"""BM25 ranked retrieval over the documents table — the batch analog of
the reference's Elasticsearch query ranking (`elastic_retriever.py:
228-342`: ES's practical scoring is BM25; here the same ranking runs as
two streaming Dataset passes instead of an inverted-index lookup).

Scale shape:
- pass 1 (corpus stats): one vectorized ``map_batches`` emits per-batch
  partials (doc count, token-length sum, per-query-term document
  frequencies) — a combiner — and a tiny driver reduce sums them. The
  exchange moves ONE ROW PER BATCH, never tokens.
- pass 2 (scoring): the stats are closure-captured constants
  (broadcast-by-value; they are a handful of scalars), each batch is
  scored fully vectorized (arrow split + flat equality + bincount), and
  the global top-k runs through the distributed sample-sort `topk`.

Float parity with the SQL oracle: per-term contributions are summed in
a FIXED order (sorted terms, left to right) on both sides, so the
IEEE-754 result is bit-identical and the 6dp round can't flip.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cosmos_ray.queries.relational import topk


def _corpus_stats(docs_ds, terms: list[str], text_col: str) -> dict:
    """One combiner pass -> {n_docs, sum_dl, df: {term: n_docs_with_term}}."""

    def partials(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        dl = pc.list_value_length(toks).cast(pa.int64())
        flat = pc.list_flatten(toks)
        parents = np.repeat(np.arange(t.num_rows), dl.to_numpy())
        cols = {
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "sum_dl": pa.array([pc.sum(dl).as_py() or 0], pa.int64()),
        }
        for i, term in enumerate(terms):
            mask = pc.equal(flat, pa.scalar(term)).to_numpy(zero_copy_only=False)
            hit_docs = np.unique(parents[mask]).size
            cols[f"df_{i}"] = pa.array([int(hit_docs)], pa.int64())
        return pa.table(cols)

    part = docs_ds.map_batches(partials, batch_format="pyarrow")
    sums = part.sum(["n_docs", "sum_dl"] + [f"df_{i}" for i in range(len(terms))])
    return {
        "n_docs": sums["sum(n_docs)"],
        "sum_dl": sums["sum(sum_dl)"],
        "df": {t: sums[f"sum(df_{i})"] for i, t in enumerate(terms)},
    }


def bm25_topk(docs_ds, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text"):
    """Global top-k documents for ``query`` under BM25 (Lucene idf form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``), ties broken by ``id_col``.
    -> (doc_id, bm25) with bm25 rounded to 6dp."""
    terms = sorted(set(query.lower().split()))
    stats = _corpus_stats(docs_ds, terms, text_col)
    # empty corpus: nothing to score — avgdl only divides per-doc terms,
    # so any value yields the same (empty) top-k
    n = stats["n_docs"]
    avgdl = stats["sum_dl"] / n if n else 1.0
    idf = {t: math.log(1.0 + (n - stats["df"][t] + 0.5) / (stats["df"][t] + 0.5))
           for t in terms}

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        dl = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
        flat = pc.list_flatten(toks)
        parents = np.repeat(np.arange(t.num_rows), dl)
        denom_base = k1 * (1.0 - b + b * (dl / avgdl))
        total = np.zeros(t.num_rows, dtype=np.float64)
        for term in terms:  # fixed order: float-sum parity with the oracle
            mask = pc.equal(flat, pa.scalar(term)).to_numpy(zero_copy_only=False)
            tf = np.bincount(parents[mask], minlength=t.num_rows).astype(np.float64)
            total = total + idf[term] * (tf / (tf + denom_base))
        # half-away-from-zero (scores are >= 0), matching DuckDB round()
        rounded = np.floor(total * 1e6 + 0.5) / 1e6
        return pa.table({
            id_col: t.column(id_col),
            "bm25": pa.array(rounded, pa.float64()),
        })

    scored = docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
    return topk(scored, [("bm25", True), (id_col, False)], k)


# ------------------------------------------------------ inverted index at rest

def _term_buckets(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic md5-based term -> bucket (stable across processes;
    internal partitioning only — the oracle checks scores, not buckets).
    Big-endian upper-64 (NOT DuckDB md5_number_upper, which is
    little-endian; see selection._hash_bucket for the replayable form)."""
    import hashlib

    return np.array(
        [int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
         % num_buckets for t in terms],
        dtype=np.int64,
    )


def build_text_index(docs_ds, out_dir: str, num_buckets: int = 32,
                     id_col: str = "doc_id", text_col: str = "text") -> dict:
    """Index-time half of ranked retrieval — the at-rest analog of the
    reference's ES bulk indexing (`elasticsearch_ingest.py` /
    `elastic_retriever.py:182-227`): explode documents into postings
    ``(term, doc_id, tf, dl)`` and write them hive-partitioned by a
    deterministic term-hash bucket (``tbucket=K/``), plus corpus stats
    (``n_docs``, ``sum_dl``) in ``meta.json``. Queries read ONLY their
    terms' buckets (disk-level partition pruning, the inverted-index
    lookup ES does in memory).

    Scale shape: one vectorized pass — per-(doc, term) tf comes from an
    arrow C++ ``group_by`` inside the batch, term bucketing hashes the
    batch's UNIQUE terms only; postings shuffle once into the hive
    write. Corpus stats move one row per batch."""
    import json
    import os

    import ray.data as rd

    def postings(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        dl = pc.list_value_length(toks).cast(pa.int64())
        flat = pc.list_flatten(toks)
        parents = np.repeat(np.arange(t.num_rows), dl.to_numpy())
        grp = (
            pa.table({"p": pa.array(parents, pa.int64()), "term": flat})
            .group_by(["p", "term"])
            .aggregate([([], "count_all")])
        )
        p = grp.column("p").to_numpy()
        terms = grp.column("term").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        tb = _term_buckets(uniq, num_buckets)[inv]
        return pa.table({
            "term": grp.column("term"),
            id_col: t.column(id_col).take(pa.array(p)),
            "tf": grp.column("count_all").cast(pa.int64()),
            "dl": dl.take(pa.array(p)),
            "tbucket": pa.array(tb, pa.int64()),
        })

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        return pa.table({
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "sum_dl": pa.array(
                [pc.sum(pc.list_value_length(toks)).as_py() or 0], pa.int64()),
        })

    os.makedirs(out_dir, exist_ok=True)
    docs_ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["tbucket"])
    agg = (docs_ds.select_columns([id_col, text_col])
           .map_batches(stats, batch_format="pyarrow").sum(["n_docs", "sum_dl"]))
    meta = {"n_docs": int(agg["sum(n_docs)"]),
            "sum_dl": int(agg["sum(sum_dl)"]),
            "num_buckets": num_buckets, "id_col": id_col}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def bm25_query_index(index_dir: str, query: str, k: int = 10,
                     k1: float = 1.2, b: float = 0.75):
    """Query-time half: read ONLY the query terms' ``tbucket=K/``
    partitions, compute df from the pruned postings (exact — a term's
    every posting lives in its bucket), score per (doc, term) into
    per-term columns and reduce with one groupby — the float sum runs
    in fixed sorted-term order on every path, so results are
    bit-identical to the from-scratch ``bm25_topk`` (zero-tf terms
    contribute exactly 0.0, an IEEE identity).

    Docs containing none of the terms never leave disk; they all score
    0, so the top-k is unchanged whenever >= k docs match any term."""
    import glob
    import json
    import math
    import os

    import ray.data as rd
    from ray.data.aggregate import Sum

    from cosmos_ray.queries.relational import topk as _topk

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    terms = sorted(set(query.lower().split()))
    tb = _term_buckets(np.array(terms), meta["num_buckets"])
    paths = [p for c in sorted({int(x) for x in tb})
             for p in glob.glob(os.path.join(index_dir, f"tbucket={c}", "*.parquet"))]
    if not paths:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "bm25": pa.array([], pa.float64())}))
    ds = rd.read_parquet(paths, columns=["term", id_col, "tf", "dl"])

    def only_terms(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("term"), pa.array(terms)))

    hits = ds.map_batches(only_terms, batch_format="pyarrow")

    def df_partials(t: pa.Table) -> pa.Table:
        tcol = t.column("term").to_numpy(zero_copy_only=False)
        return pa.table({f"df_{i}": pa.array([int((tcol == term).sum())],
                                             pa.int64())
                         for i, term in enumerate(terms)})

    sums = hits.map_batches(df_partials, batch_format="pyarrow").sum(
        [f"df_{i}" for i in range(len(terms))])
    if sums is None:  # no posting matched any term
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "bm25": pa.array([], pa.float64())}))
    df = {t: (sums[f"sum(df_{i})"] or 0) for i, t in enumerate(terms)}
    n, avgdl = meta["n_docs"], meta["sum_dl"] / meta["n_docs"]
    idf = {t: math.log(1.0 + (n - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5))
           for t in terms}

    def contribs(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy().astype(np.float64)
        dl = t.column("dl").to_numpy().astype(np.float64)
        tcol = t.column("term").to_numpy(zero_copy_only=False)
        denom_base = k1 * (1.0 - b + b * (dl / avgdl))
        cols = {id_col: t.column(id_col)}
        for i, term in enumerate(terms):
            m = (tcol == term).astype(np.float64)
            cols[f"c_{i}"] = pa.array(
                m * idf[term] * (tf / (tf + denom_base)), pa.float64())
        return pa.table(cols)

    per_doc = (hits.map_batches(contribs, batch_format="pyarrow")
               .groupby(id_col)
               .aggregate(*[Sum(f"c_{i}", alias_name=f"c_{i}")
                            for i in range(len(terms))]))

    def finish(t: pa.Table) -> pa.Table:
        total = np.zeros(t.num_rows, dtype=np.float64)
        for i in range(len(terms)):  # fixed order: float parity with bm25_topk
            total = total + t.column(f"c_{i}").to_numpy()
        rounded = np.floor(total * 1e6 + 0.5) / 1e6
        return pa.table({id_col: t.column(id_col),
                         "bm25": pa.array(rounded, pa.float64())})

    scored = per_doc.map_batches(finish, batch_format="pyarrow")
    return _topk(scored, [("bm25", True), (id_col, False)], k)


def rrf_fuse(ranked, n: int = 10, k_rrf: int = 60, id_col: str = "doc_id",
             cap_rows: int = 100_000):
    """Reciprocal-rank fusion (Cormack et al. 2009) of multiple ranked
    retrievals — the standard hybrid-retrieval combiner (ES calls it the
    `rrf` retriever): score(d) = sum over lists of 1 / (k_rrf + rank_d).
    ``ranked``: [(dataset, score_col), ...] where each dataset is a
    TOP-K result (driver-small by definition; a guard enforces it);
    ranks are 1-based under (score DESC, id ASC). Ties in the fused
    score break to the lower id. -> (doc_id, rrf) top-``n``.

    Scale shape: the inputs are already-reduced top-k pages, so rank
    assignment is a bounded driver step (same contract as `topk`'s
    offset slice); the fuse itself stays a Dataset groupby + sample-sort
    so missing-from-one-list docs need no outer-join special case."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from cosmos_ray.queries.relational import collect_small, topk

    partials = []
    for ds, score_col in ranked:
        t = collect_small(ds.select_columns([id_col, score_col]), cap_rows)
        if t is None:
            raise ValueError("rrf_fuse inputs must be top-k results "
                             f"(under {cap_rows} rows)")
        ids = np.asarray(t.column(id_col).to_pylist())
        sc = np.asarray(t.column(score_col).to_pylist(), dtype=np.float64)
        order = np.lexsort((ids, -sc))  # score desc, id asc
        rank = np.empty(len(ids), np.int64)
        rank[order] = np.arange(1, len(ids) + 1)
        partials.append(pa.table({
            id_col: t.column(id_col),
            "c": pa.array(1.0 / (k_rrf + rank), pa.float64()),
        }))
    if not partials:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "rrf": pa.array([], pa.float64())}))
    from ray.data.aggregate import Sum

    u = rd.from_arrow(pa.concat_tables(partials))
    fused = u.groupby(id_col).aggregate(Sum("c", alias_name="rrf"))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(t.schema.get_field_index("rrf"), "rrf",
                            pc.round(t.column("rrf"), 6,
                                     round_mode="half_towards_infinity"))

    return topk(fused.map_batches(finish, batch_format="pyarrow"),
                [("rrf", True), (id_col, False)], n)


def mmr_rerank(candidates_ds, query_vec, k: int = 10, lam: float = 0.7,
               id_col: str = "doc_id", emb_col: str = "embedding",
               cap_rows: int = 100_000):
    """Maximal-marginal-relevance diversity re-ranking (Carbonell &
    Goldstein 1998) of a retrieved candidate set: greedily pick the item
    maximizing ``lam * cos(q, d) - (1 - lam) * max cos(d, selected)``,
    ties broken to the lower id. -> (doc_id, mmr, rank) with mmr rounded
    to 6dp.

    Scale shape: candidates are an already-reduced top-N page (a guard
    enforces driver-small, same contract as `rrf_fuse`); the greedy loop
    is k iterations of one vectorized similarity row each — the
    inherently sequential part runs on model-sized data only."""
    import ray.data as rd

    from cosmos_ray.queries.relational import collect_small

    t = collect_small(candidates_ds.select_columns([id_col, emb_col]), cap_rows)
    if t is None:
        raise ValueError(f"mmr_rerank input must be a top-N result "
                         f"(under {cap_rows} rows)")
    ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
    V = np.asarray(t.column(emb_col).to_pylist(), dtype=np.float64)
    if len(ids) == 0:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "mmr": pa.array([], pa.float64()),
                                       "rank": pa.array([], pa.int64())}))
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    q = np.asarray(query_vec, dtype=np.float64).ravel()
    qn = q / max(np.linalg.norm(q), 1e-12)
    rel = Vn @ qn
    # deterministic: order candidates by (relevance desc, id asc) so the
    # argmax tie-break is by id regardless of input row order
    order = np.lexsort((ids, -rel))
    ids, Vn, rel = ids[order], Vn[order], rel[order]
    n = len(ids)
    selected: list[int] = []
    max_sim = np.zeros(n)  # max cosine to any selected item (none yet)
    picked = np.zeros(n, dtype=bool)
    scores: list[float] = []
    for step in range(min(k, n)):
        # first pick: pure relevance (no diversity penalty yet)
        mmr = lam * rel - ((1.0 - lam) * max_sim if step else 0.0)
        mmr = np.where(picked, -np.inf, mmr)
        i = int(np.argmax(mmr))  # first max = lowest id under the presort
        picked[i] = True
        selected.append(i)
        scores.append(float(mmr[i]))
        max_sim = np.maximum(max_sim, Vn @ Vn[i])
    sel = np.asarray(selected)
    rounded = [float(np.sign(s) * np.floor(abs(s) * 1e6 + 0.5) / 1e6)
               for s in scores]
    return rd.from_arrow(pa.table({
        id_col: pa.array(ids[sel], pa.int64()),
        "mmr": pa.array(rounded, pa.float64()),
        "rank": pa.array(np.arange(1, len(sel) + 1), pa.int64()),
    }))


def snippet_extract(docs_ds, query: str, window: int = 5,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Matched-context snippets — the batch analog of ES highlighting
    (the reference serves matched contexts from `elastic_retriever`
    query results): for every document containing at least one query
    term, emit the ±``window`` tokens around the EARLIEST first
    occurrence across terms. -> (doc_id, snippet); non-matching docs are
    dropped.

    Fully vectorized: one arrow lowercase+split per batch, first-match
    positions via flat-token equality + np.unique per term, and the
    per-row variable slices are gathered with a repeat/cumsum index
    build into one ListArray + ``binary_join`` — no Python loop over
    rows or tokens."""

    terms = sorted(set(query.lower().split()))
    big = np.iinfo(np.int64).max

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        dl = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
        flat = pc.list_flatten(toks).combine_chunks() if isinstance(
            pc.list_flatten(toks), pa.ChunkedArray) else pc.list_flatten(toks)
        n = t.num_rows
        off = np.zeros(n + 1, np.int64)
        np.cumsum(dl, out=off[1:])
        parents = np.repeat(np.arange(n), dl)
        fl = flat.to_numpy(zero_copy_only=False)
        best = np.full(n, big)
        for term in terms:
            idxs = np.flatnonzero(fl == term)
            if idxs.size:
                par, first_i = np.unique(parents[idxs], return_index=True)
                pos = idxs[first_i] - off[par]
                best[par] = np.minimum(best[par], pos)
        rows = np.flatnonzero(best < big)
        if rows.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "snippet": pa.array([], pa.string())})
        p0 = best[rows]
        starts = np.maximum(0, p0 - window) + off[rows]
        ends = np.minimum(dl[rows], p0 + window + 1) + off[rows]  # exclusive
        lens = ends - starts
        total = int(lens.sum())
        cum = np.zeros(len(lens), np.int64)
        np.cumsum(lens[:-1], out=cum[1:])
        gather = np.repeat(starts, lens) + (np.arange(total) - np.repeat(cum, lens))
        taken = flat.take(pa.array(gather, pa.int64()))
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        la = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                      taken.combine_chunks() if isinstance(
                                          taken, pa.ChunkedArray) else taken)
        return pa.table({
            id_col: t.column(id_col).take(pa.array(rows, pa.int64())),
            "snippet": pc.binary_join(la, " "),
        })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def append_text_index(new_docs_ds, index_dir: str,
                      id_col: str = "doc_id", text_col: str = "text") -> dict:
    """Fold new documents INTO an existing at-rest inverted index (the
    incremental-indexing half of the ES analog): postings for the new
    docs are appended into the same ``tbucket=K/`` hive partitions as
    new uniquely-named files (existing files never rewritten — safe
    while readers query), and the additive corpus stats in
    ``meta.json`` are updated last, so a query sees either the old or
    the new consistent index. Doc ids must be disjoint from the
    existing index; queries after the append are bit-identical to a
    fresh ``build_text_index`` over the union (df / n_docs / sum_dl
    compose additively)."""
    import json
    import os

    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    tmp = os.path.join(index_dir, ".meta_next")
    new_meta = build_text_index(new_docs_ds, index_dir,
                                num_buckets=meta["num_buckets"],
                                id_col=id_col, text_col=text_col)
    # build_text_index just overwrote meta.json with the NEW slice's
    # stats; restore the additive union atomically
    merged = {"n_docs": meta["n_docs"] + new_meta["n_docs"],
              "sum_dl": meta["sum_dl"] + new_meta["sum_dl"],
              "num_buckets": meta["num_buckets"], "id_col": meta["id_col"]}
    with open(tmp, "w") as f:
        json.dump(merged, f)
    os.replace(tmp, meta_path)
    return merged


# ----------------------------------------------------- boolean composition

class _BoolNode:
    """Parsed query_string node: ('term', w) | ('phrase', [w..]) |
    ('not', c) | ('and', [c..]) | ('or', [c..])."""

    __slots__ = ("kind", "val")

    def __init__(self, kind, val):
        self.kind, self.val = kind, val


def parse_boolean_query(query: str) -> _BoolNode:
    """Recursive-descent parser for the ES ``query_string`` boolean
    subset (`elastic_retriever.py:228-342`): AND / OR / NOT (case
    sensitive operators), parentheses, double-quoted phrases; adjacent
    clauses without an operator default to AND (ES
    ``default_operator=AND`` — the reference passes explicit operators).

    Grammar:  or := and (OR and)* ; and := unary ((AND)? unary)* ;
              unary := NOT unary | '(' or ')' | '"w .."' | term
    """
    import re as _re

    toks = _re.findall(r'"[^"]*"|\(|\)|[^\s()]+', query)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def take():
        t = peek()
        pos[0] += 1
        return t

    def p_or():
        parts = [p_and()]
        while peek() == "OR":
            take()
            parts.append(p_and())
        return parts[0] if len(parts) == 1 else _BoolNode("or", parts)

    def p_and():
        parts = [p_unary()]
        while peek() is not None and peek() not in (")", "OR"):
            if peek() == "AND":
                take()
            parts.append(p_unary())
        return parts[0] if len(parts) == 1 else _BoolNode("and", parts)

    def p_unary():
        t = peek()
        if t == "NOT":
            take()
            return _BoolNode("not", p_unary())
        if t == "(":
            take()
            node = p_or()
            if take() != ")":
                raise ValueError(f"unbalanced parens in {query!r}")
            return node
        t = take()
        if t is None or t in ("AND", "OR", ")"):
            raise ValueError(f"dangling operator in {query!r}")
        if t.startswith('"'):
            words = t.strip('"').lower().split()
            if not words:
                raise ValueError(f"empty phrase in {query!r}")
            return _BoolNode("phrase", words)
        m = _re.fullmatch(r"(.+?)~(\d?)", t)
        if m:  # ES fuzziness: term~ (dist 1) or term~N
            return _BoolNode(
                "fuzzy", (m.group(1).lower(), int(m.group(2) or 1)))
        return _BoolNode("term", t.lower())

    node = p_or()
    if pos[0] != len(toks):
        raise ValueError(f"trailing tokens in {query!r}")
    return node


def positive_terms(node: _BoolNode, negated: bool = False) -> set[str]:
    """Unigram terms NOT under a NOT — the ranking vocabulary (phrase
    words included; a negated clause can only exclude, never score)."""
    if node.kind == "term":
        return set() if negated else {node.val}
    if node.kind == "phrase":
        return set() if negated else set(node.val)
    if node.kind == "fuzzy":
        return set()  # match-only: the expansion set is data-dependent
    if node.kind == "not":
        return positive_terms(node.val, not negated)
    out: set[str] = set()
    for c in node.val:
        out |= positive_terms(c, negated)
    return out


def boolean_query_topk(docs_ds, query: str, k: int = 10, k1: float = 1.2,
                       b: float = 0.75, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Boolean-composed ranked retrieval (the ES ``query_string``
    analog): docs matching the AND/OR/NOT tree, ranked by BM25 over the
    query's positive unigram terms (fixed sorted-term float-sum order —
    SQL-oracle parity like ``bm25_topk``), ties by ``id_col``.

    Matching semantics (whitespace tokenizer, lowercased):
    - term: token equality anywhere in the document;
    - "quoted phrase": consecutive-token match (substring of
      ' '+text+' ' with space-bounded ends);
    - term~N: fuzzy match, any token within N edits (ES fuzziness;
      match-only — the expansion set is data-dependent so it does not
      join the BM25 vocabulary);
    - NOT / AND / OR compose per-document booleans.

    Scale shape: identical to ``bm25_topk`` — one combiner stats pass
    (one row per batch) + one vectorized match-and-score pass into the
    distributed top-k; the boolean tree evaluates as numpy masks, no
    extra passes regardless of tree size."""
    tree = parse_boolean_query(query)
    terms = sorted(positive_terms(tree))
    stats = _corpus_stats(docs_ds, terms, text_col)
    # empty corpus: nothing to score (see bm25_topk)
    n = stats["n_docs"]
    avgdl = stats["sum_dl"] / n if n else 1.0
    idf = {t: math.log(1.0 + (n - stats["df"][t] + 0.5) / (stats["df"][t] + 0.5))
           for t in terms}

    def matches(node: _BoolNode, flat, parents, nrows, padded) -> np.ndarray:
        if node.kind == "term":
            m = pc.equal(flat, pa.scalar(node.val)).to_numpy(zero_copy_only=False)
            out = np.zeros(nrows, dtype=bool)
            out[parents[m]] = True
            return out
        if node.kind == "phrase":
            needle = " " + " ".join(node.val) + " "
            return pc.match_substring(
                padded, pattern=needle).to_numpy(zero_copy_only=False)
        if node.kind == "fuzzy":
            fterm, fdist = node.val
            m = _fuzzy_matched_tokens(flat, fterm, fdist)
            out = np.zeros(nrows, dtype=bool)
            out[parents[m]] = True
            return out
        if node.kind == "not":
            return ~matches(node.val, flat, parents, nrows, padded)
        parts = [matches(c, flat, parents, nrows, padded) for c in node.val]
        return np.logical_and.reduce(parts) if node.kind == "and" \
            else np.logical_or.reduce(parts)

    def score(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t.column(text_col))
        toks = pc.split_pattern(lower, " ")
        dl = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
        flat = pc.list_flatten(toks)
        parents = np.repeat(np.arange(t.num_rows), dl)
        padded = pc.binary_join_element_wise(
            pa.scalar(" "), lower, pa.scalar(" "), pa.scalar(""))
        hit = matches(tree, flat, parents, t.num_rows, padded)
        denom_base = k1 * (1.0 - b + b * (dl / avgdl))
        total = np.zeros(t.num_rows, dtype=np.float64)
        for term in terms:  # fixed order: float-sum parity with the oracle
            m = pc.equal(flat, pa.scalar(term)).to_numpy(zero_copy_only=False)
            tf = np.bincount(parents[m], minlength=t.num_rows).astype(np.float64)
            total = total + idf[term] * (tf / (tf + denom_base))
        rounded = np.floor(total * 1e6 + 0.5) / 1e6
        out = pa.table({
            id_col: t.column(id_col),
            "bm25": pa.array(rounded, pa.float64()),
        })
        return out.filter(pa.array(hit))

    scored = docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
    return topk(scored, [("bm25", True), (id_col, False)], k)


# --------------------------------------------------------------- fuzzy

def _fuzzy_matched_tokens(flat: "pa.Array", term: str, max_dist: int) -> np.ndarray:
    """Boolean mask over ``flat`` tokens: Levenshtein(token, term) <=
    max_dist. Vectorized: distances run once over the batch's DISTINCT
    tokens (length-banded candidates only) and broadcast back — the DP
    cost is bounded by per-batch vocabulary, not token count."""
    from cosmos_ray.functions.linkage import levenshtein_batch

    uniq = pc.unique(flat)
    uvals = uniq.to_pylist()
    lens = np.array([len(u) if u is not None else -1 for u in uvals])
    cand = np.flatnonzero(np.abs(lens - len(term)) <= max_dist)
    ok_tokens = set()
    if len(cand):
        cvals = [uvals[i] for i in cand]
        d = levenshtein_batch(cvals, [term] * len(cvals))
        ok_tokens = {cvals[i] for i in np.flatnonzero(d <= max_dist)}
    if not ok_tokens:
        return np.zeros(len(flat), dtype=bool)
    return pc.is_in(
        flat, value_set=pa.array(sorted(ok_tokens), pa.string())
    ).to_numpy(zero_copy_only=False)


def fuzzy_search(docs_ds, term: str, max_dist: int = 1, k: int = 10,
                 id_col: str = "doc_id", text_col: str = "text"):
    """ES fuzzy-match analog (`elastic_retriever.py` fuzziness): top-k
    docs by the count of tokens within ``max_dist`` edits of ``term``
    (integer tf — exactly SQL-replayable via DuckDB's levenshtein()),
    ties by ``id_col``. ONE streaming pass: per batch the DP runs over
    the batch's distinct length-banded tokens only; no exchange beyond
    the top-k."""
    term = term.lower()

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        dl = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
        flat = pc.list_flatten(toks)
        parents = np.repeat(np.arange(t.num_rows), dl)
        m = _fuzzy_matched_tokens(flat, term, max_dist)
        tf = np.bincount(parents[m], minlength=t.num_rows).astype(np.int64)
        out = pa.table({
            id_col: t.column(id_col),
            "tf": pa.array(tf, pa.int64()),
        })
        return out.filter(pa.array(tf > 0))

    scored = docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
    return topk(scored, [("tf", True), (id_col, False)], k)
