"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All are stateless vectorized ``map_batches`` transforms over the
``documents`` table shape (doc_id, text, lang, source, n_chars). The
token/quality/fingerprint contracts are deliberately SQL-expressible so
the driver's DuckDB oracle can verify them value-for-value; language ID
is a statistical heuristic (rows-only check).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "and", "of", "to")


def token_count_batch(t: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace tokens), n_chars_measured.
    Vectorized via pyarrow: split_pattern + list_value_length."""
    toks = pc.split_pattern(t.column("text"), " ")
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            "n_chars_measured": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        }
    )


def quality_score_batch(t: pa.Table) -> pa.Table:
    """Per-doc quality features (the length/stopword-ratio family of
    web-corpus quality filters): n_tokens, mean_token_len, stopword_ratio,
    and a composite keep flag. All double-precision, SQL-mirrorable."""
    toks = pc.split_pattern(t.column("text"), " ")
    n_tokens = pc.cast(pc.list_value_length(toks), pa.float64())
    n_chars = pc.cast(pc.utf8_length(t.column("text")), pa.float64())
    # mean token length = (chars - separators) / tokens
    seps = pc.subtract(n_tokens, 1)
    mean_tok = pc.divide(pc.subtract(n_chars, seps), pc.max_element_wise(n_tokens, 1.0))

    # stopword ratio: flatten once, membership test, re-aggregate by doc
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS))
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.float64)
    idx = np.repeat(np.arange(len(lens)), lens)
    stop_per_doc = np.bincount(idx, weights=stop_np, minlength=len(lens))
    ratio = stop_per_doc / np.maximum(lens, 1)

    nt = n_tokens.to_numpy(zero_copy_only=False)
    keep = (nt >= 10) & (ratio <= 0.5)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "mean_token_len": pc.round(mean_tok, 6),
            "stopword_ratio": pa.array(np.round(ratio, 6), pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
# (the regex family GPT-style tokenizers use before merges)
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def compression_ratio_batch(t: pa.Table, level: int = 6) -> pa.Table:
    """Per-doc zlib COMPRESSION RATIO (compressed/raw bytes) — the
    Gopher-style repetitiveness signal (Rae et al. 2021 use exactly
    this: highly compressible text is boilerplate/templating, nearly
    incompressible text is noise). Deterministic for a fixed zlib
    level, so the pytest golden recomputes it bit-exactly; no SQL
    analog exists (DuckDB has no compress scalar), so the query is
    rows-only by design. The per-doc compress call is the unavoidable
    per-string kernel (C-speed zlib), same posture as md5 hashing."""
    import zlib

    texts = t.column("text").to_pylist()
    ratios = []
    for s in texts:
        b = s.encode("utf-8")
        ratios.append(
            round(len(zlib.compress(b, level)) / max(len(b), 1), 6))
    return pa.table({
        "doc_id": t.column("doc_id"),
        "compression_ratio": pa.array(ratios, pa.float64())})


def compression_ratios(docs_ds, level: int = 6):
    return docs_ds.map_batches(
        lambda t, lv=level: compression_ratio_batch(t, lv),
        batch_format="pyarrow")


def regex_token_count_batch(t: pa.Table) -> pa.Table:
    """doc_id, n_regex_tokens using the BPE-ish pre-tokenizer regex —
    vectorized via pyarrow extract_regex? count via split is wrong; use
    pandas str.count (C-impl) on the compiled pattern."""
    import pandas as pd

    texts = pd.Series(t.column("text").to_pylist(), dtype=object)
    n = texts.str.count(_BPE_RE).astype("int64")
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_regex_tokens": pa.array(n.to_numpy(), pa.int64()),
        }
    )


def regex_token_counts(docs_ds):
    return docs_ds.map_batches(regex_token_count_batch, batch_format="pyarrow")


_ROLL_BASE = 257
_ROLL_BASE2 = 263  # independent second hash (see fingerprint width note)
# Mersenne-31 modulus: byte x B^k products stay within uint64, so the
# per-position window hashes compute as a handful of vectorized numpy
# multiply-adds with ONE final mod (a 2^61 modulus would overflow uint64
# and force the per-byte python recurrence this replaced)
_ROLL_MOD = (1 << 31) - 1


def _roll_pows(n: int, base: int) -> np.ndarray:
    """[B^(n-1), ..., B^1, B^0] mod M as uint64 (cached per (n, base))."""
    global _ROLL_POW_CACHE
    try:
        cached = _ROLL_POW_CACHE
    except NameError:
        cached = _ROLL_POW_CACHE = {}
    key = (n, base)
    if key not in cached:
        cached[key] = np.array(
            [pow(base, n - 1 - k, _ROLL_MOD) for k in range(n)], dtype=np.uint64
        )
    return cached[key]


def _window_hashes(data: np.ndarray, w: int, base: int) -> np.ndarray:
    pows = _roll_pows(w, base)
    n = len(data) - w + 1
    acc = np.zeros(n, dtype=np.uint64)
    for k in range(w):
        acc += data[k : k + n].astype(np.uint64) * pows[k]
    return acc % np.uint64(_ROLL_MOD)


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Rabin-Karp rolling hash document fingerprint: min of the rolling
    window hashes (a winnowing-style representative, stable under
    content shifts outside the minimum window).

    Fingerprint width: the min of L window hashes concentrates near M/L,
    so a single 31-bit hash space gives unrelated multi-KB docs ~1e-6
    spurious-collision probability — too hot for corpus-scale identity.
    The emitted fingerprint is therefore 62 bits: the minimum is selected
    by the base-257 hash (preserving shift stability), then paired with
    the INDEPENDENT base-263 hash of the same winning window:
    ``fp = h257[j*] << 31 | h263[j*]``. Both hash arrays are the same
    uint64-safe vectorized accumulation."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) == 0:
        return 0
    w = min(window, len(data))
    h1 = _window_hashes(data, w, _ROLL_BASE)
    j = int(np.argmin(h1))
    h2 = _window_hashes(data[j : j + w], w, _ROLL_BASE2)
    return (int(h1[j]) << 31) | int(h2[0])


def rolling_fingerprint_batch(t: pa.Table) -> pa.Table:
    fps = [rolling_fingerprint(x) for x in t.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "rolling_fp": pa.array(fps, pa.uint64()),
        }
    )


def rolling_fingerprints(docs_ds):
    return docs_ds.map_batches(rolling_fingerprint_batch, batch_format="pyarrow")


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Deterministic content fingerprint (md5 hex) — the dedup-by-upsert
    identity of the reference (sha1 `_id` fields,
    `elastic_retriever.py:182-187`; md5 here to match the SQL oracle)."""
    texts = t.column("text").to_pylist()
    fp = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
    return pa.table({"doc_id": t.column("doc_id"), "fingerprint": pa.array(fp, pa.string())})


# ------------------------------------------------------------- language id
# Character n-gram profiles per language (tiny, deterministic). In a real
# deployment these are learned; here they are fixed public bigram cue
# lists — the operator shape (stateful profile table in actor state,
# vectorized scoring) is what matters.
_LANG_CUES: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "in", "er", "an", " t", "of", "on"),
    "de": ("en", "er", "ch", "de", "ei", "ie", "un", "sch"),
    "fr": ("es", "le", "de", "en", "re", "nt", "ou", "qu"),
    "es": ("de", "en", "el", "la", "os", "es", "ar", "ci"),
    "zh": ("zh", "ng", "sh", "ia", "ua", "uo", "ji", "xi"),
}


class LanguageId:
    """Actor-pool language identifier: n-gram cue profiles built once in
    __init__, scored per batch. Emits (doc_id, lang_pred, lang_score)."""

    def __init__(self, cues: dict[str, tuple[str, ...]] | None = None) -> None:
        self.profiles = {k: tuple(v) for k, v in (cues or _LANG_CUES).items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].str.lower()
        best_lang = np.full(len(batch), "und", dtype=object)
        best_score = np.zeros(len(batch))
        for lang, cues in self.profiles.items():
            score = np.zeros(len(batch))
            for c in cues:
                score += texts.str.count(c, flags=0).to_numpy()
            lens = texts.str.len().to_numpy().clip(min=1)
            score = score / lens
            better = score > best_score
            best_lang[better] = lang
            best_score[better] = score[better]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": best_lang,
                # half-away-from-zero to match SQL round(): scores like
                # 9/128 are binary-exact .5 ties where np.round half-evens
                "lang_score": np.floor(best_score * 1e6 + 0.5) / 1e6,
            }
        )


def token_counts(docs_ds):
    return docs_ds.map_batches(token_count_batch, batch_format="pyarrow")


def quality_scores(docs_ds):
    return docs_ds.map_batches(quality_score_batch, batch_format="pyarrow")


def fingerprints(docs_ds):
    return docs_ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def language_id(docs_ds, concurrency: int | tuple = (1, 4)):
    return docs_ds.map_batches(
        LanguageId, batch_format="pandas", concurrency=concurrency, batch_size=4096
    )


def top_terms_per_group(docs_ds, group_col: str = "lang", k: int = 10,
                        text_col: str = "text", num_buckets: int = 64):
    """Exact heavy hitters: the ``k`` most frequent whitespace tokens per
    group, ties broken by token ascending. -> (group, token, n, rank).

    Scale shape: tokens are counted INSIDE each batch first (arrow split
    + pandas-C value_counts per (group, token)), so the exchange moves
    one partial row per distinct (group, token) per batch — bounded by
    vocabulary, not corpus size; a global groupby sums partials and a
    bucketed per-group pass takes the top k."""
    from ray.data.aggregate import Sum

    from cosmos_ray.queries.relational import bucketed_group_apply

    def partials(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), " ")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        grp = t.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            group_col: np.repeat(grp, n_tok),
            "token": pc.list_flatten(toks).to_numpy(zero_copy_only=False),
        })
        agg = df.groupby([group_col, "token"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = (
        docs_ds.select_columns([group_col, text_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby([group_col, "token"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        # bucketed_group_apply hands fn ONE whole group at a time
        g = g.sort_values(["n", "token"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        return g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))

    return bucketed_group_apply(counts, [group_col], head_k,
                                num_buckets=num_buckets)


# ------------------------------------------------------------- PII redaction
# The crawl-hygiene pass every web training corpus needs before use.
# RE2 on both sides (pyarrow compute and DuckDB) so the oracle replays
# the exact same patterns; order matters (emails before IPs so dotted
# digits inside an address never double-match) and is mirrored in SQL.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def redact_pii_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id, clean_text, n_redactions — fully vectorized: per-pattern
    count_substring_regex then replace_substring_regex, applied in the
    documented order."""
    s = t.column(text_col)
    total = np.zeros(len(t), dtype=np.int64)
    for pat, rep in PII_PATTERNS:
        total += pc.count_substring_regex(s, pat).to_numpy(zero_copy_only=False)
        s = pc.replace_substring_regex(s, pat, rep)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "clean_text": s,
        "n_redactions": pa.array(total, pa.int64()),
    })


def redact_pii(docs_ds, text_col: str = "text"):
    return docs_ds.map_batches(
        lambda t: redact_pii_batch(t, text_col), batch_format="pyarrow")


# ----------------------------------------------- repetition quality filters
# The Gopher-rules family (Rae et al. 2021 §A1.1): fraction of duplicate
# lines and fraction of characters inside the most-frequent word — both
# exact, per-doc, SQL-mirrorable.

def repetition_stats_batch(t: pa.Table, text_col: str = "text",
                           line_sep: str = ". ") -> pa.Table:
    """doc_id, dup_line_frac (duplicate 'lines' / lines, where lines are
    ``line_sep``-separated spans), top_word_char_frac (chars of the most
    frequent word x its count / total word chars), rep_keep flag."""
    texts = t.column(text_col).to_pylist()
    dup_frac = np.zeros(len(texts))
    top_frac = np.zeros(len(texts))
    for i, x in enumerate(texts):
        lines = x.split(line_sep)
        if lines:
            dup_frac[i] = (len(lines) - len(set(lines))) / len(lines)
        words = x.split(" ")
        if words:
            counts: dict[str, int] = {}
            for w in words:
                counts[w] = counts.get(w, 0) + 1
            total_chars = sum(len(w) for w in words)
            if total_chars:
                best = max(counts.items(), key=lambda kv: (kv[1] * len(kv[0]),
                                                           kv[0]))
                top_frac[i] = best[1] * len(best[0]) / total_chars
    keep = (dup_frac <= 0.3) & (top_frac <= 0.2)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "dup_line_frac": pc.round(pa.array(dup_frac, pa.float64()), 6,
                                  round_mode="half_towards_infinity"),
        "top_word_char_frac": pc.round(pa.array(top_frac, pa.float64()), 6,
                                       round_mode="half_towards_infinity"),
        "rep_keep": pa.array(keep, pa.bool_()),
    })


def repetition_stats(docs_ds, text_col: str = "text"):
    return docs_ds.map_batches(
        lambda t: repetition_stats_batch(t, text_col), batch_format="pyarrow")


# ---------------------------------------- cross-doc duplicate-ngram fraction
def dup_ngram_fraction(docs_ds, n: int = 8, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Per-doc fraction of distinct word n-grams that also occur in at
    least one OTHER document — the corpus-level duplicated-span
    diagnostic behind substring-dedup decisions (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better').
    -> (doc_id, n_grams, dup_frac).

    Scale shape: explode to one row per DISTINCT (doc, gram) — text
    never shuffles, gram strings do; gram doc-frequency is one groupby;
    the per-doc rollup is a second. Both exchanges carry (gram, count)
    / (doc, counts) rows only."""
    from ray.data.aggregate import Count, Sum

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        out_id, out_g = [], []
        for i, x in enumerate(t.column(text_col).to_pylist()):
            w = x.split(" ")
            grams = {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}
            out_id.extend([ids[i]] * len(grams))
            out_g.extend(grams)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "g": pa.array(out_g, pa.string())})

    pairs = docs_ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow").materialize()
    df = pairs.groupby("g").aggregate(Count(alias_name="df"))

    # re-key doc-frequency back onto the (doc, gram) pairs: one bucketed
    # groupby on gram (pairs + df unioned) instead of a hash join
    tagged = pairs.map_batches(
        lambda t: t.append_column("df", pa.nulls(len(t), pa.int64())),
        batch_format="pyarrow").union(
        df.map_batches(lambda t: pa.table({
            id_col: pa.nulls(len(t), pa.int64()),
            "g": t.column("g"),
            "df": t.column("df").cast(pa.int64())}), batch_format="pyarrow"))

    from cosmos_ray.queries.relational import bucketed_group_apply

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        dfv = int(g.loc[g[id_col].isna(), "df"].iloc[0])
        docs = g.loc[g[id_col].notna(), id_col]
        return pd.DataFrame({id_col: docs.astype("int64"),
                             "dup": np.full(len(docs), 1 if dfv > 1 else 0,
                                            dtype=np.int64),
                             "one": np.ones(len(docs), dtype=np.int64)})

    per_pair = bucketed_group_apply(tagged, ["g"], attach)
    agg = per_pair.groupby(id_col).aggregate(Sum("dup", alias_name="n_dup"),
                                             Sum("one", alias_name="n_grams"))

    def finish(t: pa.Table) -> pa.Table:
        nd = t.column("n_dup").to_numpy(zero_copy_only=False).astype(np.float64)
        ng = t.column("n_grams").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            id_col: t.column(id_col),
            "n_grams": t.column("n_grams").cast(pa.int64()),
            "dup_frac": pc.round(pa.array(nd / np.maximum(ng, 1), pa.float64()),
                                 6, round_mode="half_towards_infinity"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------- tf-idf keywords
def tfidf_keywords(docs_ds, k: int = 3, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Top-``k`` tf-idf terms per document -> (doc_id, term, tfidf, rank).
    tf = in-doc term count, idf = ln(N / df) (raw, no smoothing — both
    SQL-replayable); ties broken by term asc. The keyword-extraction
    pass of the retrieval side (the ES significant-terms analog).

    Scale shape: per-batch (doc, term, tf) partials; term doc-frequency
    is a vocabulary-sized groupby broadcast back via ``ray.put``; the
    top-k pick is an in-bucket vectorized sort."""
    import ray

    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import bucketed_group_apply

    def term_counts(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(t.column(text_col), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({id_col: np.repeat(ids, lens), "term": flat})
        agg = d.groupby([id_col, "term"], sort=False).size().reset_index(name="tf")
        return pa.Table.from_pandas(agg, preserve_index=False)

    # per-batch partials may split one doc across batches — sum tf
    from ray.data.aggregate import Sum
    tf = (docs_ds.select_columns([id_col, text_col])
          .map_batches(term_counts, batch_format="pyarrow")
          .groupby([id_col, "term"]).aggregate(Sum("tf", alias_name="tf"))
          .materialize())

    df_tbl = (tf.groupby("term").aggregate(Count(alias_name="df")).to_pandas())
    n_docs = docs_ds.count()
    idf = dict(zip(df_tbl["term"], np.log(n_docs / df_tbl["df"].to_numpy())))
    idf_ref = ray.put(idf)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(idf_ref)
        terms = pd.Series(t.column("term").to_pylist())
        w = terms.map(m).to_numpy(dtype=np.float64)
        tfv = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "tfidf", pc.round(pa.array(tfv * w, pa.float64()), 6,
                              round_mode="half_towards_infinity"))

    scored = tf.map_batches(score, batch_format="pyarrow")

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tfidf", "term"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        return g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))

    return bucketed_group_apply(scored.select_columns([id_col, "term", "tfidf"]),
                                [id_col], head_k)


# ------------------------------------------------ content-defined chunking
def cdc_chunk_batch(t: pa.Table, window: int = 16, modulus: int = 64,
                    id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Content-defined chunking (the rsync/LBFS boundary rule): cut after
    byte j+window-1 wherever the base-257 Mersenne-31 window hash at j is
    ≡ 0 (mod ``modulus``) — boundaries survive insertions/deletions
    outside the window, which is what makes chunk hashes usable for
    sub-document dedup across crawl snapshots.
    -> (doc_id, chunk_idx, chunk_start, chunk_end, chunk_hash) with
    byte-inclusive [chunk_start, chunk_end] spans and md5 chunk ids."""
    import hashlib

    out = {"doc_id": [], "chunk_idx": [], "chunk_start": [], "chunk_end": [],
           "chunk_hash": []}
    ids = t.column(id_col).to_pylist()
    for i, x in enumerate(t.column(text_col).to_pylist()):
        data = np.frombuffer(x.encode("utf-8"), dtype=np.uint8)
        n = len(data)
        if n == 0:
            continue
        if n >= window:
            h = _window_hashes(data, window, _ROLL_BASE)
            ends = (np.nonzero(h % np.uint64(modulus) == 0)[0]
                    + window - 1).tolist()
        else:
            ends = []
        if not ends or ends[-1] != n - 1:
            ends.append(n - 1)
        start = 0
        for ci, e in enumerate(ends):
            out["doc_id"].append(ids[i])
            out["chunk_idx"].append(ci)
            out["chunk_start"].append(start)
            out["chunk_end"].append(e)
            out["chunk_hash"].append(
                hashlib.md5(data[start:e + 1].tobytes()).hexdigest())
            start = e + 1
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "chunk_idx": pa.array(out["chunk_idx"], pa.int64()),
        "chunk_start": pa.array(out["chunk_start"], pa.int64()),
        "chunk_end": pa.array(out["chunk_end"], pa.int64()),
        "chunk_hash": pa.array(out["chunk_hash"], pa.string()),
    })


def cdc_chunks(docs_ds, window: int = 16, modulus: int = 64):
    """Distributed CDC pass — stateless per-doc map, no exchange. Chunk
    hashes feed a groupby for sub-document (chunk-level) dedup."""
    return docs_ds.map_batches(
        lambda t: cdc_chunk_batch(t, window, modulus), batch_format="pyarrow")


def readability_batch(t: pa.Table, round_to: int = 6) -> pa.Table:
    """Flesch reading-ease inputs + score per doc, fully vectorized —
    the classic text-quality heuristic alongside the Gopher repetition
    gates. Syllables are approximated as vowel-cluster counts with a
    floor of 1 per vowel-less word (the standard heuristic); the
    synthetic corpus has no sentence punctuation so the
    sentences-per-doc term is fixed at 1 (documented degenerate form:
    score = 206.835 - 1.015*words - 84.6*syllables/words). Empty
    tokens (double spaces) are excluded on both engine and oracle
    sides; docs with zero words are dropped."""
    import pandas as pd

    s = pd.Series(t.column("text").to_pylist())
    words = s.str.count(r"[^ ]+").to_numpy(dtype=np.float64)
    clusters = s.str.count(r"[aeiou]+").to_numpy(dtype=np.float64)
    # vowel-less words get the 1-syllable floor
    novowel = s.str.count(r"(?:(?<= )|^)[^ aeiou]+(?=(?: |$))").to_numpy(
        dtype=np.float64)
    syl = clusters + novowel
    keep = words > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        score = 206.835 - 1.015 * words - 84.6 * (syl / np.maximum(words, 1))
    return pa.table({
        "doc_id": t.column("doc_id").filter(pa.array(keep)),
        "n_words": pa.array(words[keep].astype(np.int64)),
        "n_syllables": pa.array(syl[keep].astype(np.int64)),
        "flesch": pa.array(np.round(score[keep], round_to)),
    })


def readability(docs_ds):
    return docs_ds.map_batches(readability_batch, batch_format="pyarrow")


def type_token_ratio(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                     round_to: int = 6):
    """Lexical diversity per document: type-token ratio = distinct
    tokens / tokens (whitespace tokenization) — the repetitiveness
    screen next to `quality_scores`. Fully arrow-native per batch:
    split → list_flatten + list_parent_indices → one
    ``count_distinct`` hash aggregation per batch; no exchange at all
    (embarrassingly parallel). -> (doc_id, n_tokens, n_types, ttr)."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), " ")
        n_tok = pc.list_value_length(toks).cast(pa.int64())
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        g = pa.TableGroupBy(pa.table({"i": parent, "tok": flat}), "i") \
              .aggregate([("tok", "count_distinct")])
        u = np.zeros(t.num_rows, np.int64)
        u[g.column("i").to_numpy()] = g.column("tok_count_distinct").to_numpy()
        n = n_tok.to_numpy(zero_copy_only=False)
        ttr = np.round(u / np.maximum(n, 1), round_to)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": n_tok,
            "n_types": pa.array(u, pa.int64()),
            "ttr": pa.array(ttr, pa.float64())})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def zipf_slope(docs_ds, text_col: str = "text", min_count: int = 2,
               round_to: int = 6):
    """Zipf rank-frequency fit over the corpus vocabulary: OLS slope of
    ln(count) ~ ln(rank), rank by (count desc, token) — the one-number
    distribution-health probe (natural corpora sit near -1; synthetic
    or templated text drifts). Vocabulary counts come from the
    distributed `embed.corpus_vocab` exchange; the fit runs in one
    whole-block pass over the model-sized vocab table.
    -> one row (n_types, slope, intercept)."""
    from cosmos_ray.functions.embed import corpus_vocab

    vocab = corpus_vocab(docs_ds, min_count=min_count)

    def finish(t: pa.Table) -> pa.Table:
        df = pa.table({"token": t.column("token"),
                       "c": t.column("count").cast(pa.float64())})
        order = pc.sort_indices(df, sort_keys=[("c", "descending"),
                                               ("token", "ascending")])
        c = pc.take(df.column("c"), order).to_numpy(zero_copy_only=False)
        n = len(c)
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(c)
        sx, sy, sxx, sxy = x.sum(), y.sum(), (x * x).sum(), (x * y).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pa.table({
            "n_types": pa.array([n], pa.int64()),
            "slope": pa.array([round(slope, round_to)], pa.float64()),
            "intercept": pa.array([round(intercept, round_to)],
                                  pa.float64())})

    return vocab.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def llr_keyness(docs_ds, group_col: str, text_col: str, group_a,
                k: int = 50, min_count: int = 5, round_to: int = 6):
    """Dunning log-likelihood (G²) keyness: the top-k tokens most
    DISTINCTIVE of sub-corpus A (``group_col == group_a``) vs the rest —
    the corpus-linguistics comparison a curation pipeline runs between
    a candidate source and the reference mix. Per token with counts
    (a, b) against corpus totals (NA, NB):

        E_a = NA (a+b) / (NA+NB),   E_b = NB (a+b) / (NA+NB)
        G2  = 2 (a ln(a/E_a) + b ln(b/E_b))        (0 ln 0 := 0)
        dir = sign(a NB - b NA)   (exact integer cross product)

    Tokenization is the `corpus_vocab` convention (single-space split,
    keeps empties — byte-identical to SQL string_split). Shuffle shape:
    arrow-native per-batch (token, a, b) combiner, one vocab groupby;
    totals are two distributed column sums over the materialized count
    table (never a driver vocab pull); scoring is map_batches with the
    two scalars closed over; selection is a distributed sort on the
    ROUNDED score (+ token tiebreak) so the top-k cut is deterministic
    on both sides. -> (token, count_a, count_b, g2, dir), k rows."""
    import ray.data as rd  # noqa: F401  (parity with module style)
    from ray.data.aggregate import Sum

    from cosmos_ray.queries.relational import topk

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        in_a = pc.fill_null(pc.equal(t.column(group_col), group_a), False)
        rep = np.repeat(in_a.to_numpy(zero_copy_only=False),
                        lens).astype(np.int64)
        g = (pa.table({"token": flat, "a": pa.array(rep),
                       "b": pa.array(1 - rep)})
             .group_by(["token"])
             .aggregate([("a", "sum"), ("b", "sum")]))
        return pa.table({"token": g.column("token"),
                         "a": g.column("a_sum"), "b": g.column("b_sum")})

    counts = (docs_ds.select_columns([group_col, text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("a", alias_name="a"),
                         Sum("b", alias_name="b"))
              .materialize())  # vocab-sized, reused by totals + scoring
    tot = counts.sum(["a", "b"])
    na_i, nb_i = int(tot["sum(a)"]), int(tot["sum(b)"])
    na, nb = float(na_i), float(nb_i)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(
            pc.add(t.column("a"), t.column("b")),
            pa.scalar(min_count, pa.int64())))
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.float64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.float64)
        ea = na * (a + b) / (na + nb)
        eb = nb * (a + b) / (na + nb)
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = np.where(a > 0, a * np.log(a / ea), 0.0)
            tb = np.where(b > 0, b * np.log(b / eb), 0.0)
        g2 = np.round(2.0 * (ta + tb), round_to)
        # direction via the exact integer cross product a*NB - b*NA
        # (sign(a/NA - b/NB) without float cancellation risk)
        ai = t.column("a").to_numpy(zero_copy_only=False)
        bi = t.column("b").to_numpy(zero_copy_only=False)
        d = np.sign(ai * nb_i - bi * na_i).astype(np.int64)
        return pa.table({
            "token": t.column("token"),
            "count_a": t.column("a"), "count_b": t.column("b"),
            "g2": pa.array(g2, pa.float64()),
            "dir": pa.array(d, pa.int64())})

    scored = counts.map_batches(score, batch_format="pyarrow")
    return topk(scored, [("g2", True), ("token", False)], k)
