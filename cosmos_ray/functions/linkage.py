"""Fuzzy record linkage: all pairs of DISTINCT string values within a
small Levenshtein distance, without a cross join.

Blocking is the SymSpell deletion-neighborhood (Garbe's symmetric
delete): every value emits all variants reachable by deleting up to
``max_dist`` characters (itself included); two values within Levenshtein
distance d <= max_dist are GUARANTEED to share at least one variant
(each substitution spends one delete on each side, each insert/delete
spends one on one side), so blocking is complete — unlike first-char or
length-band blocking. Candidate pairs form only inside a variant's
bucket and are then verified with an exact batched DP.

Scale shape (the web analog of entity-name canonicalization, reference
`cosmos/ingest/process/detection/*` has no analog — this is a training-
data-pipeline extension):
- names are reduced to DISTINCT first (groupby, names-only exchange) —
  the corpus payload never moves;
- the variant explode is O(L^2) short strings per DISTINCT name (not per
  row), exchanged by variant hash;
- pair dedup + verify move (name_a, name_b) pairs only; the exact
  Levenshtein DP is vectorized across the pair batch (numpy uint8
  matrices, L x L loop of whole-batch ops — no per-pair Python DP).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _delete_variants(s: str, depth: int) -> set[str]:
    out = {s}
    frontier = {s}
    for _ in range(depth):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for each (a[i], b[i]) pair, DP
    vectorized across the batch: pad to byte matrices, run the
    (La+1)x(Lb+1) recurrence as whole-column numpy ops."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    ab = [s.encode("utf-8") for s in a]
    bb = [s.encode("utf-8") for s in b]
    la = np.array([len(s) for s in ab], dtype=np.int64)
    lb = np.array([len(s) for s in bb], dtype=np.int64)
    ma, mb = int(la.max(initial=1)), int(lb.max(initial=1))
    A = np.zeros((n, ma), dtype=np.uint8)
    B = np.zeros((n, mb), dtype=np.uint8)
    for i, s in enumerate(ab):
        A[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    for i, s in enumerate(bb):
        B[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    BIG = ma + mb + 1
    prev = np.tile(np.arange(mb + 1, dtype=np.int64), (n, 1))
    # positions beyond each string's true length must never win the min
    jmask = np.arange(1, mb + 1)[None, :] > lb[:, None]
    out = prev[np.arange(n), lb].copy()  # handles la == 0 rows
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B).astype(np.int64)
        dele = prev[:, 1:] + 1
        cur[:, 1:] = np.minimum(sub, dele)
        # insertion needs a left-to-right scan; cumulative-min trick:
        # cur[j] = min(cur[j], cur[j-1] + 1)  ==  min over k<=j of cur[k] + (j-k)
        ramp = np.arange(mb + 1, dtype=np.int64)
        cur = np.minimum.accumulate(cur - ramp, axis=1) + ramp
        cur[:, 1:][jmask] = BIG
        rows = i <= la
        done = i == la
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = np.where(rows[:, None], cur, prev)
    return out


def fuzzy_name_pairs(ds, col: str, max_dist: int = 2, max_group: int = 256):
    """All pairs of distinct ``col`` values with Levenshtein distance in
    [1, max_dist] -> (name_a, name_b, dist), name_a < name_b.

    ``max_group`` truncates degenerate variant buckets (a very short
    variant shared by thousands of names would pair O(m^2)); buckets are
    sorted so truncation is deterministic. The default keeps completeness
    for realistic name vocabularies — raise it if the distinct-name set
    is tiny and dense.
    """
    depth = max_dist  # deletes per side needed for completeness

    def explode(t: pa.Table) -> pa.Table:
        names = t.column(col).to_pylist()
        va, na = [], []
        for s in names:
            for v in _delete_variants(s, depth):
                va.append(v)
                na.append(s)
        return pa.table({"variant": pa.array(va, pa.string()),
                         "name": pa.array(na, pa.string())})

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # arrow output: a 0-row pandas frame with object columns trips
        # Ray's block size estimator (np.vectorize on empty) — log spam
        # per singleton bucket; typed arrow tables size cleanly
        names = np.sort(g["name"].unique())[:max_group]
        m = len(names)
        if m < 2:
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string())})
        ia, ib = np.triu_indices(m, k=1)
        return pa.table({"name_a": pa.array(names[ia], pa.string()),
                         "name_b": pa.array(names[ib], pa.string())})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        # one row per distinct candidate pair survives the groupby;
        # keep the first row then DP-verify the whole batch at once
        pair = g.iloc[:1][["name_a", "name_b"]]
        return pair

    distinct = ds.groupby(col).map_groups(
        lambda g: g.iloc[:1][[col]], batch_format="pandas")
    cands = (
        distinct.map_batches(explode, batch_format="pyarrow")
        .groupby("variant")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["name_a", "name_b"])
        .map_groups(verify, batch_format="pandas")
    )

    def score(t: pa.Table) -> pa.Table:
        a = t.column("name_a").to_pylist()
        b = t.column("name_b").to_pylist()
        d = levenshtein_batch(a, b)
        keep = (d >= 1) & (d <= max_dist)
        return pa.table({
            "name_a": pa.array([x for x, k in zip(a, keep) if k], pa.string()),
            "name_b": pa.array([x for x, k in zip(b, keep) if k], pa.string()),
            "dist": pa.array(d[keep], pa.int64()),
        })

    return cands.map_batches(score, batch_format="pyarrow")


def jaro_winkler_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Jaro-Winkler similarity for each (a[i], b[i]) pair (Winkler 1990;
    prefix scale 0.1, max prefix 4, boost threshold 0.7 — fuzz-verified
    against DuckDB's ``jaro_winkler_similarity`` in tests), vectorized
    across the batch: the greedy match scan runs as (i, j) window loops
    of whole-batch numpy ops (same discipline as `levenshtein_batch` —
    no per-pair Python)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    ab = [s.encode("utf-8") for s in a]
    bb = [s.encode("utf-8") for s in b]
    la = np.array([len(s) for s in ab], dtype=np.int64)
    lb = np.array([len(s) for s in bb], dtype=np.int64)
    ma, mb = int(la.max(initial=1)), int(lb.max(initial=1))
    A = np.zeros((n, ma), dtype=np.uint8)
    B = np.zeros((n, mb), dtype=np.uint8)
    for i, s in enumerate(ab):
        A[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    for i, s in enumerate(bb):
        B[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)  # match window per row

    matchedA = np.zeros((n, ma), dtype=bool)
    matchedB = np.zeros((n, mb), dtype=bool)
    # greedy scan: a[i] takes the FIRST unmatched b[j] in its window
    for i in range(ma):
        got = np.zeros(n, dtype=bool)  # row already matched this i
        jlo, jhi = max(0, i - int(w.max(initial=0))), min(mb, i + int(w.max(initial=0)) + 1)
        for j in range(jlo, jhi):
            ok = (
                ~got
                & ~matchedB[:, j]
                & (i < la)
                & (j < lb)
                & (np.abs(i - j) <= w)
                & (A[:, i] == B[:, j])
            )
            matchedA[ok, i] = True
            matchedB[ok, j] = True
            got |= ok
    m = matchedA.sum(axis=1).astype(np.int64)

    # transpositions: compact the matched chars of each side in order
    # (cumsum scatter — no per-row Python), compare position-wise
    posA = np.cumsum(matchedA, axis=1) - 1
    posB = np.cumsum(matchedB, axis=1) - 1
    SA = np.zeros((n, ma), dtype=np.uint8)
    SB = np.zeros((n, mb), dtype=np.uint8)
    rA, cA = np.nonzero(matchedA)
    SA[rA, posA[rA, cA]] = A[rA, cA]
    rB, cB = np.nonzero(matchedB)
    SB[rB, posB[rB, cB]] = B[rB, cB]
    mm = min(ma, mb)
    diff = (SA[:, :mm] != SB[:, :mm]) & (np.arange(mm)[None, :] < m[:, None])
    t = diff.sum(axis=1) // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (
            m / np.maximum(la, 1)
            + m / np.maximum(lb, 1)
            + (m - t) / np.maximum(m, 1)
        ) / 3.0
    # m == 0 (incl. two empty strings) -> 0.0, matching DuckDB
    jaro = np.where(m == 0, 0.0, jaro)

    # Winkler prefix boost: l = common prefix length (<= 4)
    pm = min(4, ma, mb)
    if pm > 0:
        pref_eq = (A[:, :pm] == B[:, :pm]) & (
            np.arange(pm)[None, :] < np.minimum(la, lb)[:, None])
        # length of the leading all-True run
        l = np.where(pref_eq.all(axis=1), pm,
                     np.argmin(pref_eq, axis=1))
    else:
        l = np.zeros(n, dtype=np.int64)
    # boost threshold: the prefix bonus applies only when jaro > 0.7
    # (matches DuckDB / the original Winkler formulation)
    return np.where(jaro > 0.7, jaro + l * 0.1 * (1.0 - jaro), jaro)


def jw_name_pairs(ds, col: str, threshold: float = 0.92,
                  max_group: int = 512):
    """Pairs of distinct ``col`` values sharing a first character with
    Jaro-Winkler similarity >= ``threshold`` -> (name_a, name_b, jw),
    name_a < name_b. First-character blocking is part of the operator's
    SEMANTICS (the standard ER blocking key — Winkler's boost itself
    rewards shared prefixes), so the DuckDB oracle states the identical
    predicate; buckets cap at ``max_group`` names (sorted, deterministic
    truncation) like `fuzzy_name_pairs`."""

    def distinct_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1][[col]]

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # arrow output for the same estimator reason as fuzzy_name_pairs
        names = np.sort(g[col].unique())[:max_group]
        if len(names) < 2:
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string()),
                             "jw": pa.array([], pa.float64())})
        ia, ib = np.triu_indices(len(names), k=1)
        a, b = names[ia], names[ib]
        jw = jaro_winkler_batch(a.tolist(), b.tolist())
        keep = jw >= threshold
        return pa.table({"name_a": pa.array(a[keep], pa.string()),
                         "name_b": pa.array(b[keep], pa.string()),
                         "jw": pa.array(np.round(jw[keep], 9), pa.float64())})

    def add_block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # strip the pandas metadata the upstream map_groups attached —
        # unhashable under pyarrow 16, defeats Ray's block-schema dedup
        return t.replace_schema_metadata(None).append_column(
            "block", pc.utf8_slice_codeunits(t.column(col), 0, 1))

    return (
        ds.groupby(col).map_groups(distinct_first, batch_format="pandas")
        .map_batches(add_block, batch_format="pyarrow")
        .groupby("block")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
