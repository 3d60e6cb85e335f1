"""Mergeable cardinality sketches — the approximate-distinct path for
100-TB counts where an exact groupby-distinct exchange is the
bottleneck. HyperLogLog (Flajolet et al. 2007, with the standard
small-range linear-counting correction): each batch folds its values
into a 2^p-register sketch, one register ROW per batch flows to the
driver (the exchange is batches × 2^p bytes — independent of input
rows), and registers merge by elementwise max.

The exact counterpart (`distinct_count_exact`, a two-stage distinct)
is the oracle-checkable form; the sketch is gated by an error-bound
test (expected relative error ~1.04/sqrt(2^p))."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable 64-bit value hash — pandas' fixed-key siphash
    (`pd.util.hash_array`): vectorized in C and process-independent."""
    import pandas as pd

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_integer(a.type) or pa.types.is_floating(a.type):
        np_vals = a.to_numpy(zero_copy_only=False)
    else:
        np_vals = np.asarray(a.cast(pa.string()).to_pylist(), dtype=object)
    return pd.util.hash_array(np_vals).astype(np.uint64)


def _floor_log2(x: np.ndarray) -> np.ndarray:
    """Exact vectorized floor(log2(x)) for uint64 (x==0 -> -1)."""
    pos = np.zeros(x.shape, np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        t = v >> np.uint64(s)
        m = t != 0
        v = np.where(m, t, v)
        pos += np.where(m, s, 0)
    return np.where(x != 0, pos, -1)


def _hll_partial(values: np.ndarray, p: int) -> np.ndarray:
    """Fold hashed values into a 2^p uint8 register array (vectorized)."""
    m = 1 << p
    idx = (values >> np.uint64(64 - p)).astype(np.int64)
    rest = (values << np.uint64(p)) | np.uint64((1 << p) - 1)
    lz = 63 - _floor_log2(rest)  # leading zeros of the suffix bits
    rho = np.clip(lz + 1, 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def hll_count(ds, col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col) — one combiner pass, register
    rows merged on the driver by elementwise max."""

    def partial(t: pa.Table) -> pa.Table:
        regs = _hll_partial(_hash64(t.column(col)), p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, np.uint8)
    for b in ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for r in b.column("regs").to_pylist():
            np.maximum(merged, np.asarray(r, np.uint8), out=merged)
    return round(_hll_estimate(merged))


def kmv_distinct(ds, key_cols: list[str], value_col: str, k: int = 64,
                 seed: str = "kmv0", round_to: int = 6):
    """K-minimum-values distinct sketch per group (Bar-Yossef et al.
    2002): estimate COUNT(DISTINCT value) as (k-1) * 2^64 / h_(k) where
    h_(k) is the k-th smallest md5 hash of the distinct values — exact
    count when fewer than k distinct values exist.

    Unlike HLL this sketch is DETERMINISTIC given the seed, so the
    DuckDB oracle replays the estimate bit-for-bit (md5_number_upper +
    row_number window) — an approximate operator with an exact
    correctness gate.

    Scale shape: each batch emits at most k hashes per group it touches
    (batch-local drop_duplicates first), so the exchange is k uint64s
    per (batch, group) regardless of row count; the merge is a unique +
    head-k per group. Hashing runs over batch-DISTINCT values only.

    -> (key_cols..., n_distinct_est DOUBLE)
    """
    import hashlib

    import pandas as pd

    def _hash_vals(vals) -> np.ndarray:
        return np.fromiter(
            (int.from_bytes(hashlib.md5(f"{seed}:{v}".encode()).digest()[:8],
                            "little") for v in vals),
            dtype=np.uint64, count=len(vals))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[key_cols + [value_col]].drop_duplicates()
        d = d.assign(__h=_hash_vals(d[value_col].tolist()))
        rows = {c: [] for c in key_cols}
        hh = []
        for key, g in d.groupby(key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            u = np.unique(g["__h"].to_numpy())[:k]
            for c, v in zip(key_cols, key):
                rows[c].append(v)
            hh.append(u.astype(np.uint64).tolist())
        rows["__kmin"] = hh
        return pd.DataFrame(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate(
            [np.asarray(x, dtype=np.uint64) for x in g["__kmin"]]))
        m = len(u)
        if m < k:
            est = float(m)
        else:
            est = round((k - 1) * 2.0 ** 64 / float(u[k - 1]), round_to)
        out = g.iloc[:1][key_cols].copy()
        out["n_distinct_est"] = est
        return out

    return (
        ds.select_columns(key_cols + [value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_cols)
        .map_groups(merge, batch_format="pandas")
    )


def distinct_count_exact(ds, key_cols: list[str], count_col: str):
    """Exact COUNT(DISTINCT count_col) per key_cols group as a two-stage
    distinct (groupby the full tuple first, then count per key) — the
    exchange carries one row per DISTINCT tuple, not per input row."""
    from ray.data.aggregate import Count

    distinct = (
        ds.select_columns(key_cols + [count_col])
        .groupby(key_cols + [count_col])
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )
    return (
        distinct.groupby(key_cols)
        .aggregate(Count(alias_name=f"n_distinct_{count_col}"))
    )


def histogram_quantiles(ds, keys: list[str], value_col: str,
                        lo: float = 0.0, hi: float = 1024.0,
                        nbins: int = 256,
                        qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """Mergeable fixed-bin histogram quantiles — the 100-TB percentile
    path: exact per-group quantiles (`relational.group_quantiles`) pull
    every value of a group into one task, which dies on a hot key; this
    sketch's exchange is bounded by keys × nbins COUNTS regardless of
    input rows, and partials merge by addition (like HLL registers merge
    by max). Estimate error is one bin width.

    Convention (replayed exactly by the SQL oracle): bin =
    clip(floor((v - lo) / w), 0, nbins-1) with w = (hi - lo) / nbins;
    the q-quantile is the LOWER EDGE of the bin holding the ceil(q*n)-th
    ordered value. Pick lo/hi/nbins so w is a power of two and the
    float division is bit-identical across engines.
    -> one row per (key..., q): (keys..., q, approx_value)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    w = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [value_col]).to_pandas()
        v = df[value_col].to_numpy(dtype=np.float64)
        b = np.clip(np.floor((v - lo) / w), 0, nbins - 1).astype(np.int64)
        df = df.drop(columns=[value_col])
        df["bin"] = b
        g = df.groupby(keys + ["bin"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.select_columns(keys + [value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(keys + ["bin"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bin")
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        total = int(cum[-1])
        bins = g["bin"].to_numpy(dtype=np.int64)
        rows = {k: [] for k in keys}
        out_q, out_v = [], []
        for q in qs:
            rank = int(np.ceil(q * total))
            i = int(np.searchsorted(cum, max(rank, 1)))
            for k in keys:
                rows[k].append(g[k].iloc[0])
            out_q.append(float(q))
            out_v.append(round(lo + w * float(bins[i]), 6))
        rows["q"] = out_q
        rows["approx_value"] = out_v
        return pd.DataFrame(rows)

    return counts.groupby(keys).map_groups(finish, batch_format="pandas")


_CMS_KEYS = ("f71a2b3c4d5e6a7b", "0192a3b4c5d6e7f8",
             "aabbccdd11223344", "5566778899aabbcc")


def _cms_rows(vals, width: int, depth: int) -> np.ndarray:
    """(n, depth) column indices — one salted siphash per depth row.
    Values are canonicalized to STRINGS first: pandas' siphash ignores
    ``hash_key`` for numeric dtypes, which would collapse the depth rows
    into one hash function."""
    import pandas as pd

    vals = np.asarray([x if isinstance(x, str) else str(x) for x in vals],
                      dtype=object)
    return np.stack([
        (pd.util.hash_array(vals, hash_key=_CMS_KEYS[d])
         % np.uint64(width)).astype(np.int64)
        for d in range(depth)], axis=1)


def cms_build(ds, col: str, width: int = 2048, depth: int = 4) -> np.ndarray:
    """Count-min sketch over a column (Cormode & Muthukrishnan 2005) —
    the mergeable approximate-frequency path when exact per-key counts
    would shuffle an unbounded key set: each batch folds its values into
    a (depth, width) int64 counter grid, ONE grid row flows per batch
    (exchange independent of input rows, like the HLL registers and the
    bloom bitmaps), and grids merge by addition. Point estimates
    overcount only: true_count <= est <= true_count + 2n/width with
    probability 1 - 2^-depth."""

    def partial(t: pa.Table) -> pa.Table:
        a = t.column(col)
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        vals = np.asarray(a.cast(pa.string()).to_pylist(), dtype=object)
        idx = _cms_rows(vals, width, depth)
        grid = np.zeros((depth, width), np.int64)
        for d in range(depth):
            np.add.at(grid[d], idx[:, d], 1)
        return pa.table({"g": pa.array([grid.reshape(-1)],
                                       pa.list_(pa.int64()))})

    merged = np.zeros(depth * width, np.int64)
    for b in ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for r in b.column("g").to_pylist():
            merged += np.asarray(r, np.int64)
    return merged.reshape(depth, width)


def cms_estimate(grid: np.ndarray, values) -> np.ndarray:
    """Point-frequency estimates: min over the depth rows."""
    depth, width = grid.shape
    idx = _cms_rows(np.asarray(values, dtype=object), width, depth)
    return np.min(np.stack([grid[d, idx[:, d]] for d in range(depth)],
                           axis=1), axis=1)


def checksum_partial(t: pa.Table, cols: list[str]) -> int:
    """One batch's XOR-of-row-hashes partial: per row, the md5
    (upper-64, little-endian — DuckDB ``md5_number_upper`` parity) of
    the ':'-joined column values. XOR merge is associative and
    commutative, so block/batch order never matters. Shared by
    `table_checksum` and the fused release writer
    (`pipelines/kb_release.py`) so both produce identical checksums."""
    import hashlib

    arrs = [t.column(c).cast(pa.string()).to_pylist() for c in cols]
    x = 0
    for vals in zip(*arrs):
        x ^= int.from_bytes(
            hashlib.md5(":".join(vals).encode("utf-8")).digest()[:8],
            "little")
    return x


def table_checksum(ds, cols: list[str]):
    """Order-insensitive content checksum of a table — the cheap
    corpus-equality probe for verifying a migration / rerun / resume
    produced byte-identical data without moving it: per batch, XOR +
    count partials (one row per batch crosses the exchange; see
    `checksum_partial`). -> one-row Dataset (checksum hex string,
    n_rows)."""
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"x": pa.array([checksum_partial(t, cols)],
                                       pa.uint64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow").take_all()
    x = np.uint64(0)
    n = 0
    for r in parts:  # one row per BATCH — bounded driver reduce
        x ^= np.uint64(r["x"])
        n += r["n"]
    return rd.from_arrow(pa.table({"checksum": pa.array([format(int(x), "x")]),
                                   "n_rows": pa.array([n], pa.int64())}))


def heavy_hitters(docs_ds, text_col: str = "text", phi: float = 0.005,
                  round_to: int = 6):
    """Corpus-scale frequent-token detection (phi-heavy hitters), exact.

    The 100-TB shape is sketch-then-verify: an exact global
    ``groupby(token)`` would shuffle the UNBOUNDED tail vocabulary; a
    plain sketch alone gives approximate counts. This does both passes
    but moves only bounded data:

    1. **Candidate pass** (Misra-Gries pigeonhole): each batch counts
       its tokens vectorized (``pc.value_counts`` over the flattened
       split) and emits only tokens with in-batch count >= (phi/2) *
       batch_tokens. A token with global frequency >= phi must reach
       frequency >= phi in at least one batch (weighted-average
       pigeonhole), so the union of survivors has NO false negatives;
       the phi/2 margin covers frequency granularity in tiny batches.
       Per batch at most 2/phi candidate rows cross the exchange, plus
       one null-token row carrying the batch's exact token total.
    2. **Verify pass**: the deduplicated candidate set (driver-bounded:
       <= batches x 2/phi rows, guarded by ``collect_small``) is
       broadcast into a second scan that counts ONLY candidate tokens
       (vectorized ``is_in`` filter), then a tiny ``groupby(token)``
       sums exact counts and filters ``cnt >= phi * N``.

    Output is therefore EXACT (token, cnt, frac) — same rows as the
    full-vocabulary SQL count — while the exchange stays O(batches/phi)
    instead of O(distinct tokens)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from cosmos_ray.queries.relational import collect_small

    # marker rows ride the same exchange as candidate rows; keys are
    # prefix-tagged ("t:" token / "n:" total) because Ray's sort-based
    # groupby cannot order a null key against strings across partitions
    def candidates(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t.column(text_col), " "))
        n = len(toks)
        if n == 0:
            return pa.table({"token": pa.array(["n:"], pa.string()),
                             "cnt": pa.array([0], pa.int64())})
        vc = pc.value_counts(toks)
        vals, counts = vc.field("values"), vc.field("counts")
        keep = pc.greater_equal(
            pc.cast(counts, pa.float64()), (phi / 2.0) * n)
        vals = pc.binary_join_element_wise(
            pa.array(["t"] * int(pc.sum(keep).as_py() or 0), pa.string()),
            pc.filter(vals, keep), ":")
        # NB: "t:" + token — ":" is the JOINER, so the tag is "t" + ":"
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        counts = pc.filter(pc.cast(counts, pa.int64()), keep)
        counts = (counts.combine_chunks()
                  if isinstance(counts, pa.ChunkedArray) else counts)
        return pa.table({
            "token": pa.concat_arrays([vals, pa.array(["n:"], pa.string())]),
            "cnt": pa.concat_arrays([counts, pa.array([n], pa.int64())]),
        })

    part = docs_ds.select_columns([text_col]).map_batches(
        candidates, batch_format="pyarrow")
    # dedupe candidates distributed FIRST so the driver pull is the
    # distinct candidate set, not per-batch partials
    cand = part.groupby("token").aggregate(Sum("cnt", alias_name="cnt"))
    cand_tbl = collect_small(cand)
    if cand_tbl is None:  # pragma: no cover - degenerate phi misuse
        raise ValueError("candidate set exceeds driver cap; raise phi")
    tok_col = cand_tbl.column("token").cast(pa.string())
    marker = pc.equal(tok_col, "n:")
    total = pc.sum(pc.filter(cand_tbl.column("cnt"), marker)).as_py() or 0
    cand_tokens = pc.utf8_slice_codeunits(
        pc.filter(tok_col, pc.invert(marker)), 2)  # strip the "t:" tag
    cand_ref = ray.put(cand_tokens.combine_chunks()
                       if isinstance(cand_tokens, pa.ChunkedArray)
                       else cand_tokens)

    def verify(t: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        toks = pc.list_flatten(pc.split_pattern(t.column(text_col), " "))
        toks = pc.filter(toks, pc.is_in(toks, value_set=cset))
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(toks)
        return pa.table({"token": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    exact = docs_ds.select_columns([text_col]).map_batches(
        verify, batch_format="pyarrow").groupby("token").aggregate(
        Sum("cnt", alias_name="cnt"))

    thresh = phi * total

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(pc.cast(t.column("cnt"), pa.float64()), thresh)
        t = t.filter(keep)
        frac = pc.round(pc.divide(pc.cast(t.column("cnt"), pa.float64()),
                                  float(total) if total else 1.0),
                        ndigits=round_to)
        return pa.table({"token": t.column("token"),
                         "cnt": pc.cast(t.column("cnt"), pa.int64()),
                         "frac": frac})

    return exact.map_batches(finish, batch_format="pyarrow")


def kmv_sketch_table(ds, key_cols: list[str], value_col: str, k: int = 64,
                     seed: str = "kmv0"):
    """Per-group KMV sketch ROWS (key_cols..., __kmin = the k smallest
    distinct-value md5 hashes) — the at-rest MERGEABLE sketch: persist
    this table beside the data and answer any coarser-grain distinct
    estimate later from the sketches alone (`kmv_rollup`), never
    re-reading the fact table. Same hash/seed contract as
    `kmv_distinct`, so the rollup stays DuckDB-replayable."""
    import hashlib

    import pandas as pd

    def _hash_vals(vals) -> np.ndarray:
        return np.fromiter(
            (int.from_bytes(hashlib.md5(f"{seed}:{v}".encode()).digest()[:8],
                            "little") for v in vals),
            dtype=np.uint64, count=len(vals))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[key_cols + [value_col]].drop_duplicates()
        d = d.assign(__h=_hash_vals(d[value_col].tolist()))
        rows = {c: [] for c in key_cols}
        hh = []
        for key, g in d.groupby(key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            u = np.unique(g["__h"].to_numpy())[:k]
            for c, v in zip(key_cols, key):
                rows[c].append(v)
            hh.append(u.astype(np.uint64).tolist())
        rows["__kmin"] = hh
        return pd.DataFrame(rows)

    def to_sketch(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate(
            [np.asarray(x, dtype=np.uint64) for x in g["__kmin"]]))[:k]
        out = g.iloc[:1][key_cols].copy()
        out["__kmin"] = [u.tolist()]
        return out

    return (ds.select_columns(key_cols + [value_col])
            .map_batches(partial, batch_format="pandas")
            .groupby(key_cols)
            .map_groups(to_sketch, batch_format="pandas"))


def kmv_rollup(sketch_ds, group_keys: list[str], k: int = 64,
               round_to: int = 6):
    """Merge fine-grain KMV sketch rows to coarser groups: the k
    smallest of the UNION of per-part min-k sets — provably identical
    to a sketch built directly at the coarse grain (any hash among the
    week's k smallest is among its own day's k smallest), so the
    rolled-up estimate is bit-equal to the direct one and the SQL
    oracle can state it from the fact table. -> (group_keys...,
    n_distinct_est)."""
    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate(
            [np.asarray(x, dtype=np.uint64) for x in g["__kmin"]]))
        m = len(u)
        if m < k:
            est = float(m)
        else:
            est = round((k - 1) * 2.0 ** 64 / float(u[k - 1]), round_to)
        out = g.iloc[:1][group_keys].copy()
        out["n_distinct_est"] = est
        return out

    return (sketch_ds.groupby(group_keys)
            .map_groups(merge, batch_format="pandas"))
