"""Relational query primitives, Ray-Data-first.

The reference's "retrieval" layer is filtered search + top-k + counts +
a parent/child join index (`elastic_retriever.py:228-342,615-629`); in
batch form those are Dataset filters, joins, sorts and aggregates. The
helpers here encode the scale idioms:

- ``read``: column-pruned parquet reads (prune at the read).
- ``broadcast_join``: small-side hash join without a shuffle — the small
  table is ``ray.put`` once and each batch does a vectorized lookup
  (dimension tables, key sets). The big side never moves.
- ``semi_join_filter``: broadcast key-set membership filter.
Large-large joins use ``Dataset.join`` (hash-partitioned) directly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


from functools import lru_cache


@lru_cache(maxsize=None)
def _clean_schema(path: str) -> pa.Schema:
    """Footer schema with pandas metadata stripped: schemas carrying the
    b'pandas' metadata dict are unhashable under pyarrow 16 and defeat
    Ray's block-schema dedup (a 'Failed to hash the schemas' warning on
    every read)."""
    import pyarrow.parquet as pq

    return pq.read_schema(path).remove_metadata()


def read(sf_dir: str, name: str, columns: list[str] | None = None) -> "rd.Dataset":
    path = os.path.join(sf_dir, f"{name}.parquet")
    sch = _clean_schema(path)
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=sch)


def collect_small(ds, cap_rows: int = 2_000_000) -> pa.Table | None:
    """Stream a Dataset to the driver for broadcasting, bailing out (None)
    past ``cap_rows`` — every driver pull in the query layer goes through
    this guard so a mis-sized 'small side' degrades to a distributed join
    instead of OOMing the driver."""
    batches: list[pa.Table] = []
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        batches.append(b)
        total += b.num_rows
        if total > cap_rows:
            return None
    if not batches:
        # preserve the schema so downstream broadcast lookups degrade to
        # an empty join result instead of a KeyError on a missing column
        sch = ds.schema(fetch_if_missing=True)
        if sch is None:
            return pa.table({})
        return pa.schema(list(zip(sch.names, sch.types))).empty_table()
    return pa.concat_tables(batches)


def drop_empty_blocks(ds):
    """Work around a Ray 2.49 hash-aggregator artifact: a
    ``groupby().aggregate()`` emits ZERO-COLUMN empty blocks for empty
    output partitions, and a downstream ``Dataset.join`` partition that
    receives only such blocks fails inside Acero with "No match or
    multiple matches for key field reference ... on left side of the
    join" (map_batches cannot repair them — empty blocks skip UDFs).
    Rebuild the dataset from its non-empty block refs: refs stay in the
    object store (zero-copy — only block METADATA touches the driver),
    so this is safe on any aggregate output regardless of size. Apply
    to groupby-derived datasets that feed a join; join outputs
    themselves emit well-schemed empties and don't need it."""
    m = ds.materialize()
    refs = []
    empties = 0
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            # drop ONLY blocks known empty; an unknown count (None) must
            # be kept — discarding it would silently lose real rows
            if meta.num_rows == 0:
                empties += 1
            else:
                refs.append(ref)
    if not refs or not empties:
        # fully empty (callers handle empty joins) or already clean
        return m
    return rd.from_arrow_refs(refs)


def _join_partitions(chained: int = 1, cap: int = 16) -> int:
    """Size hash-join partition counts to the cluster — each concurrent
    join spawns num_partitions CPU-holding aggregator actors, and
    oversubscribing a small cluster deadlocks the pipeline."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(cap, cpus // (2 * chained)))


def join_or_broadcast(big_ds, small_ds, key: str, add_cols: list[str],
                      big_key: str | None = None, cap_rows: int = 2_000_000):
    """Append ``add_cols`` from ``small_ds`` by key: broadcast hash-lookup
    when the small side fits ``cap_rows`` (dimension tables — the big side
    never moves), else a distributed ``Dataset.join``.

    The fallback scrubs the small side's zero-column empty blocks
    (`drop_empty_blocks`), which materializes it into the object store —
    a transient extra copy of a side the hash join would buffer in its
    build stage anyway; spill handles the over-cap sizes."""
    big_key = big_key or key
    small = collect_small(small_ds.select_columns([key] + add_cols), cap_rows)
    if small is not None:
        return broadcast_join(big_ds, small, key=key, add_cols=add_cols, big_key=big_key)
    j = big_ds.join(
        # scrub groupby-emitted zero-column empties off the small side
        drop_empty_blocks(small_ds.select_columns([key] + add_cols)),
        join_type="inner",
        num_partitions=_join_partitions(),
        on=(big_key,),
        right_on=(key,),
    )
    if key != big_key:
        # Ray's join usually folds the right key into the left key column;
        # drop it defensively if a version keeps it
        j = j.map_batches(
            lambda t: t.drop_columns([key]) if key in t.column_names else t,
            batch_format="pyarrow",
        )
    return j


def _bloom_indices(vals: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """k double-hashed bit positions per value -> (n, k) int64 array."""
    import pandas as pd

    h1 = pd.util.hash_array(vals, hash_key="1b4e6a7c9d2f8e3a")
    h2 = pd.util.hash_array(vals, hash_key="8c1d3f5a7b9e2c4d") | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def _key_np(col) -> np.ndarray:
    """Hashing-canonical numpy view of a key column: integers widen to
    int64 and floats to float64 BEFORE hashing, so the same key value
    hashes identically regardless of the column's physical width
    (pd.util.hash_array(int32(x)) != hash_array(int64(x)) otherwise —
    a bloom false-negative source when two tables or a probe disagree
    on width)."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(a.type):
        return a.cast(pa.int64()).to_numpy(zero_copy_only=False)
    if pa.types.is_floating(a.type):
        return a.cast(pa.float64()).to_numpy(zero_copy_only=False)
    return np.asarray(a.cast(pa.string()).to_pylist(), dtype=object)


def _key_np_scalar(value) -> np.ndarray:
    """One-element probe array in the same canonical dtype `_key_np`
    hashes (int64 / float64 / object-string)."""
    if isinstance(value, bool) or not isinstance(value, (int, float)):
        return np.asarray([str(value) if not isinstance(value, str) else value],
                          dtype=object)
    if isinstance(value, int):
        return np.asarray([value], dtype=np.int64)
    return np.asarray([value], dtype=np.float64)


def build_bloom(keys_ds, key_col: str, m_bits: int = 1 << 23,
                k_hashes: int = 4) -> np.ndarray:
    """Bloom filter over a key column as a packed uint64 bitmap —
    mergeable partials like the HLL registers: each batch emits ONE
    bitmap row (m_bits/8 bytes, independent of batch rows) and the
    driver ORs them streaming. 2^23 bits = 1 MiB; at k=4 the false-
    positive rate stays ~1e-3 up to ~6e5 keys (size m_bits to ~14 bits
    per expected key). No false negatives ever."""
    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        idx = _bloom_indices(_key_np(t.column(key_col)), m_bits, k_hashes)
        w = np.zeros(words, np.uint64)
        flat = idx.reshape(-1)
        np.bitwise_or.at(w, flat >> 6, np.uint64(1) << (flat & 63).astype(np.uint64))
        return pa.table({"w": pa.array([w], pa.list_(pa.uint64()))})

    merged = np.zeros(words, np.uint64)
    for b in keys_ds.select_columns([key_col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for r in b.column("w").to_pylist():
            np.bitwise_or(merged, np.asarray(r, np.uint64), out=merged)
    return merged


def bloom_filter_ds(big_ds, bloom: np.ndarray, big_key: str, keep_hits: bool,
                    m_bits: int, k_hashes: int = 4):
    """Keep rows whose key hits (keep_hits=True) / misses the bloom —
    the bitmap is put in the object store once and read per task."""
    bloom_ref = ray.put(bloom)

    def member(t: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        idx = _bloom_indices(_key_np(t.column(big_key)), m_bits, k_hashes)
        hit = ((bl[idx >> 6] >> (idx & 63).astype(np.uint64))
               & np.uint64(1)).all(axis=1)
        return t.filter(pa.array(hit if keep_hits else ~hit))

    return big_ds.map_batches(member, batch_format="pyarrow")


def semi_join_ds(big_ds, keys_ds, key_col: str, big_key: str, keep: bool = True,
                 cap_rows: int = 2_000_000, bloom_bits: int = 0):
    """Semi (keep=True) / anti (keep=False) join of ``big_ds`` against the
    key set of ``keys_ds``: broadcast key-set membership filter under
    ``cap_rows``, else a distributed join (inner for semi; left_outer +
    null-marker filter for anti) — the ES doc-filter semi-join analog
    (`elastic_retriever.py:260-310`) with a bounded driver footprint.

    ``bloom_bits`` > 0 inserts the middle tier for key sets too big to
    broadcast: a packed bloom bitmap (built from mergeable per-batch
    partials, broadcast once) pre-filters the big side, so the exact
    distributed join sees only matches + the ~1e-3 false positives
    instead of every big-side row. Results stay EXACT: for semi, the
    join removes false positives; for anti, bloom misses are definite
    non-members kept directly and only bloom hits are join-verified."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    keys_tbl = collect_small(keys_ds.select_columns([key_col]), cap_rows)
    if keys_tbl is not None:
        keys = set(keys_tbl.column(key_col).to_pylist()) if keys_tbl.num_rows else set()
        if not keys:
            return big_ds if not keep else big_ds.limit(0)
        return semi_join_filter(big_ds, keys, big_key, keep=keep)
    if bloom_bits:
        bloom = build_bloom(keys_ds, key_col, bloom_bits)
        hits = bloom_filter_ds(big_ds, bloom, big_key, True, bloom_bits)
        if keep:
            big_ds = hits
        else:
            misses = bloom_filter_ds(big_ds, bloom, big_key, False, bloom_bits)
            return misses.union(semi_join_ds(hits, keys_ds, key_col, big_key,
                                             keep=False, cap_rows=0))
    distinct = drop_empty_blocks(
        keys_ds.groupby(key_col).aggregate(Count(alias_name="__m")))
    j = big_ds.join(
        distinct,
        join_type="inner" if keep else "left_outer",
        num_partitions=_join_partitions(),
        on=(big_key,),
        right_on=(key_col,),
    )

    def finish(t: pa.Table) -> pa.Table:
        if not keep:
            t = t.filter(pc.is_null(t.column("__m")))
        drop = [c for c in (key_col, "__m") if c in t.column_names and c != big_key]
        return t.drop_columns(drop)

    return j.map_batches(finish, batch_format="pyarrow")


def seeded_sample(ds, n: int, seed: int, oversample: float = 1.5):
    """Uniform random sample of ~n rows with a fixed seed (O7,
    `elastic_page_retriever.py:111-116`): Bernoulli ``random_sample`` at
    an oversampled fraction, capped by ``limit`` — never a head/limit
    sample, which is order-biased."""
    total = ds.count()
    if total <= n:
        return ds
    frac = min(1.0, oversample * n / total)
    return ds.random_sample(frac, seed=seed).limit(n)


def stratified_sample(ds, group_col: str, n: int, id_col: str,
                      num_buckets: int = 64):
    """Deterministic stratified sample: the first ``n`` rows per group
    under the md5-of-id order (a seedable uniform draw that any engine —
    including the SQL oracle — reproduces exactly, unlike PRNG-based
    sampling). One coarse shuffle on hash(group), vectorized in-bucket
    rank; the exchange carries only the selected columns."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        # fn runs once per (group_col) group under bucketed_group_apply
        h = [hashlib.md5(str(x).encode()).hexdigest()
             for x in g[id_col].tolist()]
        out = g.assign(__h=h).sort_values(["__h", id_col], kind="stable").head(n)
        return out.drop(columns="__h").reset_index(drop=True)

    return bucketed_group_apply(ds, [group_col], pick, num_buckets=num_buckets)


def group_quantiles(ds, keys: list[str], value_col: str,
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    num_buckets: int = 64):
    """Exact per-group discrete quantiles (holistic aggregate): for each
    q the element at sorted index ceil(q*n)-1 — the inverted-CDF pick,
    identical to DuckDB's ``quantile_disc`` so the oracle matches
    value-for-value. One coarse shuffle on hash(keys), one in-group
    sort. -> (*keys, q50, q90, ... named from qs)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy())
        n = len(v)
        row = {k: [g[k].iloc[0]] for k in keys}
        for q in qs:
            row[f"q{int(q * 100)}"] = [v[min(n - 1, int(np.ceil(q * n)) - 1)]]
        return pd.DataFrame(row)

    return bucketed_group_apply(ds.select_columns(keys + [value_col]), keys,
                                fn, num_buckets=num_buckets)


def broadcast_join(big_ds, small_table: pa.Table, key: str, add_cols: list[str],
                   big_key: str | None = None):
    """Append ``add_cols`` from the small side to every big-side row by
    key lookup. Inner-join semantics (rows without a match are dropped)."""
    import pyarrow.compute as pc

    big_key = big_key or key
    small = small_table.combine_chunks()
    if small.num_columns == 0:
        # schema-less empty small side (empty aggregate upstream):
        # inner-join semantics degrade to an empty result, typed from
        # the big side with null-typed add_cols — not a KeyError
        def empty(batch: pa.Table) -> pa.Table:
            batch = batch.slice(0, 0)
            for c in add_cols:
                batch = batch.append_column(c, pa.nulls(0))
            return batch

        return big_ds.map_batches(empty, batch_format="pyarrow")
    ref = ray.put(small)

    # plain task fn (no actor-pool spin-up): ray.get on a local ObjectRef
    # is a zero-copy shared-memory read, once per task; the lookup is a
    # vectorized index_in + take, arrow in / arrow out
    def lookup(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        idx = pc.index_in(batch.column(big_key), value_set=s.column(key))
        mask = pc.is_valid(idx)
        batch = batch.filter(mask)
        idx = idx.filter(mask)
        for c in add_cols:
            batch = batch.append_column(c, pc.take(s.column(c), idx))
        return batch

    return big_ds.map_batches(lookup, batch_format="pyarrow", batch_size=65536)


def left_join_or_broadcast(big_ds, small_ds, key: str, add_cols: list[str],
                           big_key: str | None = None, fill=None,
                           cap_rows: int = 2_000_000):
    """LEFT-OUTER variant of ``join_or_broadcast``: append ``add_cols``
    from ``small_ds`` by key, keeping unmatched big-side rows with
    ``fill`` (e.g. 0 for counts). Broadcast lookup under ``cap_rows``
    (big side never moves), else a distributed left_outer
    ``Dataset.join`` with a vectorized null-fill — paths agree
    (test-gated with a forced tiny cap)."""
    import pyarrow.compute as pc

    big_key = big_key or key
    # Detect the schema-less / missing-column empty small side up front
    # instead of a blanket except around execution: a real task failure
    # (OOM, upstream bug) must propagate, not silently degrade to
    # fill-everything (that would turn runtime errors into wrong data).
    # Schema probe is free when already known; a lazy unknown-schema
    # plan is materialized ONCE and reused so the plan never runs twice.
    sch = small_ds.schema(fetch_if_missing=False)
    if sch is None:
        small_ds = small_ds.materialize()
        sch = small_ds.schema()
    names = list(sch.names) if sch is not None else []
    if key in names and all(c in names for c in add_cols):
        small = collect_small(small_ds.select_columns([key] + add_cols),
                              cap_rows)
    else:
        small = pa.table({})
    if small is not None and small.num_columns == 0:
        # schema-less empty small side: nothing matches — append fill
        # columns to every big row (left-outer degradation, no KeyError)
        def nofill(batch: pa.Table) -> pa.Table:
            for c in add_cols:
                v = (pa.nulls(batch.num_rows) if fill is None else
                     pa.array([fill] * batch.num_rows))
                batch = batch.append_column(c, v)
            return batch

        return big_ds.map_batches(nofill, batch_format="pyarrow")
    if small is not None:
        small = small.combine_chunks()
        ref = ray.put(small)

        def lookup(batch: pa.Table) -> pa.Table:
            s = ray.get(ref)
            idx = pc.index_in(batch.column(big_key), value_set=s.column(key))
            for c in add_cols:
                v = pc.take(s.column(c), idx)  # null where no match
                if fill is not None:
                    v = pc.fill_null(v, fill)
                batch = batch.append_column(c, v)
            return batch

        return big_ds.map_batches(lookup, batch_format="pyarrow",
                                  batch_size=65536)
    j = big_ds.join(
        drop_empty_blocks(small_ds.select_columns([key] + add_cols)),
        join_type="left_outer",
        num_partitions=_join_partitions(),
        on=(big_key,),
        right_on=(key,),
    )

    def postfill(t: pa.Table) -> pa.Table:
        if key in t.column_names and key != big_key:
            t = t.drop_columns([key])
        if fill is not None:
            for c in add_cols:
                i = t.schema.get_field_index(c)
                t = t.set_column(i, c, pc.fill_null(t.column(c), fill))
        return t

    return j.map_batches(postfill, batch_format="pyarrow")


def semi_join_filter(big_ds, keys: set, key_col: str, keep: bool = True):
    """Broadcast semi/anti join: filter big rows by key-set membership."""
    import pyarrow.compute as pc

    ref = ray.put(np.array(sorted(keys)))

    def member(batch: pa.Table) -> pa.Table:
        vs = pa.array(ray.get(ref))
        mask = pc.is_in(batch.column(key_col), value_set=vs)
        if not keep:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return big_ds.map_batches(member, batch_format="pyarrow")


def skew_join(big_ds, dim_ds, key: str, add_cols: list[str],
              big_key: str | None = None, hot_count: int = 100_000,
              max_hot_keys: int = 1_000_000):
    """Skew-aware inner equi-join: append ``add_cols`` from a key-unique
    ``dim_ds`` to ``big_ds`` when the big side's key distribution has
    heavy hitters that would overload single hash-join partitions (the
    north-rule's "skew-aware repartitioning for head entities" — a hot
    key sends ALL its rows to one aggregator in a plain shuffle join).

    Plan, in three exchanges none of which moves a hot row:
      1. hot-key census — per-batch ``value_counts`` partials (distinct-
         keys-per-batch sized) reduce through one small groupby; keys
         with ≥ ``hot_count`` big-side rows are pulled to the driver
         under ``max_hot_keys``.
      2. the dim rows for hot keys (≤ one per hot key by the key-unique
         contract) broadcast once via ``ray.put``; big-side hot rows
         join by map-side lookup — they never enter an exchange.
      3. the cold remainder (bounded per-key fan-in by construction)
         goes through the ordinary distributed hash join.
    Both branches emit (big columns + add_cols) and union streaming.

    Degradations keep correctness over cleverness: more than
    ``max_hot_keys`` "hot" keys means the threshold is below the bulk of
    the distribution (nothing is special about those keys), so the plan
    falls back to the plain distributed join; an empty hot set does the
    same. Test-gated: both branches and the fallback agree with pandas
    merge on a zipf-skewed fixture."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    big_key = big_key or key
    sel_dim = dim_ds.select_columns([key] + add_cols)

    def plain():
        j = big_ds.join(drop_empty_blocks(sel_dim), join_type="inner",
                        num_partitions=_join_partitions(),
                        on=(big_key,), right_on=(key,))
        if key != big_key:
            j = j.map_batches(
                lambda t: t.drop_columns([key]) if key in t.column_names else t,
                batch_format="pyarrow")
        return j

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column(big_key).combine_chunks())
        return pa.table({"__k": vc.field("values"),
                         "__c": pc.cast(vc.field("counts"), pa.int64())})

    # the census is distinct-key-sized (far below the fact table);
    # materializing it lets one pass over the big side answer both
    # "which keys are hot" and "does a cold remainder exist at all"
    counts = (big_ds.select_columns([big_key])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("__k").aggregate(Sum("__c", alias_name="__n"))
              .materialize())

    def split(cold: bool):
        op = pc.less if cold else pc.greater_equal
        return counts.map_batches(
            lambda t: t.filter(op(t.column("__n"), pa.scalar(hot_count))),
            batch_format="pyarrow")

    hot_tbl = collect_small(split(cold=False), cap_rows=max_hot_keys)
    if hot_tbl is None:
        return plain()
    hot_keys = set(hot_tbl.column("__k").to_pylist())
    if not hot_keys:
        return plain()

    out_cols = [c for c in big_ds.columns()] + add_cols
    dim_hot = collect_small(semi_join_filter(sel_dim, hot_keys, key),
                            cap_rows=max_hot_keys)
    if dim_hot is None:  # dim not key-unique enough to hold the contract
        return plain()
    hot_res = broadcast_join(
        semi_join_filter(big_ds, hot_keys, big_key), dim_hot,
        key=key, add_cols=add_cols, big_key=big_key).select_columns(out_cols)
    # Ray's hash join rejects a side whose blocks were ALL filtered empty
    # (schema lost) — and an empty side makes an inner join empty anyway,
    # so both degenerate branches resolve to hot_res without a join.
    if split(cold=True).count() == 0:  # no cold key on the big side
        return hot_res
    dim_cold = drop_empty_blocks(  # materializes: count below is metadata
        semi_join_filter(sel_dim, hot_keys, key, keep=False))
    if dim_cold.count() == 0:
        return hot_res
    cold = semi_join_filter(big_ds, hot_keys, big_key, keep=False)
    j = cold.join(dim_cold, join_type="inner",
                  num_partitions=_join_partitions(),
                  on=(big_key,), right_on=(key,))
    if key != big_key:
        j = j.map_batches(
            lambda t: t.drop_columns([key]) if key in t.column_names else t,
            batch_format="pyarrow")
    return hot_res.union(j.select_columns(out_cols))


def merge_upsert(base_ds, changes_ds, key: str, delete_col: str = "is_delete",
                 num_buckets: int = 256):
    """SQL MERGE semantics in ONE key-hash exchange: a change row
    replaces the base row with the same ``key`` (update), change rows
    with ``delete_col`` true remove the key, unmatched change rows
    insert. ``changes_ds`` must carry the base columns plus
    ``delete_col`` and at most one row per key (compact CDC upstream —
    `state.compact` / keep-latest — if not).

    Shape (the `extract.keep_latest` coarse-bucket pattern): tag rank
    (base 0 / change 1), hash the key into ``num_buckets`` coarse
    groups, vectorized in-bucket keep-max-rank via pandas
    ``drop_duplicates``, then a delete filter — no join, no per-key
    python."""
    import pandas as pd

    cols = [c for c in base_ds.schema().names]

    def tag_base(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        t = t.append_column(delete_col, pa.array(np.zeros(len(t), bool)))
        return t.append_column("__rank", pa.array(np.zeros(len(t), np.int8)))

    def tag_change(t: pa.Table) -> pa.Table:
        t = t.select(cols + [delete_col])
        return t.append_column("__rank", pa.array(np.ones(len(t), np.int8)))

    def add_bucket(t: pa.Table) -> pa.Table:
        vals = _key_np(t.column(key))
        h = pd.util.hash_array(vals)
        return t.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "__rank"], kind="stable")
        win = df.drop_duplicates(subset=[key], keep="last")
        return win.loc[~win[delete_col], cols]

    tagged = (base_ds.map_batches(tag_base, batch_format="pyarrow")
              .union(changes_ds.map_batches(tag_change,
                                            batch_format="pyarrow")))
    return (tagged.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(reduce_bucket, batch_format="pandas"))


def bucketed_group_apply(ds, keys: list[str], fn, num_buckets: int = 64):
    """``groupby(keys).map_groups(fn)`` with per-group overhead amortized.

    Ray's ``map_groups`` pays ~1 ms of slicing/convert per group — ruinous
    for millions of tiny groups (LSH buckets). Here rows are
    hash-partitioned into ``num_buckets`` coarse groups (one shuffle, same
    co-location guarantee: every true group lands wholly in one coarse
    group) and a vectorized pandas ``groupby`` applies ``fn`` inside each.
    The row-hash is pandas' process-stable hash_pandas_object."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        out = df.copy()
        out["__bucket"] = (h % num_buckets).astype(np.int64)
        return out

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        parts = [fn(sub) for _, sub in g.drop(columns="__bucket").groupby(keys, sort=False)]
        parts = [p for p in parts if p is not None and len(p)]
        if not parts:
            return fn(g.iloc[0:0].drop(columns="__bucket"))
        return pd.concat(parts, ignore_index=True)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )


def bucketed_bulk_apply(ds, keys: list[str], fn, num_buckets: int = 64):
    """One single-key exchange for a multi-key rollup: rows are
    hash-partitioned on ``keys`` into ``num_buckets`` coarse buckets
    (every true group lands wholly in one bucket) and ``fn`` receives
    each WHOLE bucket DataFrame — it must do its own vectorized
    ``groupby(keys)`` and may only emit per-true-group results.

    Why this exists: Ray 2.49's MULTI-key ``groupby().aggregate()``
    costs ~5 s of fixed overhead per execution at any size (measured:
    4-key aggregate over 24 k rows = 4.9 s vs 0.4 s for 1-key), so a
    two-level rollup pays ~10 s before touching data. This shape pays
    ONE cheap single-key sort exchange and keeps the combine/finish
    fully vectorized — same co-location guarantee, same results."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        out = df.copy()
        out["__bucket"] = (h % num_buckets).astype(np.int64)
        return out

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )


def self_join_pairs(ds, keys: list[str], id_col: str, payload_cols: list[str] | None = None,
                    num_buckets: int = 64, max_group: int = 64):
    """Candidate pairs (id_a < id_b) of rows sharing ``keys`` — the LSH
    bucket self-join, executed as a vectorized pandas merge per coarse
    hash bucket. Groups larger than ``max_group`` are truncated (guard
    against degenerate all-identical corpora; the dropped pairs are
    between already-duplicate rows)."""
    payload_cols = payload_cols or []

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        out = df.copy()
        out["__bucket"] = (h % num_buckets).astype(np.int64)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        sizes = g.groupby(keys, sort=False)[id_col].transform("size")
        if (sizes > max_group).any():
            # deterministic truncation: keep the max_group SMALLEST ids
            # per group (block arrival order varies run to run)
            g = g.sort_values(id_col, kind="stable")
            g = g[
                g.groupby(keys, sort=False).cumcount() < max_group
            ]
        cols = keys + [id_col] + payload_cols
        m = g[cols].merge(g[cols], on=keys, suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        return m.drop(columns=keys).reset_index(drop=True)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def topk(ds, sort_cols: list[tuple[str, bool]], k: int, offset: int = 0):
    """Global top-k with pagination: sort (Ray's distributed sample-sort)
    + limit(offset+k), dropping the first ``offset`` rows (the reference
    retriever's ``[start:end]`` result windows,
    `elastic_retriever.py:252-257`). sort_cols: [(col, descending)].
    A page is driver-small by definition, so the offset drop is a single
    bounded slice."""
    keys = [c for c, _ in sort_cols]
    desc = [d for _, d in sort_cols]
    out = ds.sort(keys, descending=desc).limit(offset + k)
    if not offset:
        return out
    page = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None),
        promote_options="default",
    ).slice(offset, k)
    return rd.from_arrow(page)


def weighted_sample(ds, n: int, weight_col: str, id_col: str = "doc_id",
                    seed: str = "w0"):
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006
    A-ES, one pass): each row draws a deterministic md5 uniform
    u = (h + 0.5) / 2^64 and scores key = ln(u) / w — the n largest keys
    are exactly an without-replacement sample with inclusion probability
    proportional to weight. Deterministic (seedable) and replayable by
    ANY engine, unlike PRNG sampling; rows with weight <= 0 are excluded.
    -> (id, weight, draw=round(key, 9)) via the distributed top-k.

    Scale shape: the draw is a stateless vectorized map; selection is
    one sample-sort limit n — ids and one float move, payload stays."""
    import hashlib

    import numpy as np

    def key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = np.array([int.from_bytes(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "little")
            for i in ids], dtype=np.uint64)
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        k = np.log(u) / np.maximum(w, 1e-300)
        t = pa.table({id_col: t.column(id_col),
                      weight_col: t.column(weight_col),
                      "__key": pa.array(k, pa.float64())})
        return t.filter(pa.array(w > 0))

    picked = topk(ds.map_batches(key, batch_format="pyarrow"),
                  [("__key", True), (id_col, False)], n)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            id_col: t.column(id_col),
            weight_col: t.column(weight_col),
            "draw": pc.round(t.column("__key"), 9,
                             round_mode="half_towards_infinity"),
        })

    return picked.map_batches(finish, batch_format="pyarrow")


def group_quantiles_counted(ds, keys: list[str], value_col: str,
                            qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                            num_buckets: int = 64):
    """Skew-safe EXACT per-group discrete quantiles for bounded-
    cardinality values: unlike ``group_quantiles`` (which gathers every
    row of a group into one worker — a bottleneck when the group key is
    hot), the exchange here carries per-(group, value) COUNTS produced
    by per-batch combiners, so a hot group's traffic is bounded by its
    distinct-value count, not its row count. The in-group pick is the
    weighted inverted CDF over the count table — element-identical to
    ``quantile_disc`` and to ``group_quantiles``. The third tier of the
    quantile family: exact-gather / exact-counted / histogram-sketch."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [value_col]).to_pandas()
        df["__n"] = 1
        agg = df.groupby(keys + [value_col], sort=False).count().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = (ds.select_columns(keys + [value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(keys + [value_col])
              .aggregate(Sum("__n", alias_name="__n")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col, kind="stable")
        v = g[value_col].to_numpy()
        c = g["__n"].to_numpy()
        cum = np.cumsum(c)
        n = cum[-1]
        row = {k: [g[k].iloc[0]] for k in keys}
        for q in qs:
            rnk = max(int(np.ceil(q * n)), 1)
            row[f"q{int(q * 100)}"] = [v[np.searchsorted(cum, rnk, side="left")]]
        return pd.DataFrame(row)

    return bucketed_group_apply(counts, keys, pick, num_buckets=num_buckets)


def skyline(ds, max_cols: list[str], min_cols: list[str],
            batch_size: int = 1024):
    """Pareto frontier (skyline, Börzsönyi et al. 2001): rows not
    weakly dominated — with at least one strict inequality — by any
    other row over ``max_cols`` (bigger better) and ``min_cols``
    (smaller better). Duplicate points all survive, matching the SQL
    NOT-EXISTS convention.

    Scale shape: skyline admits an exact combiner — skyline(A ∪ B) ⊆
    skyline(A) ∪ skyline(B) and every globally dominated point is
    dominated by some local survivor (strict dominance is transitive) —
    so each batch drops its dominated rows first (vectorized O(b²·d)
    numpy bitmask, b = ``batch_size``), then the survivors converge in
    one `repartition(1)` whole-block pass applying the same rule; no
    driver pull at any size. Survivor count is data-dependent
    (anti-correlated dims keep many points): the final single task
    assumes the frontier fits one worker, the standard skyline
    partitioning assumption (documented per the custom-operator rule)."""
    cols = list(max_cols) + list(min_cols)

    def oriented(t: pa.Table) -> np.ndarray:
        x = np.stack([t.column(c).to_numpy(zero_copy_only=False)
                      .astype(np.float64) for c in max_cols]
                     + [-t.column(c).to_numpy(zero_copy_only=False)
                        .astype(np.float64) for c in min_cols], axis=1)
        return x

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        x = oriented(t)
        ge = (x[:, None, :] >= x[None, :, :]).all(-1)   # ge[j,i]: j >= i
        gt = (x[:, None, :] > x[None, :, :]).any(-1)
        dominated = (ge & gt).any(axis=0)
        return t.filter(pa.array(~dominated))

    survivors = ds.map_batches(local, batch_format="pyarrow",
                               batch_size=batch_size)
    return survivors.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None)
