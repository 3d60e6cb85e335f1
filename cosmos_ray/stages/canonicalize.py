"""Canonicalization + dedup + graph materialization — the wide steps.

Reference analogs: exact entity dedup via `drop_duplicates`
(`entity_linking/link.py:110-113`), the entity<->object adjacency the ES
Join index materializes (`elastic_retriever.py:74-90,116-141`).

Scale design (SURVEY.md §4 skew/shuffle rows): every aggregation here is
**two-phase with an integer-bucket exchange**:

1. a vectorized in-batch partial aggregate (pyarrow ``Table.group_by``)
   emits at most one row per distinct key per batch, so the shuffle moves
   combiner partials, never raw rows;
2. partials are exchanged on a COARSE int64 bucket column (a
   process-stable hash of the true key, ``num_buckets`` values) — far
   cheaper than sort-shuffling multi-string keys, and every true key
   still lands wholly in one bucket;
3. the in-bucket final reduce is again a vectorized arrow ``group_by``.

Head-entity skew is bounded by construction: a hot key contributes one
partial per upstream batch regardless of its raw mention count (this is
the combiner form of salted aggregation), and hot keys share a bucket
with ~1/num_buckets of all keys, not with their raw rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

TRIPLES_FINAL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conf", pa.float32()),
        ("n_mentions", pa.int64()),
    ]
)

ADJACENCY_SCHEMA = pa.schema(
    [
        ("src_entity", pa.string()),
        ("dst_entity", pa.string()),
        ("pred", pa.string()),
        ("weight", pa.int64()),
    ]
)

DEFAULT_BUCKETS = 64

# Below this many input rows the final reduce runs as a single local
# arrow group_by instead of a distributed exchange — the small-aggregate
# fast path every real engine has. The distributed path is unchanged and
# exercised by tests (threshold=0).
DRIVER_REDUCE_THRESHOLD = 10_000_000
# ... and a byte-denominated guard alongside the row cap: 10M rows of
# url-string triples can be multi-GB, which the driver must not pull.
DRIVER_REDUCE_BYTE_CAP = 2 << 30


def _fits_driver(ds, threshold: int) -> bool:
    """Materialized + under BOTH the row threshold and the byte cap."""
    from ray.data.dataset import MaterializedDataset

    if threshold <= 0 or not isinstance(ds, MaterializedDataset):
        return False
    if ds.count() > threshold:
        return False
    size = ds.size_bytes()
    return size is None or size <= DRIVER_REDUCE_BYTE_CAP


def _driver_arrow_threads() -> None:
    """Allow a few arrow compute threads for driver-local reduces (the
    container pins OMP_NUM_THREADS=1, which also caps arrow's pool)."""
    try:
        if pa.cpu_count() < 8:
            pa.set_cpu_count(8)
    except Exception:
        pass


def _local_fast_path(ds, partial_fn, keys: list[str], aggs: list[tuple],
                     out_names: list[str], threshold: int):
    """Small-aggregate fast path: when the input is an already-
    MATERIALIZED dataset under ``threshold`` rows, run combiner + final
    reduce locally as vectorized arrow kernels (zero extra executions).
    Returns None to fall through to the distributed path."""
    import ray.data as rd

    if not _fits_driver(ds, threshold):
        return None
    refs = ds.to_arrow_refs()
    if not refs:
        return None
    _driver_arrow_threads()
    full = pa.concat_tables([ray.get(r) for r in refs], promote_options="default")
    part = partial_fn(full)
    g = part.group_by(keys).aggregate(aggs)
    return rd.from_arrow(g.rename_columns(keys + out_names))


def _add_bucket(t: pa.Table, keys: list[str], num_buckets: int) -> pa.Table:
    """Append a process-stable int64 bucket column derived from ``keys``."""
    h = pd.util.hash_pandas_object(t.select(keys).to_pandas(), index=False).to_numpy()
    return t.append_column("__bucket", pa.array((h % num_buckets).astype(np.int64)))


def bucketed_agg(
    partial_ds,
    keys: list[str],
    aggs: list[tuple],
    out_names: list[str],
    num_buckets: int = DEFAULT_BUCKETS,
    coalesce: int | None = 32,
):
    """Final reduce of combiner partials: int-bucket exchange + vectorized
    arrow group_by per bucket. ``aggs`` is a pyarrow aggregate spec; the
    reduce output columns are keys + aggregated columns, renamed to
    ``keys + out_names``."""

    def add_b(t: pa.Table) -> pa.Table:
        return _add_bucket(t, keys, num_buckets)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["__bucket"]).group_by(keys).aggregate(aggs)
        return g.rename_columns(keys + out_names)

    ds = partial_ds.map_batches(add_b, batch_format="pyarrow")
    if coalesce:
        ds = ds.repartition(coalesce)
    return ds.groupby("__bucket").map_groups(reduce_bucket, batch_format="pyarrow")


def _conform(schema: pa.Schema):
    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {n: t.column(n).cast(schema.field(n).type) for n in schema.names},
            schema=schema,
        )

    return fn


# ------------------------------------------------------------- triples
_TRIPLE_KEYS = ["url", "subj", "pred", "obj"]


def _with_n(t: pa.Table) -> pa.Table:
    """Ensure a raw-support count column 'n' (1 per raw row; combined
    blocks already carry it)."""
    if "n" in t.column_names:
        return t
    return t.append_column("n", pa.array(np.ones(t.num_rows, np.int64)))


def combine_linked_block(t: pa.Table) -> pa.Table:
    """Block-local combiner over linked triples: one row per
    (url, subj, pred, obj) with summed raw support 'n'. The id/score
    columns are single-valued per key (ids are functions of surfaces),
    so max == the value."""
    if t.num_rows == 0:
        return _with_n(t)
    t = _with_n(t)
    g = t.group_by(_TRIPLE_KEYS).aggregate(
        [
            ("conf", "max"),
            ("subj_id", "max"),
            ("subj_score", "max"),
            ("obj_id", "max"),
            ("obj_score", "max"),
            ("n", "sum"),
        ]
    )
    return g.rename_columns(
        _TRIPLE_KEYS + ["conf", "subj_id", "subj_score", "obj_id", "obj_score", "n"]
    )


def _partial_triples(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "subj": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "conf": pa.array([], pa.float32()),
                "n": pa.array([], pa.int64()),
            }
        )
    t = _with_n(t)
    g = t.select(["url", "subj", "pred", "obj", "conf", "n"]).group_by(_TRIPLE_KEYS).aggregate(
        [("conf", "max"), ("n", "sum")]
    )
    return g.rename_columns(_TRIPLE_KEYS + ["conf", "n"])


def dedup_triples(triples_ds, driver_threshold: int = DRIVER_REDUCE_THRESHOLD) -> "ray.data.Dataset":
    """Exact per-url triple dedup with mention counts (FIXTURES.md F4)."""
    local = _local_fast_path(
        triples_ds, _partial_triples, _TRIPLE_KEYS,
        [("conf", "max"), ("n", "sum")], ["conf", "n_mentions"], driver_threshold,
    )
    if local is not None:
        return local.map_batches(_conform(TRIPLES_FINAL_SCHEMA), batch_format="pyarrow")
    partial = triples_ds.map_batches(_partial_triples, batch_format="pyarrow")
    agg = bucketed_agg(
        partial, _TRIPLE_KEYS, [("conf", "max"), ("n", "sum")], ["conf", "n_mentions"]
    )
    return agg.map_batches(_conform(TRIPLES_FINAL_SCHEMA), batch_format="pyarrow")


# ------------------------------------------------------------- adjacency
_ADJ_KEYS = ["src_entity", "dst_entity", "pred"]


def _partial_adjacency(t: pa.Table) -> pa.Table:
    both = t.filter(
        pc.and_(
            pc.not_equal(t.column("subj_id"), pa.scalar("")),
            pc.not_equal(t.column("obj_id"), pa.scalar("")),
        )
    )
    if both.num_rows == 0:
        return pa.table(
            {
                "src_entity": pa.array([], pa.string()),
                "dst_entity": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "w": pa.array([], pa.int64()),
            }
        )
    both = _with_n(both)
    g = both.select(["subj_id", "pred", "obj_id", "n"]).group_by(
        ["subj_id", "pred", "obj_id"]
    ).aggregate([("n", "sum")])
    return g.rename_columns(["src_entity", "pred", "dst_entity", "w"]).select(
        ["src_entity", "dst_entity", "pred", "w"]
    )


def build_adjacency(linked_triples_ds, driver_threshold: int = DRIVER_REDUCE_THRESHOLD) -> "ray.data.Dataset":
    """Canonical graph edges: (src_entity, dst_entity, pred, weight) where
    weight = number of supporting raw triples across the corpus."""
    local = _local_fast_path(
        linked_triples_ds, _partial_adjacency, _ADJ_KEYS,
        [("w", "sum")], ["weight"], driver_threshold,
    )
    if local is not None:
        return local.map_batches(_conform(ADJACENCY_SCHEMA), batch_format="pyarrow")
    partial = linked_triples_ds.map_batches(_partial_adjacency, batch_format="pyarrow")
    agg = bucketed_agg(partial, _ADJ_KEYS, [("w", "sum")], ["weight"])
    return agg.map_batches(_conform(ADJACENCY_SCHEMA), batch_format="pyarrow")


# ------------------------------------------------------------- entities
def _partial_mentions(t: pa.Table) -> pa.Table:
    t = _with_n(t)
    ids = pa.concat_arrays(
        [
            t.column("subj_id").combine_chunks().cast(pa.string()),
            t.column("obj_id").combine_chunks().cast(pa.string()),
        ]
    )
    ns = pa.concat_arrays(
        [
            t.column("n").combine_chunks().cast(pa.int64()),
            t.column("n").combine_chunks().cast(pa.int64()),
        ]
    )
    tbl = pa.table({"canonical_id": ids, "n": ns})
    tbl = tbl.filter(pc.not_equal(tbl.column("canonical_id"), pa.scalar("")))
    if tbl.num_rows == 0:
        return pa.table({"canonical_id": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    g = tbl.group_by(["canonical_id"]).aggregate([("n", "sum")])
    return g.rename_columns(["canonical_id", "n"])


class _KbDecorator:
    """Joins mention counts to KB records via the broadcast KB (actor
    state, no shuffle — J4 small-side lookup)."""

    def __init__(self, kb_ref=None, kb_table: pa.Table | None = None) -> None:
        if kb_table is None:
            kb_table = ray.get(kb_ref)
        self.by_id = {r["canonical_id"]: r for r in kb_table.to_pylist()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("canonical_id").to_pylist()
        ns = batch.column("n_mentions").to_pylist()
        rows = []
        for cid, n in zip(ids, ns):
            r = self.by_id.get(cid)
            rows.append(
                {
                    "canonical_id": cid,
                    "name": r["name"] if r else "",
                    "aliases": r["aliases"] if r else [],
                    "types": r["types"] if r else [],
                    "description": r["description"] if r else "",
                    "n_mentions": n,
                }
            )
        from cosmos_ray.core import schemas

        return pa.Table.from_pylist(rows, schema=schemas.ENTITIES)


def dedup_triples_urllocal(linked_ds) -> "ray.data.Dataset":
    """Per-url triple dedup with NO exchange, valid under the
    url-locality invariant: every row of a url is produced inside one
    task's output block (true for the streaming chain — rows fan out
    per-page and are never shuffled between extract and link — and
    preserved by ``combine_linked_block``). Since the dedup key includes
    ``url``, a (url,s,p,o) group can never span blocks, so block-local
    combining IS the global dedup."""

    def fn(t: pa.Table) -> pa.Table:
        part = _partial_triples(t)
        return _conform(TRIPLES_FINAL_SCHEMA)(
            part.rename_columns(_TRIPLE_KEYS + ["conf", "n_mentions"])
        )

    return linked_ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def finalize_graph_local(linked_ds, kb_ref,
                         threshold: int = DRIVER_REDUCE_THRESHOLD):
    """Compute (triples, entities, adjacency) with ONE driver-side pull
    of the (combined, materialized, small) linked dataset — the three
    per-aggregate fast paths would otherwise each re-concat the blocks.
    Returns None when the input is too big or not materialized; callers
    fall back to the per-aggregate functions (distributed path)."""
    import ray.data as rd

    if not _fits_driver(linked_ds, threshold):
        return None
    refs = linked_ds.to_arrow_refs()
    if not refs:
        return None
    _driver_arrow_threads()
    full = pa.concat_tables([ray.get(r) for r in refs], promote_options="default")

    tp = _partial_triples(full)
    tg = tp.group_by(_TRIPLE_KEYS).aggregate([("conf", "max"), ("n", "sum")])
    triples = rd.from_arrow(
        _conform(TRIPLES_FINAL_SCHEMA)(
            tg.rename_columns(_TRIPLE_KEYS + ["conf", "n_mentions"])
        )
    )

    ap = _partial_adjacency(full)
    ag = ap.group_by(_ADJ_KEYS).aggregate([("w", "sum")])
    adjacency = rd.from_arrow(
        _conform(ADJACENCY_SCHEMA)(ag.rename_columns(_ADJ_KEYS + ["weight"]))
    )

    mp = _partial_mentions(full)
    mg = mp.group_by(["canonical_id"]).aggregate([("n", "sum")])
    entities = rd.from_arrow(
        _KbDecorator(kb_ref=kb_ref)(mg.rename_columns(["canonical_id", "n_mentions"]))
    )
    return triples, entities, adjacency


def build_entities(linked_triples_ds, kb_ref, concurrency: int | tuple = (1, 2),
                   driver_threshold: int = DRIVER_REDUCE_THRESHOLD) -> "ray.data.Dataset":
    """Canonical entity table with mention counts (exact dedup on
    canonical_id — the groupby IS the dedup, reference `link.py:113`)."""
    local = _local_fast_path(
        linked_triples_ds, _partial_mentions, ["canonical_id"],
        [("n", "sum")], ["n_mentions"], driver_threshold,
    )
    if local is not None:
        return local.map_batches(
            _KbDecorator, fn_constructor_kwargs={"kb_ref": kb_ref},
            batch_format="pyarrow", concurrency=1,
        )
    partial = linked_triples_ds.map_batches(_partial_mentions, batch_format="pyarrow")
    agg = bucketed_agg(partial, ["canonical_id"], [("n", "sum")], ["n_mentions"],
                       num_buckets=16, coalesce=16)
    return agg.map_batches(
        _KbDecorator,
        fn_constructor_kwargs={"kb_ref": kb_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
