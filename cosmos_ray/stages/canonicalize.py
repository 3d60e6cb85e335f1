"""Canonicalization + dedup + graph materialization — the wide steps.

Reference analogs: exact entity dedup via `drop_duplicates`
(`entity_linking/link.py:110-113`), the entity<->object adjacency the ES
Join index materializes (`elastic_retriever.py:74-90,116-141`).

Scale design (SURVEY.md §4 skew/shuffle rows): every groupby here is
**two-phase** — a vectorized in-batch partial aggregate (pyarrow
``Table.group_by``) emits at most one row per distinct key per batch, so
the hash shuffle moves partials, not raw rows. Head-entity skew (a hot
``canonical_id`` appearing in a large share of pages) is therefore
bounded: the final reduce for a key sees <= one partial per upstream
batch regardless of how many raw mentions the key has. This is the
combiner form of salted aggregation; no key ever needs to be resident
as raw rows on one node.
"""

from __future__ import annotations

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


# ------------------------------------------------------------- triples
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
    g = t.select(["url", "subj", "pred", "obj", "conf"]).group_by(
        ["url", "subj", "pred", "obj"]
    ).aggregate([("conf", "max"), ([], "count_all")])
    return g.rename_columns(["url", "subj", "pred", "obj", "conf", "n"])


def dedup_triples(triples_ds) -> "ray.data.Dataset":
    """Exact per-url triple dedup with mention counts: in-batch partial
    count -> hash-shuffle groupby -> sum (FIXTURES.md F4 contract)."""
    from ray.data.aggregate import Max, Sum

    partial = triples_ds.map_batches(_partial_triples, batch_format="pyarrow")
    agg = partial.groupby(["url", "subj", "pred", "obj"]).aggregate(
        Max("conf", alias_name="conf"), Sum("n", alias_name="n_mentions")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {n: t.column(n).cast(TRIPLES_FINAL_SCHEMA.field(n).type) for n in TRIPLES_FINAL_SCHEMA.names},
            schema=TRIPLES_FINAL_SCHEMA,
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------- adjacency
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
    g = both.select(["subj_id", "pred", "obj_id"]).group_by(
        ["subj_id", "pred", "obj_id"]
    ).aggregate([([], "count_all")])
    return g.rename_columns(["src_entity", "pred", "dst_entity", "w"]).select(
        ["src_entity", "dst_entity", "pred", "w"]
    )


def build_adjacency(linked_triples_ds) -> "ray.data.Dataset":
    """Canonical graph edges: (src_entity, dst_entity, pred, weight) where
    weight = number of supporting raw triples across the corpus."""
    from ray.data.aggregate import Sum

    partial = linked_triples_ds.map_batches(_partial_adjacency, batch_format="pyarrow")
    agg = partial.groupby(["src_entity", "dst_entity", "pred"]).aggregate(
        Sum("w", alias_name="weight")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {n: t.column(n).cast(ADJACENCY_SCHEMA.field(n).type) for n in ADJACENCY_SCHEMA.names},
            schema=ADJACENCY_SCHEMA,
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------- entities
def _partial_mentions(t: pa.Table) -> pa.Table:
    ids = pa.concat_arrays(
        [
            t.column("subj_id").combine_chunks().cast(pa.string()),
            t.column("obj_id").combine_chunks().cast(pa.string()),
        ]
    )
    tbl = pa.table({"canonical_id": ids})
    tbl = tbl.filter(pc.not_equal(tbl.column("canonical_id"), pa.scalar("")))
    if tbl.num_rows == 0:
        return pa.table({"canonical_id": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    g = tbl.group_by(["canonical_id"]).aggregate([([], "count_all")])
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


def build_entities(linked_triples_ds, kb_ref, concurrency: int | tuple = (1, 2)) -> "ray.data.Dataset":
    """Canonical entity table with mention counts (exact dedup on
    canonical_id — the groupby IS the dedup, reference `link.py:113`)."""
    from ray.data.aggregate import Sum

    partial = linked_triples_ds.map_batches(_partial_mentions, batch_format="pyarrow")
    agg = partial.groupby("canonical_id").aggregate(Sum("n", alias_name="n_mentions"))
    return agg.map_batches(
        _KbDecorator,
        fn_constructor_kwargs={"kb_ref": kb_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
