"""Graph analytics over the materialized KG adjacency — the batch analog
of the reference's graph-side consumption of its ES-indexed entity graph
(`cosmos_service`'s entity adjacency queries); PageRank/degree are the
standard "which entities matter" passes a KG build feeds downstream.

Scale shape: the EDGE set streams (it is corpus-sized); the NODE table
is entity-vocabulary-sized — bounded by the canonical KB the linker
maps into, i.e. model-sized state like the word-vector vocabulary, not
corpus-sized. PageRank therefore runs its per-iteration rank lookup as
a broadcast (`ray.put` once per iteration, read inside `map_batches`)
with per-batch combiner partials, falling back to a distributed
hash-join + groupby iteration when the node table exceeds the broadcast
cap (the two paths agree exactly — gated in tests)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _distinct_entities(e):
    """Distinct node ids over both edge endpoints (groupby-distinct).
    Node ids keep their native type (int entity keys or string
    canonical ids both work)."""
    from ray.data.aggregate import Count

    return (
        e.map_batches(
            lambda t: pa.table({"entity": pa.concat_arrays(
                [t.column("src").combine_chunks(),
                 t.column("dst").combine_chunks()])}),
            batch_format="pyarrow",
        )
        .groupby("entity")
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )


def _edge_weights(edges_ds, src: str, dst: str, weight: str | None):
    """Normalize to (src, dst, w:double), summing parallel edges."""

    def prep(t: pa.Table) -> pa.Table:
        w = (t.column(weight).cast(pa.float64()) if weight
             else pa.array(np.ones(t.num_rows), pa.float64()))
        return pa.table({"src": t.column(src), "dst": t.column(dst), "w": w})

    return (
        edges_ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("w", alias_name="w"))
    )


def degree_centrality(edges_ds, src: str = "src_entity",
                      dst: str = "dst_entity", weight: str = "weight"):
    """-> (entity, out_degree, in_degree, out_weight, in_weight) for
    every node appearing on either side. Distinct-neighbour degrees plus
    weighted totals — one combiner map + one small groupby, no joins."""
    e = _edge_weights(edges_ds, src, dst, weight)

    def partials(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        out = pa.table({
            "entity": t.column("src"),
            "out_degree": pa.array(np.ones(t.num_rows, np.int64)),
            "in_degree": pa.array(np.zeros(t.num_rows, np.int64)),
            "out_weight": pa.array(w, pa.float64()),
            "in_weight": pa.array(np.zeros(t.num_rows), pa.float64()),
        })
        inn = pa.table({
            "entity": t.column("dst"),
            "out_degree": pa.array(np.zeros(t.num_rows, np.int64)),
            "in_degree": pa.array(np.ones(t.num_rows, np.int64)),
            "out_weight": pa.array(np.zeros(t.num_rows), pa.float64()),
            "in_weight": pa.array(w, pa.float64()),
        })
        return pa.concat_tables([out, inn])

    return (
        e.map_batches(partials, batch_format="pyarrow")
        .groupby("entity")
        .aggregate(
            Sum("out_degree", alias_name="out_degree"),
            Sum("in_degree", alias_name="in_degree"),
            Sum("out_weight", alias_name="out_weight"),
            Sum("in_weight", alias_name="in_weight"),
        )
    )


def pagerank(edges_ds, src: str = "src_entity", dst: str = "dst_entity",
             weight: str = "weight", damping: float = 0.85, iters: int = 20,
             broadcast_cap: int = 2_000_000, ndigits: int = 6):
    """Weighted PageRank -> (entity, rank), ranks rounded to ``ndigits``
    (sum over nodes ~= 1). Dangling mass is redistributed uniformly each
    iteration (standard formulation). Fixed ``iters`` power iterations —
    deterministic given the graph; float partial-sum order may wiggle
    well below the rounding digit (same tolerance story as the rounded
    SQL-checked aggregates)."""
    from cosmos_ray.queries.relational import collect_small

    e = _edge_weights(edges_ds, src, dst, weight).materialize()

    # node table + per-src total outgoing weight (both node-sized)
    nodes_tbl = collect_small(_distinct_entities(e), cap_rows=broadcast_cap)
    if nodes_tbl is None:
        return _pagerank_joined(e, damping, iters, ndigits)
    node_ids = np.sort(nodes_tbl.column("entity").to_numpy(zero_copy_only=False))
    n = len(node_ids)
    if n == 0:
        return rd.from_arrow(pa.table({
            "entity": nodes_tbl.column("entity"),
            "rank": pa.array([], pa.float64()),
        }))

    outw_tbl = collect_small(
        e.groupby("src").aggregate(Sum("w", alias_name="outw")),
        cap_rows=broadcast_cap,
    )
    outw = np.zeros(n, np.float64)
    idx = np.searchsorted(node_ids, outw_tbl.column("src").to_numpy(zero_copy_only=False))
    outw[idx] = outw_tbl.column("outw").to_numpy(zero_copy_only=False)

    ranks = np.full(n, 1.0 / n)
    ids_ref = ray.put(node_ids)
    for _ in range(iters):
        r_ref = ray.put(ranks / np.where(outw > 0, outw, 1.0))  # rank/outw per node

        def contribs(t: pa.Table, _r=r_ref, _ids=ids_ref) -> pa.Table:
            ids, r = ray.get(_ids), ray.get(_r)
            s = np.searchsorted(ids, t.column("src").to_numpy(zero_copy_only=False))
            c = r[s] * t.column("w").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            # in-batch combiner: one partial row per distinct dst
            uniq, inv = np.unique(d, return_inverse=True)
            return pa.table({
                "dst": pa.array(uniq.tolist()),
                "c": pa.array(np.bincount(inv, weights=c), pa.float64()),
            })

        agg = collect_small(
            e.map_batches(contribs, batch_format="pyarrow")
            .groupby("dst").aggregate(Sum("c", alias_name="c")),
            cap_rows=broadcast_cap,
        )
        incoming = np.zeros(n, np.float64)
        if agg is not None and agg.num_rows:
            j = np.searchsorted(node_ids, agg.column("dst").to_numpy(zero_copy_only=False))
            incoming[j] = agg.column("c").to_numpy(zero_copy_only=False)
        dangling = ranks[outw == 0].sum()
        ranks = (1.0 - damping) / n + damping * (incoming + dangling / n)

    return rd.from_arrow(pa.table({
        "entity": pa.array(node_ids.tolist()),
        "rank": pa.array(np.round(ranks, ndigits), pa.float64()),
    }))


def _pagerank_joined(e, damping: float, iters: int, ndigits: int):
    """Node table exceeds the broadcast cap: every iteration is a
    distributed hash join of edges against the rank table plus a
    groupby-sum — the all-to-all form. Agrees exactly with the broadcast
    path (test-gated); used only past ``broadcast_cap`` nodes."""
    import ray as _ray

    num_partitions = max(2, int(_ray.cluster_resources().get("CPU", 8)) // 2)

    nodes = _distinct_entities(e).materialize()
    n = nodes.count()
    outw = e.groupby("src").aggregate(Sum("w", alias_name="outw"))
    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array(
            np.full(t.num_rows, 1.0 / n), pa.float64())),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        rw = ranks.join(outw, join_type="left_outer", num_partitions=num_partitions,
                        on=("entity",), right_on=("src",))

        def share(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy(zero_copy_only=False)
            ow = t.column("outw").to_numpy(zero_copy_only=False)
            ow = np.nan_to_num(ow, nan=0.0)
            return pa.table({
                "entity": t.column("entity"),
                "share": pa.array(np.where(ow > 0, r / np.where(ow > 0, ow, 1), 0.0),
                                  pa.float64()),
                "dang": pa.array(np.where(ow > 0, 0.0, r), pa.float64()),
            })

        shares = rw.map_batches(share, batch_format="pyarrow").materialize()
        dangling = shares.sum("dang")
        contrib = (
            e.join(shares.select_columns(["entity", "share"]), join_type="inner",
                   num_partitions=num_partitions, on=("src",), right_on=("entity",))
            .map_batches(
                lambda t: pa.table({
                    "entity": t.column("dst"),
                    "c": pc.multiply(t.column("w"), t.column("share")),
                }),
                batch_format="pyarrow",
            )
            .groupby("entity").aggregate(Sum("c", alias_name="c"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = nodes.join(contrib, join_type="left_outer",
                           num_partitions=num_partitions, on=("entity",),
                           right_on=("entity",)).map_batches(
            lambda t, _b=base: pa.table({
                "entity": t.column("entity"),
                "rank": pa.array(
                    _b + damping * np.nan_to_num(
                        t.column("c").to_numpy(zero_copy_only=False), nan=0.0),
                    pa.float64()),
            }),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table({
            "entity": t.column("entity"),
            "rank": pa.array(np.round(
                t.column("rank").to_numpy(zero_copy_only=False), ndigits),
                pa.float64()),
        }),
        batch_format="pyarrow",
    )
