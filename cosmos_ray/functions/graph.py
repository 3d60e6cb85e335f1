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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum


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


def _distinct_canonical_edges(edges_ds, src: str, dst: str,
                              cast_string: bool = False):
    """Distinct canonical edges of the UNDIRECTED simple graph under
    the edge table: orient each edge to (a=min, b=max), drop self-loops,
    and collapse duplicates/reverses with one distinct groupby exchange
    — the single-sourced simple-graph semantics shared by
    triangle_count / k_core / clustering_coefficient /
    degree_assortativity. ``cast_string`` normalizes node ids to
    strings first (callers whose downstream keys are string-joined);
    default is type-agnostic (any strict total order orients the same
    edge set). -> Dataset(a, b), not materialized."""
    from ray.data.aggregate import Count

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column(src), t.column(dst)
        if cast_string:
            s, d = s.cast(pa.string()), d.cast(pa.string())
        lt = pc.less(s, d)
        a = pc.if_else(lt, s, d)
        b = pc.if_else(lt, d, s)
        return pa.table({"a": a, "b": b}).filter(pc.not_equal(a, b))

    return (edges_ds.select_columns([src, dst])
            .map_batches(canon, batch_format="pyarrow")
            .groupby(["a", "b"]).aggregate(Count(alias_name="__n"))
            .drop_columns(["__n"]))


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
             broadcast_cap: int = 2_000_000, ndigits: int = 6,
             seeds: list | None = None):
    """Weighted PageRank -> (entity, rank), ranks rounded to ``ndigits``
    (sum over nodes ~= 1). Dangling mass is redistributed uniformly each
    iteration (standard formulation). Fixed ``iters`` power iterations —
    deterministic given the graph; float partial-sum order may wiggle
    well below the rounding digit (same tolerance story as the rounded
    SQL-checked aggregates).

    ``seeds`` switches to PERSONALIZED PageRank (random-walk-with-
    restart): the teleport vector is uniform over the seed set instead
    of all nodes, and dangling mass restarts at the seeds too. The seed
    set is a query parameter (driver-small by definition); seeds absent
    from the graph are ignored."""
    from cosmos_ray.queries.relational import collect_small

    e = _edge_weights(edges_ds, src, dst, weight).materialize()

    # node table + per-src total outgoing weight (both node-sized)
    nodes_tbl = collect_small(_distinct_entities(e), cap_rows=broadcast_cap)
    if nodes_tbl is None:
        return _pagerank_joined(e, damping, iters, ndigits, seeds=seeds)
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

    if seeds is None:
        v = np.full(n, 1.0 / n)
    else:
        present = np.intersect1d(np.asarray(sorted(set(seeds))), node_ids)
        if len(present) == 0:
            raise ValueError("personalized pagerank: no seed is a graph node")
        v = np.zeros(n)
        v[np.searchsorted(node_ids, present)] = 1.0 / len(present)
    ranks = v.copy()
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
        ranks = (1.0 - damping) * v + damping * (incoming + dangling * v)

    return rd.from_arrow(pa.table({
        "entity": pa.array(node_ids.tolist()),
        "rank": pa.array(np.round(ranks, ndigits), pa.float64()),
    }))


def _pagerank_joined(e, damping: float, iters: int, ndigits: int,
                     seeds: list | None = None):
    """Node table exceeds the broadcast cap: every iteration is a
    distributed hash join of edges against the rank table plus a
    groupby-sum — the all-to-all form. Agrees exactly with the broadcast
    path (test-gated); used only past ``broadcast_cap`` nodes. The seed
    set (personalized teleport) is query-sized, so its membership test
    rides inside the map closures."""
    import ray as _ray

    from cosmos_ray.queries.relational import drop_empty_blocks

    num_partitions = max(2, int(_ray.cluster_resources().get("CPU", 8)) // 2)

    # e / outw / contrib are groupby outputs feeding joins: scrub their
    # zero-column empty blocks (Ray hash-aggregate artifact) or a join
    # partition receiving only those fails key resolution
    e = drop_empty_blocks(e)
    nodes = drop_empty_blocks(_distinct_entities(e))
    n = nodes.count()
    seed_set = None
    if seeds is not None:
        seed_set = frozenset(seeds)

        def count_present(t: pa.Table) -> pa.Table:
            ent = t.column("entity").to_numpy(zero_copy_only=False)
            hit = sum(1 for x in ent if x in seed_set)
            return pa.table({"n": pa.array([hit], pa.int64())})

        n_seed = int(nodes.map_batches(
            count_present, batch_format="pyarrow").sum("n") or 0)
        if n_seed == 0:
            raise ValueError("personalized pagerank: no seed is a graph node")

    def teleport(t: pa.Table) -> pa.Table:
        ent = t.column("entity").to_numpy(zero_copy_only=False)
        if seed_set is None:
            tv = np.full(len(ent), 1.0 / n)
        else:
            tv = np.fromiter((1.0 / n_seed if x in seed_set else 0.0
                              for x in ent), np.float64, count=len(ent))
        return t.append_column("tv", pa.array(tv, pa.float64()))

    outw = drop_empty_blocks(
        e.groupby("src").aggregate(Sum("w", alias_name="outw")))
    nodes = nodes.map_batches(teleport, batch_format="pyarrow").materialize()
    ranks = nodes.map_batches(
        lambda t: pa.table({"entity": t.column("entity"),
                            "rank": t.column("tv")}),
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

        # rw is a join output: its empty partitions' zero-column blocks
        # survive map_batches (empty blocks skip UDFs) — scrub before
        # shares feeds the contrib join (also materializes)
        shares = drop_empty_blocks(rw.map_batches(share,
                                                  batch_format="pyarrow"))
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
        contrib = drop_empty_blocks(contrib)
        ranks = nodes.join(contrib, join_type="left_outer",
                           num_partitions=num_partitions, on=("entity",),
                           right_on=("entity",)).map_batches(
            lambda t, _dang=dangling: pa.table({
                "entity": t.column("entity"),
                "rank": pa.array(
                    (1.0 - damping) * t.column("tv").to_numpy(
                        zero_copy_only=False)
                    + damping * (np.nan_to_num(
                        t.column("c").to_numpy(zero_copy_only=False), nan=0.0)
                        + _dang * t.column("tv").to_numpy(
                            zero_copy_only=False)),
                    pa.float64()),
            }),
            batch_format="pyarrow",
        )
        # next iteration joins ranks again: scrub the join's
        # empty-partition zero-column blocks (also materializes)
        ranks = drop_empty_blocks(ranks)

    return ranks.map_batches(
        lambda t: pa.table({
            "entity": t.column("entity"),
            "rank": pa.array(np.round(
                t.column("rank").to_numpy(zero_copy_only=False), ndigits),
                pa.float64()),
        }),
        batch_format="pyarrow",
    )


def weighted_distances(edges_ds, seeds, hops: int = 4,
                       src: str = "src_entity", dst: str = "dst_entity",
                       weight: str = "weight", directed: bool = False):
    """Hop-bounded weighted shortest-path distances from a seed set
    (Bellman-Ford, ``hops`` relaxation rounds): -> (entity, d) with d =
    minimum total edge weight over paths of <= hops edges, seeds at 0.

    Fully distributed — no driver pull at any size: each round is one
    hash join of the edge list against the current distance table plus
    a min-reduce; the distance table is node-bounded. With
    integer-valued weights (the adjacency's counts) path sums are exact
    in float64, so the min is order-independent and SQL-replayable."""
    import ray as _ray

    from cosmos_ray.queries.relational import drop_empty_blocks

    num_partitions = max(2, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    e = drop_empty_blocks(_edge_weights(edges_ds, src, dst, weight))
    if not directed:
        def both(t: pa.Table) -> pa.Table:
            s, d, w = t.column("src"), t.column("dst"), t.column("w")
            return pa.table({
                "src": pa.chunked_array(s.chunks + d.chunks, type=s.type)
                if isinstance(s, pa.ChunkedArray) else pa.concat_arrays([s, d]),
                "dst": pa.chunked_array(d.chunks + s.chunks, type=s.type)
                if isinstance(d, pa.ChunkedArray) else pa.concat_arrays([d, s]),
                "w": pa.chunked_array(w.chunks + w.chunks, type=w.type)
                if isinstance(w, pa.ChunkedArray) else pa.concat_arrays([w, w]),
            })

        e = e.map_batches(both, batch_format="pyarrow")
    e = e.materialize()

    dist = rd.from_arrow(pa.table({
        "entity": pa.array(sorted(set(seeds))),
        "d": pa.array([0.0] * len(set(seeds)), pa.float64()),
    })).materialize()

    for _ in range(hops):
        cand = (e.join(dist, join_type="inner",
                       num_partitions=num_partitions,
                       on=("src",), right_on=("entity",))
                .map_batches(
                    lambda t: pa.table({
                        "entity": t.column("dst"),
                        "d": pc.add(t.column("d"), t.column("w")),
                    }), batch_format="pyarrow"))
        dist = drop_empty_blocks(
            dist.union(cand).groupby("entity")
            .aggregate(Min("d", alias_name="d")))
    return dist


# ------------------------------------------------- connected components
def connected_components(edges_ds, src: str = "src_entity",
                         dst: str = "dst_entity",
                         cap_rows: int = 2_000_000):
    """(entity, component) with component = lexicographic-min node id in
    the connected component (undirected reading of the edge list).

    Scale shape: the entity EDGE list is KB-bounded (node vocabulary ×
    mean degree), not corpus-bounded, so the default path pulls the
    distinct edge list under ``cap_rows`` and runs exact driver
    union-find (the minhash-cluster shape, `dedup._union_find_clusters`).
    Past the cap: distributed min-label propagation — each round is one
    hash exchange over the edge table; labels only decrease, so an
    unchanged change-count certifies the fixed point."""
    from ray.data.aggregate import Count, Min

    from cosmos_ray.queries.relational import collect_small

    e = (edges_ds.select_columns([src, dst])
         .groupby([src, dst]).aggregate(Count(alias_name="__n"))
         .drop_columns(["__n"]))
    tbl = collect_small(e, cap_rows)
    if tbl is not None:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        pairs = zip(tbl.column(src).to_pylist(), tbl.column(dst).to_pylist())
        nodes = set()
        for a, b in pairs:
            nodes.add(a); nodes.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = sorted(nodes)
        return rd.from_arrow(pa.table({
            "entity": pa.array(out),
            "component": pa.array([find(x) for x in out]),
        }))

    # distributed fallback: undirected min-label propagation to fixpoint
    def both_dir(t: pa.Table) -> pa.Table:
        a, b = t.column(src), t.column(dst)
        # typed even when empty: a schema-less empty block poisons the
        # downstream hash join
        return pa.table({
            "node": pa.chunked_array(a.chunks + b.chunks, type=a.type),
            "nbr": pa.chunked_array(b.chunks + a.chunks, type=a.type),
        })

    # each round: (1) group the edge list + label table by node and fan
    # the node's label out along its edges (one exchange, no join — the
    # hash-shuffle join chokes on the empty zero-schema bundles the
    # aggregate operator emits); (2) min-reduce incoming labels per node.
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import bucketed_group_apply

    und = e.map_batches(both_dir, batch_format="pyarrow").materialize()
    labels = (und.groupby("node").aggregate(Min("nbr", alias_name="nbr_min"))
              .map_batches(lambda t: pa.table({
                  "node": t.column("node"),
                  "label": pc.min_element_wise(t.column("node"),
                                               t.column("nbr_min"))}),
                           batch_format="pyarrow").materialize())

    def fan_out(g):
        import pandas as _pd
        lab = g.loc[g["nbr"].isna(), "label"].min()
        nbrs = g.loc[g["nbr"].notna(), "nbr"].tolist()
        return _pd.DataFrame({"node": nbrs + [g["node"].iloc[0]],
                              "label": [lab] * (len(nbrs) + 1)})

    for _ in range(64):
        tagged = (und.map_batches(
                      lambda t: t.append_column(
                          "label", pa.nulls(len(t), labels.schema().types[1])),
                      batch_format="pyarrow")
                  .union(labels.map_batches(
                      lambda t: pa.table({
                          "node": t.column("node"),
                          "nbr": pa.nulls(len(t), t.column("node").type),
                          "label": t.column("label")}),
                      batch_format="pyarrow")))
        nxt = (bucketed_group_apply(tagged, ["node"], fan_out)
               .groupby("node").aggregate(Min("label", alias_name="label"))
               .map_batches(lambda t: t, batch_format="pyarrow")  # arrow blocks
               .materialize())
        # change certificate: a (node, label) row present in only one of
        # {prev, next} appears once in their union — any singleton means
        # some label moved this round
        changed = (labels.union(nxt)
                   .groupby(["node", "label"])
                   .aggregate(Count(alias_name="__c"))
                   .filter(lambda r: r["__c"] == 1).count())
        labels = nxt
        if not changed:
            break
    return labels.rename_columns({"node": "entity", "label": "component"})


# ------------------------------------------------------ k-hop neighborhood
def k_hop_neighborhood(edges_ds, seeds, k: int = 2,
                       src: str = "src_entity", dst: str = "dst_entity",
                       directed: bool = False):
    """(entity, hops) — minimum hop count from the seed set within
    ``k`` hops, hop 0 = the seeds themselves. Each hop is one
    size-guarded semi-join of the edge list against the frontier
    (broadcast membership while the frontier is small — the common KG
    case — distributed join past the cap via `semi_join_ds`)."""
    from ray.data.aggregate import Count, Min

    from cosmos_ray.queries.relational import semi_join_ds

    if not directed:
        def both_dir(t: pa.Table) -> pa.Table:
            a, b = t.column(src), t.column(dst)
            return pa.table({
                "__s": pa.chunked_array(a.chunks + b.chunks, type=a.type),
                "__d": pa.chunked_array(b.chunks + a.chunks, type=a.type)})
        e = edges_ds.select_columns([src, dst]).map_batches(
            both_dir, batch_format="pyarrow")
    else:
        e = edges_ds.select_columns([src, dst]).rename_columns(
            {src: "__s", dst: "__d"})
    e = e.groupby(["__s", "__d"]).aggregate(Count(alias_name="__n")) \
         .drop_columns(["__n"]).materialize()

    frontier = rd.from_arrow(pa.table({"entity": pa.array(sorted(set(seeds)))}))
    layers = [frontier.map_batches(
        lambda t: t.append_column("hops", pa.array([0] * len(t), pa.int64())),
        batch_format="pyarrow")]
    for h in range(1, k + 1):
        hop = h
        nxt = (semi_join_ds(e, frontier, key_col="entity", big_key="__s")
               .groupby("__d").aggregate(Count(alias_name="__n"))
               .drop_columns(["__n"])
               .rename_columns({"__d": "entity"}))
        layers.append(nxt.map_batches(
            lambda t, hop=hop: t.append_column(
                "hops", pa.array([hop] * len(t), pa.int64())),
            batch_format="pyarrow"))
        frontier = nxt
    out = layers[0]
    for l in layers[1:]:
        out = out.union(l)
    return out.groupby("entity").aggregate(Min("hops", alias_name="hops"))


def link_prediction(edges_ds, src: str = "src_entity",
                    dst: str = "dst_entity", k: int = 20,
                    num_buckets: int = 64, round_to: int = 6):
    """Link prediction over the undirected simple graph: for every NON-
    edge pair sharing at least one common neighbor, the common-neighbor
    count and the Adamic-Adar score sum(1/ln(deg(ctr))) over shared
    neighbors ctr (Adamic & Adar 2003); returns the global top-k by
    (aa desc, cn desc, node_a, node_b) with aa pre-rounded so the
    cutoff is float-order-stable against the SQL oracle.

    -> (node_a, node_b, cn, aa), node_a < node_b, k rows.

    Scale shape: mirrors `triangle_count` — distinct canonical edges,
    full (center, neighbor) fan-out grouped per center (a center's
    degree is its group size, so no separate degree join), vectorized
    triu pair emission, then one (pair) aggregate; existing edges are
    removed by the tiered anti semi-join and the top-k is one
    distributed sample-sort. Wedge volume is sum(deg^2) — salt or
    degree-cap hot centers at web scale (same note as triangle_count).
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from cosmos_ray.queries.relational import (
        bucketed_group_apply,
        semi_join_ds,
        topk,
    )

    edges = _distinct_canonical_edges(edges_ds, src, dst)

    def both(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        return pa.table({
            "ctr": pa.concat_arrays([a.combine_chunks().cast(pa.string()),
                                     b.combine_chunks().cast(pa.string())]),
            "nb": pa.concat_arrays([b.combine_chunks().cast(pa.string()),
                                    a.combine_chunks().cast(pa.string())]),
        })

    und = edges.map_batches(both, batch_format="pyarrow")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["nb"].to_numpy())
        d = len(v)  # distinct by construction (edges are distinct)
        if d < 2:
            return pd.DataFrame({"node_a": pd.Series([], dtype=str),
                                 "node_b": pd.Series([], dtype=str),
                                 "cn": pd.Series([], dtype=np.int64),
                                 "aa": pd.Series([], dtype=np.float64)})
        i, j = np.triu_indices(d, k=1)
        w = 1.0 / np.log(d)
        return pd.DataFrame({"node_a": v[i], "node_b": v[j],
                             "cn": np.ones(len(i), dtype=np.int64),
                             "aa": np.full(len(i), w)})

    w = bucketed_group_apply(und, ["ctr"], wedges, num_buckets=num_buckets)
    scores = (w.groupby(["node_a", "node_b"])
              .aggregate(Sum("cn", alias_name="cn"),
                         Sum("aa", alias_name="aa")))

    def finish(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t.column("node_a"), pa.string()),
            pc.cast(t.column("node_b"), pa.string()), ":")
        return pa.table({
            "node_a": t.column("node_a"),
            "node_b": t.column("node_b"),
            "cn": t.column("cn").cast(pa.int64()),
            "aa": pc.round(t.column("aa"), ndigits=round_to),
            "__k": key,
        })

    def edge_key(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.binary_join_element_wise(
            pc.cast(t.column("a"), pa.string()),
            pc.cast(t.column("b"), pa.string()), ":")})

    nonedge = semi_join_ds(
        scores.map_batches(finish, batch_format="pyarrow"),
        edges.map_batches(edge_key, batch_format="pyarrow"),
        key_col="k", big_key="__k", keep=False).drop_columns(["__k"])
    return topk(nonedge, [("aa", True), ("cn", True),
                          ("node_a", False), ("node_b", False)], k)


def triangle_count(edges_ds, src: str = "src_entity", dst: str = "dst_entity",
                   num_buckets: int = 64):
    """Global triangle count of the UNDIRECTED simple graph underlying
    the edge table (self-loops and duplicate/reverse edges collapsed).
    -> one-row Dataset (triangles).

    Algorithm (compact-forward with id orientation): canonicalize every
    edge to (a=min, b=max); per node a, emit the wedge (b, c) for each
    id-ordered pair of its forward neighbors; a wedge that is itself an
    edge closes exactly one triangle (a < b < c counts each triangle
    once). Wedge emission is vectorized ``triu_indices`` per group; the
    closing test is a string-keyed semi-join through the size-guarded
    broadcast / bloom / distributed-join tiers of ``semi_join_ds``.
    Skew note: wedge volume is sum(forward_deg^2) — at web scale,
    orienting by (degree, id) instead of id bounds it by arboricity;
    id-order is kept here for exact SQL-oracle parity."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from cosmos_ray.queries.relational import bucketed_group_apply, semi_join_ds

    edges = _distinct_canonical_edges(edges_ds, src, dst)

    def edge_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column("a"), pa.string()),
            pc.cast(t.column("b"), pa.string()), ":")
        return pa.table({"k": k})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # one true group (a single source node a) per call
        v = np.sort(g["b"].to_numpy())
        if len(v) < 2:
            return pd.DataFrame({"k": pd.Series([], dtype=str)})
        i, j = np.triu_indices(len(v), k=1)
        return pd.DataFrame({"k": np.char.add(np.char.add(
            v[i].astype(str), ":"), v[j].astype(str))})

    w = bucketed_group_apply(edges, ["a"], wedges, num_buckets=num_buckets)
    closed = semi_join_ds(w, edges.map_batches(edge_key, batch_format="pyarrow"),
                          key_col="k", big_key="k")

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    total = closed.map_batches(ones, batch_format="pyarrow").sum("n")
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "triangles": pa.array([int(total or 0)], pa.int64())}))


def k_core(edges_ds, k: int = 3, src: str = "src_entity",
           dst: str = "dst_entity", max_rounds: int = 64):
    """k-core decomposition membership (Seidman 1983): the maximal
    subgraph of the undirected SIMPLE graph (self-loops dropped,
    parallel/reverse edges collapsed) in which every node keeps degree
    >= k. -> (entity, degree) rows, degree measured INSIDE the core.

    Algorithm (distributed peeling): each round recomputes degrees over
    the surviving edge table (one groupby exchange over (node) rows),
    keeps nodes with degree >= k, and semi-joins the edge table on BOTH
    endpoints against the keep set (size-guarded broadcast via
    ``semi_join_ds``, distributed-join fallback past the cap — the node
    table is entity-vocabulary-sized, see module docstring). A round
    that deletes no edge certifies the fixed point; rounds needed equal
    the peel depth, bounded by ``max_rounds`` against a pathological
    chain. No stage materializes node or edge payloads on the driver."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import semi_join_ds

    edges = _distinct_canonical_edges(edges_ds, src, dst).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        return pa.table({"node": pa.chunked_array(
            list(a.chunks) + list(b.chunks), type=a.type)})

    n_edges = edges.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = (edges.map_batches(both_ends, batch_format="pyarrow")
               .groupby("node").aggregate(Count(alias_name="deg")))
        keep = deg.filter(lambda r: r["deg"] >= k).select_columns(["node"])
        nxt = semi_join_ds(edges, keep, key_col="node", big_key="a")
        nxt = semi_join_ds(nxt, keep, key_col="node", big_key="b").materialize()
        n_next = nxt.count()
        if n_next == n_edges:
            break
        edges, n_edges = nxt, n_next

    deg = (edges.map_batches(both_ends, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg")))
    return (deg.filter(lambda r: r["deg"] >= k)
            .rename_columns({"node": "entity", "deg": "degree"}))


# ----------------------------------------------------------------- HITS
def hits(edges_ds, src: str = "src_entity", dst: str = "dst_entity",
         weight: str = "weight", iters: int = 10,
         broadcast_cap: int = 2_000_000, ndigits: int = 6):
    """Kleinberg HITS (1999) hubs & authorities over the weighted
    directed graph -> (entity, hub, authority), both rounded to
    ``ndigits``. Per iteration: authority = L2-normalized in-weighted
    sum of hub scores, then hub = L2-normalized out-weighted sum of the
    NEW authority scores (the standard alternating half-steps, init
    hub = 1). Nodes with no in-edges get authority 0, no out-edges hub 0.

    Scale shape mirrors `pagerank`: node vector broadcast per iteration
    (`ray.put` once, read in every task), per-batch combiner partials
    over the streaming edge table; past ``broadcast_cap`` nodes the
    joined fallback runs each half-step as a distributed hash join +
    groupby (paths agree exactly — test-gated)."""
    from cosmos_ray.queries.relational import collect_small

    e = _edge_weights(edges_ds, src, dst, weight).materialize()
    nodes_tbl = collect_small(_distinct_entities(e), cap_rows=broadcast_cap)
    if nodes_tbl is None:
        return _hits_joined(e, iters, ndigits)
    node_ids = np.sort(nodes_tbl.column("entity").to_numpy(zero_copy_only=False))
    n = len(node_ids)
    if n == 0:
        return rd.from_arrow(pa.table({
            "entity": nodes_tbl.column("entity"),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64())}))
    ids_ref = ray.put(node_ids)

    def propagate(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """out[v] = sum over edges w(u->v) * vec[u] (or the transpose)."""
        v_ref = ray.put(vec)

        def contribs(t: pa.Table, _v=v_ref, _ids=ids_ref) -> pa.Table:
            ids, vv = ray.get(_ids), ray.get(_v)
            s = np.searchsorted(ids, t.column(from_col).to_numpy(zero_copy_only=False))
            c = vv[s] * t.column("w").to_numpy(zero_copy_only=False)
            d = t.column(to_col).to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(d, return_inverse=True)
            return pa.table({"k": pa.array(uniq.tolist()),
                             "c": pa.array(np.bincount(inv, weights=c),
                                           pa.float64())})

        agg = collect_small(
            e.map_batches(contribs, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("c", alias_name="c")),
            cap_rows=broadcast_cap)
        out = np.zeros(n, np.float64)
        if agg is not None and agg.num_rows:
            j = np.searchsorted(node_ids, agg.column("k").to_numpy(zero_copy_only=False))
            out[j] = agg.column("c").to_numpy(zero_copy_only=False)
        return out

    def l2(v: np.ndarray) -> np.ndarray:
        nrm = float(np.sqrt((v * v).sum()))
        return v / nrm if nrm > 0 else v

    h = np.ones(n, np.float64)
    a = np.zeros(n, np.float64)
    for _ in range(iters):
        a = l2(propagate(h, "src", "dst"))
        h = l2(propagate(a, "dst", "src"))
    return rd.from_arrow(pa.table({
        "entity": pa.array(node_ids.tolist()),
        "hub": pa.array(np.round(h, ndigits), pa.float64()),
        "authority": pa.array(np.round(a, ndigits), pa.float64()),
    }))


def _hits_joined(e, iters: int, ndigits: int):
    """Node table exceeds the broadcast cap: each half-step is one
    distributed hash join of the edge table against the score table
    plus a groupby-sum; the L2 norm is a one-scalar reduce. Agrees
    exactly with the broadcast path (test-gated)."""
    import ray as _ray

    from cosmos_ray.queries.relational import drop_empty_blocks

    num_partitions = max(2, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    e = drop_empty_blocks(e)
    nodes = drop_empty_blocks(_distinct_entities(e))

    def half_step(vec, from_col: str, to_col: str):
        raw = (e.join(vec, join_type="inner", num_partitions=num_partitions,
                      on=(from_col,), right_on=("entity",))
               .map_batches(
                   lambda t: pa.table({
                       "entity": t.column(to_col),
                       "v": pc.multiply(t.column("w"), t.column("v"))}),
                   batch_format="pyarrow")
               .groupby("entity").aggregate(Sum("v", alias_name="v")))
        raw = drop_empty_blocks(raw)
        ssq = raw.map_batches(
            lambda t: pa.table({"s": pa.array(
                [float(np.square(t.column("v").to_numpy(
                    zero_copy_only=False)).sum())], pa.float64())}),
            batch_format="pyarrow").sum("s") or 0.0
        nrm = float(np.sqrt(ssq)) or 1.0
        return raw.map_batches(
            lambda t, _n=nrm: pa.table({
                "entity": t.column("entity"),
                "v": pc.divide(t.column("v"), _n)}),
            batch_format="pyarrow").materialize()

    h = nodes.map_batches(
        lambda t: pa.table({"entity": t.column("entity"),
                            "v": pa.array(np.ones(len(t)), pa.float64())}),
        batch_format="pyarrow").materialize()
    a = None
    for _ in range(iters):
        a = half_step(h, "src", "dst")
        h = half_step(a, "dst", "src")

    out = nodes.join(h.rename_columns({"v": "hub"}), join_type="left_outer",
                     num_partitions=num_partitions, on=("entity",),
                     right_on=("entity",))
    # scrub between chained joins (empty join partitions emit
    # zero-column blocks, same artifact as groupby outputs)
    out = drop_empty_blocks(out)
    out = out.join(a.rename_columns({"v": "authority"}), join_type="left_outer",
                   num_partitions=num_partitions, on=("entity",),
                   right_on=("entity",))
    return out.map_batches(
        lambda t: pa.table({
            "entity": t.column("entity"),
            "hub": pa.array(np.round(np.nan_to_num(
                t.column("hub").to_numpy(zero_copy_only=False), nan=0.0),
                ndigits), pa.float64()),
            "authority": pa.array(np.round(np.nan_to_num(
                t.column("authority").to_numpy(zero_copy_only=False), nan=0.0),
                ndigits), pa.float64())}),
        batch_format="pyarrow")


def clustering_coefficient(edges_ds, src: str = "src_entity",
                           dst: str = "dst_entity", num_buckets: int = 64,
                           round_to: int = 6):
    """Local clustering coefficient per node (Watts & Strogatz 1998)
    over the undirected SIMPLE graph: cc(v) = 2·T(v) / (d(v)·(d(v)−1)),
    T(v) = triangles containing v, d(v) = distinct-neighbor degree;
    cc = 0 when d < 2. -> (entity, degree, triangles, cc), node ids
    canonicalized to strings.

    Shape: `triangle_count`'s compact-forward wedge machinery, but the
    closed wedge RETAINS its (a, b, c) members so each triangle
    (a<b<c) explodes to its three nodes; per-node triangle counts then
    meet degrees in one size-guarded left join. Same skew note as
    triangle_count: wedge volume is sum(forward_deg²)."""
    from ray.data.aggregate import Count, Sum

    from cosmos_ray.queries.relational import (
        bucketed_group_apply,
        left_join_or_broadcast,
        semi_join_ds,
    )

    edges = _distinct_canonical_edges(edges_ds, src, dst,
                                      cast_string=True).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        return pa.table({"node": pa.chunked_array(
            list(a.chunks) + list(b.chunks), type=a.type)})

    deg = (edges.map_batches(both_ends, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="degree")))

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["b"].to_numpy())
        if len(v) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=str),
                                 "b": pd.Series([], dtype=str),
                                 "c": pd.Series([], dtype=str),
                                 "k": pd.Series([], dtype=str)})
        i, j = np.triu_indices(len(v), k=1)
        return pd.DataFrame({
            "a": np.repeat(g["a"].iloc[0], len(i)),
            "b": v[i], "c": v[j],
            "k": np.char.add(np.char.add(v[i].astype(str), ":"),
                             v[j].astype(str))})

    def edge_key(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.binary_join_element_wise(
            t.column("a"), t.column("b"), ":")})

    w = bucketed_group_apply(edges, ["a"], wedges, num_buckets=num_buckets)
    closed = semi_join_ds(w, edges.map_batches(edge_key, batch_format="pyarrow"),
                          key_col="k", big_key="k")

    def tri_nodes(t: pa.Table) -> pa.Table:
        cols = [t.column(c).cast(pa.string()).combine_chunks()
                for c in ("a", "b", "c")]
        node = pa.concat_arrays(
            [c if isinstance(c, pa.Array) else c.combine_chunks()
             for c in cols])
        return pa.table({"node": node,
                         "t": pa.array(np.ones(len(node), np.int64))})

    tcnt = (closed.map_batches(tri_nodes, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("t", alias_name="t")))

    out = left_join_or_broadcast(deg, tcnt, key="node", add_cols=["t"],
                                 fill=0)

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("degree").to_numpy(zero_copy_only=False).astype(np.float64)
        tri = t.column("t").to_numpy(zero_copy_only=False).astype(np.float64)
        cc = np.where(d >= 2, 2.0 * tri / np.where(d >= 2, d * (d - 1), 1.0),
                      0.0)
        return pa.table({
            "entity": t.column("node"),
            "degree": t.column("degree").cast(pa.int64()),
            "triangles": pa.array(tri.astype(np.int64)),
            "cc": pa.array(np.round(cc, round_to), pa.float64())})

    return out.map_batches(finish, batch_format="pyarrow")


def degree_assortativity(edges_ds, src: str = "src_entity",
                         dst: str = "dst_entity", round_to: int = 6):
    """Degree assortativity coefficient (Newman 2002) of the undirected
    simple graph: Pearson correlation of (deg(u), deg(v)) over the
    directed reading of every undirected edge — do high-degree entities
    attach to each other (r > 0) or to leaves (r < 0)?
    -> one row (n_edges, assortativity), n_edges = directed count.

    Shape: distinct-canonical edges, one node-sized degree table joined
    onto both endpoints through the size-guarded broadcast tiers, then
    six integer-exact moment partials per batch (the `grouped_corr`
    exchange) — the closed form is bit-identical to the SQL replay
    before the 6dp round because degree sums are integer-valued."""
    from ray.data.aggregate import Count, Sum

    from cosmos_ray.queries.relational import left_join_or_broadcast

    edges = _distinct_canonical_edges(edges_ds, src, dst,
                                      cast_string=True).materialize()

    def both_dir(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        return pa.table({
            "u": pa.chunked_array(list(a.chunks) + list(b.chunks),
                                  type=a.type),
            "v": pa.chunked_array(list(b.chunks) + list(a.chunks),
                                  type=a.type)})

    und = edges.map_batches(both_dir, batch_format="pyarrow").materialize()
    deg = (und.groupby("u").aggregate(Count(alias_name="d"))
           .rename_columns({"u": "node"}))
    e = left_join_or_broadcast(und, deg.rename_columns({"d": "du"}),
                               key="node", add_cols=["du"], big_key="u")
    e = left_join_or_broadcast(e, deg.rename_columns({"d": "dv"}),
                               key="node", add_cols=["dv"], big_key="v")

    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("du").to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column("dv").to_numpy(zero_copy_only=False).astype(np.float64)
        vals = [float(len(x)), x.sum(), y.sum(), (x * x).sum(),
                (y * y).sum(), (x * y).sum()]
        return pa.table({c: pa.array([v]) for c, v in zip(cols, vals)})

    sums = e.map_batches(moments, batch_format="pyarrow").sum(cols)
    n, sx, sy, sxx, syy, sxy = (sums[f"sum({c})"] for c in cols)
    denom = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    r = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([int(n)], pa.int64()),
        "assortativity": pa.array([round(float(r), round_to)],
                                  pa.float64())}))


def reciprocity(edges_ds, src: str = "src_entity", dst: str = "dst_entity",
                round_to: int = 6):
    """Reciprocity of the directed simple graph: the fraction of
    distinct non-loop edges (u, v) whose reverse (v, u) also exists —
    how symmetric the fact graph is. Distinct-edge exchange, then one
    string-keyed semi-join of the edge list against its own reversed
    keys (size-guarded broadcast / bloom / distributed tiers).
    -> one row (n_edges, n_reciprocal, reciprocity)."""
    import ray.data as _rd
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import semi_join_ds

    def prep(t: pa.Table) -> pa.Table:
        s = t.column(src).cast(pa.string())
        d = t.column(dst).cast(pa.string())
        keep = pc.not_equal(s, d)
        return pa.table({"s": s, "d": d}).filter(keep)

    edges = (edges_ds.select_columns([src, dst])
             .map_batches(prep, batch_format="pyarrow")
             .groupby(["s", "d"]).aggregate(Count(alias_name="__n"))
             .drop_columns(["__n"]).materialize())

    def fwd_key(t: pa.Table) -> pa.Table:
        return t.append_column("k", pc.binary_join_element_wise(
            t.column("s"), t.column("d"), ":"))

    def rev_key(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.binary_join_element_wise(
            t.column("d"), t.column("s"), ":")})

    total = edges.count()
    recip = semi_join_ds(
        edges.map_batches(fwd_key, batch_format="pyarrow"),
        edges.map_batches(rev_key, batch_format="pyarrow"),
        key_col="k", big_key="k").count()
    return _rd.from_arrow(pa.table({
        "n_edges": pa.array([total], pa.int64()),
        "n_reciprocal": pa.array([recip], pa.int64()),
        "reciprocity": pa.array(
            [round(recip / total, round_to) if total else 0.0],
            pa.float64())}))


# ------------------------------------------------ betweenness (sampled)
def _undirected_expanded(edges_ds, src: str, dst: str):
    """Materialized (src, dst) table holding BOTH directions of the
    distinct simple undirected graph — the shared BFS substrate of
    `betweenness_sampled` / `closeness_sampled`."""
    e = _distinct_canonical_edges(edges_ds, src, dst)

    def both(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        ca = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        cb = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        return pa.table({"src": pa.concat_arrays([ca, cb]),
                         "dst": pa.concat_arrays([cb, ca])})

    return e.map_batches(both, batch_format="pyarrow").materialize()


def _smallest_k_seeds(eb, k: int):
    """Deterministic pivot sample — the k smallest node ids of the
    expanded edge table — plus the node id arrow type."""
    from ray.data.aggregate import Min as _Min

    from cosmos_ray.queries.relational import topk

    nodes = (eb.select_columns(["src"])
             .groupby("src").aggregate(_Min("src", alias_name="__m"))
             .select_columns(["src"]))
    seeds = [r["src"] for r in topk(nodes, [("src", False)], k).take_all()]
    node_type = pa.array(seeds).type if seeds else pa.string()
    return seeds, node_type


def bfs_tree(edges_ds, max_depth: int = 4,
             src: str = "src_entity", dst: str = "dst_entity"):
    """Shortest-path TREE from the smallest node id: (entity, dist,
    parent) with parent = the lexicographically smallest predecessor on
    a shortest path — the structure a KB service walks to answer 'how
    are A and B related?' (path explanation; reference analog: the
    per-entity neighborhood expansions Cosmos serves from its ES join
    index, `retrieval/elastic_retriever.py:74-90`).

    Scale shape: the closeness/betweenness frontier convention — each
    hop is one hash join of the node-bounded undirected edge table
    against the frontier, an anti-join against the seen set, and a
    Min(parent) groupby; no driver pull at any size."""
    from ray.data.aggregate import Min as _Min

    from cosmos_ray.queries.relational import drop_empty_blocks

    num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    eb = _undirected_expanded(edges_ds, src, dst)
    seeds, node_type = _smallest_k_seeds(eb, 1)
    if not seeds:
        return rd.from_arrow(pa.table({
            "entity": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
            "parent": pa.array([], pa.string())}))
    root = seeds[0]
    levels = [rd.from_arrow(pa.table({
        "entity": pa.array([root], node_type),
        "dist": pa.array([0], pa.int64()),
        "parent": pa.array([None], node_type)})).materialize()]
    seen = levels[0].select_columns(["entity"])
    for d in range(1, max_depth + 1):
        cand = drop_empty_blocks(
            eb.join(levels[-1].select_columns(["entity"]),
                    join_type="inner", num_partitions=num_partitions,
                    on=("src",), right_on=("entity",))
            .map_batches(lambda t: pa.table({
                "entity": t.column("dst"),
                "parent": t.column("src")}), batch_format="pyarrow"))
        fresh = drop_empty_blocks(
            cand.join(
                seen.map_batches(lambda t: pa.table({
                    "__e": t.column("entity"),
                    "__v": pa.array(np.ones(len(t), np.int64))}),
                    batch_format="pyarrow"),
                join_type="left_outer", num_partitions=num_partitions,
                on=("entity",), right_on=("__e",))
            .map_batches(lambda t: t.filter(
                pc.is_null(t.column("__v")))
                .select(["entity", "parent"]), batch_format="pyarrow"))
        lvl = drop_empty_blocks(
            fresh.groupby("entity")
            .aggregate(_Min("parent", alias_name="parent"))
            .map_batches(lambda t, dd=d: t.append_column(
                "dist", pa.array(np.full(len(t), dd, np.int64))),
                batch_format="pyarrow")).materialize()
        if not lvl.count():
            break
        levels.append(lvl.select_columns(["entity", "dist", "parent"])
                      .materialize())
        seen = drop_empty_blocks(
            seen.union(lvl.select_columns(["entity"]))).materialize()
    acc = levels[0]
    for lv in levels[1:]:
        acc = acc.union(lv)
    return acc


def betweenness_sampled(edges_ds, k_sources: int = 4, max_depth: int = 6,
                        src: str = "src_entity", dst: str = "dst_entity",
                        topn: int = 20, round_to: int = 6):
    """Approximate betweenness centrality via sampled-source Brandes
    (unweighted): the exact two-phase Brandes computation — forward BFS
    building per-level (seed, node, sigma) shortest-path counts, then
    backward dependency accumulation delta(v) += sigma_v/sigma_w *
    (1 + delta_w) over DAG edges (dist_w = dist_v + 1) — from the
    ``k_sources`` smallest node ids (deterministic pivot sample),
    reporting the top ``topn`` nodes by accumulated dependency
    (undirected halving applied). Scores are the EXACT betweenness
    restricted to those sources; sampling error is the standard
    Brandes-pivot tradeoff.

    Scale shape: ALL seeds advance together in one composite-key
    (seed, node) frontier, so the number of distributed rounds is
    O(diameter), independent of k — each round is a hash join of the
    node-bounded edge list against the frontier plus a groupby-sum
    (the same round structure as `weighted_distances` / `k_core`); no
    driver pull of nodes or edges at any size. Per-level tables are
    materialized (k x node bounded). -> (entity, betweenness), topn
    rows, (score desc, entity) order."""
    import ray as _ray
    from ray.data.aggregate import Min as _Min, Sum as _Sum

    from cosmos_ray.queries.relational import drop_empty_blocks, topk

    num_partitions = max(2, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    eb = _undirected_expanded(edges_ds, src, dst)
    seeds, node_type = _smallest_k_seeds(eb, k_sources)
    empty = rd.from_arrow(pa.table({
        "entity": pa.array([], node_type),
        "betweenness": pa.array([], pa.float64())}))
    if not seeds:
        return empty

    def strip_seed_rows(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("entity"), t.column("seed"))
        return t.filter(keep).select(["entity", "delta"])

    # forward multi-source BFS: one frontier keyed (seed, entity)
    levels = [rd.from_arrow(pa.table({
        "seed": pa.array(seeds, node_type),
        "entity": pa.array(seeds, node_type),
        "sigma": pa.array([1.0] * len(seeds), pa.float64()),
    })).materialize()]
    seen = levels[0]
    for _ in range(max_depth):
        cand = drop_empty_blocks(
            eb.join(levels[-1], join_type="inner",
                    num_partitions=num_partitions,
                    on=("src",), right_on=("entity",))
            .map_batches(lambda t: pa.table({
                "seed": t.column("seed"),
                "entity": t.column("dst"),
                "sigma": t.column("sigma")}),
                batch_format="pyarrow"))
        nxt = (cand.join(
            seen.map_batches(lambda t: pa.table({
                "__vs": t.column("seed"),
                "__ve": t.column("entity"),
                "__v": pa.array(np.ones(len(t), np.int64))}),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=num_partitions,
            on=("seed", "entity"), right_on=("__vs", "__ve"))
            .map_batches(lambda t: pa.table({
                "seed": t.column("seed"),
                "entity": t.column("entity"),
                "sigma": t.column("sigma")}).filter(
                    pc.is_null(t.column("__v"))),
                batch_format="pyarrow"))
        lvl = drop_empty_blocks(
            nxt.groupby(["seed", "entity"])
            .aggregate(_Sum("sigma", alias_name="sigma"))).materialize()
        if not lvl.count():
            break
        levels.append(lvl)
        seen = drop_empty_blocks(seen.union(lvl)).materialize()

    # backward accumulation: deepest level starts at delta = 0
    deltas = []
    delta = levels[-1].map_batches(lambda t: pa.table({
        "seed": t.column("seed"),
        "entity": t.column("entity"),
        "sigma": t.column("sigma"),
        "delta": pa.array(np.zeros(len(t), np.float64))}),
        batch_format="pyarrow").materialize()
    if len(levels) > 1 and delta.count():
        # deepest-level nodes carry zero dependency but must still
        # appear in the output
        deltas.append(delta.map_batches(strip_seed_rows,
                                        batch_format="pyarrow"))
    for d in range(len(levels) - 1, 0, -1):
        # contributions flow across DAG edges (v at depth d-1, w at d):
        # join edges against the deeper level's (sigma_w, delta_w), then
        # against the shallower level's sigma_v — both per (seed, node)
        up_l = drop_empty_blocks(
            eb.join(delta.map_batches(lambda t: pa.table({
                    "seed": t.column("seed"),
                    "entity": t.column("entity"),
                    "__sw": t.column("sigma"),
                    "__dw": t.column("delta")}),
                    batch_format="pyarrow"),
                join_type="inner", num_partitions=num_partitions,
                on=("dst",), right_on=("entity",))
            .map_batches(lambda t: pa.table({
                "seed": t.column("seed"),
                "entity": t.column("src"),
                "__sw": t.column("__sw"),
                "__dw": t.column("__dw")}),
                batch_format="pyarrow"))
        up = up_l.join(
            levels[d - 1].map_batches(lambda t: pa.table({
                "__ls": t.column("seed"),
                "__le": t.column("entity"),
                "sigma": t.column("sigma")}),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("seed", "entity"), right_on=("__ls", "__le"))
        contrib = up.map_batches(lambda t: pa.table({
            "seed": t.column("seed"),
            "entity": t.column("entity"),
            "__c": pc.multiply(
                pc.divide(pc.cast(t.column("sigma"), pa.float64()),
                          t.column("__sw")),
                pc.add(t.column("__dw"), pa.scalar(1.0)))}),
            batch_format="pyarrow")
        agg = drop_empty_blocks(
            contrib.groupby(["seed", "entity"])
            .aggregate(_Sum("__c", alias_name="delta")))
        delta = drop_empty_blocks(
            levels[d - 1].join(
                agg.map_batches(lambda t: pa.table({
                    "__as": t.column("seed"),
                    "__ae": t.column("entity"),
                    "delta": t.column("delta")}),
                    batch_format="pyarrow"),
                join_type="left_outer", num_partitions=num_partitions,
                on=("seed", "entity"), right_on=("__as", "__ae"))
            .map_batches(lambda t: pa.table({
                "seed": t.column("seed"),
                "entity": t.column("entity"),
                "sigma": t.column("sigma"),
                "delta": pc.fill_null(t.column("delta"), 0.0)}),
                batch_format="pyarrow")).materialize()
        if delta.count():
            deltas.append(delta.map_batches(strip_seed_rows,
                                            batch_format="pyarrow"))

    if not deltas:
        return empty
    acc = deltas[0]
    for dd in deltas[1:]:
        acc = acc.union(dd)
    scored = (acc.groupby("entity")
              .aggregate(_Sum("delta", alias_name="__b"))
              .map_batches(lambda t: pa.table({
                  "entity": t.column("entity"),
                  "betweenness": pc.round(
                      pc.divide(t.column("__b"), pa.scalar(2.0)),
                      ndigits=round_to)}), batch_format="pyarrow"))
    return topk(scored, [("betweenness", True), ("entity", False)], topn)


# ------------------------------------------------- closeness centrality
def closeness_sampled(edges_ds, k_sources: int = 4, max_depth: int = 4,
                      src: str = "src_entity", dst: str = "dst_entity"):
    """Sampled harmonic closeness centrality: for each of the
    ``k_sources`` smallest node ids (the deterministic pivot sample
    shared with `betweenness_sampled`), C(s) = sum over nodes v != s
    reachable within ``max_depth`` unweighted hops of 1/d(s, v), plus
    the reach count. Reference analog: the entity-importance passes the
    Cosmos ES graph serves (`elastic_retriever.py:143-159` adjacency
    consumption); harmonic closeness is the textbook disconnected-safe
    closeness.

    Exactness contract: per-level reciprocal contributions accumulate as
    INTEGERS scaled by lcm(1..max_depth) (each level-h node contributes
    lcm // h) and the scale is divided out ONCE at the end — one float64
    division of the same integer on both the engine and the SQL-oracle
    side, so hashes match bit-for-bit.

    Scale shape: ALL seeds advance in one composite-key (seed, entity)
    BFS frontier — O(max_depth) rounds independent of k, each one hash
    join of the node-bounded undirected edge list against the frontier
    plus an anti-join against the seen set (the `betweenness_sampled`
    forward phase without sigma); per-level counts cross as k rows.
    -> (entity, n_reached, closeness), ordered by entity."""
    import math

    from cosmos_ray.queries.relational import drop_empty_blocks

    num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    eb = _undirected_expanded(edges_ds, src, dst)
    seeds, node_type = _smallest_k_seeds(eb, k_sources)
    if not seeds:
        return rd.from_arrow(pa.table({
            "entity": pa.array([], node_type),
            "n_reached": pa.array([], pa.int64()),
            "closeness": pa.array([], pa.float64())}))

    lcm = math.lcm(*range(1, max_depth + 1))
    frontier = rd.from_arrow(pa.table({
        "seed": pa.array(seeds, node_type),
        "entity": pa.array(seeds, node_type)})).materialize()
    seen = frontier
    # per-seed accumulators (k-bounded driver state, like the seed list)
    n_reached = {s: 0 for s in seeds}
    scaled = {s: 0 for s in seeds}
    for h in range(1, max_depth + 1):
        cand = drop_empty_blocks(
            eb.join(frontier, join_type="inner",
                    num_partitions=num_partitions,
                    on=("src",), right_on=("entity",))
            .map_batches(lambda t: pa.table({
                "seed": t.column("seed"),
                "entity": t.column("dst")}), batch_format="pyarrow")
            .groupby(["seed", "entity"])
            .aggregate(Min("seed", alias_name="__m"))
            .select_columns(["seed", "entity"]))
        nxt = (cand.join(
            seen.map_batches(lambda t: pa.table({
                "__vs": t.column("seed"),
                "__ve": t.column("entity"),
                "__v": pa.array(np.ones(len(t), np.int64))}),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=num_partitions,
            on=("seed", "entity"), right_on=("__vs", "__ve"))
            .map_batches(lambda t: pa.table({
                "seed": t.column("seed"),
                "entity": t.column("entity")}).filter(
                    pc.is_null(t.column("__v"))),
                batch_format="pyarrow"))
        frontier = drop_empty_blocks(nxt).materialize()
        if not frontier.count():
            break
        from ray.data.aggregate import Count as _Count
        lvl_counts = (frontier.groupby("seed")
                      .aggregate(_Count(alias_name="__n")).take_all())
        for r in lvl_counts:  # k rows
            n_reached[r["seed"]] += int(r["__n"])
            scaled[r["seed"]] += int(r["__n"]) * (lcm // h)
        seen = drop_empty_blocks(seen.union(frontier)).materialize()
    return rd.from_arrow(pa.table({
        "entity": pa.array(seeds, node_type),
        "n_reached": pa.array([n_reached[s] for s in seeds], pa.int64()),
        "closeness": pa.array([scaled[s] / float(lcm) for s in seeds],
                              pa.float64())}).sort_by("entity"))


def label_propagation(edges_ds, rounds: int = 4,
                      src: str = "src_entity", dst: str = "dst_entity",
                      num_buckets: int = 64):
    """Deterministic SYNCHRONOUS label-propagation community detection
    (Raghavan et al. 2007, made replayable): labels start as node ids;
    each round every node adopts the label most frequent among its
    neighbors, ties to the smallest label; after a FIXED number of
    rounds the label is the community id. Fixing the rounds and the
    tie rule removes classic LPA's update-order nondeterminism, so the
    SQL oracle can unroll the rounds exactly (the kg_shortest /
    kg_kcore CTE pattern).

    Scale shape per round: one hash-join of the (node, label) table —
    entity-vocabulary-sized, the KB bound — against the expanded edge
    table, one (node, label) count groupby, then the per-batch argmax
    combiner (at most one candidate row per (batch, node) crosses the
    final exchange); labels materialize per round so the lazy chain
    does not recompute across rounds.

    -> (entity, community)"""
    from ray.data.aggregate import Count as _Count

    from cosmos_ray.queries.relational import (_join_partitions,
                                               bucketed_group_apply)

    eb = _undirected_expanded(edges_ds, src, dst)
    labels = (eb.select_columns(["src"])
              .groupby("src").aggregate(_Count(alias_name="__n"))
              .map_batches(lambda t: pa.table({"node": t.column("src"),
                                               "lbl": t.column("src")}),
                           batch_format="pyarrow")
              .materialize())

    def partial_argmax(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "lbl"],
                                       ascending=[False, True],
                                       kind="stable")
        # strip the pandas metadata dict: unhashable under pyarrow 16,
        # defeats Ray's block-schema dedup in the downstream join
        return pa.Table.from_pandas(
            df.drop_duplicates(subset=["node"], keep="first"),
            preserve_index=False).replace_schema_metadata(None)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "lbl"], ascending=[False, True],
                          kind="stable")
        return g.drop_duplicates(subset=["node"], keep="first")[
            ["node", "lbl"]]

    for _ in range(rounds):
        counts = (eb.join(labels, join_type="inner",
                          num_partitions=_join_partitions(),
                          on=("dst",), right_on=("node",))
                  .map_batches(lambda t: pa.table({
                      "node": t.column("src"), "lbl": t.column("lbl")}),
                      batch_format="pyarrow")
                  .groupby(["node", "lbl"])
                  .aggregate(_Count(alias_name="n")))
        labels = (bucketed_group_apply(
            counts.map_batches(partial_argmax, batch_format="pyarrow"),
            ["node"], finish, num_buckets=num_buckets)
            .map_batches(lambda t: t.replace_schema_metadata(None),
                         batch_format="pyarrow")
            .materialize())

    return labels.map_batches(
        lambda t: pa.table({"entity": t.column("node"),
                            "community": t.column("lbl")}),
        batch_format="pyarrow")


def modularity(edges_ds, labels_ds, src: str = "src_entity",
               dst: str = "dst_entity", entity_col: str = "entity",
               label_col: str = "community"):
    """Newman modularity of a node partition over the distinct simple
    undirected graph (Newman & Girvan 2004): per community c,

        Q_c = e_c / m - (d_c / 2m)^2

    with e_c the intra-community edge count, d_c the sum of member
    degrees and m the total edge count; sum(Q_c) is the usual global
    score. The community-quality companion of `label_propagation` (the
    reference consumes its entity graph whole; scoring the partition is
    the standard follow-up pass).

    Scale shape: the label table is entity-vocabulary-sized (the KB
    bound), so both endpoint labelings ride `join_or_broadcast` (the
    canonical edge set — corpus-sized — never moves when the labels
    broadcast); e_c / d_c reduce via per-batch value-count combiners, so
    only (community, partial) rows cross the one groupby exchange; m is
    a count(). Float determinism: Q_c is two IEEE divisions and one
    multiply over exact int64 counts, computed identically in the SQL
    oracle (no pow(), no reassociation).

    -> (community, intra_edges, degree_sum, modularity) sorted by
    community."""
    from ray.data.aggregate import Sum as _Sum

    from cosmos_ray.queries.relational import join_or_broadcast

    e = _distinct_canonical_edges(edges_ds, src, dst).materialize()
    m = e.count()
    if m == 0:
        sch = labels_ds.schema()
        lbl_t = dict(zip(sch.names, sch.types))[label_col]
        return rd.from_arrow(pa.table({
            "community": pa.array([], lbl_t),
            "intra_edges": pa.array([], pa.int64()),
            "degree_sum": pa.array([], pa.int64()),
            "modularity": pa.array([], pa.float64())}))

    la = labels_ds.map_batches(
        lambda t: pa.table({"a": t.column(entity_col),
                            "__ca": t.column(label_col)}),
        batch_format="pyarrow")
    lb = labels_ds.map_batches(
        lambda t: pa.table({"b": t.column(entity_col),
                            "__cb": t.column(label_col)}),
        batch_format="pyarrow")
    ej = join_or_broadcast(
        join_or_broadcast(e, la, key="a", add_cols=["__ca"]),
        lb, key="b", add_cols=["__cb"])

    def partial(t: pa.Table) -> pa.Table:
        ca = t.column("__ca").combine_chunks() \
            if isinstance(t.column("__ca"), pa.ChunkedArray) else t.column("__ca")
        cb = t.column("__cb").combine_chunks() \
            if isinstance(t.column("__cb"), pa.ChunkedArray) else t.column("__cb")
        # every canonical edge adds 1 to deg(a) and 1 to deg(b)
        deg = pa.concat_arrays([ca, cb]).value_counts()
        intra = ca.filter(pc.equal(ca, cb)).value_counts()
        dv = deg.field("values")
        iv = intra.field("values")
        return pa.table({
            "community": pa.concat_arrays([dv, iv]),
            "__deg": pa.concat_arrays([
                deg.field("counts").cast(pa.int64()),
                pa.nulls(len(iv), pa.int64()).fill_null(0)]),
            "__intra": pa.concat_arrays([
                pa.nulls(len(dv), pa.int64()).fill_null(0),
                intra.field("counts").cast(pa.int64())])})

    sums = (ej.map_batches(partial, batch_format="pyarrow")
            .groupby("community")
            .aggregate(_Sum("__intra", alias_name="intra_edges"),
                       _Sum("__deg", alias_name="degree_sum")))

    def score(t: pa.Table) -> pa.Table:
        ec = t.column("intra_edges").to_numpy(zero_copy_only=False).astype(np.float64)
        dc = t.column("degree_sum").to_numpy(zero_copy_only=False).astype(np.float64)
        half = dc / (2.0 * float(m))
        return pa.table({
            "community": t.column("community"),
            "intra_edges": t.column("intra_edges").cast(pa.int64()),
            "degree_sum": t.column("degree_sum").cast(pa.int64()),
            "modularity": pa.array(ec / float(m) - half * half,
                                   pa.float64())})

    return sums.map_batches(score, batch_format="pyarrow").sort("community")
