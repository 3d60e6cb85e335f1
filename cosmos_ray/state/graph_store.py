"""At-rest adjacency store — the GRAPH member of the at-rest layout
family (`sorted_store` zone maps, `zorder` Morton boxes, `bloom_index`
point lookups, `similarity.build_ivf_index` cells): the entity
adjacency written hive-partitioned by a stable hash bucket of
``src_entity`` (``bucket=K/``), so neighbor reads and k-hop expansions
``read_parquet`` ONLY the touched buckets — vertex-partitioned edge
storage, the disk layout a disaggregated graph service uses so a
lookup never scans the full edge list (reference analog: Cosmos serves
per-entity neighborhoods from its ES join index,
`retrieval/elastic_retriever.py:74-90`; here the index is parquet
partition pruning instead of a search cluster).

Scale shape: the write is one streaming pass (batch-local bucket
tagging, no exchange beyond the partitioned writer); a k-hop expansion
reads at most |touched buckets| directories per hop and its frontier
state is node-bounded (the BFS frontier convention shared with
`graph.closeness_sampled`). The bucket count is recorded in a manifest
so readers hash with the writer's modulus.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

N_BUCKETS = 32

# At-rest bucket hash: the repo's md5 upper-64 little-endian convention
# (functions/sketch.py) — library-version-independent, unlike
# pd.util.hash_array, so a store written today prunes correctly under
# any future pandas.  The manifest records this identifier and readers
# verify it before pruning.
HASH_ID = "md5-upper64-le"


def _buckets_of(names, num_buckets: int) -> np.ndarray:
    """Stable bucket per entity id (md5 upper-64, little-endian — the
    durable at-rest convention).  Hashes each DISTINCT name once;
    adjacency batches repeat src entities heavily."""
    arr = np.asarray(names, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode("utf-8")).digest()[:8],
                        "little") % num_buckets for v in uniq),
        dtype=np.int64, count=len(uniq))
    return hs[inv]


def _read_manifest(root: str) -> dict:
    with open(os.path.join(root, "manifest.json")) as f:
        manifest = json.load(f)
    got = manifest.get("hash")
    if got != HASH_ID:
        # a MISSING key means a legacy store bucketed by the old
        # pandas-siphash writer — pruning it with the md5 convention
        # would silently return wrong neighbor sets, so reject it too
        raise ValueError(
            f"adjacency store at {root} was bucketed with hash "
            f"'{got or 'pre-md5 legacy (no hash key)'}' but this reader "
            f"uses '{HASH_ID}'; rebuild the store")
    return manifest


def write_adjacency_store(adj_ds, out_dir: str,
                          num_buckets: int = N_BUCKETS) -> dict:
    """Write (src_entity, pred, dst_entity[, weight]) hive-partitioned
    by src bucket; returns the manifest (also persisted)."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["bucket"] = _buckets_of(out["src_entity"].to_numpy(),
                                    num_buckets)
        return out

    os.makedirs(out_dir, exist_ok=True)
    adj_ds.map_batches(tag, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["bucket"])
    manifest = {"num_buckets": num_buckets, "hash": HASH_ID}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def _bucket_paths(root: str, buckets) -> list[str]:
    return [p for b in sorted(set(int(x) for x in buckets))
            for p in glob.glob(os.path.join(root, f"bucket={b}",
                                            "*.parquet"))]


def neighbors(root: str, entity: str):
    """Out-neighbors of one entity: opens ONLY its bucket's files."""
    import pyarrow.compute as pc

    nb = _read_manifest(root)["num_buckets"]
    paths = _bucket_paths(root, _buckets_of([entity], nb))
    if not paths:
        return rd.from_arrow(pa.table({
            "pred": pa.array([], pa.string()),
            "dst_entity": pa.array([], pa.string())}))
    ds = rd.read_parquet(paths, columns=["src_entity", "pred",
                                         "dst_entity"])
    return ds.map_batches(
        lambda t, e=entity: t.filter(
            pc.equal(t.column("src_entity"), e))
        .select(["pred", "dst_entity"]),
        batch_format="pyarrow")


def khop(root: str, seeds: list[str], hops: int = 2,
         max_frontier: int = 1_000_000) -> pa.Table:
    """BFS levels from ``seeds`` over the store: (entity, hop) with hop
    = first-reached distance (0 = seed). Each hop reads ONLY the
    frontier's buckets; frontier/seen state is node-bounded and
    guarded: a frontier past ``max_frontier`` raises instead of
    silently pulling an unbounded neighborhood to the driver (the
    scale-guard convention — service k-hop lookups are degree-bounded;
    whole-graph traversals belong to `graph.connected_components`)."""
    import pyarrow.compute as pc

    nb = _read_manifest(root)["num_buckets"]
    seen: dict[str, int] = {s: 0 for s in seeds}
    frontier = sorted(set(seeds))
    for h in range(1, hops + 1):
        paths = _bucket_paths(root, _buckets_of(frontier, nb))
        if not paths:
            break
        fr = frozenset(frontier)
        ds = rd.read_parquet(paths, columns=["src_entity", "dst_entity"])
        dsts = (ds.map_batches(
            lambda t, f=fr: pa.table({"dst_entity": t.column(
                "dst_entity").filter(pc.is_in(
                    t.column("src_entity"),
                    value_set=pa.array(sorted(f), pa.string())))}),
            batch_format="pyarrow")
            .groupby("dst_entity").count())
        rows = dsts.limit(max_frontier + 1).take_all()
        if len(rows) > max_frontier:
            raise ValueError(
                f"khop frontier exceeds max_frontier={max_frontier}; "
                "use graph.connected_components for whole-graph reach")
        nxt = sorted(d for d in (r["dst_entity"] for r in rows)
                     if d not in seen)
        for d in nxt:
            seen[d] = h
        frontier = nxt
        if not frontier:
            break
    ents = sorted(seen)
    return pa.table({"entity": pa.array(ents, pa.string()),
                     "hop": pa.array([seen[e] for e in ents],
                                     pa.int64())})
