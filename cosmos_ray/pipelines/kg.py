"""The flagship KG-construction pipeline, composed Ray-Data-first.

    pages ──extract──▶ extracted(+blocks, html dropped)
          ──keep_latest(url)──▶            [shuffle #1: url]
          ├─▶ documents
          ├─▶ dead_letter
          └─explode──classify(actor pool)──▶ segments
                 └─SVO──▶ triples_raw ──link(actor pool, broadcast KB)──▶ linked
                        ├─▶ triples   (groupby url,s,p,o)   [shuffle #2]
                        ├─▶ adjacency (groupby s_id,p,o_id) [shuffle #3]
                        └─▶ entities  (groupby canonical_id)[shuffle #4]

Branch points (extracted, linked) are ``materialize()``-ed: Ray Data
re-executes lineage per consumer otherwise, and both intermediates are
post-explosion-narrow (html already dropped, triples are tiny vs pages).
At 100 TB the pipeline runs per input partition (see
``cosmos_ray.state.manifest``) so each materialization is bounded by
partition size, and shuffles #2-#4 move combiner partials only
(`stages/canonicalize.py`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa

import ray.data

from cosmos_ray.sources.entity_dict import build_entity_dict
from cosmos_ray.stages import canonicalize, extract, link, segment, triples


@dataclass
class KgDatasets:
    documents: "ray.data.Dataset"
    dead_letter: "ray.data.Dataset"
    segments: "ray.data.Dataset"
    linked: "ray.data.Dataset"
    triples: "ray.data.Dataset"
    entities: "ray.data.Dataset"
    adjacency: "ray.data.Dataset"


def build_kg(
    pages: "ray.data.Dataset",
    kb_table: pa.Table | None = None,
    *,
    dedup_input: bool = True,
    classifier_concurrency: int | tuple | None = None,
    linker_concurrency: int | tuple | None = None,
    extract_batch_size: int = 256,
) -> KgDatasets:
    import ray as _ray

    # size actor pools to the cluster unless the caller pinned them
    # (capped: pool spin-up is ~1s/actor of latency; the classifier is
    # vectorized so a modest pool saturates before the extract stage does)
    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    if classifier_concurrency is None:
        classifier_concurrency = (max(2, min(8, ncpu // 2)), max(2, ncpu))
    if linker_concurrency is None:
        linker_concurrency = (2, max(2, ncpu // 2))
    kb_table = kb_table if kb_table is not None else build_entity_dict()
    kb_ref = link.broadcast_kb(kb_table)

    # one pass over the raw html; everything downstream reads the narrow
    # extracted form (html dropped) from the object store
    extracted = extract.extract(pages, batch_size=extract_batch_size).materialize()
    ok, dead = extract.split_dead_letter(extracted)
    if dedup_input:
        ok = extract.keep_latest(ok)
    ok = ok.materialize()  # branch point: documents | segments

    documents = ok.drop_columns(["blocks"])
    # classifier actor pool runs exactly once; both the segments sink and
    # the triple chain read the classified blocks from the store
    segs = segment.segment(ok, classifier_concurrency=classifier_concurrency).materialize()
    raw = triples.extract_triples(segs)
    linked = link.link_triples(raw, kb_ref, concurrency=linker_concurrency).materialize()

    return KgDatasets(
        documents=documents,
        dead_letter=dead,
        segments=segs,
        linked=linked,
        triples=canonicalize.dedup_triples(linked),
        entities=canonicalize.build_entities(linked, kb_ref),
        adjacency=canonicalize.build_adjacency(linked),
    )


def run_kg_to_dir(pages: "ray.data.Dataset", out_dir: str, kb_table: pa.Table | None = None, **kw) -> dict:
    """Execute the full pipeline, writing every output table as a
    partitioned Parquet directory. Returns per-table row counts (the
    per-partition metrics record)."""
    from concurrent.futures import ThreadPoolExecutor

    _stub_fsspec_http()
    kg = build_kg(pages, kb_table, **kw)
    names = ("documents", "dead_letter", "segments", "triples", "entities", "adjacency")

    def write(name: str) -> tuple[str, int]:
        ds: "ray.data.Dataset" = getattr(kg, name)
        path = os.path.join(out_dir, name)
        os.makedirs(path, exist_ok=True)
        ds.write_parquet(path)
        return name, _parquet_rows(path)

    # the six sinks are independent datasets over materialized inputs —
    # run their executions concurrently so per-execution startup overlaps
    with ThreadPoolExecutor(max_workers=len(names)) as pool:
        metrics = {f"{n}_rows": rows for n, rows in pool.map(write, names)}
    return metrics


def _stub_fsspec_http() -> None:
    """fsspec.implementations.http fails to import here (no aiohttp).
    Ray's write path re-attempts that import on every sink; two sinks
    importing concurrently see a partially-initialized module and die
    with ImportError (Ray only catches ModuleNotFoundError). Pre-seed a
    deterministic stub so concurrent writes are safe."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # never instantiated; isinstance target only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — avoids re-executing the dataset
    lineage that a post-write ``ds.count()`` would trigger."""
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(path, "*.parquet"))
    )
