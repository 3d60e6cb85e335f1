"""The flagship KG-construction pipeline, composed Ray-Data-first.

Two variants share all stage code:

``build_kg`` — checkpointing variant (all output tables consumable):

    pages ──extract──▶ extracted(+blocks, html dropped)  [materialized]
          ──keep_latest(url)──▶            [bucketed shuffle #1: url]
          ├─▶ documents        ├─▶ dead_letter (filter)
          └─explode──classify(actor pool)──▶ segments    [materialized]
                 └─SVO──▶ triples_raw ──link(actor pool, broadcast KB)──▶ linked
                        ├─▶ triples   (groupby url,s,p,o)   [exchange #2]
                        ├─▶ adjacency (groupby s_id,p,o_id) [exchange #3]
                        └─▶ entities  (groupby canonical_id)[exchange #4]

``build_kg_streaming`` — single-pass variant for the graph outputs: the
dup plan drops stale crawls BEFORE extraction (metadata-only pass, no
payload shuffle), dead letters are side-written as content-keyed parquet
shards, the extract→classify→SVO→link chain runs as ONE fused streaming
operator (task-fused stages with per-process cached state), and only the
tiny ``linked`` dataset is pinned.

Materializations exist at branch points because Ray Data re-executes
lineage per consumer; both pinned intermediates are post-explosion-
narrow. At 100 TB the pipeline runs per input partition (see
``cosmos_ray.state.manifest``) so each materialization is bounded by
partition size, and exchanges #2-#4 move combiner partials only —
with a driver-local fast path below a row threshold
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
    stage_mode: str = "actors",
) -> KgDatasets:
    """``stage_mode="actors"`` (default) runs the classifier/linker as
    actor pools — the shape for model-heavy state (GPU weights,
    embedding indexes). ``"tasks"`` runs them TASK-FUSED (plain
    functions with per-process cached state — the `build_kg_streaming`
    stage shape, parity-gated): identical results, no pool spin-up
    latency; right for the lightweight deterministic stand-ins."""
    import ray as _ray

    if stage_mode == "tasks":
        classifier_concurrency = linker_concurrency = None
    else:
        # size actor pools to the cluster unless the caller pinned them
        # (capped: pool spin-up is ~1s/actor of latency; the classifier is
        # vectorized so a modest pool saturates before the extract stage
        # does)
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
        # metadata dup plan + batch-local filters (same winners as the
        # full-shuffle keep_latest, ~none of its exchange cost; falls
        # back to keep_latest past the plan's broadcast cap)
        ok = extract.keep_latest_planned(ok)
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


def build_kg_streaming(
    pages: "ray.data.Dataset",
    kb_table: pa.Table | None = None,
    *,
    dedup_input: bool = True,
    pages_meta: "ray.data.Dataset | None" = None,
    dead_dir: str | None = None,
    driver_threshold: int | None = None,
) -> KgDatasets:
    """Single-pass streaming variant: no bulk intermediates are pinned.

    Differences from ``build_kg`` (the checkpointing variant):
    - duplicate-url losers are dropped BEFORE extraction via the
      metadata-only dup plan (``discover_dup_urls`` + ``drop_stale``) —
      the payload is never shuffled. Pass ``pages_meta`` as a
      column-pruned (url, warc_ts) read of the same input so the plan
      never decodes html;
    - dead letters are side-written by extract tasks (atomic,
      content-keyed parquet shards — no second scan, no actor);
    - classifier and linker run TASK-FUSED (plain functions with
      per-process cached state) so the whole extract→classify→link
      chain is one fused streaming operator — per-worker amortization is
      identical to an actor pool, without pool sizing; use ``build_kg``
      (actor pools) when stage state is heavy (GPU weights, embedding
      indexes);
    - only ``linked`` (tiny vs the corpus) is materialized; documents /
      segments datasets re-derive lazily if consumed — use ``build_kg``
      when those sinks are needed.
    """
    import time as _time

    import ray as _ray

    _t0 = _time.perf_counter()
    kb_table = kb_table if kb_table is not None else build_entity_dict()
    kb_ref = link.broadcast_kb(kb_table)

    dup_ref = None
    if dedup_input:
        dup_ref = extract.discover_dup_urls(
            pages_meta if pages_meta is not None else pages
        )
        if dup_ref is not None:
            pages = extract.dedup_latest_pages(pages, dup_ref)
    # the exchange-free per-url triple dedup is valid only when at most
    # one row per url reaches extraction, which the dup plan guarantees
    # exactly: non-tied losers are filtered batch-locally, max-ts TIES get
    # one deterministic winner via resolve_tied (min md5(html)) in a
    # single map_groups group. With dedup_input=False or the
    # degenerate-corpus keep_latest fallback, fall back to the
    # globally-grouped dedup_triples.
    urllocal_ok = dedup_input and dup_ref is not None
    _phase("dup_plan", _t0)

    if dead_dir is None:
        import tempfile

        dead_dir = tempfile.mkdtemp(prefix="cosmos_dead_")
    ok = extract.extract_streaming(pages, dead_dir)
    if dedup_input and dup_ref is None:  # degenerate corpus fallback
        ok = extract.keep_latest(ok)

    _t0 = _time.perf_counter()
    segs = segment.segment(ok, classifier_concurrency=None)
    raw = triples.extract_triples(segs, batch_size=None)
    linked = link.link_triples(raw, kb_ref, concurrency=None)
    # in-chain combiner: block-local (url,s,p,o) aggregation shrinks the
    # pinned dataset and every downstream reduce; linker id columns are
    # carried through the group (single-valued per key)
    linked = linked.map_batches(
        canonicalize.combine_linked_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    _phase("chain", _t0)

    import glob as _glob

    import ray.data as rd

    from cosmos_ray.core import schemas as _schemas

    dead_files = _glob.glob(os.path.join(dead_dir, "*.parquet"))
    dead = (
        rd.read_parquet(dead_files)
        if dead_files
        else rd.from_arrow(_schemas.DEAD_LETTER.empty_table())
    )
    _t0 = _time.perf_counter()
    thr = canonicalize.DRIVER_REDUCE_THRESHOLD if driver_threshold is None else driver_threshold
    local = canonicalize.finalize_graph_local(linked, kb_ref, threshold=thr)
    if local is not None:
        triples_ds, entities_ds, adjacency_ds = local
    else:
        # url-locality invariant (guarded above): per-url dedup is
        # exchange-free; only adjacency/entities (non-url keys) exchange,
        # and their combiner partials are tiny
        if urllocal_ok:
            triples_ds = canonicalize.dedup_triples_urllocal(linked)
        else:
            triples_ds = canonicalize.dedup_triples(linked)
        entities_ds = canonicalize.build_entities(linked, kb_ref, driver_threshold=0)
        adjacency_ds = canonicalize.build_adjacency(linked, driver_threshold=0)
    _phase("finalize", _t0)
    return KgDatasets(
        documents=ok.drop_columns(["blocks"]),
        dead_letter=dead,
        segments=segs,
        linked=linked,
        triples=triples_ds,
        entities=entities_ds,
        adjacency=adjacency_ds,
    )


GRAPH_SINKS = ("triples", "entities", "adjacency", "dead_letter")


def run_kg_streaming(pages: "ray.data.Dataset", out_dir: str,
                     kb_table: pa.Table | None = None,
                     sinks: tuple = GRAPH_SINKS,
                     driver_threshold: int | None = None, **kw) -> dict:
    """Streaming headline: pages -> canonical graph tables on disk.
    Writes only the (small) graph outputs; bulk intermediates stream
    through without being pinned or written."""
    from concurrent.futures import ThreadPoolExecutor

    _stub_fsspec_http()
    kg = build_kg_streaming(pages, kb_table, driver_threshold=driver_threshold, **kw)

    def write(name: str) -> tuple[str, int]:
        ds: "ray.data.Dataset" = getattr(kg, name)
        path = os.path.join(out_dir, name)
        os.makedirs(path, exist_ok=True)
        ds.write_parquet(path)
        return name, _parquet_rows(path)

    import time as _time

    _t0 = _time.perf_counter()
    with ThreadPoolExecutor(max_workers=len(sinks)) as pool:
        metrics = {f"{n}_rows": rows for n, rows in pool.map(write, sinks)}
    _phase("agg_writes", _t0)
    return metrics


def _phase(name: str, t0: float) -> None:
    """Optional phase timing to stderr (GRAFT_BENCH_PHASES=1)."""
    if os.environ.get("GRAFT_BENCH_PHASES"):
        import sys
        import time as _time

        print(f"[phase] {name}: {_time.perf_counter() - t0:.2f}s", file=sys.stderr)


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
