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
    classifier_concurrency: int | tuple = (1, 8),
    linker_concurrency: int | tuple = (1, 4),
    extract_batch_size: int = 256,
) -> KgDatasets:
    kb_table = kb_table if kb_table is not None else build_entity_dict()
    kb_ref = link.broadcast_kb(kb_table)

    extracted = extract.extract(pages, batch_size=extract_batch_size)
    ok, dead = extract.split_dead_letter(extracted)
    if dedup_input:
        ok = extract.keep_latest(ok)
    ok = ok.materialize()  # branch point: documents | segments

    documents = ok.drop_columns(["blocks"])
    segs = segment.segment(ok, classifier_concurrency=classifier_concurrency)
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
    kg = build_kg(pages, kb_table, **kw)
    metrics: dict[str, int] = {}
    for name in ("documents", "dead_letter", "segments", "triples", "entities", "adjacency"):
        ds: "ray.data.Dataset" = getattr(kg, name)
        path = os.path.join(out_dir, name)
        os.makedirs(path, exist_ok=True)
        ds.write_parquet(path)
        metrics[f"{name}_rows"] = ds.count()
    return metrics
