"""Incremental KG refresh: fold a NEW crawl into an existing graph
directory without re-extracting old pages — the operation a standing
100-TB crawl pipeline runs daily (the reference re-runs its ingest over
new document batches and re-indexes; `ingest/ingest.py` batch mode).

Semantics:
- url granularity, keep-latest: every url present in the new crawl
  REPLACES its old triples entirely; urls absent from the new crawl
  stream through untouched.
- entities / adjacency are exact global aggregates of the merged triple
  set — recomputed from per-url triple AGGREGATES (not from pages), so
  the refresh cost is O(new pages + |triples|), never O(old pages).

Scale shape:
- the expensive chain (extract→classify→SVO→link) runs ONLY on new
  pages (`build_kg_streaming`);
- old triples are filtered by a size-guarded anti-join against the new
  url set (broadcast under the cap, distributed join past it);
- id re-attachment for the aggregate rebuild is the same broadcast-KB
  dict lookup the linker uses (J4) — no exchange;
- outputs are written to tmp dirs and atomically renamed, so a crashed
  refresh never corrupts the published graph.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

import ray.data as rd

from cosmos_ray.pipelines.kg import build_kg_streaming, _parquet_rows
from cosmos_ray.sources.entity_dict import build_entity_dict
from cosmos_ray.stages import canonicalize, link


def _relink_triples(triples_ds, kb_ref):
    """Re-attach (subj_id, obj_id) to stored triples via the broadcast
    KB lookup and rename n_mentions -> n so the canonicalize partials
    treat each row as carrying its aggregated raw-support count."""
    link_fn = link.make_link_fn(kb_ref)

    def prep(t: pa.Table) -> pa.Table:
        out = link_fn(t)
        idx = out.schema.get_field_index("n_mentions")
        return out.set_column(idx, "n", out.column("n_mentions").cast(pa.int64()))

    return triples_ds.map_batches(prep, batch_format="pyarrow")


def run_kg_update(out_dir: str, new_pages, *, pages_meta=None,
                  kb_table: pa.Table | None = None,
                  driver_threshold: int | None = None,
                  anti_join_cap: int = 2_000_000) -> dict:
    """Refresh the graph at ``out_dir`` (written by ``run_kg_streaming``
    or a previous update) with ``new_pages``. Returns per-table row
    counts like the full run does."""
    from cosmos_ray.queries.relational import semi_join_ds

    kb_table = kb_table if kb_table is not None else build_entity_dict()
    kb_ref = link.broadcast_kb(kb_table)

    dead_dir = os.path.join(out_dir, "dead_letter")
    kg_new = build_kg_streaming(
        new_pages, kb_table, pages_meta=pages_meta, dead_dir=dead_dir,
        driver_threshold=driver_threshold,
    )
    new_triples = kg_new.triples.materialize()

    old_triples = rd.read_parquet(os.path.join(out_dir, "triples"))
    new_urls = new_triples.groupby("url").count().select_columns(["url"])
    kept_old = semi_join_ds(old_triples, new_urls, key_col="url",
                            big_key="url", keep=False, cap_rows=anti_join_cap)
    merged = kept_old.union(new_triples).materialize()

    relinked = _relink_triples(merged, kb_ref)
    thr = driver_threshold if driver_threshold is not None else canonicalize.DRIVER_REDUCE_THRESHOLD
    entities = canonicalize.build_entities(relinked, kb_ref, driver_threshold=thr)
    adjacency = canonicalize.build_adjacency(relinked, driver_threshold=thr)

    metrics: dict[str, int] = {}
    for name, ds in (("triples", merged), ("entities", entities),
                     ("adjacency", adjacency)):
        tmp = os.path.join(out_dir, f".{name}.tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        final = os.path.join(out_dir, name)
        old = os.path.join(out_dir, f".{name}.old")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(old, ignore_errors=True)
        metrics[f"{name}_rows"] = _parquet_rows(final)
    metrics["dead_letter_rows"] = _parquet_rows(dead_dir) if os.path.isdir(dead_dir) else 0
    return metrics


def kg_diff(old_triples, new_triples, keys=("subj", "pred", "obj")):
    """Crawl-over-crawl KG diff: distinct triples present in exactly one
    side -> (subj, pred, obj, status in {'added','removed'}). The what-
    changed report between two crawl snapshots.

    Scale shape: one tagged union + one groupby — each side's triples
    are reduced to distinct keys with min/max side tags; no driver pull,
    no pairwise join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    keys = list(keys)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.select(keys).append_column(
                "__side", pa.array([side] * len(t), pa.int64()))
        return fn

    tagged = (old_triples.select_columns(keys)
              .map_batches(tag(0), batch_format="pyarrow")
              .union(new_triples.select_columns(keys)
                     .map_batches(tag(1), batch_format="pyarrow")))
    agg = tagged.groupby(keys).aggregate(Min("__side", alias_name="__lo"),
                                         Max("__side", alias_name="__hi"))

    def status(t: pa.Table) -> pa.Table:
        lo, hi = t.column("__lo"), t.column("__hi")
        only_old = pc.and_(pc.equal(lo, 0), pc.equal(hi, 0))
        only_new = pc.and_(pc.equal(lo, 1), pc.equal(hi, 1))
        changed = pc.or_(only_old, only_new)
        t = t.filter(changed)
        st = pc.if_else(pc.equal(t.column("__lo"), 0),
                        pa.scalar("removed"), pa.scalar("added"))
        return t.select(keys).append_column("status", st)

    return agg.map_batches(status, batch_format="pyarrow")
