"""Declarative stage + aggregation registry — the user-extension surface.

Reference analogs:
- the aggregation router dispatching each requested aggregation name to
  its builder family (`ingest/process/aggregation/aggregate.py:232-245`,
  with `stream_types` / `association_types` / `full_page_types` lists);
- worker preload plugins as the stateful-stage extension point
  (`ingest/preload_plugins/*.py`) — here a registered ``Stage`` whose
  ``fn`` is a callable class becomes an actor-pool ``map_batches`` stage;
- the `Ingest.ingest(aggregations=[...])` toggle surface
  (`ingest/ingest.py:49-99`).

Usage::

    from cosmos_ray.pipelines.registry import AGGREGATIONS, register_aggregation
    outs = run_aggregations(kg.segments, ["sections", "captions"])   # dict
    register_aggregation("my_agg", my_builder)                        # plugin

A builder is ``fn(segments_ds, **kw) -> Dataset``; a ``Stage`` wraps a
row/batch transform with its resource declaration so pipelines can be
assembled from config instead of code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class Stage:
    """One pipeline step: a batch fn (stateless task) or callable class
    (actor pool), plus the per-stage resources the reference declares via
    Dask worker annotations (`docker-compose-ingest.yml:28,45`)."""

    name: str
    fn: Callable
    is_actor: bool = False
    batch_size: int | None = None
    concurrency: int | tuple | None = None
    num_cpus: float | None = None
    num_gpus: float | None = None
    fn_kwargs: dict = field(default_factory=dict)

    def apply(self, ds):
        kw: dict[str, Any] = {"batch_format": "pyarrow", "batch_size": self.batch_size}
        if self.num_cpus is not None:
            kw["num_cpus"] = self.num_cpus
        if self.num_gpus:
            kw["num_gpus"] = self.num_gpus
        if self.is_actor:
            kw["concurrency"] = self.concurrency or (1, 4)
            kw["fn_constructor_kwargs"] = self.fn_kwargs
            return ds.map_batches(self.fn, **kw)
        if self.fn_kwargs:
            kw["fn_kwargs"] = self.fn_kwargs
        return ds.map_batches(self.fn, **kw)


def apply_stages(ds, stages: list[Stage]):
    for st in stages:
        ds = st.apply(ds)
    return ds


# ---------------------------------------------------------------- registry

def _sections(segments_ds, **kw):
    from cosmos_ray.stages.aggregate import aggregate_sections

    return aggregate_sections(segments_ds, **kw)


def _documents(segments_ds, **kw):
    from cosmos_ray.stages.aggregate import aggregate_documents

    return aggregate_documents(segments_ds, **kw)


def _captions(segments_ds, **kw):
    from cosmos_ray.stages.aggregate import associate_captions

    return associate_captions(segments_ds, **kw)


def _figures(segments_ds, **kw):
    from cosmos_ray.stages.aggregate import associate_captions

    return associate_captions(
        segments_ds, caption_cls="Figure Caption", object_cls="Other", **kw
    )


def _equations(segments_ds, **kw):
    from cosmos_ray.stages.aggregate import aggregate_equations

    return aggregate_equations(segments_ds, **kw)


def _table_context(segments_ds, **kw):
    from cosmos_ray.stages.enrich import table_context

    return table_context(segments_ds, **kw)


def _table_qa(segments_ds, question: str = "what scans?", **kw):
    from cosmos_ray.stages.enrich import qa_table_enrichment

    return qa_table_enrichment(segments_ds, question=question, **kw)


def _regroup(segments_ds, **kw):
    from cosmos_ray.stages.regroup import regroup_segments

    return regroup_segments(segments_ds, **kw)


# name -> builder(segments_ds, **kw) -> Dataset. Mirrors the reference's
# {sections, pdfs} stream / {tables, figures} association / {equations}
# full-page routing (`aggregate.py:232-245`) plus the group_cls merge and
# use_qa_table_enrichment toggles (`ingest.py:49-99`).
AGGREGATIONS: dict[str, Callable] = {
    "sections": _sections,
    "documents": _documents,
    "captions": _captions,
    "figures": _figures,
    "equations": _equations,
    "table_context": _table_context,
    "table_qa": _table_qa,
    "regroup": _regroup,
}


def register_aggregation(name: str, builder: Callable, overwrite: bool = False) -> None:
    """Plugin hook (the preload_plugins analog): make a user aggregation
    routable by name."""
    if name in AGGREGATIONS and not overwrite:
        raise ValueError(f"aggregation {name!r} already registered")
    AGGREGATIONS[name] = builder


def run_aggregations(segments_ds, names: list[str] | None = None, **kw) -> dict:
    """Router: dispatch each requested aggregation to its builder
    (unknown names fail fast, like the reference's assert on aggregation
    type). Returns {name: Dataset}."""
    names = list(AGGREGATIONS) if names is None else names
    unknown = [n for n in names if n not in AGGREGATIONS]
    if unknown:
        raise KeyError(f"unknown aggregations: {unknown}; known: {sorted(AGGREGATIONS)}")
    return {n: AGGREGATIONS[n](segments_ds, **kw) for n in names}
