"""Data-quality validation (expectations) over a Dataset — the batch
analog of the schema/shape assertions the reference applies when rows
enter its store (`elasticsearch_ingest` mapping enforcement + the
ingest-time empty/error filters, M11): each rule is evaluated fully
vectorized per batch, and the result is a tiny (rule, violations)
table suitable for gating a pipeline run.

Rules (null-strict: a NULL fails every check except ``unique``):
- ``{"check": "not_null", "col": c}``
- ``{"check": "in_set", "col": c, "values": [...]}``
- ``{"check": "range", "col": c, "lo": x, "hi": y}`` (inclusive bounds;
  either bound may be None)
- ``{"check": "regex", "col": c, "pattern": p}`` (violation = no match)
- ``{"check": "unique", "col": c}`` (violations = non-null rows minus
  distinct non-null values)

Scale shape: every non-unique rule is a per-batch combiner (one count
row per batch crosses the exchange); ``unique`` adds one
groupby-distinct whose exchange carries one row per distinct key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum


def _rule_name(r: dict) -> str:
    return r.get("name") or f"{r['col']}_{r['check']}"


def _violation_mask(t: pa.Table, r: dict) -> pa.Array:
    col = t.column(r["col"])
    null = pc.is_null(col)
    check = r["check"]
    if check == "not_null":
        return null
    if check == "in_set":
        ok = pc.is_in(col, pa.array(r["values"]))
        return pc.or_kleene(null, pc.invert(pc.fill_null(ok, False)))
    if check == "range":
        bad = pc.fill_null(pa.array(np.zeros(len(col), bool)), False)
        if r.get("lo") is not None:
            bad = pc.or_(bad, pc.fill_null(pc.less(col, pa.scalar(r["lo"])), True))
        if r.get("hi") is not None:
            bad = pc.or_(bad, pc.fill_null(pc.greater(col, pa.scalar(r["hi"])), True))
        return pc.or_(bad, null)
    if check == "regex":
        ok = pc.match_substring_regex(col, r["pattern"])
        return pc.or_kleene(null, pc.invert(pc.fill_null(ok, False)))
    raise ValueError(f"unknown check: {check}")


def validate(ds, rules: list[dict]):
    """-> Dataset (rule, violations), one row per rule."""
    batch_rules = [r for r in rules if r["check"] != "unique"]
    uniq_rules = [r for r in rules if r["check"] == "unique"]

    parts = []
    if batch_rules:
        def partials(t: pa.Table) -> pa.Table:
            cols = {}
            for r in batch_rules:
                m = _violation_mask(t, r)
                cols[_rule_name(r)] = pa.array(
                    [int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0)],
                    pa.int64())
            return pa.table(cols)

        sums = ds.map_batches(partials, batch_format="pyarrow").sum(
            [_rule_name(r) for r in batch_rules])
        if sums is None:
            counts = [0] * len(batch_rules)
        elif isinstance(sums, dict):
            counts = [int(sums.get(f"sum({_rule_name(r)})") or 0)
                      for r in batch_rules]
        else:  # single-column sum returns a bare scalar
            counts = [int(sums)]
        parts.append(pa.table({
            "rule": pa.array([_rule_name(r) for r in batch_rules]),
            "violations": pa.array(counts, pa.int64()),
        }))
    for r in uniq_rules:
        col = r["col"]
        nn = ds.map_batches(
            lambda t, c=col: t.filter(pc.is_valid(t.column(c))),
            batch_format="pyarrow")
        total = nn.count()
        distinct = (nn.select_columns([col]).groupby(col)
                    .aggregate(Count(alias_name="__n")).count())
        parts.append(pa.table({
            "rule": pa.array([_rule_name(r)]),
            "violations": pa.array([int(total - distinct)], pa.int64()),
        }))
    if not parts:
        return rd.from_arrow(pa.table({"rule": pa.array([], pa.string()),
                                       "violations": pa.array([], pa.int64())}))
    return rd.from_arrow(pa.concat_tables(parts))
