"""Incremental materialized-view maintenance over signed deltas.

The matview discipline a 100-TB fact table forces: a grouped
SUM/COUNT view is refreshed from a CHANGE stream only — cost
O(|delta| + |view|), the fact table is never re-read. Deltas are a
signed multiset (the Z-set / DBSP formulation: ``sign`` = +1 insert,
-1 retraction), so updates and deletes maintain exactly, not just
appends: COUNT partials accumulate ``sum(sign)``, SUM partials
``sum(sign * x)``, and a group whose maintained count reaches zero
leaves the view — the algebra a full recompute would replay.

Shuffle shape: the delta pre-aggregates to per-(batch, key) partial
rows inside ``map_batches`` (the standard combiner), then ONE
view-plus-delta-partials groupby merges — the exchange is bounded by
|view| + |delta partials|, never by facts. Exactness discipline: sum
columns are INTEGER partials (callers scale floats to fixed-point
first, e.g. micro-units), so incremental and full-recompute results
are bit-identical regardless of accumulation order.

Only distributive aggregates (SUM/COUNT, and MIN/MAX under
append-only deltas) self-maintain; holistic ones (exact distinct,
median) need their own state — out of scope here, the repo's
two-stage-distinct operators cover those shapes.

Composes with `state/versioned.py`: persist each refresh with
``commit_overwrite`` and the view's history time-travels.

Reference analog: the reference re-ingests a document set and mutates
its live ES index per batch (`cosmos_service` ingest path); this is
the deterministic batch-functional version of that refresh.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["delta_partials", "maintain_view"]


def delta_partials(delta_ds, keys: list[str], sum_cols: list[str],
                   count_col: str = "n", sign_col: str = "sign"):
    """Pre-aggregate a signed delta stream to per-(batch, key) partial
    rows: ``count_col`` = sum(sign), each ``sum_cols`` entry =
    sum(sign * col). Output schema matches the view's partial rows."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sign = df[sign_col].to_numpy(np.int64)
        agg = {c: (c, "sum") for c in sum_cols}
        for c in sum_cols:
            df[c] = df[c].to_numpy(np.int64) * sign
        df[count_col] = sign
        g = df.groupby(keys, as_index=False, sort=False).agg(
            **{count_col: (count_col, "sum"), **agg})
        for c in [count_col] + sum_cols:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g[keys + [count_col] + sum_cols],
                                    preserve_index=False)

    return delta_ds.map_batches(partial, batch_format="pyarrow")


def maintain_view(view_ds, delta_ds, keys: list[str], sum_cols: list[str],
                  count_col: str = "n", sign_col: str = "sign"):
    """-> the refreshed view: ``view_ds`` (rows: keys + count_col +
    sum_cols, int64 partials — e.g. the previous refresh's output)
    merged with the signed ``delta_ds`` (rows: keys + sign_col + raw
    addend columns named as sum_cols). Groups whose maintained count
    is zero are dropped; a negative maintained count means the delta
    retracted rows the view never contained — surfaced as an error row
    guard (raise) rather than silently clamped."""
    from ray.data.aggregate import Sum

    merged = (view_ds.union(delta_partials(
        delta_ds, keys, sum_cols, count_col=count_col, sign_col=sign_col))
        .groupby(keys)
        .aggregate(Sum(count_col, alias_name=count_col),
                   *[Sum(c, alias_name=c) for c in sum_cols]))

    def drop_empty(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.column(count_col)
        if pc.any(pc.less(n, pa.scalar(0))).as_py():
            raise ValueError(
                "maintain_view: negative maintained count — the delta "
                "retracted rows not present in the view")
        keep = pc.greater(n, pa.scalar(0))
        out = t.filter(keep)
        return pa.table({c: out.column(c).cast(pa.int64())
                         if c == count_col or c in sum_cols
                         else out.column(c)
                         for c in out.column_names})

    return merged.map_batches(drop_empty, batch_format="pyarrow")
