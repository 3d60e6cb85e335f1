"""Same-class region regrouping: merge fragmented detections of one
logical object before aggregation.

Reference analog: ``group_cls`` merges neighboring same-class detections
(Table/Figure fragments from the RCNN) into one region with a union bbox
before text pooling (`cosmos/ingestion/ingest/process/ocr/group_cls.py:
60-144`, called from `ocr.py:20-27`). Web analog: consecutive same-url,
same-page, same-class segments whose vertical gap is below a line pitch
threshold become ONE segment — a table split across adjacent DOM blocks
reassembles before caption association / section aggregation.

Shape: stateless vectorized ``map_batches``; run boundaries are computed
with numpy mask arithmetic and only the (rare) multi-row groups take the
python merge path. Relies on the same explode invariant as the
classifier's page-context pass: a url's segments arrive contiguously and
in reading order within one block (documented at `segment.py:22-35`), so
no shuffle is needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# default merge classes: object-like regions the reference regroups
DEFAULT_CLASSES = ("Table", "Figure")

_PAGE_H = 1920.0


def regroup_batch(t: pa.Table, classes=DEFAULT_CLASSES, max_gap: float = 160.0) -> pa.Table:
    n = t.num_rows
    if n == 0:
        return t
    urls = np.asarray(t.column("url").to_pylist(), dtype=object)
    cls = np.asarray(t.column("cls").to_pylist(), dtype=object)
    page = t.column("page_num").to_numpy(zero_copy_only=False).astype(np.int64)
    bb = t.column("bbox")
    flat = bb.combine_chunks() if isinstance(bb, pa.ChunkedArray) else bb
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.chunk(0)
    xy = flat.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, 4)
    ay1 = page * _PAGE_H + xy[:, 1]
    ay2 = page * _PAGE_H + xy[:, 3]

    mergeable = np.isin(cls, np.asarray(classes, dtype=object))
    join_prev = np.zeros(n, dtype=bool)
    if n > 1:
        join_prev[1:] = (
            (urls[1:] == urls[:-1])
            & (cls[1:] == cls[:-1])
            & (page[1:] == page[:-1])
            & mergeable[1:]
            & mergeable[:-1]
            & (ay1[1:] - ay2[:-1] <= max_gap)
        )
    if not join_prev.any():
        return t
    gid = np.cumsum(~join_prev) - 1
    n_groups = int(gid[-1]) + 1
    # first/last row index per group (gid is non-decreasing)
    first_idx = np.searchsorted(gid, np.arange(n_groups), side="left")
    last_idx = np.searchsorted(gid, np.arange(n_groups), side="right") - 1

    base = t.take(pa.array(first_idx))  # representative row per group
    sizes = last_idx - first_idx + 1
    multi = np.flatnonzero(sizes > 1)
    if len(multi) == 0:
        return base

    texts = t.column("text").to_pylist()
    new_text = base.column("text").to_pylist()
    boxes = xy.copy()
    new_bb = boxes[first_idx].copy()
    scores = (
        t.column("score").to_numpy(zero_copy_only=False).astype(np.float64)
        if "score" in t.column_names
        else None
    )
    new_score = scores[first_idx].copy() if scores is not None else None
    for g in multi:
        s, e = int(first_idx[g]), int(last_idx[g]) + 1
        new_text[g] = "\n".join(texts[s:e])
        new_bb[g] = [
            boxes[s:e, 0].min(), boxes[s:e, 1].min(),
            boxes[s:e, 2].max(), boxes[s:e, 3].max(),
        ]
        if scores is not None:
            new_score[g] = scores[s:e].max()

    out = base.set_column(
        base.schema.get_field_index("text"), "text", pa.array(new_text, pa.string())
    )
    out = out.set_column(
        out.schema.get_field_index("bbox"),
        "bbox",
        pa.FixedSizeListArray.from_arrays(
            pa.array(new_bb.astype(np.float32).reshape(-1), pa.float32()), 4
        ),
    )
    if new_score is not None:
        out = out.set_column(
            out.schema.get_field_index("score"),
            "score",
            pa.array(new_score.astype(np.float32), pa.float32()),
        )
    return out


def regroup_segments(segments_ds, classes=DEFAULT_CLASSES, max_gap: float = 160.0):
    """Merge adjacent same-class fragments (batch-local; url runs are
    whole within a block per the explode invariant)."""
    return segments_ds.map_batches(
        lambda t: regroup_batch(t, classes, max_gap),
        batch_format="pyarrow",
        batch_size=None,
    )
