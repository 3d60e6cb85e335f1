"""Vectorized bbox geometry kernels (shared library for layout ops).

Reference analogs: IoU / area / union / y-overlap scalar helpers
scattered through `ocr/group_cls.py:5-39`, `elastic_retriever.py:24-58`,
`healthcheck/page_metrics.py:17-42`, `aggregation/aggregate.py:9-12`.
Here they are numpy batch kernels: boxes are (N, 4) float arrays
[x1, y1, x2, y2].
"""

from __future__ import annotations

import numpy as np


def as_boxes(col) -> np.ndarray:
    """list<float>[4] arrow column / python lists -> (N,4) float64."""
    return np.asarray([list(b) for b in col], dtype=np.float64).reshape(-1, 4)


def area(boxes: np.ndarray) -> np.ndarray:
    boxes = np.atleast_2d(boxes)
    return np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )


def pairwise_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) -> (N,M) IoU matrix."""
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    union = area(a)[:, None] + area(b)[None, :] - inter
    # divide by the true union where positive (an epsilon floor would
    # distort subnormal-area boxes); 1 is a dummy divisor where union==0
    return np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)


def union_box(boxes: np.ndarray) -> np.ndarray:
    boxes = np.atleast_2d(boxes)
    return np.array(
        [boxes[:, 0].min(), boxes[:, 1].min(), boxes[:, 2].max(), boxes[:, 3].max()]
    )


def y_overlap(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) -> (N,M) vertical overlap in pixels (reading-order
    line grouping primitive)."""
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    return np.clip(
        np.minimum(a[:, None, 3], b[None, :, 3]) - np.maximum(a[:, None, 1], b[None, :, 1]),
        0,
        None,
    )


def expand(boxes: np.ndarray, margin: float) -> np.ndarray:
    """Feathered boxes (the reference feathers ±10 px before its
    text↔region spatial join, `ocr/ocr.py:53-86`)."""
    boxes = np.atleast_2d(boxes).astype(np.float64, copy=True)
    boxes[:, :2] -= margin
    boxes[:, 2:] += margin
    return boxes


def centroid(boxes: np.ndarray) -> np.ndarray:
    boxes = np.atleast_2d(boxes)
    return np.stack(
        [(boxes[:, 0] + boxes[:, 2]) / 2.0, (boxes[:, 1] + boxes[:, 3]) / 2.0], axis=1
    )


def spatial_join_text(region_boxes: np.ndarray, line_boxes: np.ndarray,
                      line_texts: list[str], feather: float = 10.0) -> list[str]:
    """The J1 text-pooling join: for each region, concat the text of
    lines whose feathered IoU > 0, ordered by (y2, x1) — reference
    `_pool_text_meta`, `ocr/ocr.py:53-86`."""
    if len(line_boxes) == 0:
        return ["" for _ in range(len(np.atleast_2d(region_boxes)))]
    f = expand(region_boxes, feather)
    iou = pairwise_iou(f, line_boxes)
    lines = np.atleast_2d(line_boxes)
    order_key = np.lexsort((lines[:, 0], lines[:, 3]))  # (y2, x1)
    out = []
    for i in range(iou.shape[0]):
        hits = [j for j in order_key if iou[i, j] > 0]
        out.append(" ".join(line_texts[j] for j in hits))
    return out
