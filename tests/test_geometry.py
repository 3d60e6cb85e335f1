"""Geometry kernel unit tests (no Ray needed)."""

from __future__ import annotations

import numpy as np

from cosmos_ray.functions import geometry as g


def test_iou_basic():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[5, 5, 15, 15], [20, 20, 30, 30], [0, 0, 10, 10]])
    iou = g.pairwise_iou(a, b)[0]
    assert abs(iou[0] - 25 / 175) < 1e-9
    assert iou[1] == 0.0
    assert iou[2] == 1.0


def test_area_union_centroid():
    boxes = np.array([[0, 0, 2, 3], [1, 1, 4, 2]])
    assert g.area(boxes).tolist() == [6.0, 3.0]
    assert g.union_box(boxes).tolist() == [0, 0, 4, 3]
    assert g.centroid(boxes).tolist() == [[1.0, 1.5], [2.5, 1.5]]


def test_y_overlap_and_expand():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 5, 10, 20]])
    assert g.y_overlap(a, b)[0, 0] == 5.0
    e = g.expand(a, 2.0)
    assert e.tolist() == [[-2, -2, 12, 12]]


def test_spatial_join_text_reading_order():
    regions = np.array([[0, 0, 100, 50]])
    lines = np.array(
        [[0, 30, 50, 40], [0, 10, 50, 20], [60, 10, 90, 20], [0, 200, 50, 210]]
    )
    texts = ["third", "first", "second", "outside"]
    pooled = g.spatial_join_text(regions, lines, texts)
    assert pooled == ["first second third"]
