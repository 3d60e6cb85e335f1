"""Property-based tests (hypothesis): the extractor never crashes on
arbitrary bytes/markup, normalization is idempotent, geometry invariants
hold. No Ray needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cosmos_ray.functions import geometry as g
from cosmos_ray.stages.extract import normalize_text, parse_html_blocks


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_parser_total_on_bytes(data):
    """Any byte string either parses to a block list or raises
    UnicodeDecodeError (the dead-letter contract) — never anything else."""
    try:
        blocks = parse_html_blocks(data)
    except UnicodeDecodeError:
        return
    assert isinstance(blocks, list)
    for tag, text in blocks:
        assert isinstance(tag, str) and isinstance(text, str)
        assert text == normalize_text(text)  # already normalized


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once
    assert "  " not in once and not once.startswith(" ") and not once.endswith(" ")


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0, 1000), st.floats(0, 1000),
            st.floats(0, 1000), st.floats(0, 1000),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_iou_invariants(raw):
    boxes = np.array([[min(a, c), min(b, d), max(a, c), max(b, d)] for a, b, c, d in raw])
    iou = g.pairwise_iou(boxes, boxes)
    assert iou.shape == (len(boxes), len(boxes))
    assert np.all(iou >= 0) and np.all(iou <= 1 + 1e-9)
    assert np.allclose(iou, iou.T)  # symmetric
    pos = g.area(boxes) > 0
    assert np.allclose(np.diag(iou)[pos], 1.0)  # self-IoU of nonempty boxes


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab ", max_size=200))
def test_svo_extractor_total(s):
    from cosmos_ray.stages.triples import extract_triples_from_text

    out = extract_triples_from_text(s)
    assert isinstance(out, list)
