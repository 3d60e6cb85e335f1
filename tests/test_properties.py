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


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_dehyphenate_total_and_idempotent(s):
    """Dehyphenation is total on arbitrary text and idempotent when no
    new hyphen-break can be formed by a previous join (single pass over
    non-overlapping matches)."""
    import pyarrow as pa

    from cosmos_ray.stages.enrich import dehyphenate_batch

    t = pa.table({"text": [s]})
    out1 = dehyphenate_batch(t).column("text").to_pylist()[0]
    # no "-\n" surrounded by alnum may survive a single pass's matches;
    # overlapping patterns (e.g. "a-\nb-\nc") legitimately need a second
    # pass — assert convergence within two passes instead
    out2 = dehyphenate_batch(pa.table({"text": [out1]})).column("text").to_pylist()[0]
    out3 = dehyphenate_batch(pa.table({"text": [out2]})).column("text").to_pylist()[0]
    assert out3 == out2


@given(st.text(alphabet="ab -\n", max_size=200))
@settings(max_examples=200, deadline=None)
def test_rolling_fingerprint_total_and_stable(s):
    from cosmos_ray.functions.textops import _ROLL_MOD, rolling_fingerprint

    v = rolling_fingerprint(s)
    assert 0 <= v < (_ROLL_MOD << 31) | _ROLL_MOD  # 62-bit space
    assert rolling_fingerprint(s) == v  # deterministic


@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=30), min_size=2, max_size=6))
@settings(max_examples=100, deadline=None)
def test_table_label_mining_total(texts):
    from cosmos_ray.stages.enrich import mine_table_label

    for t in texts:
        out = mine_table_label(t)
        assert out is None or out.startswith("table ")


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_qa_extractor_total(s):
    """QA span offsets always index the answer inside the context."""
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.stages.qa import QaExtractor

    t = pa.table({"doc_id": [1], "text": [s]})
    row = QaExtractor("what scans?")(t).to_pylist()[0]
    if row["answer"] is not None:
        assert s[row["answer_start"]:row["answer_end"]] == row["answer"]


@given(st.lists(st.tuples(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=40),
    st.integers(min_value=0, max_value=2_000_000_000),
    st.binary(max_size=300)), max_size=8))
@settings(max_examples=100, deadline=None)
def test_warc_roundtrip_total(rows):
    """WARC round-trip is exact for ANY payload bytes — including
    payloads embedding 'WARC/' markers or CRLF-CRLF sequences (the
    Content-Length walk never scans inside a record's payload)."""
    from cosmos_ray.sources.warc import parse_warc_bytes, write_warc_shard

    recs = [(u, ts * 1_000_000, b"\r\n\r\nWARC/1.0\r\n" + h)
            for u, ts, h in rows]
    parsed = parse_warc_bytes(write_warc_shard(recs))
    got = [(r["url"], r["warc_ts_us"], r["html"]) for r in parsed]
    assert got == recs


# ---------------------------------------------------- boolean query_string

_VOCAB = ["aa", "bb", "cc", "dd"]

_tree = st.deferred(lambda: st.one_of(
    st.sampled_from(_VOCAB).map(lambda t: ("term", t)),
    st.tuples(st.sampled_from(_VOCAB), st.sampled_from(_VOCAB)).map(
        lambda p: ("phrase", list(p))),
    st.tuples(st.just("not"), _tree),
    st.tuples(st.sampled_from(["and", "or"]), _tree, _tree),
))


def _render(node) -> str:
    kind = node[0]
    if kind == "term":
        return node[1]
    if kind == "phrase":
        return '"' + " ".join(node[1]) + '"'
    if kind == "not":
        return f"NOT ({_render(node[1])})"
    return f"({_render(node[1])} {kind.upper()} {_render(node[2])})"


def _ref_match(node, toks: list[str]) -> bool:
    kind = node[0]
    if kind == "term":
        return node[1] in toks
    if kind == "phrase":
        w = node[1]
        return any(toks[i:i + len(w)] == w for i in range(len(toks)))
    if kind == "not":
        return not _ref_match(node[1], toks)
    a, b = _ref_match(node[1], toks), _ref_match(node[2], toks)
    return (a and b) if kind == "and" else (a or b)


@settings(max_examples=40, deadline=None)
@given(
    tree=_tree,
    docs=st.lists(st.lists(st.sampled_from(_VOCAB + ["zz"]),
                            min_size=1, max_size=8),
                  min_size=1, max_size=12),
)
def test_boolean_query_matches_reference_evaluator(ray_session, tree, docs):
    """The vectorized tree matcher (arrow token masks + numpy logic)
    agrees with a plain recursive evaluator on arbitrary trees/corpora —
    parser round-trip included (fully parenthesized rendering)."""
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.functions.retrieval import boolean_query_topk

    t = pa.table({
        "doc_id": list(range(len(docs))),
        "text": [" ".join(d) for d in docs],
    })
    got = boolean_query_topk(rd.from_arrow(t), _render(tree),
                             k=len(docs) + 1).take_all()
    want = {i for i, d in enumerate(docs) if _ref_match(tree, d)}
    assert {r["doc_id"] for r in got} == want
