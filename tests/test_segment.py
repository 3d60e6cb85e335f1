"""Segment explode + classification: exact per-url class counts and
reading order (reference analog: `check_document_count`
`annotations_base.py:125-128` exact-count gate; reading order
`ocr/ocr.py:81`, `aggregate.py:115-156`)."""

from __future__ import annotations

import collections

import pyarrow as pa

from cosmos_ray.stages.segment import CLASSES, SegmentClassifier, explode_segments


def _golden_by_url(golden_small):
    by_url = collections.defaultdict(list)
    t = golden_small["segments"]
    for r in t.to_pylist():
        by_url[r["url"]].append(r)
    return by_url


def test_exact_class_counts_per_url(kg_small, golden_small):
    got = collections.Counter()
    for r in kg_small.segments.select_columns(["url", "cls"]).take_all():
        got[(r["url"], r["cls"])] += 1
    want = collections.Counter()
    for r in golden_small["segments"].to_pylist():
        want[(r["url"], r["cls"])] += 1
    assert got == want


def test_reading_order_and_text(kg_small, golden_small):
    segs = kg_small.segments.select_columns(["url", "seg_id", "text"]).take_all()
    got = collections.defaultdict(dict)
    for r in segs:
        got[r["url"]][r["seg_id"]] = r["text"]
    for url, rows in _golden_by_url(golden_small).items():
        for r in rows:
            assert got[url][r["seg_id"]] == r["text"]


def test_classifier_contract_ranked_scores():
    t = pa.table(
        {
            "url": ["u"] * 3,
            "page_num": pa.array([0, 0, 0], pa.int32()),
            "seg_id": pa.array([0, 1, 2], pa.int32()),
            "tag": ["h1", "p", "p"],
            "text": ["My Title", "Body text here.", "Table 3: caption text"],
            "bbox": pa.array([[0.0, 0.0, 1.0, 1.0]] * 3, pa.list_(pa.float32(), 4)),
        }
    )
    out = SegmentClassifier()(t)
    rows = out.to_pylist()
    # ranked (score, cls) descending, full class list
    for r in rows:
        assert sorted(r["scores"], reverse=True) == r["scores"]
        assert set(r["classes"]) == set(CLASSES)
        assert r["cls"] == r["classes"][0] or r["score"] == 1.0  # rules override
    assert rows[0]["cls"] == "Title"
    assert rows[1]["cls"] == "Body Text"
    assert rows[2]["cls"] == "Table Caption" and rows[2]["score"] == 1.0


def _extracted_row(url: str, blocks: list[tuple[str, str]]) -> dict:
    return {
        "url": url,
        "warc_ts": None,
        "lang": "en",
        "text": "\n".join(t for _, t in blocks),
        "blocks": [{"tag": tg, "text": t} for tg, t in blocks],
        "n_blocks": len(blocks),
        "error": None,
    }


def _classified(rows, **clf_kw):
    from cosmos_ray.stages.extract import EXTRACTED_SCHEMA

    batch = pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)
    return SegmentClassifier(**clf_kw)(explode_segments(batch)).to_pylist()


def test_page_context_isolated_table_cell_demoted():
    """D2 parity: the class of a segment changes based on its neighbors —
    a lone <td> surrounded by prose demotes to Body Text, while the same
    cell next to another table cell stays Table."""
    lone = _extracted_row(
        "http://a", [("p", "Intro paragraph."), ("td", "stray cell"), ("p", "More text.")]
    )
    real = _extracted_row(
        "http://b",
        [("p", "Intro."), ("td", "metric"), ("td", "value"), ("p", "After.")],
    )
    by = {(r["url"], r["seg_id"]): r for r in _classified([lone, real])}
    assert by[("http://a", 1)]["cls"] == "Body Text"
    assert by[("http://b", 1)]["cls"] == "Table"
    assert by[("http://b", 2)]["cls"] == "Table"
    # without page context the lone cell keeps its tag prior
    by2 = {(r["url"], r["seg_id"]): r
           for r in _classified([lone, real], page_context=False)}
    assert by2[("http://a", 1)]["cls"] == "Table"


def test_page_context_other_smoothing_and_neighbor_features():
    """An unknown-prior segment adopts the neighbor majority class; the
    emitted neighbor_cls feature column carries the <=15 IoU neighbors
    (featurizer.py:84-125 feature-vector parity)."""
    row = _extracted_row(
        "http://c",
        [("p", "One body paragraph."), ("h5", "Odd heading"),
         ("p", "Another body paragraph.")],
    )
    out = _classified([row], emit_neighbors=True)
    assert out[1]["cls"] == "Body Text"
    assert out[1]["neighbor_cls"] == ["Body Text", "Body Text"]
    assert len(out[0]["neighbor_cls"]) >= 1


def test_explode_is_batch_shape_stable():
    # explode on an empty batch yields the schema, not an error
    from cosmos_ray.stages.extract import EXTRACTED_SCHEMA

    empty = EXTRACTED_SCHEMA.empty_table()
    out = explode_segments(empty)
    assert out.num_rows == 0
    assert "seg_id" in out.schema.names


def test_two_column_layout_invariants(documents_small):
    """The synthetic corpus plants two-column pages (>=20%, VERDICT r3
    #3): plain (page, y, x) ordering provably scrambles reading order on
    them, while the column-aware (page, x-bin, y) order reconstructs the
    golden segment order exactly; unbreakable floats (td runs, pre+label
    pairs) never straddle the column break."""
    import numpy as np

    from cosmos_ray.sources.pages import golden_corpus
    from cosmos_ray.stages.segment import (
        did_of_url,
        layout_twocol_mask,
        synthetic_bboxes,
    )

    segs = golden_corpus(documents_small)["segments"]
    seg_id = np.array(segs.column("seg_id").to_pylist(), np.int64)
    urls = segs.column("url").to_pylist()
    tags = segs.column("tag").to_pylist()
    dids = np.array([did_of_url(u) for u in urls], np.int64)
    td = np.array([t == "td" for t in tags])
    pre = np.array([t == "pre" for t in tags])
    tc = layout_twocol_mask(dids, seg_id, td, pre)

    page_key = dids * (1 << 22) + seg_id // 12
    uk, inv = np.unique(page_key, return_inverse=True)
    page_tc = np.zeros(len(uk), bool)
    page_tc[inv[tc]] = True
    assert page_tc.mean() >= 0.20, "fewer than 20% two-column pages"

    lens = np.array([len(t) for t in segs.column("text").to_pylist()],
                    np.float32)
    bb = synthetic_bboxes(seg_id.astype(np.int32), lens, tc)
    # no float straddles the break: two-col td/pre rows never sit at the
    # column boundary without a same-column same-tag neighbor (checked
    # structurally: td at pos 5+6 or td/pre at pos 11 forces single-col)
    pos = seg_id % 12
    assert not (tc & (td | pre) & (pos == 11)).any()

    import collections
    by_url = collections.defaultdict(list)
    for i, u in enumerate(urls):
        by_url[u].append(i)
    broken_plain = 0
    for u, idxs in by_url.items():
        idxs = sorted(idxs, key=lambda i: seg_id[i])
        page = seg_id[idxs] // 12
        y1 = bb[idxs, 1]
        x1 = bb[idxs, 0]
        plain = np.lexsort((x1, y1, page))
        aware = np.lexsort((x1, y1, (x1 // 960.0).astype(np.int64), page))
        # column-aware order ALWAYS reconstructs the golden seg order
        assert list(aware) == list(range(len(idxs))), u
        if list(plain) != list(range(len(idxs))):
            broken_plain += 1
    assert broken_plain > 0, "plain (page,y,x) never broke — layout inert"
