"""Sections aggregation + caption association vs independently-computed
golden structure."""

from __future__ import annotations

import collections

import pandas as pd
import pytest

from cosmos_ray.stages.aggregate import aggregate_documents, aggregate_sections, caption_associate


def _golden_sections(golden_small):
    """Independent recomputation from the golden segments: split on
    Title/Section Header, concat the rest."""
    by_url = collections.defaultdict(list)
    for r in golden_small["segments"].to_pylist():
        by_url[r["url"]].append(r)
    out = {}
    for url, rows in by_url.items():
        rows.sort(key=lambda r: r["seg_id"])
        secs = []
        cur = None
        for r in rows:
            if r["cls"] in ("Title", "Section Header"):
                if cur is not None:
                    secs.append(cur)
                cur = {"header": r["text"], "content": []}
            else:
                if cur is None:
                    cur = {"header": "", "content": []}
                cur["content"].append(r["text"])
        if cur is not None:
            secs.append(cur)
        out[url] = secs
    return out


def test_sections_match_golden(kg_small, golden_small):
    got = collections.defaultdict(list)
    for r in aggregate_sections(kg_small.segments).take_all():
        got[r["url"]].append(r)
    want = _golden_sections(golden_small)
    assert set(got) == set(want)
    for url in want:
        rows = sorted(got[url], key=lambda r: r["section_id"])
        assert [r["section_header"] for r in rows] == [s["header"] for s in want[url]]
        for r, s in zip(rows, want[url]):
            assert r["content"] == "\n".join(s["content"])
            assert len(r["obj_seg_ids"]) == len(s["content"])


def test_document_rollup_matches_text(kg_small, golden_small):
    got = {r["url"]: r for r in aggregate_documents(kg_small.segments).take_all()}
    want = {
        u: t
        for u, t in zip(
            golden_small["text"].column("url").to_pylist(),
            golden_small["text"].column("text").to_pylist(),
        )
    }
    assert set(got) == set(want)
    for url, text in want.items():
        assert got[url]["content"] == text
        assert len(got[url]["obj_pages"]) == len(text.split("\n"))


def test_corpus_caption_association(kg_small, golden_small):
    """With the table-bearing corpus: every (url, page) holding both a
    Table Caption and >=1 Table segment must produce a non-null match."""
    from cosmos_ray.stages.aggregate import associate_captions

    rows = associate_captions(kg_small.segments).take_all()
    assert rows, "corpus should contain captions"
    by_page = {}
    for r in golden_small["segments"].to_pylist():
        by_page.setdefault((r["url"], r["seg_id"] // 12), []).append(r["cls"])
    matched = unmatched = 0
    for r in rows:
        key = (r["url"], r["page_num"])
        classes = by_page.get(key, [])
        if "Table" in classes:
            assert r["object_seg_id"] is not None, f"unmatched caption on {key}"
            matched += 1
        else:
            unmatched += 1
    assert matched > 0


def test_caption_associate_greedy_nearest():
    page = pd.DataFrame(
        {
            "seg_id": [1, 2, 3, 4],
            "cls": ["Table", "Table Caption", "Table", "Table Caption"],
            "text": ["tbl-A", "Table 1: a", "tbl-B", "Table 2: b"],
            "bbox": [
                [0.0, 0.0, 10.0, 10.0],     # tbl-A centroid (5,5)
                [0.0, 12.0, 10.0, 14.0],    # cap1 centroid (5,13) -> tbl-A
                [0.0, 100.0, 10.0, 110.0],  # tbl-B centroid (5,105)
                [0.0, 112.0, 10.0, 114.0],  # cap2 centroid (5,113) -> tbl-B
            ],
        }
    )
    got = caption_associate(page, "Table Caption", "Table")
    assert {(r["caption_text"], r["object_text"]) for r in got} == {
        ("Table 1: a", "tbl-A"),
        ("Table 2: b", "tbl-B"),
    }
    # more captions than objects -> unmatched caption gets nulls
    page2 = page[page["cls"] == "Table Caption"].copy()
    got2 = caption_associate(page2, "Table Caption", "Table")
    assert all(r["object_seg_id"] is None for r in got2)


def test_equation_label_association_exact(kg_small, documents_small):
    """Exact (url, label, content) rows per planted equation (J3/G4):
    docs with doc_id % 4 == 1 carry one pre-block equation whose (X.Y)
    label sits in the adjacent block; all other docs emit no rows."""
    from cosmos_ray.sources.entity_dict import build_entity_dict
    from cosmos_ray.sources.pages import (
        MALFORMED_MOD,
        MALFORMED_REM,
        golden_doc,
    )
    from cosmos_ray.stages.aggregate import aggregate_equations

    got = {
        r["url"]: (r["label"], r["content"], r["equation_page"])
        for r in aggregate_equations(kg_small.segments).take_all()
    }
    kb = build_entity_dict()
    kb_rows = kb.to_pylist()
    kb_names = [r["name"] for r in kb_rows]
    kb_aliases = {r["name"]: r["aliases"] for r in kb_rows}

    n_eq = 0
    for d in documents_small.to_pylist():
        did = d["doc_id"]
        if did % MALFORMED_MOD == MALFORMED_REM:
            continue
        g = golden_doc(did, d["text"], d["lang"], d["source"], kb_names, kb_aliases)
        if did % 4 == 1:
            n_eq += 1
            want_label = f"({1 + did % 3}.{did % 5})"
            want_content = f"gamma = alpha + {did % 7} * beta"
            eq_seg = next(i for i, (tag, _) in enumerate(g.blocks) if tag == "pre")
            assert got[g.url] == (want_label, want_content, eq_seg // 12), g.url
        else:
            assert g.url not in got
    assert n_eq > 0


def test_caption_nearby_text_pooling(kg_small):
    """J1 wiring: every caption row carries the (y2, x1)-ordered pooled
    text of overlapping page lines, which must include the caption's own
    text (self-overlap is IoU 1)."""
    from cosmos_ray.stages.aggregate import associate_captions

    rows = associate_captions(kg_small.segments).take_all()
    assert rows
    for r in rows:
        assert r["caption_text"] in r["nearby_text"]
    # at least some captions pool more than their own text (an adjacent
    # line within the 150-px feather)
    assert any(r["nearby_text"] != r["caption_text"] for r in rows)


def test_multicolumn_reading_order():
    """A two-column page must read whole-left-column-then-right under
    column_split (the export x//500 heuristic), and interleave by y
    without it."""
    import pandas as pd

    from cosmos_ray.stages.aggregate import _reading_order

    # left column x=72, right column x=1000; two rows each
    g = pd.DataFrame(
        {
            "url": ["u"] * 4,
            "page_num": [0] * 4,
            "seg_id": [0, 1, 2, 3],
            "cls": ["Body Text"] * 4,
            "text": ["L1", "R1", "L2", "R2"],
            "bbox": [
                [72.0, 100.0, 500.0, 124.0],
                [1000.0, 100.0, 1400.0, 124.0],
                [72.0, 300.0, 500.0, 324.0],
                [1000.0, 300.0, 1400.0, 324.0],
            ],
        }
    )
    assert _reading_order(g, column_split=500)["text"].tolist() == ["L1", "L2", "R1", "R2"]
    assert _reading_order(g)["text"].tolist() == ["L1", "R1", "L2", "R2"]


def _seg_table(rows):
    import pyarrow as pa

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("page_num", pa.int32()),
            ("seg_id", pa.int32()),
            ("tag", pa.string()),
            ("cls", pa.string()),
            ("text", pa.string()),
            ("bbox", pa.list_(pa.float32(), 4)),
            ("score", pa.float32()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def test_regroup_merges_split_table_and_caption_associates():
    """A table fragmented into adjacent same-class segments (reference
    group_cls merge, `ocr/group_cls.py:60-144`) reassembles into ONE
    segment with a union bbox, and caption association then claims the
    merged object."""
    import ray.data as rd

    from cosmos_ray.stages.aggregate import associate_captions
    from cosmos_ray.stages.regroup import regroup_segments

    def seg(sid, cls, text, y1, y2, tag="td", score=0.8):
        return {
            "url": "https://s.example.org/p/1", "page_num": 0, "seg_id": sid,
            "tag": tag, "cls": cls, "text": text,
            "bbox": [72.0, y1, 400.0, y2], "score": score,
        }

    rows = [
        seg(0, "Body Text", "intro prose", 72.0, 96.0, tag="p"),
        seg(1, "Table", "alpha 1", 220.0, 244.0),
        seg(2, "Table", "beta 2", 368.0, 392.0),      # 124px gap: merges
        seg(3, "Table", "gamma 3", 516.0, 540.0),     # chains on
        seg(4, "Table Caption", "Table 1: metrics", 664.0, 688.0, tag="p", score=1.0),
        seg(5, "Body Text", "far away prose", 1500.0, 1524.0, tag="p"),
    ]
    merged = regroup_segments(rd.from_arrow(_seg_table(rows))).take_all()
    tables = [r for r in merged if r["cls"] == "Table"]
    assert len(tables) == 1
    t = tables[0]
    assert t["seg_id"] == 1  # representative = first fragment
    assert t["text"] == "alpha 1\nbeta 2\ngamma 3"
    assert t["bbox"] == [72.0, 220.0, 400.0, 540.0]  # union box
    assert t["score"] == pytest.approx(0.8)
    assert len(merged) == len(rows) - 2

    assoc = associate_captions(
        regroup_segments(rd.from_arrow(_seg_table(rows)))
    ).take_all()
    assert len(assoc) == 1
    assert assoc[0]["object_seg_id"] == 1
    assert assoc[0]["object_text"] == "alpha 1\nbeta 2\ngamma 3"


def test_regroup_respects_gap_class_and_page_boundaries():
    import ray.data as rd

    from cosmos_ray.stages.regroup import regroup_segments

    def seg(url, page, sid, cls, y1):
        return {
            "url": url, "page_num": page, "seg_id": sid, "tag": "td",
            "cls": cls, "text": f"t{sid}", "bbox": [72.0, y1, 400.0, y1 + 24.0],
            "score": 0.5,
        }

    rows = [
        seg("u1", 0, 0, "Table", 72.0),
        seg("u1", 0, 1, "Table", 400.0),    # 304px gap > 160: no merge
        seg("u1", 0, 2, "Figure", 448.0),   # class change: no merge
        seg("u1", 1, 0, "Table", 72.0),     # page change: no merge
        seg("u2", 1, 1, "Table", 100.0),    # url change: no merge
        seg("u2", 1, 2, "Body Text", 124.0),  # non-mergeable class
    ]
    out = regroup_segments(rd.from_arrow(_seg_table(rows))).take_all()
    assert len(out) == len(rows)  # nothing merges


def test_multicolumn_reading_order():
    """column_split reading order (reference export's x//500 column-break
    heuristic, `parquet_to_json.py:42-94`): the whole LEFT column reads
    before the right column within a page."""
    import ray.data as rd

    from cosmos_ray.stages.aggregate import aggregate_sections

    def seg(sid, cls, text, x1, y1, tag="p"):
        return {
            "url": "https://s.example.org/p/2", "page_num": 0, "seg_id": sid,
            "tag": tag, "cls": cls, "text": text,
            "bbox": [x1, y1, x1 + 300.0, y1 + 24.0], "score": 0.9,
        }

    # interleaved arrival order; left column (x=72) holds A1, A2; right
    # column (x=1000) holds B1, B2 at the SAME y positions
    rows = [
        seg(0, "Section Header", "H", 72.0, 72.0, tag="h2"),
        seg(1, "Body Text", "B1", 1000.0, 220.0),
        seg(2, "Body Text", "A1", 72.0, 220.0),
        seg(3, "Body Text", "B2", 1000.0, 368.0),
        seg(4, "Body Text", "A2", 72.0, 368.0),
    ]
    ds = rd.from_arrow(_seg_table(rows))
    single = aggregate_sections(ds, column_split=None).take_all()[0]["content"]
    multi = aggregate_sections(ds, column_split=500.0).take_all()[0]["content"]
    default = aggregate_sections(ds).take_all()[0]["content"]
    assert single == "A1\nB1\nA2\nB2"      # y-major interleave
    assert multi == "A1\nA2\nB1\nB2"       # whole left column first
    # the DEFAULT is column-aware (reference applies x//500 always)
    assert default == "A1\nA2\nB1\nB2"


def test_two_column_page_end_to_end(kg_small):
    """Pipeline-level multi-column gate: take a REAL classified document
    from the corpus, re-lay its segments out as a two-column page (first
    half of each page's rows -> left column, rest -> right column, y
    restarting), and assert the DEFAULT sections aggregation (column-
    aware, the reference's unconditional x//500 export heuristic)
    recovers the DOM reading order exactly, while the plain (page, y, x)
    order does not."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from cosmos_ray.stages.aggregate import aggregate_sections

    segs = kg_small.segments.to_pandas()
    # the url with the most single-page rows (>= 6 so both columns hold
    # multiple rows and interleaving is observable)
    url = segs.groupby("url").size().idxmax()
    one = segs[segs["url"] == url].sort_values("seg_id").reset_index(drop=True)
    assert len(one) >= 6

    def to_ds(df):
        t = pa.Table.from_pandas(df, preserve_index=False)
        bb = pa.array([list(map(float, b)) for b in df["bbox"]],
                      pa.list_(pa.float32(), 4))
        return rd.from_arrow(t.set_column(
            t.schema.get_field_index("bbox"), "bbox", bb))

    def sections(df, **kw):
        return (aggregate_sections(to_ds(df), **kw).to_pandas()
                .sort_values("section_id").reset_index(drop=True)
                [["section_id", "section_header", "content"]])

    base = sections(one)

    twocol = one.copy()
    for page, idx in twocol.groupby("page_num").groups.items():
        idx = list(idx)
        half = (len(idx) + 1) // 2
        ys = [list(twocol.loc[i, "bbox"])[1] for i in idx]  # original slots
        boxes = []
        for k, i in enumerate(idx):
            x1, y1, x2, y2 = map(float, twocol.loc[i, "bbox"])
            h = y2 - y1
            if k < half:
                boxes.append([x1, ys[k], min(x2, 900.0), ys[k] + h])
            else:  # right column, y restarts at the top slots
                y = ys[k - half]
                boxes.append([x1 + 960.0, y, min(x2, 900.0) + 960.0, y + h])
        for i, b in zip(idx, boxes):
            twocol.at[i, "bbox"] = b

    got_aware = sections(twocol)  # default column_split = page midline
    got_plain = sections(twocol, column_split=None)

    assert got_aware.equals(base)          # DOM order recovered
    assert not got_plain.equals(base)      # plain y-order interleaves
