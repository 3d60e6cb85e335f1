"""QA span extraction (D4), rerank top-k (D5/O6), boilerplate detection
(M14 web analog), and the declarative aggregation registry (G5/§2.11)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd


# ---------------------------------------------------------------- QA spans

def test_qa_extractor_spans_and_offsets():
    from cosmos_ray.stages.qa import answer_questions

    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma scan delta epsilon",
                "nothing relevant here",
                "x y zeta scan omega then kappa scan mu",
            ],
        }
    )
    rows = answer_questions(rd.from_arrow(docs), "what scans?").take_all()
    by = {r["doc_id"]: r for r in rows}
    assert by[1]["answer"] == "gamma"
    assert by[1]["answer_start"] == 11 and by[1]["answer_end"] == 16
    assert by[2]["answer"] is None and by[2]["qa_score"] is None
    assert by[3]["answer"] == "zeta"  # first occurrence wins


def test_qa_rejects_unsupported_question():
    from cosmos_ray.stages.qa import QaExtractor

    with pytest.raises(ValueError):
        QaExtractor("why is the sky blue?")


# ---------------------------------------------------------------- rerank

def test_rerank_topk_order_and_determinism():
    from cosmos_ray.stages.qa import rerank_topk

    cands = pa.table(
        {
            "cid": [1, 2, 3, 4],
            "text": [
                "spark join optimization guide",        # 3 hits / sqrt(4)
                "spark overview",                        # 1 hit / sqrt(2)
                "join join join join",                   # 1-distinct but 4 hits
                "unrelated text entirely here",          # 0
            ],
        }
    )
    top = rerank_topk(rd.from_arrow(cands), "spark join optimization",
                      k=3, tiebreak_cols=["cid"]).take_all()
    assert [r["cid"] for r in top][0] == 3 or top[0]["rerank_score"] >= top[1]["rerank_score"]
    scores = [r["rerank_score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    assert len(top) == 3 and all(r["rerank_score"] > 0 for r in top)
    # deterministic across runs
    again = rerank_topk(rd.from_arrow(cands), "spark join optimization",
                        k=3, tiebreak_cols=["cid"]).take_all()
    assert [r["cid"] for r in again] == [r["cid"] for r in top]


# ---------------------------------------------------------------- boilerplate

def test_boilerplate_detection_exact(kg_small, golden_small):
    """Exact golden: the (site, text) boilerplate set at min_frac=0.9
    must equal the blocks appearing on >= 90% of each site's pages,
    computed independently from the golden corpus."""
    from collections import Counter, defaultdict

    from cosmos_ray.stages.enrich import detect_boilerplate, mask_boilerplate

    got_ds = detect_boilerplate(kg_small.segments, min_frac=0.9, min_pages=5)
    got = {(r["site"], r["text"]) for r in got_ds.take_all()}

    pages_by_site: dict[str, set] = defaultdict(set)
    text_counts: dict[str, Counter] = defaultdict(Counter)
    seg_rows = golden_small["segments"].to_pylist()
    for url in {r["url"] for r in seg_rows}:
        pages_by_site[url.split("/")[2]].add(url)
    seen = set()
    for r in seg_rows:
        key = (r["url"], r["text"])
        if key in seen:
            continue
        seen.add(key)
        text_counts[r["url"].split("/")[2]][r["text"]] += 1
    want = set()
    for site, pages in pages_by_site.items():
        if len(pages) < 5:
            continue
        for text, n in text_counts[site].items():
            if n / len(pages) >= 0.9:
                want.add((site, text))
    assert got == want
    assert any(t == "Overview" for _, t in got)  # planted furniture found

    # masking removes exactly the boilerplate rows
    masked = mask_boilerplate(kg_small.segments, got_ds)
    left = {(r["url"].split("/")[2], r["text"])
            for r in masked.select_columns(["url", "text"]).take_all()}
    assert not (left & got)


# ---------------------------------------------------------------- registry

def test_aggregation_registry_routes_and_extends(kg_small):
    from cosmos_ray.pipelines.registry import (
        AGGREGATIONS,
        register_aggregation,
        run_aggregations,
    )

    outs = run_aggregations(kg_small.segments, ["sections", "equations"])
    assert set(outs) == {"sections", "equations"}
    assert outs["sections"].count() > 0
    assert outs["equations"].count() > 0

    with pytest.raises(KeyError):
        run_aggregations(kg_small.segments, ["nope"])

    def my_agg(segments_ds, **kw):
        return segments_ds.select_columns(["url"])

    register_aggregation("my_agg", my_agg)
    try:
        with pytest.raises(ValueError):
            register_aggregation("my_agg", my_agg)
        out = run_aggregations(kg_small.segments, ["my_agg"])["my_agg"]
        assert out.count() == kg_small.segments.count()
    finally:
        AGGREGATIONS.pop("my_agg", None)


def test_stage_protocol_applies():
    from cosmos_ray.pipelines.registry import Stage, apply_stages

    def double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(0, "x", pc.multiply(t.column("x"), pa.scalar(2)))

    ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
    out = apply_stages(ds, [Stage("double", double), Stage("double2", double)])
    assert sorted(r["x"] for r in out.take_all()) == [4, 8, 12]
