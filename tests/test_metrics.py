"""Evaluation aggregates (G9/G10): AP == 1.0 on the perfect synthetic
corpus, AP < 1.0 under an injected misclassification; per-doc P/R/F1
likewise (reference gates: AP > 0.9 `annotation_metrics.py:10-11`)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from cosmos_ray.stages import metrics


@pytest.fixture(scope="module")
def annotations(golden_small):
    return metrics.golden_annotations(golden_small["segments"])


def _flip_one_cls(segments_ds):
    """Misclassify exactly one segment: the first Title becomes Body
    Text (deterministic: min url among Titles)."""
    import pyarrow.compute as pc

    titles = segments_ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("cls"), pa.scalar("Title"))),
        batch_format="pyarrow",
    ).take_all()
    victim = min(r["url"] for r in titles)

    def flip(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t.column("url"), pa.scalar(victim)),
            pc.equal(t.column("cls"), pa.scalar("Title")),
        )
        new_cls = pc.if_else(mask, pa.scalar("Body Text"), t.column("cls"))
        return t.set_column(t.schema.get_field_index("cls"), "cls", new_cls)

    return segments_ds.map_batches(flip, batch_format="pyarrow"), victim


def test_ap_perfect_corpus(kg_small, annotations):
    rows = metrics.detection_ap(kg_small.segments, annotations).take_all()
    by_cls = {r["cls"]: r for r in rows}
    assert by_cls, "no AP rows"
    for cls, r in by_cls.items():
        assert r["n_pred"] == r["n_gold"] > 0, cls
        assert r["ap"] == 1.0, (cls, r)
        assert r["ap50"] == 1.0 and r["ap75"] == 1.0, cls


def test_ap_detects_injected_misclassification(kg_small, annotations):
    flipped, _ = _flip_one_cls(kg_small.segments)
    rows = {r["cls"]: r for r in metrics.detection_ap(flipped, annotations).take_all()}
    # Title loses a detection (recall gap) and Body Text gains a false
    # positive: both APs drop below 1
    assert rows["Title"]["ap"] < 1.0
    assert rows["Body Text"]["ap"] < 1.0
    # untouched classes stay perfect
    assert rows["List Item"]["ap"] == 1.0


def test_prf_perfect_and_summary(kg_small, annotations):
    prf = metrics.detection_prf(kg_small.segments, annotations)
    rows = prf.take_all()
    assert rows and all(r["f1"] == 1.0 for r in rows)
    summary = metrics.prf_summary(
        metrics.detection_prf(kg_small.segments, annotations)
    ).to_pylist()[0]
    assert summary["mean_f1"] == 1.0 and summary["min_f1"] == 1.0
    assert summary["n_docs"] == len(rows)


def test_prf_detects_injected_misclassification(kg_small, annotations):
    flipped, victim = _flip_one_cls(kg_small.segments)
    rows = {r["url"]: r for r in metrics.detection_prf(flipped, annotations).take_all()}
    assert rows[victim]["f1"] < 1.0
    others = [r for u, r in rows.items() if u != victim]
    assert all(r["f1"] == 1.0 for r in others)
