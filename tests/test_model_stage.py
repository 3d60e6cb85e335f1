"""GPU-shaped weights-backed classifier stage (`stages/model.py`): the
actor-pool resource-plumbing template for porting the reference's
trained detector (inference.py:23-57)."""

from __future__ import annotations

import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def extracted_small(pages_small):
    from cosmos_ray.stages import extract

    return extract.extract(rd.from_arrow(pages_small)).filter(
        lambda r: r["error"] is None
    ).materialize()


def test_weights_roundtrip_matches_deterministic_classifier(
        extracted_small, tmp_path):
    """Loading scores from the checkpoint file reproduces the
    deterministic classifier's output exactly (same corpus, same
    classes/scores) through a real actor pool with
    fn_constructor_kwargs."""
    from cosmos_ray.stages.model import save_default_weights, segment_with_model
    from cosmos_ray.stages.segment import segment

    w = str(tmp_path / "clf.npz")
    save_default_weights(w)
    got = segment_with_model(extracted_small, w, concurrency=1).take_all()
    want = segment(extracted_small, classifier_concurrency=1).take_all()
    key = lambda r: (r["url"], r["seg_id"])
    got = {key(r): (r["cls"], round(r["score"], 6)) for r in got}
    want = {key(r): (r["cls"], round(r["score"], 6)) for r in want}
    assert got == want and len(got) > 0


def test_missing_or_corrupt_weights_fail_loudly(extracted_small, tmp_path):
    import numpy as np

    from cosmos_ray.stages.model import ModelSegmentClassifier

    with pytest.raises(FileNotFoundError):
        ModelSegmentClassifier(str(tmp_path / "absent.npz"))
    bad = tmp_path / "bad.npz"
    import json as _json
    meta = np.frombuffer(_json.dumps({"version": 999}).encode(), np.uint8)
    with open(bad, "wb") as f:
        np.savez(f, combo_classes=np.array([["x"]], object),
                 combo_scores=np.array([[1.0]], np.float32), meta=meta)
    with pytest.raises(ValueError):
        ModelSegmentClassifier(str(bad))


def test_gpu_resource_plumbing_is_lazy(extracted_small, tmp_path):
    """Requesting num_gpus builds the plan without scheduling (Datasets
    are lazy) — the template accepts the GPU reservation args even on a
    GPU-less box; execution would wait for a GPU, so only the plan is
    asserted here."""
    from cosmos_ray.stages.model import save_default_weights, segment_with_model

    w = str(tmp_path / "clf.npz")
    save_default_weights(w)
    ds = segment_with_model(extracted_small, w, concurrency=2,
                            num_gpus=0.25, batch_size=64)
    assert "ModelSegmentClassifier" in str(ds)


def test_device_resolution_without_torch(tmp_path):
    from cosmos_ray.stages.model import ModelSegmentClassifier, save_default_weights

    w = str(tmp_path / "clf.npz")
    save_default_weights(w)
    clf = ModelSegmentClassifier(w, device="auto")
    assert clf.device in ("cpu", "cuda")  # cpu in this container
    assert ModelSegmentClassifier(w, device="cuda").device == "cuda"
