"""Multimodal plumbing: schema/batching/actor contract with the stubbed
decoder (no codecs in this container — FIXTURES/spec allow a
deterministic fake behind the real Ray-side plumbing)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from cosmos_ray.stages import multimodal


def _media_table(n=20):
    rows = [
        {
            "media_id": f"m{i}",
            "kind": "image",
            "payload": (b"\x89PNGfake" + bytes([i])) * (10 + i),
            "mime": "image/png",
            "meta": "{}",
        }
        for i in range(n)
    ]
    return pa.Table.from_pylist(rows, schema=multimodal.MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.DecodeImage(fake=False).decode(b"xx")


def test_fake_decode_pipeline_schema_and_determinism():
    ds = rd.from_arrow(_media_table())
    out1 = multimodal.decode_images(ds, fake=True).take_all()
    out2 = multimodal.decode_images(ds, fake=True).take_all()
    assert len(out1) == 20
    by_id = {r["media_id"]: r for r in out1}
    for r in out2:
        w = by_id[r["media_id"]]
        assert (r["width"], r["height"], r["channels"]) == (w["width"], w["height"], w["channels"])
        assert r["feature"] == w["feature"]
        assert len(r["feature"]) == 8


def test_frame_sampling_fanout():
    ds = rd.from_arrow(_media_table(5))
    frames = multimodal.sample_frames(ds, every_n=2).take_all()
    assert len(frames) >= 5
    for r in frames:
        assert r["frame_idx"] % 2 == 0
        assert isinstance(r["frame"], bytes)
