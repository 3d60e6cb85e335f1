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


def test_resize_and_pad_geometry_exact():
    import numpy as np

    from cosmos_ray.stages.multimodal import pad_square, resize_longest

    img = np.arange(12 * 8 * 3, dtype=np.uint8).reshape(12, 8, 3)
    r = resize_longest(img, 24)  # longest edge 12 -> 24, aspect kept
    assert r.shape == (24, 16, 3)
    assert r[0, 0, 0] == img[0, 0, 0] and r[-1, -1, -1] == img[-1, -1, -1]
    p = pad_square(r, 24)
    assert p.shape == (24, 24, 3)
    assert (p[:, 16:] == 255).all()  # right padding white
    import pytest

    with pytest.raises(ValueError):
        pad_square(r, 10)


def test_preprocess_images_pipeline_fake():
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.stages.multimodal import preprocess_images

    media = pa.table(
        {
            "media_id": ["a", "b"],
            "kind": ["image", "image"],
            "payload": [b"imgbytes-a", b"imgbytes-b"],
            "mime": ["image/png", "image/png"],
            "meta": ["{}", "{}"],
        }
    )
    rows = preprocess_images(rd.from_arrow(media), fake=True, target=48).take_all()
    assert len(rows) == 2
    for r in rows:
        assert max(r["width"], r["height"]) == 48
        assert len(r["pixels"]) == 48 * 48 * 3  # padded square payload


def test_chunk_audio_fanout_and_overlap():
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.stages.multimodal import chunk_audio

    media = pa.table(
        {
            "media_id": ["s"],
            "kind": ["audio"],
            "payload": [bytes(range(256)) * 40],  # 10240 bytes
            "mime": ["audio/pcm"],
            "meta": ["{}"],
        }
    )
    rows = chunk_audio(rd.from_arrow(media), chunk_bytes=4096, hop_bytes=2048).take_all()
    assert [r["chunk_idx"] for r in rows] == list(range(5))
    assert len(rows[0]["chunk"]) == 4096
    # 50% overlap: second half of chunk 0 == first half of chunk 1
    assert rows[0]["chunk"][2048:] == rows[1]["chunk"][:2048]
