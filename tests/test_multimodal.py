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


class TestRealCodecs:
    """The pure-numpy BMP/PPM codecs: real decode, byte-exact roundtrip."""

    def test_bmp_roundtrip_exact_with_padding(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        rng = np.random.RandomState(7)
        for w, h in [(33, 17), (32, 32), (1, 1), (5, 64)]:  # odd strides
            img = rng.randint(0, 256, (h, w, 3), np.uint8)
            assert np.array_equal(ic.decode_bmp(ic.encode_bmp(img)), img)

    def test_bmp_top_down_rows(self):
        import struct

        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
        payload = bytearray(ic.encode_bmp(img))
        # flip height negative (top-down) and re-order pixel rows
        w, h = 4, 3
        struct.pack_into("<i", payload, 14 + 8, -h)
        stride = (w * 3 + 3) & ~3
        off = len(payload) - h * stride
        rows = np.frombuffer(bytes(payload[off:]), np.uint8).reshape(h, stride)
        payload[off:] = rows[::-1].tobytes()
        assert np.array_equal(ic.decode_bmp(bytes(payload)), img)

    def test_ppm_and_pgm_roundtrip(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (9, 13, 3), np.uint8)
        assert np.array_equal(ic.decode_ppm(ic.encode_ppm(img)), img)
        # P5 grayscale with a comment line expands to 3 channels
        gray = rng.randint(0, 256, (4, 6), np.uint8)
        p5 = b"P5\n# a comment\n6 4\n255\n" + gray.tobytes()
        out = ic.decode_ppm(p5)
        assert out.shape == (4, 6, 3)
        assert np.array_equal(out[:, :, 0], gray)
        assert np.array_equal(out[:, :, 1], gray)

    def test_decode_images_real_bmp_pipeline(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        rng = np.random.RandomState(3)
        imgs = {f"b{i}": rng.randint(0, 256, (8 + i, 12 + i, 3), np.uint8)
                for i in range(6)}
        rows = [{"media_id": k, "kind": "image",
                 "payload": ic.encode_bmp(v), "mime": "image/bmp",
                 "meta": "{}"} for k, v in imgs.items()]
        ds = rd.from_arrow(pa.Table.from_pylist(
            rows, schema=multimodal.MEDIA_SCHEMA))
        # fake=False: these are REAL decodes, no stand-in involved
        out = {r["media_id"]: r
               for r in multimodal.decode_images(ds, fake=False).take_all()}
        for k, img in imgs.items():
            r = out[k]
            assert (r["height"], r["width"], r["channels"]) == img.shape
            want = np.resize(
                img.astype(np.float32).mean(axis=(0, 1)) / 255.0, 8)
            assert np.allclose(r["feature"], want, atol=1e-6)

    def test_unknown_magic_still_raises(self):
        import pytest as _pytest

        from cosmos_ray.functions import imagecodec as ic

        with _pytest.raises(NotImplementedError):
            ic.decode_image(b"GIF89a....")  # no GIF codec
        # truncated JPEG magic now reaches the real decoder and fails
        # loudly as a malformed stream, not as a missing codec
        with _pytest.raises(ValueError):
            ic.decode_image(b"\xff\xd8\xff\xe0jpeg")

    def test_truncated_png_raises(self):
        import pytest as _pytest

        from cosmos_ray.functions import imagecodec as ic

        with _pytest.raises((ValueError, Exception)):
            ic.decode_image(b"\x89PNG\r\n\x1a\n....")


class TestWavCodec:
    def test_roundtrip_16bit_stereo(self):
        import numpy as np

        from cosmos_ray.functions import audiocodec as ac

        rng = np.random.RandomState(5)
        x = (rng.rand(800, 2) * 2 - 1) * 0.9
        y, sr = ac.decode_wav(ac.encode_wav(x, sample_rate=8000, bits=16))
        assert sr == 8000 and y.shape == (800, 2)
        # 16-bit quantization + the 32767-encode/32768-decode scale
        # asymmetry bound: |err| <= 0.5/32767 + |x|/32767 ~ 1.5 LSB
        assert np.abs(y - x).max() < 1.5 / 32768

    def test_roundtrip_float32_exact(self):
        import numpy as np

        from cosmos_ray.functions import audiocodec as ac

        rng = np.random.RandomState(6)
        x = (rng.rand(300) * 2 - 1).astype(np.float32)
        y, sr = ac.decode_wav(ac.encode_wav(x, sample_rate=44100, bits=32))
        assert sr == 44100
        assert np.array_equal(y[:, 0], x)  # float WAV is exact

    def test_decode_audio_pipeline_real(self):
        import numpy as np

        from cosmos_ray.functions import audiocodec as ac

        rng = np.random.RandomState(9)
        rows = []
        want = {}
        for i in range(4):
            x = (rng.rand(1000 + 100 * i) * 2 - 1) * 0.5
            want[f"a{i}"] = x
            rows.append({"media_id": f"a{i}", "kind": "audio",
                         "payload": ac.encode_wav(x, sample_rate=16000),
                         "mime": "audio/wav", "meta": "{}"})
        ds = rd.from_arrow(pa.Table.from_pylist(
            rows, schema=multimodal.MEDIA_SCHEMA))
        out = {r["media_id"]: r
               for r in multimodal.decode_audio(ds).take_all()}
        for k, x in want.items():
            r = out[k]
            assert r["n_samples"] == len(x) and r["channels"] == 1
            assert abs(r["duration_s"] - len(x) / 16000) < 1e-12
            assert abs(r["rms"] - float(np.sqrt(np.mean(x ** 2)))) < 1e-3

    def test_compressed_audio_raises(self):
        import pytest as _pytest

        from cosmos_ray.functions import audiocodec as ac

        with _pytest.raises(NotImplementedError):
            ac.decode_wav(b"ID3\x04...mp3 bytes...")


class TestY4MCodec:
    def test_roundtrip_exact(self):
        import numpy as np

        from cosmos_ray.functions import videocodec as vc

        rng = np.random.RandomState(13)
        frames = rng.randint(0, 256, (5, 18, 24), np.uint8)
        out, fps = vc.decode_y4m(vc.encode_y4m(frames, fps=(30, 1)))
        assert fps == (30, 1)
        assert np.array_equal(out, frames)  # luma is byte-exact

    def test_zero_frames(self):
        import numpy as np

        from cosmos_ray.functions import videocodec as vc

        out, _ = vc.decode_y4m(vc.encode_y4m(
            np.empty((0, 16, 16), np.uint8)))
        assert out.shape == (0, 16, 16)

    def test_decode_video_pipeline_real(self):
        import numpy as np

        from cosmos_ray.functions import videocodec as vc

        rng = np.random.RandomState(15)
        rows, want = [], {}
        for i in range(3):
            frames = rng.randint(0, 256, (2 + i, 16, 20), np.uint8)
            want[f"v{i}"] = frames
            rows.append({"media_id": f"v{i}", "kind": "video",
                         "payload": vc.encode_y4m(frames),
                         "mime": "video/x-y4m", "meta": "{}"})
        ds = rd.from_arrow(pa.Table.from_pylist(
            rows, schema=multimodal.MEDIA_SCHEMA))
        out = {r["media_id"]: r
               for r in multimodal.decode_video(ds).take_all()}
        for k, frames in want.items():
            r = out[k]
            assert (r["n_frames"], r["height"], r["width"]) == frames.shape
            assert abs(r["mean_luma"] - frames.mean()) < 1e-9

    def test_compressed_video_raises(self):
        import pytest as _pytest

        from cosmos_ray.functions import videocodec as vc

        with _pytest.raises(NotImplementedError):
            vc.decode_y4m(b"\x00\x00\x00\x18ftypmp42 fake mp4")


def test_sample_frames_real_roundtrip():
    """Sampled Y4M frames come back as decodable PGM payloads that
    byte-match the source frames."""
    import numpy as np

    from cosmos_ray.functions import imagecodec as ic
    from cosmos_ray.functions import videocodec as vc
    from cosmos_ray.stages.multimodal import sample_frames_real

    rng = np.random.RandomState(21)
    frames = rng.randint(0, 256, (7, 12, 16), np.uint8)
    media = pa.Table.from_pylist(
        [{"media_id": "clip", "kind": "video",
          "payload": vc.encode_y4m(frames), "mime": "video/x-y4m",
          "meta": "{}"}], schema=multimodal.MEDIA_SCHEMA)
    rows = sample_frames_real(rd.from_arrow(media), every_n=3).take_all()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    for r in rows:
        luma = ic.decode_ppm(r["frame"])[:, :, 0]  # P5 -> gray channel
        assert np.array_equal(luma, frames[r["frame_idx"]])


class TestPngCodec:
    def test_roundtrip_gray_rgb_rgba(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        rng = np.random.RandomState(3)
        for shape in [(11, 7), (9, 13, 3), (6, 5, 4), (1, 1, 3)]:
            img = rng.randint(0, 256, size=shape).astype(np.uint8)
            out = ic.decode_png(ic.encode_png(img))
            assert out.shape == img.shape and (out == img).all()

    def test_decode_image_sniffs_png(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        img = np.full((4, 4, 3), 9, np.uint8)
        assert (ic.decode_image(ic.encode_png(img)) == img).all()

    def test_all_standard_filters_decode(self):
        """Independent spec-side filterer in the test: an image is
        FILTERED per ISO 15948 (Sub/Up/Average/Paeth per row) and the
        decoder must invert every filter exactly."""
        import struct
        import zlib

        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(5, 6, 3)).astype(np.uint8)
        h, w, ch = img.shape
        rows = img.reshape(h, -1).astype(np.int64)
        filters = [1, 2, 3, 4, 0]
        scan = bytearray()
        for y in range(h):
            f = filters[y]
            rec = rows[y]
            prev = rows[y - 1] if y else np.zeros(w * ch, np.int64)
            raw = np.zeros(w * ch, np.int64)
            for x in range(w * ch):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                        (b if pb_ <= pc_ else c)
                raw[x] = (rec[x] - pred) % 256
            scan.append(f)
            scan.extend(raw.astype(np.uint8).tobytes())

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body)
                                  & 0xFFFFFFFF))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(scan)))
               + chunk(b"IEND", b""))
        assert (ic.decode_png(png) == img).all()

    def test_unsupported_subset_raises(self):
        import struct
        import pytest as _pytest

        from cosmos_ray.functions import imagecodec as ic

        bad = (b"\x89PNG\r\n\x1a\n"
               + struct.pack(">I", 13) + b"IHDR"
               + struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
               + b"\x00\x00\x00\x00")
        with _pytest.raises(NotImplementedError):
            ic.decode_png(bad)

    def test_decode_images_real_png_pipeline(self):
        import numpy as np
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.functions import imagecodec as ic
        from cosmos_ray.stages.multimodal import decode_images

        rng = np.random.RandomState(11)
        imgs = [rng.randint(0, 256, size=(8 + i, 10, 3)).astype(np.uint8)
                for i in range(4)]
        media = rd.from_arrow(pa.table({
            "media_id": pa.array([f"p{i}" for i in range(4)], pa.string()),
            "payload": pa.array([ic.encode_png(m) for m in imgs],
                                pa.binary())}))
        out = {r["media_id"]: r for r in
               decode_images(media, fake=False).take_all()}
        for i, m in enumerate(imgs):
            assert out[f"p{i}"]["height"] == m.shape[0]


class TestJpegCodec:
    """Baseline JPEG (ITU-T T.81) encode/decode — pure numpy + stdlib."""

    def test_flat_tile_exact_reconstruction(self):
        """Flat 8x8 tiles replay exactly through DCT+quant+Huffman:
        recon(v) = clip(floor((v-128)/2 + 0.5)*2 + 128) with the Annex-K
        DC quantizer 16 — including the mathematically-exact-half
        boundary (v=163 -> 164)."""
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        vals = [0, 7, 77, 128, 163, 201, 255]
        img = np.zeros((8, 8 * len(vals)), np.uint8)
        for i, v in enumerate(vals):
            img[:, i * 8:(i + 1) * 8] = v
        dec = ic.decode_jpeg(ic.encode_jpeg(img))
        for i, v in enumerate(vals):
            want = min(max(int(np.floor((v - 128) / 2 + 0.5) * 2 + 128), 0), 255)
            tile = dec[:, i * 8:(i + 1) * 8]
            assert (tile == want).all(), (v, want, np.unique(tile))

    def test_roundtrip_smooth_gray_and_rgb(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        yy, xx = np.mgrid[0:40, 0:56]
        g = (np.sin(yy / 10.0) * 40 + np.cos(xx / 9.0) * 40 + 128).astype(np.uint8)
        dg = ic.decode_jpeg(ic.encode_jpeg(g))
        assert dg.shape == g.shape
        assert np.abs(dg.astype(int) - g.astype(int)).mean() < 3.0
        rgb = np.stack([g, g[::-1], g[:, ::-1]], -1).astype(np.uint8)
        dr = ic.decode_jpeg(ic.encode_jpeg(rgb))
        assert dr.shape == rgb.shape
        assert np.abs(dr.astype(int) - rgb.astype(int)).mean() < 4.0

    def test_non_multiple_of_8_dims_and_noise(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (33, 41, 3), np.uint8)
        dec = ic.decode_jpeg(ic.encode_jpeg(img))
        assert dec.shape == img.shape  # SOF dims honored, pad cropped

    def test_spec_gates(self):
        import struct

        import numpy as np
        import pytest as _pytest

        from cosmos_ray.functions import imagecodec as ic

        payload = ic.encode_jpeg(np.full((8, 8), 5, np.uint8))
        # SOF2 is now SUPPORTED: a sequential full scan under a
        # progressive frame header decodes identically
        prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
        assert (ic.decode_jpeg(prog) == ic.decode_jpeg(payload)).all()
        # lossless SOF3 remains the declared gate
        lossless = payload.replace(b"\xff\xc0", b"\xff\xc3", 1)
        with _pytest.raises(NotImplementedError):
            ic.decode_jpeg(lossless)
        # sampling factors > 2 rejected (declared gate); factor 2 on a
        # single-component frame decodes (non-interleaved scan ignores
        # the declared sampling, T.81 A.2.2)
        i = payload.index(b"\xff\xc0")
        ln = struct.unpack_from(">H", payload, i + 2)[0]
        body = bytearray(payload[i + 4:i + 2 + ln])
        body[7] = 0x33  # sampling factor of component 1
        sub = payload[:i + 4] + bytes(body) + payload[i + 2 + ln:]
        with _pytest.raises(NotImplementedError):
            ic.decode_jpeg(sub)
        body[7] = 0x22
        sub2 = payload[:i + 4] + bytes(body) + payload[i + 2 + ln:]
        assert (ic.decode_jpeg(sub2) == ic.decode_jpeg(payload)).all()
        with _pytest.raises(ValueError):
            ic.decode_jpeg(b"\xff\xd8\xff\xd9")  # no frame

    def test_decode_image_sniffs_jpeg(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        img = np.full((16, 16), 42, np.uint8)
        out = ic.decode_image(ic.encode_jpeg(img))
        assert out.shape == (16, 16) and (out == 42).all()

    def test_restart_marker_decode(self):
        """Hand-spliced DRI stream: two flat MCUs encoded independently
        and joined with an RST0 marker decode to the same pixels as the
        plain single-scan encoding (DC predictors reset per segment,
        boundaries found in the RAW stuffed stream)."""
        import struct

        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        left = np.full((8, 8), 40, np.uint8)
        right = np.full((8, 8), 200, np.uint8)
        img = np.concatenate([left, right], axis=1)  # 8 x 16, 2 MCUs

        def scan_of(payload: bytes) -> bytes:
            i = payload.index(b"\xff\xda")
            ln = struct.unpack_from(">H", payload, i + 2)[0]
            return payload[i + 2 + ln:-2]  # between SOS body and EOI

        full = ic.encode_jpeg(img)
        s0 = scan_of(ic.encode_jpeg(left))
        s1 = scan_of(ic.encode_jpeg(right))
        i = full.index(b"\xff\xda")
        dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)  # interval = 1 MCU
        spliced = full[:i] + dri + full[i:i + 2 +
                                        struct.unpack_from(">H", full, i + 2)[0]] \
            + s0 + b"\xff\xd0" + s1 + b"\xff\xd9"
        dec = ic.decode_jpeg(spliced)
        assert np.array_equal(dec, ic.decode_jpeg(full))
        assert (dec[:, :8] == dec[0, 0]).all() and (dec[:, 8:] == dec[0, 8]).all()


class TestJpeg420:
    """4:2:0 subsampled baseline JPEG (round-4 verdict item #5): encode
    emits the 4Y+Cb+Cr MCU interleave, decode replicate-upsamples the
    chroma; flat regions reconstruct EXACTLY per the pinned quantizer
    formulas."""

    @staticmethod
    def _recon(v, q):
        import math
        return min(max(int(math.floor(8.0 * (v - 128.0) / q + 0.5)
                           * q / 8.0 + 128.0 + 0.5), 0), 255)

    def test_flat_color_roundtrip_exact(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        img = np.full((16, 16, 3), [200, 80, 40], np.uint8)
        d420 = ic.decode_jpeg(ic.encode_jpeg(img, subsample="420"))
        d444 = ic.decode_jpeg(ic.encode_jpeg(img))
        assert d420.shape == (16, 16, 3)
        # a flat image survives either sampling identically (chroma
        # 2x2 mean of a constant is the constant)
        assert (d420 == d444).all()
        assert len(np.unique(d420.reshape(-1, 3), axis=0)) == 1

    def test_two_mcu_alignment_no_chroma_bleed(self):
        """Left/right flat halves with different chroma: the upsampled
        chroma must not bleed across the MCU boundary — every decoded
        half stays perfectly flat."""
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        img = np.zeros((16, 32, 3), np.uint8)
        img[:, :16] = [220, 60, 60]
        img[:, 16:] = [60, 60, 220]
        dec = ic.decode_jpeg(ic.encode_jpeg(img, subsample="420"))
        assert len(np.unique(dec[:, :16].reshape(-1, 3), axis=0)) == 1
        assert len(np.unique(dec[:, 16:].reshape(-1, 3), axis=0)) == 1
        assert not (dec[0, 0] == dec[0, 31]).all()

    def test_gray_tiles_match_gray_formula(self):
        """r=g=b tiles: Y == v exactly, chroma flat 128 quantizes to
        zero — every channel equals the 4:4:4 grayscale reconstruction
        formula (the media_jpeg_features oracle contract)."""
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        img = np.zeros((16, 16, 3), np.uint8)
        vals = [37, 201, 128, 255]
        for ti, v in enumerate(vals):
            by, bx = divmod(ti, 2)
            img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
        dec = ic.decode_jpeg(ic.encode_jpeg(img, subsample="420"))
        for ti, v in enumerate(vals):
            by, bx = divmod(ti, 2)
            tile = dec[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            assert (tile == self._recon(v, 16)).all(), (ti, v)

    def test_odd_dims_and_bounded_loss(self):
        """Non-MCU-multiple dims decode at the SOF size; 4:2:0 loss on
        a smooth gradient stays within a few chroma quantization steps
        of the 4:4:4 decode."""
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        yy, xx = np.mgrid[0:33, 0:29]
        img = np.stack([(yy * 3 + xx * 2) % 256, (yy * 2 + 40) % 256,
                        (xx * 5 + 10) % 256], -1).astype(np.uint8)
        d420 = ic.decode_jpeg(ic.encode_jpeg(img, subsample="420"))
        d444 = ic.decode_jpeg(ic.encode_jpeg(img, subsample="444"))
        assert d420.shape == img.shape
        assert np.max(np.abs(d420.astype(int) - d444.astype(int))) <= 24

    def test_420_rejected_for_gray_and_bad_mode(self):
        import numpy as np
        import pytest as _pytest

        from cosmos_ray.functions import imagecodec as ic

        gray = np.full((8, 8), 7, np.uint8)
        # gray + '420' falls back to the single-component path (no
        # chroma to subsample) and stays decodable
        assert (ic.decode_jpeg(ic.encode_jpeg(gray, subsample="420"))
                == ic.decode_jpeg(ic.encode_jpeg(gray))).all()
        with _pytest.raises(ValueError):
            ic.encode_jpeg(gray, subsample="422")


class TestJpegProgressive:
    """Progressive JPEG (SOF2) — the last wild-format codec gap:
    `encode_jpeg_progressive` carries the SAME quantized coefficients
    as the sequential encoder through the standard successive-
    approximation scan script (DC first Al=1 -> per-component AC first
    Al=1 with EOBn band-skips -> DC refine -> AC refine correction
    bits), so decoding either stream must be BIT-IDENTICAL."""

    def _same(self, img, sub="444"):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        base = ic.decode_jpeg(ic.encode_jpeg(img, subsample=sub))
        prog = ic.decode_jpeg(ic.encode_jpeg_progressive(img, subsample=sub))
        assert np.array_equal(base, prog)
        return base

    def test_gray_flat_gradient_random(self):
        import numpy as np

        rng = np.random.RandomState(3)
        yy, xx = np.mgrid[0:24, 0:24]
        self._same(np.full((16, 16), 77, np.uint8))
        self._same(((yy * 5 + xx * 3) % 256).astype(np.uint8))
        self._same(rng.randint(0, 256, (17, 19), np.uint8))

    def test_color_444_and_420(self):
        import numpy as np

        rng = np.random.RandomState(4)
        self._same(rng.randint(0, 256, (16, 24, 3), np.uint8), "444")
        self._same(rng.randint(0, 256, (33, 29, 3), np.uint8), "420")

    def test_420_non_mcu_aligned_own_grid(self):
        """24x24 at 4:2:0 pads Y to 32x32: the interleaved DC scan
        covers the padded 4x4 grid while the non-interleaved AC scans
        cover Y's OWN 3x3 grid (T.81 A.2.2/A.2.3) — the case that
        separates the two grids."""
        import numpy as np

        yy, xx = np.mgrid[0:24, 0:24]
        img = np.stack([(yy * 3 + xx * 2) % 256, (yy * 2 + 40) % 256,
                        (xx * 5 + 10) % 256], -1).astype(np.uint8)
        self._same(img, "420")

    def test_near_flat_exercises_eobn_runs(self):
        """Near-flat images leave most AC bands empty at Al=1 — long
        EOBn runs in the first pass and newly-significant placements in
        the refine pass."""
        import numpy as np

        rng = np.random.RandomState(5)
        img = (rng.randint(0, 3, (40, 40)) * 2 + 120).astype(np.uint8)
        self._same(img)

    def test_fuzz_roundtrip(self):
        import numpy as np

        rng = np.random.RandomState(11)
        for trial in range(40):
            h = int(rng.randint(8, 41))
            w = int(rng.randint(8, 41))
            kind = trial % 4
            if kind == 0:
                img, sub = rng.randint(0, 256, (h, w), np.uint8), "444"
            elif kind == 1:
                img, sub = rng.randint(0, 256, (h, w, 3), np.uint8), "444"
            elif kind == 2:
                img, sub = rng.randint(0, 256, (h, w, 3), np.uint8), "420"
            else:
                yy, xx = np.mgrid[0:h, 0:w]
                a, b, c = rng.randint(1, 6, 3)
                img = np.stack([((yy * a + xx * b + c) % 256)] * 3,
                               -1).astype(np.uint8)
                sub = "420"
            self._same(img, sub)

    def test_decode_image_sniffs_progressive(self):
        import numpy as np

        from cosmos_ray.functions import imagecodec as ic

        img = np.full((16, 16), 42, np.uint8)
        out = ic.decode_image(ic.encode_jpeg_progressive(img))
        assert out.shape == (16, 16) and (out == 42).all()
