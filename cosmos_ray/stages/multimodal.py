"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference renders PDFs to page PNGs and crops region images
(`ingest/ingest.py:245-332`, `aggregation/aggregate.py:88-98`); the
engine treats such payloads as ``binary`` columns with typed metadata and
runs decode / feature-extract / resize / frame-sample as actor-pool
``map_batches`` stages.

Decode is REAL for uncompressed formats: ``DecodeImage`` natively
decodes 24-bit BMP and binary PPM/PGM payloads through the pure-numpy
codecs in `functions/imagecodec.py` (byte-exact, vectorized — no PIL).
COMPRESSED codecs (JPEG/PNG) are not in this container, so those
payloads raise ``NotImplementedError`` — unless constructed with
``fake=True``, in which case a deterministic fake decoder (seeded by
content hash) stands in so the Ray-side plumbing — schema, small batch
sizes for wide binary rows, actor signature, output layout — stays
exercised end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),  # JSON metadata
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # pooled feature vector
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decode: content-hash
    seeded pixels with plausible dims. Replaces PIL/cv2 (absent here)."""
    h = hashlib.md5(payload).digest()
    w = 32 + h[0] % 64
    ht = 32 + h[1] % 64
    rng = np.random.RandomState(int.from_bytes(h[2:6], "little"))
    return rng.randint(0, 256, size=(ht, w, 3), dtype=np.uint8)


class DecodeImage:
    """Actor-pool image decode + feature pooling.

    BMP 24-bit, binary PPM/PGM, PNG (zlib) and baseline JPEG all decode
    FOR REAL via the pure-numpy codecs in `functions/imagecodec.py`;
    unknown magics (GIF/WebP/progressive JPEG...) raise unless
    ``fake=True`` substitutes the deterministic stand-in. Use small
    ``batch_size`` (wide binary rows) and ``num_cpus>=1`` per actor.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 8) -> None:
        self.fake = fake
        self.feature_dim = feature_dim

    def decode(self, payload: bytes) -> np.ndarray:
        from cosmos_ray.functions.imagecodec import decode_image

        try:
            return decode_image(payload)
        except Exception:
            # fake=True keeps its original contract: ANY undecodable
            # payload (unknown magic OR malformed BMP/PPM bytes) falls
            # back to the deterministic stand-in; fake=False surfaces
            # the real parse error / NotImplementedError unchanged
            if self.fake:
                return _fake_decode(payload)
            raise

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_w, o_h, o_c, o_f = [], [], [], []
        for p in payloads:
            img = self.decode(p)
            if img.ndim == 2:  # grayscale codecs return (H, W)
                img = img[..., None]
            o_h.append(img.shape[0])
            o_w.append(img.shape[1])
            o_c.append(img.shape[2])
            # pooled feature: per-channel means over a feature_dim grid
            pooled = img.astype(np.float32).mean(axis=(0, 1))
            feat = np.resize(pooled / 255.0, self.feature_dim)
            o_f.append(feat.tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "width": pa.array(o_w, pa.int32()),
                "height": pa.array(o_h, pa.int32()),
                "channels": pa.array(o_c, pa.int32()),
                "feature": pa.array(o_f, pa.list_(pa.float32())),
            },
            schema=IMAGE_FEATURES_SCHEMA,
        )


class SampleFrames:
    """Video frame-sampling stub: emits every Nth 'frame' (fixed-size
    slices of the payload) as its own media row — the fan-out shape of a
    real frame sampler, without a codec."""

    def __init__(self, every_n: int = 10, frame_bytes: int = 256) -> None:
        self.every_n = every_n
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_frame, o_payload = [], [], []
        for mid, p in zip(ids, payloads):
            n_frames = max(1, len(p) // self.frame_bytes)
            for f in range(0, n_frames, self.every_n):
                o_id.append(mid)
                o_frame.append(f)
                o_payload.append(p[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.string()),
                "frame_idx": pa.array(o_frame, pa.int32()),
                "frame": pa.array(o_payload, pa.binary()),
            }
        )


def decode_images(media_ds, fake: bool = False, concurrency: int | tuple = (1, 4),
                  batch_size: int = 32):
    """Small batch_size on purpose: payload rows are wide; a batch x
    concurrency must fit the worker heap (SURVEY.md §4 memory row)."""
    return media_ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(media_ds, every_n: int = 10, concurrency: int | tuple = (1, 2)):
    return media_ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )


# ------------------------------------------------------- M1/M2 kernels
# The codec is the only stub in this module; resize and pad operate on
# decoded ndarrays and are REAL (pure numpy) — reference analogs
# `ingest/utils/preprocess.py:6-34` (resize longest edge to 1920) and
# `detection/src/preprocess.py:10-29` (pad to 1920x1920 white).

def resize_longest(img: np.ndarray, target: int = 1920) -> np.ndarray:
    """Nearest-neighbor resize so the longest edge == target (aspect
    preserved) — index-sampling, no interpolation library needed."""
    h, w = img.shape[:2]
    scale = target / max(h, w)
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    rows = np.minimum((np.arange(nh) / scale).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(nw) / scale).astype(np.int64), w - 1)
    return img[rows][:, cols]


def pad_square(img: np.ndarray, size: int, fill: int = 255) -> np.ndarray:
    """Pad bottom/right to (size, size) with ``fill`` (white)."""
    h, w = img.shape[:2]
    if h > size or w > size:
        raise ValueError(f"image {h}x{w} exceeds pad size {size}")
    out = np.full((size, size) + img.shape[2:], fill, dtype=img.dtype)
    out[:h, :w] = img
    return out


class PreprocessImages(DecodeImage):
    """Decode -> resize-longest -> pad-square actor stage (the M1+M2
    chain): emits the processed dims and the flattened pixel payload.
    Codec stubbed as in ``DecodeImage``; the geometry is real."""

    def __init__(self, fake: bool = False, target: int = 64) -> None:
        super().__init__(fake=fake)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_w, o_h, o_px = [], [], []
        for p in payloads:
            img = self.decode(p)
            r = resize_longest(img, self.target)
            o_h.append(r.shape[0])
            o_w.append(r.shape[1])
            o_px.append(pad_square(r, self.target).tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "width": pa.array(o_w, pa.int32()),
                "height": pa.array(o_h, pa.int32()),
                "pixels": pa.array(o_px, pa.binary()),
            }
        )


class ChunkAudio:
    """Audio chunking stub: fixed-duration PCM byte windows with overlap
    (the fan-out shape of a real audio splitter, codec-free)."""

    def __init__(self, chunk_bytes: int = 4096, hop_bytes: int | None = None) -> None:
        self.chunk_bytes = chunk_bytes
        self.hop_bytes = hop_bytes or chunk_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_idx, o_chunk = [], [], []
        for mid, p in zip(ids, payloads):
            i = ci = 0
            while i < max(1, len(p)):
                o_id.append(mid)
                o_idx.append(ci)
                o_chunk.append(p[i : i + self.chunk_bytes])
                i += self.hop_bytes
                ci += 1
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.string()),
                "chunk_idx": pa.array(o_idx, pa.int32()),
                "chunk": pa.array(o_chunk, pa.binary()),
            }
        )


AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("channels", pa.int32()),
        ("duration_s", pa.float64()),
        ("rms", pa.float64()),
        ("peak", pa.float64()),
    ]
)


class DecodeAudio:
    """Actor-pool audio decode + summary features: REAL for PCM WAV
    (pure-numpy `functions/audiocodec.py` — 8/16/32-bit int and float32,
    RIFF chunk walk); compressed formats (MP3/Opus — no codec in this
    container) raise behind the declared stub. Small batch_size: wide
    binary rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from cosmos_ray.functions.audiocodec import decode_wav

        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_sr, o_n, o_ch, o_dur, o_rms, o_peak = [], [], [], [], [], []
        for p in payloads:
            x, sr = decode_wav(p)
            o_sr.append(sr)
            o_n.append(x.shape[0])
            o_ch.append(x.shape[1])
            o_dur.append(x.shape[0] / sr if sr else 0.0)
            o_rms.append(float(np.sqrt(np.mean(np.square(x)))) if x.size
                         else 0.0)
            o_peak.append(float(np.abs(x).max()) if x.size else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "sample_rate": pa.array(o_sr, pa.int32()),
                "n_samples": pa.array(o_n, pa.int64()),
                "channels": pa.array(o_ch, pa.int32()),
                "duration_s": pa.array(o_dur, pa.float64()),
                "rms": pa.array(o_rms, pa.float64()),
                "peak": pa.array(o_peak, pa.float64()),
            },
            schema=AUDIO_FEATURES_SCHEMA,
        )


VIDEO_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int64()),
        ("fps_num", pa.int32()),
        ("fps_den", pa.int32()),
        ("mean_luma", pa.float64()),
    ]
)


class DecodeVideo:
    """Actor-pool video decode + summary features: REAL for Y4M
    (YUV4MPEG2 C420, pure-numpy `functions/videocodec.py`); compressed
    codecs (H.264/VP9 — no ffmpeg in this container) raise behind the
    declared stub. Small batch_size: video rows are the widest."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from cosmos_ray.functions.videocodec import decode_y4m

        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_w, o_h, o_n, o_fn, o_fd, o_ml = [], [], [], [], [], []
        for p in payloads:
            frames, (fn, fd) = decode_y4m(p)
            o_n.append(frames.shape[0])
            o_h.append(frames.shape[1])
            o_w.append(frames.shape[2])
            o_fn.append(fn)
            o_fd.append(fd)
            o_ml.append(float(frames.mean()) if frames.size else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "width": pa.array(o_w, pa.int32()),
                "height": pa.array(o_h, pa.int32()),
                "n_frames": pa.array(o_n, pa.int64()),
                "fps_num": pa.array(o_fn, pa.int32()),
                "fps_den": pa.array(o_fd, pa.int32()),
                "mean_luma": pa.array(o_ml, pa.float64()),
            },
            schema=VIDEO_FEATURES_SCHEMA,
        )


class SampleFramesY4M:
    """REAL frame sampler: decode Y4M, emit every ``every_n``-th luma
    frame as its own row with the frame re-encoded as a P5 PGM payload
    (a real, decodable image — the fan-out a keyframe extractor feeds
    into the image pipeline). Compressed video still raises behind the
    codec stub."""

    def __init__(self, every_n: int = 10) -> None:
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from cosmos_ray.functions.videocodec import decode_y4m

        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_idx, o_frame = [], [], []
        for mid, p in zip(ids, payloads):
            frames, _ = decode_y4m(p)
            for i in range(0, frames.shape[0], self.every_n):
                o_id.append(mid)
                o_idx.append(i)
                h, w = frames[i].shape
                o_frame.append(b"P5\n%d %d\n255\n" % (w, h)
                               + frames[i].tobytes())
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.string()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "frame": pa.array(o_frame, pa.binary()),
            }
        )


def sample_frames_real(media_ds, every_n: int = 10,
                       concurrency: int | tuple = (1, 4),
                       batch_size: int = 8):
    return media_ds.map_batches(
        SampleFramesY4M,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_video(media_ds, concurrency: int | tuple = (1, 4),
                 batch_size: int = 8):
    return media_ds.map_batches(
        DecodeVideo,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_audio(media_ds, concurrency: int | tuple = (1, 4),
                 batch_size: int = 16):
    return media_ds.map_batches(
        DecodeAudio,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def preprocess_images(media_ds, fake: bool = False, target: int = 64,
                      concurrency: int | tuple = (1, 4), batch_size: int = 32):
    return media_ds.map_batches(
        PreprocessImages,
        fn_constructor_kwargs={"fake": fake, "target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def chunk_audio(media_ds, chunk_bytes: int = 4096, hop_bytes: int | None = None,
                concurrency: int | tuple = (1, 2)):
    return media_ds.map_batches(
        ChunkAudio,
        fn_constructor_kwargs={"chunk_bytes": chunk_bytes, "hop_bytes": hop_bytes},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )
