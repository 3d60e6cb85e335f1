"""Pure-numpy Y4M (YUV4MPEG2) codec — real decode for the standard
UNCOMPRESSED video interchange format, no ffmpeg (absent here).

Completes the multimodal trio with `imagecodec.py` (BMP/PPM) and
`audiocodec.py` (PCM WAV): `DecodeVideo` / frame sampling in
`stages/multimodal.py` are real for Y4M; compressed codecs (H.264/VP9)
stay behind the declared ``NotImplementedError``. C420 subsampling
(the Y4M default) is supported; frames come back as luma (Y-plane)
arrays — the channel feature extraction runs on — with chroma planes
parsed and skipped by stride. Vectorized ``np.frombuffer`` per frame;
the per-FRAME loop is bounded by frame count, never pixels.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, H, W) uint8 luma frames (H, W even) -> C420 Y4M bytes with
    neutral chroma."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n" % (
        w, h, fps[0], fps[1])
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes):
    """Y4M bytes -> (luma frames uint8 (n, H, W), (fps_num, fps_den)).
    C420 family only (the Y4M default); anything else raises
    NotImplementedError for the caller's stub policy."""
    nl = payload.find(b"\n")
    if not payload.startswith(_MAGIC) or nl < 0:
        raise NotImplementedError(
            f"not a YUV4MPEG2 payload (magic={payload[:9]!r})")
    w = h = None
    fps = (25, 1)
    colorspace = "C420jpeg"
    for tok in payload[len(_MAGIC) : nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            a, b = val.split(b":")
            fps = (int(a), int(b))
        elif tag == b"C":
            colorspace = tok.decode()
    if w is None or h is None:
        raise ValueError("Y4M header missing W or H")
    if not colorspace.startswith("C420"):
        raise NotImplementedError(f"only C420 supported, got {colorspace}")
    ysz = w * h
    csz = (w // 2) * (h // 2)
    frame_bytes = ysz + 2 * csz
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M frame header")
        start = fnl + 1
        if start + frame_bytes > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(payload, np.uint8, count=ysz,
                                    offset=start).reshape(h, w))
        pos = start + frame_bytes
    return (np.stack(frames) if frames
            else np.empty((0, h, w), np.uint8)), fps
