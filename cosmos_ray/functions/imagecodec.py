"""Pure-numpy image codecs for UNCOMPRESSED formats (BMP 24-bit BI_RGB,
binary PPM/PGM): real decode without PIL/cv2, which this container lacks.

Scope is deliberate: these are complete, byte-exact decoders for the
uncompressed formats a synthetic/multimodal pipeline can round-trip —
the decode stage of `stages/multimodal.py` is REAL for them, and only
compressed codecs (JPEG/PNG) remain stubbed behind the declared
``NotImplementedError``. Reference analog: the page/region PNG payloads
the reference crops and ships (`ingest/ingest.py:245-332`); the web
analog treats media as opaque binary columns and decodes in actor-pool
``map_batches`` stages.

All paths are vectorized (``np.frombuffer`` + stride reshape): no
per-pixel Python anywhere.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER = struct.Struct("<2sIHHI")          # magic, size, res, res, offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3)")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_bytes = rows.tobytes()
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + len(pixel_bytes), 0, 0, offset)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0,
                          len(pixel_bytes), 2835, 2835, 0, 0)
    return header + info + pixel_bytes


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB. Handles row
    padding and both bottom-up (positive height) and top-down rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    (hdr_size, w, h, _planes, bpp, comp, _img_size, _xp, _yp, _clr,
     _imp) = _BMP_INFO.unpack_from(payload, _BMP_HEADER.size)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=h * stride,
                         offset=offset).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(img[::-1] if bottom_up else img)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> binary P6 PPM bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm expects (H, W, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _ppm_header(payload: bytes):
    """Parse the P5/P6 header (whitespace + '#' comments per netpbm
    spec) -> (magic, width, height, maxval, pixel_offset)."""
    magic = payload[:2]
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    return magic, vals[0], vals[1], vals[2], pos + 1  # single ws after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), maxval <= 255 -> (H, W, 3) uint8 RGB
    (grayscale expands to 3 identical channels)."""
    magic, w, h, maxval, off = _ppm_header(payload)
    if magic not in (b"P6", b"P5") or maxval > 255:
        raise NotImplementedError(f"unsupported netpbm variant {magic!r}")
    ch = 3 if magic == b"P6" else 1
    img = np.frombuffer(payload, np.uint8, count=h * w * ch,
                        offset=off).reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img)


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode: BMP ('BM') and binary netpbm ('P5'/'P6') are
    decoded for real; anything else (JPEG/PNG — compressed codecs not in
    this container) raises NotImplementedError for the caller's
    fake/dead-letter policy."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    raise NotImplementedError(
        "no compressed-image codec in this environment "
        f"(magic={payload[:4]!r}); BMP/PPM/PGM decode natively")
