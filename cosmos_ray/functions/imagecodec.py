"""Pure-numpy image codecs without PIL/cv2 (absent in this container):
uncompressed BMP 24-bit BI_RGB and binary PPM/PGM, plus REAL PNG
(ISO 15948) via stdlib zlib — 8-bit gray/RGB/RGBA encode (filter 0)
and decode of all five standard scanline filters. Only JPEG remains
stubbed behind the declared ``NotImplementedError`` (no DCT codec
here). Reference analog: the page/region PNG payloads the reference
crops and ships (`ingest/ingest.py:245-332`); the web analog treats
media as opaque binary columns and decodes in actor-pool
``map_batches`` stages.

BMP/PPM paths and the PNG None/Sub/Up defilters are vectorized
(``np.frombuffer`` + stride reshape / mod-256 cumsum); only the
left-sequential Average/Paeth defilters walk pixels, and only when an
EXTERNAL file used those filters — this encoder never emits them.
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
    """Sniff-and-decode: BMP ('BM'), binary netpbm ('P5'/'P6') and PNG
    (8-bit gray/RGB/RGBA, stdlib-zlib inflate + full defilter) are
    decoded for real; anything else (JPEG — no DCT codec in this
    container) raises NotImplementedError for the caller's
    fake/dead-letter policy."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    raise NotImplementedError(
        "no JPEG codec in this environment "
        f"(magic={payload[:4]!r}); BMP/PPM/PGM/PNG decode natively")


# ------------------------------------------------------------------ PNG
# Real PNG (ISO 15948) support via stdlib zlib: encode with filter 0,
# decode all five standard scanline filters. 8-bit depth, color types
# 0 (gray), 2 (RGB) and 6 (RGBA), no interlace — the subset the
# reference's page/region crops actually use (`ingest/ingest.py:245-332`
# ships PNG page images). Sub/Up defilters are vectorized (mod-256
# cumsum / row add); Average/Paeth fall back to a per-pixel walk only
# when an external file used them — our encoder never does.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _z

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA uint8 -> PNG bytes
    (8-bit, filter 0, one IDAT)."""
    import zlib as _z

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        ctype, raw = 0, img
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        ctype, raw = 2, img
    elif img.ndim == 3 and img.shape[2] == 4:
        h, w = img.shape[:2]
        ctype, raw = 6, img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    rows = raw.reshape(h, -1)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), rows], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(scan, 6))
            + _png_chunk(b"IEND", b""))


def _defilter(scan: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """(h, 1+stride) filtered scanlines -> (h, stride) reconstructed."""
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        f = int(scan[y, 0])
        raw = scan[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:  # None
            out[y] = raw
        elif f == 1:  # Sub — mod-256 cumsum per bpp lane
            lane = raw.reshape(-1, bpp).astype(np.uint64)
            out[y] = (np.cumsum(lane, axis=0) % 256).astype(
                np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[y] = raw + prev
        elif f == 3:  # Average — left-sequential, rare for our files
            rec = out[y]
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(raw[x]) + (left + int(prev[x])) // 2) % 256
        elif f == 4:  # Paeth — left-sequential
            rec = out[y]
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                rec[x] = (int(raw[x]) + pr) % 256
        else:
            raise NotImplementedError(f"PNG filter {f}")
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W[, C]) uint8. 8-bit gray/RGB/RGBA,
    non-interlaced; anything else raises NotImplementedError."""
    import zlib as _z

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    ctype = None
    idat = []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or interlace or ctype not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG subset: depth={depth} ctype={ctype} "
                    f"interlace={interlace}")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    scan = np.frombuffer(_z.decompress(b"".join(idat)),
                         np.uint8).reshape(h, 1 + stride)
    out = _defilter(scan, h, stride, ch)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
