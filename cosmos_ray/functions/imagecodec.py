"""Pure-numpy image codecs without PIL/cv2 (absent in this container):
uncompressed BMP 24-bit BI_RGB and binary PPM/PGM, REAL PNG
(ISO 15948) via stdlib zlib — 8-bit gray/RGB/RGBA encode (filter 0)
and decode of all five standard scanline filters — and REAL JPEG
(ITU-T T.81): numpy DCT/IDCT + Huffman, baseline sequential AND
progressive (SOF2 — spectral selection, successive approximation,
EOBn runs; `encode_jpeg_progressive` emits the standard
DC-first/AC-first/refine scan script), 4:4:4 and 4:2:0 sampling
(encode both; decode any 1-2 factor combo with replicate chroma
upsample), in-file tables (lossless/arithmetic/hierarchical frames
raise the declared NotImplementedError). Reference analog: the page/region
PNG payloads the reference crops and ships (`ingest/ingest.py:245-332`)
and the JPG recompression (`htcosmos/make_parquet.py:786-806`); the
web analog treats media as opaque binary columns and decodes in
actor-pool ``map_batches`` stages.

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
    """Sniff-and-decode: BMP ('BM'), binary netpbm ('P5'/'P6'), PNG
    (8-bit gray/RGB/RGBA, stdlib-zlib inflate + full defilter) and
    JPEG — baseline sequential AND progressive, 4:4:4/4:2:0 (pure-numpy
    Huffman + IDCT; lossless/arithmetic frames raise the declared
    NotImplementedError) — decode natively; unknown magics raise for
    the caller's fake/dead-letter policy."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise NotImplementedError(
        f"unknown image magic {payload[:4]!r}; "
        "BMP/PPM/PGM/PNG/JPEG decode natively")


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


# ----------------------------------------------------------------- JPEG
# Baseline sequential DCT JPEG (ITU-T T.81): real encode + decode with
# stdlib + numpy only. Encoder: level shift -> 8x8 float64 DCT-II ->
# Annex-K luminance/chrominance quantization -> zigzag -> differential
# DC + run-length AC -> canonical flat-length Huffman tables (valid
# baseline tables, carried in DHT as the spec requires — any conforming
# reader decodes them); 4:4:4 sampling, edge blocks padded by
# replication. Decoder: reads DQT/DHT/SOF0/DRI from the stream (so it
# decodes external baseline files too), supports 1- and 3-component
# 4:4:4 scans and restart markers; progressive / subsampled files raise
# the declared NotImplementedError. Rounding is pinned to
# floor(x + 0.5) on both sides so flat 8x8 tiles reconstruct EXACTLY:
# recon = clip(floor(round_half_up(8*(v-128)/qDC) * qDC / 8 + 128.5)),
# the integer identity the media_jpeg_features oracle replays in SQL.
# Reference analog: the page images the reference recompresses to JPG
# (`htcosmos/make_parquet.py:786-806`).

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto
# quality-50 tables every libjpeg derivative scales from)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    t = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16.0)
    t[0, :] *= 1.0 / np.sqrt(2.0)
    return t


_DCT_T = _dct_matrix()


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) with an epsilon far above DCT float noise
    (~1e-13) but far below a quantization step: exact-half boundaries
    (e.g. a flat tile whose DC/q is mathematically 17.5) round UP
    deterministically, matching the exact rational arithmetic the SQL
    oracle replays — without it, 17.5 computed as 17.499999999999996
    flips the rounded DC per float noise."""
    return np.floor(x + 0.5 + 1e-8)


class _FlatHuff:
    """Canonical Huffman table with ALL symbols at one code length —
    valid baseline-JPEG tables (<= 16-bit, all-ones code unused) that
    sidestep transcribing the 162-entry Annex-K code books; the tables
    ride in DHT so any conforming decoder (including ours) reads them."""

    def __init__(self, symbols: list[int], length: int) -> None:
        assert len(symbols) < (1 << length)  # leave the all-ones code free
        self.length = length
        self.code = {s: (i, length) for i, s in enumerate(symbols)}
        self.bits = [0] * 16
        self.bits[length - 1] = len(symbols)
        self.symbols = list(symbols)


_DC_HUFF = _FlatHuff(list(range(12)), 4)
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_HUFF = _FlatHuff(_AC_SYMBOLS, 8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _encode_plane_block(w: "_BitWriter", zz: np.ndarray, prev_dc: int,
                        dc_huff: "_FlatHuff", ac_huff: "_FlatHuff") -> int:
    diff = int(zz[0]) - prev_dc
    size, code = _magnitude(diff)
    c, ln = dc_huff.code[size]
    w.put(c, ln)
    if size:
        w.put(code, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            if run == 16:
                c, ln = ac_huff.code[0xF0]
                w.put(c, ln)
                run = 0
            continue
        size, code = _magnitude(v)
        c, ln = ac_huff.code[(run << 4) | size]
        w.put(c, ln)
        w.put(code, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_huff.code[0x00]  # EOB
        w.put(c, ln)
    return int(zz[0])


def _dht_segment(tc: int, th: int, huff: "_FlatHuff") -> bytes:
    body = bytes([tc << 4 | th]) + bytes(huff.bits) + bytes(huff.symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(table[_ZIGZAG[i]]) for i in range(64))
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _jpeg_block(writer: "_BitWriter", plane: np.ndarray, by: int, bx: int,
                qt: np.ndarray, prev_dc: int) -> int:
    """Quantize-and-entropy-code one 8x8 block at block coords (by, bx)
    of ``plane`` (edge blocks replicate-pad); returns the new DC."""
    blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
    if blk.shape != (8, 8):
        blk = np.pad(blk, ((0, 8 - blk.shape[0]),
                           (0, 8 - blk.shape[1])), mode="edge")
    coef = _DCT_T @ (blk - 128.0) @ _DCT_T.T
    q = qt.reshape(8, 8).astype(np.float64)
    zz = _round_half_up(coef / q).astype(np.int64).reshape(64)[_ZIGZAG]
    return _encode_plane_block(writer, zz, prev_dc, _DC_HUFF, _AC_HUFF)


def encode_jpeg(img: np.ndarray, subsample: str = "444") -> bytes:
    """(H, W) uint8 gray or (H, W, 3) uint8 RGB -> baseline sequential
    JPEG bytes (Annex-K quantization, in-file Huffman tables).
    ``subsample``: '444' (one block per component per MCU) or '420'
    (color only — the dominant wild-JPEG format and the reference's own
    recompression target, `htcosmos/make_parquet.py:786-806`: Y at full
    resolution, Cb/Cr 2x2 box-mean downsampled, 16x16-pixel MCUs of
    4 Y + 1 Cb + 1 Cr blocks)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W) gray or (H, W, 3) RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = img.shape[:2]
    sub420 = subsample == "420" and not gray
    if gray:
        planes = [img.astype(np.float64)]
        qts = [_QT_LUMA]
        qsel = [0]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [_QT_LUMA, _QT_CHROMA]
        qsel = [0, 1, 1]
    writer = _BitWriter()
    prev_dc = [0] * len(planes)
    if sub420:
        # pad everything to whole 16x16 MCUs (edge replication), then
        # 2x2 box-mean the chroma planes
        h2 = -(-h // 16) * 16
        w2 = -(-w // 16) * 16

        def pad(p):
            return np.pad(p, ((0, h2 - h), (0, w2 - w)), mode="edge")

        yp = pad(planes[0])
        sub = []
        for p in planes[1:]:
            p = pad(p)
            sub.append(p.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3)))
        for my in range(h2 // 16):
            for mx in range(w2 // 16):
                for bv in range(2):          # 4 Y blocks, raster order
                    for bhh in range(2):
                        prev_dc[0] = _jpeg_block(
                            writer, yp, my * 2 + bv, mx * 2 + bhh,
                            qts[0], prev_dc[0])
                for ci, p in enumerate(sub, start=1):   # 1 Cb + 1 Cr
                    prev_dc[ci] = _jpeg_block(
                        writer, p, my, mx, qts[1], prev_dc[ci])
    else:
        bh, bw = (h + 7) // 8, (w + 7) // 8
        for by in range(bh):
            for bx in range(bw):
                for ci, plane in enumerate(planes):
                    prev_dc[ci] = _jpeg_block(
                        writer, plane, by, bx, qts[qsel[ci]], prev_dc[ci])
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"       # APP0
    out += _dqt_segment(0, _QT_LUMA)
    if not gray:
        out += _dqt_segment(1, _QT_CHROMA)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        samp = 0x22 if (sub420 and ci == 0) else 0x11
        sof += bytes([ci + 1, samp, qsel[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_HUFF)
    out += _dht_segment(1, 0, _AC_HUFF)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])                   # DC table 0, AC table 0
    sos += bytes([0, 63, 0])                           # full spectral, no approx
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan data truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


class _HuffDecode:
    """Canonical table from DHT (bits, symbols) -> (code,len) lookup."""

    def __init__(self, bits: list[int], symbols: list[int]) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = symbols[k]
                k += 1
                code += 1
            code <<= 1

    def read(self, r: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | r.bit()
            sym = self.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# extended AC table for progressive scans: the baseline symbols plus the
# EOBn band-skip symbols (r<<4, r=1..14) progressive encoding batches
# empty bands with; rides in-file via DHT like every other table
_AC_HUFF_PROG = _FlatHuff(_AC_SYMBOLS + [r << 4 for r in range(1, 15)], 8)


class _ProgWriter(_BitWriter):
    """_BitWriter plus the progressive encoder's run state: a pending
    EOB run and the correction bits buffered behind it (T.81 G.1.2.2 /
    G.1.2.3: correction bits for blocks inside an EOB run are emitted
    AFTER the EOBn symbol that closes the run)."""

    def __init__(self) -> None:
        super().__init__()
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eobrun(self, ac: "_FlatHuff") -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            c, ln = ac.code[nbits << 4]
            self.put(c, ln)
            if nbits:
                self.put(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.pending:
            self.put(b, 1)
        self.pending = []


def _prog_blocks(img: np.ndarray, subsample: str):
    """Quantized coefficient planning shared with the sequential
    encoder: -> (h, w, gray, comps) where comps[ci] = (list of per-block
    zigzag int64 arrays in the component's raster block order, (bh, bw),
    interleave dims (hi, vi))."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sub420 = subsample == "420" and not gray
    if gray:
        planes = [img.astype(np.float64)]
        qsel = [0]
        hv = [(1, 1)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
        qsel = [0, 1, 1]
        hv = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * 3
    qts = [_QT_LUMA, _QT_CHROMA]
    if sub420:
        h2, w2 = -(-h // 16) * 16, -(-w // 16) * 16
        padded = [np.pad(p, ((0, h2 - h), (0, w2 - w)), mode="edge")
                  for p in planes]
        planes = [padded[0]] + [
            p.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            for p in padded[1:]]
    comps = []
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    for ci, plane in enumerate(planes):
        hi, vi = hv[ci]
        # the component's OWN block grid (what non-interleaved AC scans
        # cover, T.81 A.2.2) vs the MCU-PADDED grid (what the
        # interleaved DC scan covers, A.2.3) — they differ when the
        # image is not a whole number of MCUs (e.g. 24x24 at 4:2:0 pads
        # Y to 32x32: own 3x3 blocks, padded 4x4)
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        own = ((ch + 7) // 8, (cw + 7) // 8)
        if sub420:
            bh = plane.shape[0] // 8
            bw = plane.shape[1] // 8
        else:
            bh, bw = own
        q = qts[qsel[ci]].reshape(8, 8).astype(np.float64)
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                if blk.shape != (8, 8):
                    blk = np.pad(blk, ((0, 8 - blk.shape[0]),
                                       (0, 8 - blk.shape[1])), mode="edge")
                coef = _DCT_T @ (blk - 128.0) @ _DCT_T.T
                blocks.append(_round_half_up(coef / q)
                              .astype(np.int64).reshape(64)[_ZIGZAG])
        comps.append((blocks, (bh, bw), (hi, vi), own))
    return h, w, gray, qsel, comps


def encode_jpeg_progressive(img: np.ndarray, subsample: str = "444") -> bytes:
    """(H, W) gray or (H, W, 3) RGB -> PROGRESSIVE JPEG bytes (SOF2)
    carrying the SAME quantized coefficients as `encode_jpeg`, delivered
    as a standard successive-approximation scan script: DC first (Al=1,
    interleaved), per-component AC 1-63 first (Al=1, with EOBn
    band-skip runs), DC refine, per-component AC refine (the
    correction-bit pass). `decode_jpeg(encode_jpeg_progressive(x)) ==
    decode_jpeg(encode_jpeg(x))` bit-for-bit — the roundtrip gate in
    tests/test_multimodal.py."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w, gray, qsel, comps = _prog_blocks(img, subsample)
    ncomp = len(comps)
    al = 1

    def dc_scan(first: bool) -> bytes:
        wtr = _ProgWriter()
        prev = [0] * ncomp
        if ncomp == 1:
            # single-component DC scan is non-interleaved: OWN grid
            bh_o, bw_o = comps[0][3]
            bw_pad = comps[0][1][1]
            seq = [(0, by * bw_pad + bx)
                   for by in range(bh_o) for bx in range(bw_o)]
        else:
            # interleaved MCU order over the padded grids
            bh0, bw0 = comps[0][1]
            mcy = bh0 // comps[0][2][1] if comps[0][2][1] > 1 else bh0
            mcx = bw0 // comps[0][2][0] if comps[0][2][0] > 1 else bw0
            seq = []
            for my in range(mcy):
                for mx in range(mcx):
                    for ci, (_, (bh, bw), (hi, vi), _own) in enumerate(comps):
                        for bv in range(vi):
                            for bhh in range(hi):
                                seq.append((ci, (my * vi + bv) * bw
                                            + (mx * hi + bhh)))
        for ci, bi in seq:
            dc = int(comps[ci][0][bi][0])
            if first:
                v = dc >> al  # arithmetic shift: the DC point transform
                size, code = _magnitude(v - prev[ci])
                c, ln = _DC_HUFF.code[size]
                wtr.put(c, ln)
                if size:
                    wtr.put(code, size)
                prev[ci] = v
            else:
                wtr.put((dc >> 0) & 1, 1)  # refine appends bit Al=0
        return wtr.flush()

    def ac_scan(ci: int, first: bool) -> bytes:
        wtr = _ProgWriter()
        blocks = comps[ci][0]
        # non-interleaved AC scans cover the component's OWN grid
        # (T.81 A.2.2), not the MCU-padded one the DC scan interleaves
        bh_o, bw_o = comps[ci][3]
        bw_pad = comps[ci][1][1]
        own_blocks = [blocks[by * bw_pad + bx]
                      for by in range(bh_o) for bx in range(bw_o)]
        for zz in own_blocks:
            if first:
                r = 0
                wrote = False
                for k in range(1, 64):
                    v = int(zz[k])
                    t = (abs(v) >> al)
                    if t == 0:
                        r += 1
                        continue
                    wtr.flush_eobrun(_AC_HUFF_PROG)
                    while r > 15:
                        c, ln = _AC_HUFF_PROG.code[0xF0]
                        wtr.put(c, ln)
                        r -= 16
                    tv = t if v > 0 else -t
                    size, code = _magnitude(tv)
                    c, ln = _AC_HUFF_PROG.code[(r << 4) | size]
                    wtr.put(c, ln)
                    wtr.put(code, size)
                    r = 0
                    wrote = True
                if r > 0 or not wrote:
                    wtr.eobrun += 1
                    if wtr.eobrun == 0x7FFF:
                        wtr.flush_eobrun(_AC_HUFF_PROG)
            else:
                # refinement pass (T.81 G.1.2.3): EOB = index of the
                # last NEWLY-significant coefficient
                absv = [(abs(int(zz[k])) >> 0) for k in range(64)]
                eob = 0
                for k in range(1, 64):
                    if absv[k] == 1:
                        eob = k
                r = 0
                br: list[int] = []
                for k in range(1, 64):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        wtr.flush_eobrun(_AC_HUFF_PROG)
                        c, ln = _AC_HUFF_PROG.code[0xF0]
                        wtr.put(c, ln)
                        r -= 16
                        for b in br:
                            wtr.put(b, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)  # history coefficient: append
                        continue          # its next bit, run unaffected
                    # newly significant (t == 1)
                    wtr.flush_eobrun(_AC_HUFF_PROG)
                    c, ln = _AC_HUFF_PROG.code[(r << 4) | 1]
                    wtr.put(c, ln)
                    wtr.put(1 if int(zz[k]) > 0 else 0, 1)
                    for b in br:
                        wtr.put(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    wtr.eobrun += 1
                    wtr.pending.extend(br)
                    if wtr.eobrun == 0x7FFF:
                        wtr.flush_eobrun(_AC_HUFF_PROG)
        wtr.flush_eobrun(_AC_HUFF_PROG)
        return wtr.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += _dqt_segment(0, _QT_LUMA)
    if not gray:
        out += _dqt_segment(1, _QT_CHROMA)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = comps[ci][2]
        sof += bytes([ci + 1, (hi << 4) | vi, qsel[ci]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht_segment(0, 0, _DC_HUFF)
    out += _dht_segment(1, 0, _AC_HUFF_PROG)

    def sos(sel: list[int], ss_: int, se_: int, ah_: int, al_: int,
            data: bytes) -> bytes:
        body = bytes([len(sel)])
        for ci in sel:
            body += bytes([ci + 1, 0x00])
        body += bytes([ss_, se_, (ah_ << 4) | al_])
        return (b"\xff\xda" + struct.pack(">H", len(body) + 2) + body
                + data)

    out += sos(list(range(ncomp)), 0, 0, 0, al, dc_scan(first=True))
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 0, al, ac_scan(ci, first=True))
    out += sos(list(range(ncomp)), 0, 0, al, 0, dc_scan(first=False))
    for ci in range(ncomp):
        out += sos([ci], 1, 63, al, 0, ac_scan(ci, first=False))
    out += b"\xff\xd9"
    return bytes(out)


def _split_rst(scan_bytes: bytes) -> list[bytes]:
    """Split raw scan bytes at RST markers (stuffing still intact, so an
    entropy 0xFF followed by a 0xD0-D7 DATA byte cannot fake an RST),
    then unstuff each segment."""
    raw_segments = []
    cur = bytearray()
    i = 0
    while i < len(scan_bytes):
        b = scan_bytes[i]
        if b == 0xFF and i + 1 < len(scan_bytes):
            nxt = scan_bytes[i + 1]
            if 0xD0 <= nxt <= 0xD7:
                raw_segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            cur.append(b)
            cur.append(nxt)  # FF 00 stuffing pair, kept for unstuff
            i += 2
            continue
        cur.append(b)
        i += 1
    raw_segments.append(bytes(cur))
    return [seg.replace(b"\xff\x00", b"\xff") for seg in raw_segments]


def _decode_scan(scan, comps, coefs, grids, dc_tabs, ac_tabs,
                 restart_interval, mcx, mcy, hs, vs):
    """Entropy-decode ONE scan into the per-component coefficient
    arrays (natural zigzag order k=0..63), per T.81 Annex F (sequential
    / progressive-first) and G (progressive refinement):

    - interleaved (ns > 1, necessarily Ss=0): MCU loop, Hi x Vi blocks
      per component per MCU;
    - non-interleaved (ns == 1): the component's OWN block grid in
      raster order;
    - DC first: diff-coded predictor in the point-transformed domain,
      stored << Al; DC refine: one appended bit per block;
    - AC first: run/size with EOBn band-skip runs; AC refine: the
      correction-bit algorithm (newly-significant +-1<<Al placements,
      history-coefficient correction bits, EOBn runs that still carry
      corrections for the skipped blocks' nonzero history).

    Restart markers reset DC predictors AND the EOB run."""
    (scan_sel, ss, se, ah, al, segments) = scan
    interleaved = len(scan_sel) > 1
    if interleaved and ss != 0:
        raise ValueError("interleaved AC scan is not valid JPEG")
    seg_i = 0
    reader = _BitReader(segments[0])
    prev_dc = [0] * len(comps)
    state = {"eobrun": 0}
    p1 = 1 << al

    def dc_first(blk, ci, tdc):
        size = dc_tabs[tdc].read(reader)
        diff = _extend(reader.bits(size), size) if size else 0
        prev_dc[ci] += diff
        blk[0] = prev_dc[ci] << al

    def dc_refine(blk):
        if reader.bit():
            blk[0] |= p1

    def ac_first(blk, tac):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = ac_tabs[tac].read(reader)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                run = 1 << r
                if r:
                    run += reader.bits(r)
                state["eobrun"] = run - 1  # current block consumes one
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run overflow")
            blk[k] = _extend(reader.bits(s), s) << al
            k += 1

    def ac_refine(blk, tac):
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = ac_tabs[tac].read(reader)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        run = 1 << r
                        if r:
                            run += reader.bits(r)
                        state["eobrun"] = run
                        break
                    # r == 15: ZRL — skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement code")
                    val = p1 if reader.bit() else -p1
                # advance over r zero-history coefficients, applying
                # correction bits to nonzero-history ones along the way
                while k <= se:
                    if blk[k] != 0:
                        if reader.bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else -p1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("JPEG AC refine overflow")
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            # inside an EOB run: only correction bits for the remaining
            # nonzero-history coefficients of this block's band
            while k <= se:
                if blk[k] != 0:
                    if reader.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else -p1
                k += 1
            state["eobrun"] -= 1

    def do_block(ci, tdc, tac, by, bx):
        blk = coefs[ci][by][bx]
        if ss == 0:
            if ah == 0:
                dc_first(blk, ci, tdc)
            else:
                dc_refine(blk)
            if se > ss and ah == 0:  # sequential scan: DC then AC 1..se
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                    return
                k = 1
                while k <= se:
                    rs = ac_tabs[tac].read(reader)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        run = 1 << r
                        if r:
                            run += reader.bits(r)
                        state["eobrun"] = run - 1
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run overflow")
                    blk[k] = _extend(reader.bits(s), s) << al
                    k += 1
        elif ah == 0:
            ac_first(blk, tac)
        else:
            ac_refine(blk, tac)

    if interleaved:
        total = mcx * mcy
        unit = 0
        while unit < total:
            if restart_interval and unit and unit % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError(
                        "JPEG scan data truncated (missing restart segment)")
                reader = _BitReader(segments[seg_i])
                prev_dc = [0] * len(comps)
                state["eobrun"] = 0
            my, mx = divmod(unit, mcx)
            for (ci, tdc, tac) in scan_sel:
                for bv in range(vs[ci]):
                    for bhh in range(hs[ci]):
                        do_block(ci, tdc, tac, my * vs[ci] + bv,
                                 mx * hs[ci] + bhh)
            unit += 1
    else:
        ci, tdc, tac = scan_sel[0]
        bh_i, bw_i = grids[ci]
        total = bh_i * bw_i
        unit = 0
        while unit < total:
            if restart_interval and unit and unit % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError(
                        "JPEG scan data truncated (missing restart segment)")
                reader = _BitReader(segments[seg_i])
                prev_dc = [0] * len(comps)
                state["eobrun"] = 0
            by, bx = divmod(unit, bw_i)
            do_block(ci, tdc, tac, by, bx)
            unit += 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Sequential (SOF0/1) or PROGRESSIVE (SOF2) JPEG bytes -> (H, W)
    or (H, W, 3) uint8. Reads DQT/DHT/SOF/DRI/every SOS from the
    stream (external files decode too); 1- or 3-component with
    sampling factors 1-2 (4:4:4, 4:2:2, 4:4:0 and the dominant wild
    format 4:2:0 — subsampled chroma is replicate-upsampled).
    Progressive streams accumulate coefficients across scans: spectral
    selection bands, successive-approximation DC/AC first and refine
    passes, EOBn band-skip runs and restart markers are all handled
    (T.81 Annex G); arithmetic-coded (SOF9+) and hierarchical frames
    raise the declared NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecode] = {}
    ac_tabs: dict[int, _HuffDecode] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    h = w = 0
    restart_interval = 0
    scans = []  # (scan_sel, Ss, Se, Ah, Al, segments)
    try:
        while pos < len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("bad JPEG marker stream")
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI
                break
            ln = struct.unpack_from(">H", payload, pos)[0]
            body = payload[pos + 2:pos + ln]
            pos += ln
            if marker == 0xDB:  # DQT (possibly several tables)
                off = 0
                while off < len(body):
                    pq, tq = body[off] >> 4, body[off] & 0xF
                    off += 1
                    if pq == 0:
                        tbl = np.frombuffer(body, np.uint8, 64, off).astype(np.int64)
                        off += 64
                    else:
                        tbl = np.frombuffer(body, ">u2", 64, off).astype(np.int64)
                        off += 128
                    dez = np.zeros(64, np.int64)
                    dez[_ZIGZAG] = tbl
                    qt[tq] = dez.reshape(8, 8)
            elif marker == 0xC4:  # DHT
                off = 0
                while off < len(body):
                    tc, th = body[off] >> 4, body[off] & 0xF
                    bits = list(body[off + 1:off + 17])
                    n = sum(bits)
                    syms = list(body[off + 17:off + 17 + n])
                    (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecode(bits, syms)
                    off += 17 + n
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2
                h, w = struct.unpack_from(">HH", body, 1)
                ncomp = body[5]
                comps = []
                for ci in range(ncomp):
                    cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                    comps.append((cid, samp, tq))
                if any((s >> 4) not in (1, 2) or (s & 0xF) not in (1, 2)
                       for _, s, _ in comps):
                    raise NotImplementedError(
                        "only sampling factors 1-2 supported (4:4:4 / 4:2:2 /"
                        " 4:4:0 / 4:2:0)")
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"unsupported JPEG frame (SOF marker 0x{marker:02x}: "
                    "lossless / arithmetic / hierarchical)")
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack_from(">H", body, 0)[0]
            elif marker == 0xDA:  # SOS — entropy-coded data follows
                ns = body[0]
                scan_sel = []
                cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
                for si in range(ns):
                    cid, tt = body[1 + 2 * si:3 + 2 * si]
                    scan_sel.append((cid_to_idx[cid], tt >> 4, tt & 0xF))
                ss_, se_, a = body[1 + 2 * ns:4 + 2 * ns]
                # collect RAW scan bytes (stuffing intact) up to the next
                # real marker; see _split_rst for why stuffing must survive
                scan = bytearray()
                p = pos
                while p < len(payload):
                    b = payload[p]
                    if b == 0xFF:
                        if p + 1 >= len(payload):
                            raise ValueError("JPEG scan data truncated")
                        nxt = payload[p + 1]
                        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                            scan.append(0xFF)
                            scan.append(nxt)
                            p += 2
                            continue
                        break
                    scan.append(b)
                    p += 1
                scans.append((list(scan_sel), ss_, se_, a >> 4, a & 0xF,
                              _split_rst(bytes(scan)), restart_interval))
                pos = p
            # APPn / COM / others: skipped via the length field
    except (IndexError, struct.error) as e:
        # malformed/truncated header segments follow the
        # dead-letter error contract, not a raw IndexError
        raise ValueError(f"truncated JPEG segment: {e}") from e
    if not scans or not comps or not h or not w:
        raise ValueError("incomplete JPEG stream")

    hs = [(s >> 4) for _, s, _ in comps]
    vs = [(s & 0xF) for _, s, _ in comps]
    if len(comps) == 1:
        hs, vs = [1], [1]
    hmax, vmax = max(hs), max(vs)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient store: MCU-padded block grid (covers the
    # component's own grid for non-interleaved scans too); plain python
    # lists of per-block int lists — scans mutate in place
    coefs = [[[[0] * 64 for _ in range(mcx * hi)] for _ in range(mcy * vi)]
             for hi, vi in zip(hs, vs)]
    # non-interleaved scans walk the component's OWN grid
    grids = []
    for ci in range(len(comps)):
        ch = -(-h * vs[ci] // vmax)
        cw = -(-w * hs[ci] // hmax)
        grids.append(((ch + 7) // 8, (cw + 7) // 8))

    for (scan_sel, ss_, se_, ah_, al_, segments, dri) in scans:
        _decode_scan((scan_sel, ss_, se_, ah_, al_, segments), comps,
                     coefs, grids, dc_tabs, ac_tabs, dri, mcx, mcy, hs, vs)

    # reconstruct: dequantize + IDCT each block, assemble planes
    planes = [np.zeros((mcy * vi * 8, mcx * hi * 8), np.float64)
              for hi, vi in zip(hs, vs)]
    for ci in range(len(comps)):
        q = qt[comps[ci][2]].astype(np.float64)
        rows = coefs[ci]
        for by in range(len(rows)):
            for bx in range(len(rows[by])):
                zz = rows[by][bx]
                dez = np.zeros(64, np.float64)
                dez[_ZIGZAG] = zz
                coef = dez.reshape(8, 8) * q
                blk = _DCT_T.T @ coef @ _DCT_T + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = blk
    # crop each component to its OWN dims, replicate-upsample subsampled
    # chroma to full resolution, then crop to the image
    full = []
    for ci, p in enumerate(planes):
        ch = -(-h * vs[ci] // vmax)
        cw = -(-w * hs[ci] // hmax)
        p = p[:ch, :cw]
        if vs[ci] != vmax:
            p = np.repeat(p, vmax // vs[ci], axis=0)
        if hs[ci] != hmax:
            p = np.repeat(p, hmax // hs[ci], axis=1)
        full.append(p[:h, :w])
    planes = full
    if len(comps) == 1:
        return np.clip(_round_half_up(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)
