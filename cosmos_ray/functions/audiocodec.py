"""Pure-numpy PCM WAV codec (RIFF/WAVE, 8/16/32-bit integer PCM and
32-bit float): real audio decode without any audio library, which this
container lacks.

Same scope policy as `imagecodec.py`: complete, byte-exact for the
UNCOMPRESSED format a pipeline can round-trip — `DecodeAudio` in
`stages/multimodal.py` is real for PCM WAV; compressed codecs
(MP3/Opus/AAC) stay behind the declared ``NotImplementedError``.
Chunk parsing walks the RIFF structure (fmt/data may be preceded by
LIST/fact chunks); samples come out as float32 in [-1, 1], channels
preserved — vectorized ``np.frombuffer`` throughout.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000,
               bits: int = 16) -> bytes:
    """(n,) or (n, channels) float array in [-1, 1] -> PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if bits == 16:
        data = np.clip(np.round(x * 32767.0), -32768, 32767).astype(
            "<i2").tobytes()
        fmt_code, sw = 1, 2
    elif bits == 32:
        data = x.astype("<f4").tobytes()
        fmt_code, sw = 3, 4  # IEEE float
    elif bits == 8:
        data = np.clip(np.round(x * 127.0) + 128, 0, 255).astype(
            np.uint8).tobytes()
        fmt_code, sw = 1, 1
    else:
        raise ValueError("bits must be 8, 16 or 32")
    byte_rate = sample_rate * ch * sw
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sample_rate, byte_rate,
                      ch * sw, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """PCM WAV bytes -> (samples float32 (n, channels) in [-1, 1],
    sample_rate). Walks RIFF chunks; 8/16/32-bit int PCM and 32-bit
    float supported."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"not a RIFF/WAVE payload (magic={payload[:4]!r})")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    fmt_code, ch, rate, _br, _ba, bits = fmt
    if fmt_code == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif fmt_code == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif fmt_code == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif fmt_code == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    else:
        raise NotImplementedError(
            f"unsupported WAV encoding (fmt={fmt_code}, bits={bits})")
    return x.reshape(-1, ch), rate
