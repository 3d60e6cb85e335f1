"""Perceptual image hashing + near-duplicate detection over binary
image columns.

The multimodal counterpart of the text near-dup family (SimHash /
MinHash in `functions/dedup.py`): an 8x8 average-hash (aHash) per
decoded image — grayscale, area-downsample to an 8x8 grid, threshold
each cell against the grid mean, pack to one uint64 — then band-bucket
LSH pairing and exact Hamming verification. aHash is invariant to
constant brightness shifts (the threshold is the grid mean) and robust
to resampling of the same content, which is exactly the mirror-crawl /
re-encoded-thumbnail duplicate class a web pipeline must collapse.
Reference analog: Cosmos recompresses and dedups extracted figure
images by content (`ingest/ingest_images.py`); the hash here replaces
its byte-identity with perceptual identity.

Scale shape: hashing is an actor-pool ``map_batches`` over payload
batches (wide rows -> small batch_size, same posture as
`stages/multimodal.decode_images`); only (media_id, 64-bit hash) ever
enters an exchange. Candidate pairs come from a 4x16-bit band
self-join (`relational.self_join_pairs` — capped degenerate buckets),
verified by vectorized XOR+popcount, then distinct-deduped across
bands. No image bytes cross the wire after the hash stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cosmos_ray.functions.imagecodec import decode_image
from cosmos_ray.stages.multimodal import _fake_decode

HASH_BITS = 64
_GRID = 8  # 8x8 grid -> 64-bit hash
N_BANDS = 4  # 4 x 16-bit LSH bands


def average_hash(img: np.ndarray) -> int:
    """aHash of an (H, W[, C]) uint8 image as a python int in [0, 2^64).

    Deterministic pure numpy: channel-mean grayscale (float64), integer
    area bins (cell [i, j] averages rows i*H//8:(i+1)*H//8 — exact for
    any H, W >= 8), bit = cell > mean(cells), row-major MSB-first
    packing."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    if h < _GRID or w < _GRID:  # upscale tiny images by repetition
        a = np.repeat(np.repeat(a, (_GRID + h - 1) // h, axis=0),
                      (_GRID + w - 1) // w, axis=1)
        h, w = a.shape
    rb = (np.arange(_GRID + 1) * h) // _GRID
    cb = (np.arange(_GRID + 1) * w) // _GRID
    cells = np.empty((_GRID, _GRID), np.float64)
    for i in range(_GRID):
        ri = a[rb[i]:rb[i + 1]]
        for j in range(_GRID):
            cells[i, j] = ri[:, cb[j]:cb[j + 1]].mean()
    bits = (cells > cells.mean()).reshape(-1)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a XOR b) for uint64 arrays (numpy<2 has no
    bitwise_count; unpackbits over the byte view is exact)."""
    x = (np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64))
    by = x.view(np.uint8).reshape(-1, 8)
    return np.unpackbits(by, axis=1).sum(axis=1).astype(np.int64)


class HashImages:
    """Actor-pool stage: (media_id, payload) -> (media_id, phash).

    Same decode contract as `stages/multimodal.DecodeImage` (real
    pure-numpy BMP/PPM/PGM codec, honest fake for absent codecs)."""

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        hashes = []
        for p in payloads:
            img = _fake_decode(p) if self.fake else decode_image(p)
            hashes.append(average_hash(img))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "phash": pa.array(hashes, pa.uint64()),
        })


def hash_images(media_ds, fake: bool = False,
                concurrency: int | tuple = (1, 4), batch_size: int = 32):
    return media_ds.map_batches(
        HashImages,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def phash_near_dups(media_ds, max_hamming: int = 6, fake: bool = False,
                    max_group: int = 64):
    """Verified near-duplicate image pairs
    (media_id_a < media_id_b, hamming <= max_hamming).

    Band LSH recall: by pigeonhole, any pair with <= N_BANDS - 1 = 3
    differing bits leaves at least one 16-bit band untouched, so recall
    is EXACT for hamming <= 3; for 4..max_hamming flips recall drops
    only when the flips spread across all 4 bands — the same
    recall/cost trade-off as the SimHash text banding
    (`dedup.simhash_pairs`), and the same 4-band geometry so the two
    families stay comparable."""
    import pyarrow.compute as pc

    from cosmos_ray.queries.relational import self_join_pairs

    hashed = hash_images(media_ds, fake=fake)

    def bands(t: pa.Table) -> pa.Table:
        ph = t.column("phash").to_numpy(zero_copy_only=False)
        ids = t.column("media_id")
        parts = []
        for b in range(N_BANDS):
            val = ((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(
                np.int64)
            parts.append(pa.table({
                "band_id": pa.array(np.full(len(val), b, np.int64)),
                "band_val": pa.array(val),
                "media_id": ids,
                "phash": t.column("phash"),
            }))
        return pa.concat_tables(parts)

    cands = self_join_pairs(hashed.map_batches(bands, batch_format="pyarrow"),
                            ["band_id", "band_val"], id_col="media_id",
                            payload_cols=["phash"], max_group=max_group)

    def verify(df):
        if not len(df):
            return pa.table({"media_id_a": pa.array([], pa.string()),
                             "media_id_b": pa.array([], pa.string()),
                             "hamming": pa.array([], pa.int64())})
        d = hamming64(df["phash_a"].to_numpy().astype(np.uint64),
                      df["phash_b"].to_numpy().astype(np.uint64))
        keep = d <= max_hamming
        return pa.table({
            "media_id_a": pa.array(df["media_id_a"].to_numpy()[keep],
                                   pa.string()),
            "media_id_b": pa.array(df["media_id_b"].to_numpy()[keep],
                                   pa.string()),
            "hamming": pa.array(d[keep], pa.int64()),
        })

    from ray.data.aggregate import Min

    verified = cands.map_batches(verify, batch_format="pandas")
    # a pair can surface from several bands: one distinct groupby
    return (verified.groupby(["media_id_a", "media_id_b"])
            .aggregate(Min("hamming", alias_name="hamming")))
