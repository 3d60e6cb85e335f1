"""Perceptual-hash image near-dup gates (`functions/imagehash.py`)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from cosmos_ray.functions.imagecodec import encode_bmp
from cosmos_ray.functions.imagehash import (average_hash, hamming64,
                                            phash_near_dups)


def _texture(seed: int, h: int = 32, w: int = 40) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 200, size=(h, w, 3)).astype(np.uint8)


class TestAverageHash:
    def test_brightness_shift_invariant(self):
        img = _texture(1)
        assert average_hash(img) == average_hash((img + 20).astype(np.uint8))

    def test_single_pixel_robust(self):
        img = _texture(2)
        tweaked = img.copy()
        tweaked[5, 5, :] = np.minimum(tweaked[5, 5, :] + 1, 255)
        a, b = average_hash(img), average_hash(tweaked)
        assert int(hamming64(np.array([a], np.uint64),
                             np.array([b], np.uint64))[0]) <= 1

    def test_distinct_textures_far(self):
        a, b = average_hash(_texture(3)), average_hash(_texture(4))
        d = int(hamming64(np.array([a], np.uint64),
                          np.array([b], np.uint64))[0])
        assert d > 6

    def test_grayscale_and_small_images(self):
        g = np.arange(64, dtype=np.uint8).reshape(8, 8)
        assert 0 <= average_hash(g) < 2 ** 64
        tiny = np.full((3, 5), 7, np.uint8)  # < 8x8: repetition upscale
        assert 0 <= average_hash(tiny) < 2 ** 64

    def test_hamming64_matches_popcount(self):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 2 ** 63, size=50).astype(np.uint64)
        b = rng.randint(0, 2 ** 63, size=50).astype(np.uint64)
        got = hamming64(a, b)
        want = [bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)]
        assert got.tolist() == want


def _media(rows):
    return rd.from_arrow(pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.string()),
        "payload": pa.array([encode_bmp(r[1]) for r in rows], pa.binary()),
    }))


class TestPhashNearDups:
    def test_planted_pairs_exact(self):
        base = _texture(10)
        shifted = (base + 5).astype(np.uint8)  # brightness near-dup
        tweak = base.copy()
        tweak[3, 3, :] = np.minimum(tweak[3, 3, :] + 1, 255)
        rows = [("a", base), ("b", shifted), ("c", tweak),
                ("d", _texture(11)), ("e", _texture(12))]
        out = phash_near_dups(_media(rows), max_hamming=6).to_pandas()
        got = set(zip(out.media_id_a, out.media_id_b))
        assert got == {("a", "b"), ("a", "c"), ("b", "c")}
        assert (out.hamming <= 1).all()

    def test_pair_ordering_and_min_hamming(self):
        base = _texture(20)
        out = phash_near_dups(
            _media([("x2", base), ("x1", (base + 9).astype(np.uint8))]),
            max_hamming=6).to_pandas()
        assert list(zip(out.media_id_a, out.media_id_b)) == [("x1", "x2")]
        assert out.hamming.tolist() == [0]

    def test_degenerate_identical_corpus_bounded(self):
        img = _texture(30)
        rows = [(f"m{i:03d}", img) for i in range(150)]
        out = phash_near_dups(_media(rows), max_hamming=6).to_pandas()
        # capped bucket self-join keeps the run bounded and exact
        # within the retained ids (same guard as text LSH)
        assert len(out) <= 64 * 63 // 2
        assert (out.hamming == 0).all()
        assert len(out) > 0

    def test_empty_input(self):
        out = phash_near_dups(_media([]), max_hamming=6).to_pandas()
        assert len(out) == 0
