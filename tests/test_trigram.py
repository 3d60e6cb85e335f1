"""At-rest byte-trigram substring index (`state/trigram.py`).

Gates: exact results vs a plain scan, part pruning actually prunes,
misses return empty without reading corpus parts, sub-trigram needles
degrade to a full scan but stay exact.
"""
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from cosmos_ray.state.trigram import (
    build_trigram_index,
    candidate_parts,
    substring_search,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "how vexingly quick daft zebras jump",
    "the five boxing wizards jump quickly",
    "a quick movement of the enemy will jeopardize six gunboats",
    "jived fox nymph grabs quick waltz",
    "glib jocks quiz nymph to vex dwarf",
] * 4  # 32 docs spread over parts


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("trigram_idx"))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS),
    }))
    build_trigram_index(docs, out, num_parts=8, num_buckets=4)
    return out


def _scan_expect(needle):
    return sorted(i for i, t in enumerate(TEXTS) if needle in t)


@pytest.mark.parametrize("needle", [
    "quick brown", "jump", "nymph", "the", "quartz judge",
])
def test_exact_vs_scan(index_dir, needle):
    got = sorted(substring_search(index_dir, needle)
                 .to_pandas()["doc_id"].tolist())
    assert got == _scan_expect(needle)


def test_miss_prunes_everything(index_dir):
    assert candidate_parts(index_dir, "zzqxv##") == []
    res = substring_search(index_dir, "zzqxv##")
    assert res.count() == 0


def test_pruning_is_superset_and_strict(index_dir):
    # every part holding a match must be a candidate...
    parts = candidate_parts(index_dir, "gunboats")
    match_parts = {i % 8 for i in _scan_expect("gunboats")}
    assert match_parts <= set(parts)
    # ...and a needle unique to one doc family prunes below full fan-out
    assert len(parts) < 8


def test_short_needle_full_scan_exact(index_dir):
    # < 3 bytes: no trigram to prune on -> all parts, residual exact
    assert candidate_parts(index_dir, "qu") == list(range(8))
    got = sorted(substring_search(index_dir, "qu")
                 .to_pandas()["doc_id"].tolist())
    assert got == _scan_expect("qu")


def test_postings_are_distinct_pairs(index_dir):
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(index_dir, "grams"))
    n = t.num_rows
    grp = t.group_by(["gbucket", "gram", "fpart"]).aggregate([])
    assert grp.num_rows == n
