"""Streaming single-pass pipeline: same results as the checkpointing
variant, with the metadata-only dedup plan and collector-actor dead
letters."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from cosmos_ray.pipelines.kg import build_kg_streaming
from cosmos_ray.stages.extract import discover_dup_urls, drop_stale


@pytest.fixture(scope="module")
def kg_stream(pages_small):
    return build_kg_streaming(rd.from_arrow(pages_small))


def test_streaming_triples_match_golden(kg_stream, golden_small):
    got = {
        (r["url"], r["subj"], r["pred"], r["obj"]) for r in kg_stream.triples.take_all()
    }
    g = golden_small["triples"]
    want = set(zip(*[g.column(c).to_pylist() for c in ["url", "subj", "pred", "obj"]]))
    assert got == want


def test_streaming_dead_letter_per_url(kg_stream, golden_small, pages_small):
    dead_urls = {r["url"] for r in kg_stream.dead_letter.take_all()}
    golden_urls = set(golden_small["text"].column("url").to_pylist())
    all_urls = set(pages_small.column("url").to_pylist())
    assert dead_urls == all_urls - golden_urls  # exactly the malformed urls


def test_streaming_entity_counts(kg_stream, golden_small):
    got = {r["canonical_id"]: r["n_mentions"] for r in kg_stream.entities.take_all()}
    want = {
        r["canonical_id"]: r["n_mentions"]
        for r in golden_small["mention_counts"].to_pylist()
    }
    assert got == want


def test_streaming_nodedup_matches_checkpointing(pages_small):
    """With dedup_input=False duplicate-url rows reach extraction, so the
    exchange-free urllocal triple dedup is invalid — the streaming
    variant must fall back to the globally-grouped dedup and agree with
    the checkpointing variant on (triple, n_mentions)."""
    from cosmos_ray.pipelines.kg import build_kg, build_kg_streaming

    s = build_kg_streaming(
        rd.from_arrow(pages_small), dedup_input=False, driver_threshold=0
    )
    c = build_kg(rd.from_arrow(pages_small), dedup_input=False)
    key = lambda r: (r["url"], r["subj"], r["pred"], r["obj"], r["n_mentions"])
    assert {key(r) for r in s.triples.take_all()} == {key(r) for r in c.triples.take_all()}


def test_drop_stale_breaks_ts_ties(pages_small):
    """Two crawls of one url with IDENTICAL warc_ts: the plan marks the
    url TIED and dedup_latest_pages keeps exactly one deterministic
    winner (min md5(html)) regardless of batch boundaries."""
    import hashlib

    import ray

    from cosmos_ray.stages.extract import dedup_latest_pages

    htmls = [b"<p>first</p>", b"<p>second</p>"]
    t = pa.table(
        {
            "url": ["http://tie.example/x"] * 2,
            "warc_ts": pa.array([1_700_000_000_000_000] * 2, pa.timestamp("us")),
            "html": htmls,
            "text": ["", ""],
            "lang": ["en", "en"],
        }
    )
    ref = discover_dup_urls(rd.from_arrow(t))
    assert ref is not None
    plan = ray.get(ref)
    assert plan["ts"] and plan["tied"] == {"http://tie.example/x"}
    kept = dedup_latest_pages(rd.from_arrow(t), ref).take_all()
    assert len(kept) == 1
    want = min(htmls, key=lambda h: hashlib.md5(h).hexdigest())
    assert kept[0]["html"] == want
    # legacy batch-local policy still keeps exactly one within a batch
    kept_first = drop_stale(rd.from_arrow(t), ref, tied="first").take_all()
    assert len(kept_first) == 1


def test_sparse_dedup_plan(pages_small):
    import ray

    pages = rd.from_arrow(pages_small)
    dup_ref = discover_dup_urls(pages)
    assert dup_ref is not None
    dups = ray.get(dup_ref)["ts"]
    # planted duplicates: every url occurring twice, mapped to its max ts
    urls = pages_small.column("url").to_pylist()
    from collections import Counter

    counted = Counter(urls)
    assert set(dups) == {u for u, n in counted.items() if n > 1}

    kept = drop_stale(pages, dup_ref)
    kept_urls = [r["url"] for r in kept.select_columns(["url"]).take_all()]
    assert len(kept_urls) == len(set(kept_urls))  # one row per url survives
    assert set(kept_urls) == set(urls)


def _poison_udf():
    # defined as a nested-return factory so cloudpickle ships it by
    # value (test modules are not importable inside ray workers)
    def udf(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        vals = t.column("v")
        if pc.any(pc.equal(vals, 13)).as_py():
            raise ValueError("poison 13")
        return pa.table({"doc_id": t.column("doc_id"),
                         "doubled": pc.multiply(vals, 2)})

    return udf


class TestSafeMapBatches:

    def test_poison_rows_quarantined_good_rows_flow(self, ray_session, tmp_path):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.stages.safemap import read_dead, safe_map_batches

        dead = str(tmp_path / "dead")
        n = 500
        vals = [13 if i in (7, 250, 499) else i + 1000 for i in range(n)]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "v": pa.array(vals, pa.int64())}))
        out = safe_map_batches(ds, _poison_udf(), dead, id_col="doc_id",
                               stage="double", batch_size=64).to_pandas()
        assert len(out) == n - 3
        assert (out["doubled"] == out["doc_id"].map(
            dict(zip(range(n), vals))) * 2).all()
        d = read_dead(dead).to_pandas()
        assert sorted(d["id"].tolist()) == ["250", "499", "7"]
        assert (d["stage"] == "double").all()
        assert d["error"].str.contains("poison").all()

    def test_no_failures_no_shards(self, ray_session, tmp_path):
        import os

        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.stages.safemap import read_dead, safe_map_batches

        dead = str(tmp_path / "dead2")
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(50), pa.int64()),
            "v": pa.array(range(1000, 1050), pa.int64())}))
        out = safe_map_batches(ds, _poison_udf(), dead, id_col="doc_id")
        assert out.count() == 50
        assert os.listdir(dead) == []
        assert read_dead(dead).count() == 0

    def test_all_poison_batch_keeps_schema(self, ray_session, tmp_path):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.stages.safemap import read_dead, safe_map_batches

        dead = str(tmp_path / "dead3")
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "v": pa.array([13, 13], pa.int64())}))
        out = safe_map_batches(ds, _poison_udf(), dead, id_col="doc_id")
        assert out.count() == 0
        assert read_dead(dead).count() == 2

    def test_rerun_idempotent_shards(self, ray_session, tmp_path):
        import os

        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.stages.safemap import read_dead, safe_map_batches

        dead = str(tmp_path / "dead4")
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(100), pa.int64()),
            "v": pa.array([13 if i == 42 else i + 100 for i in range(100)],
                          pa.int64())}))
        for _ in range(2):  # identical content-keyed shard on re-run
            safe_map_batches(ds, _poison_udf(), dead,
                             id_col="doc_id").materialize()
        assert len(os.listdir(dead)) == 1
        assert read_dead(dead).count() == 1


def _slow_udf():
    def udf(t):
        import time

        import pyarrow as pa
        import pyarrow.compute as pc

        if pc.any(pc.equal(t.column("v"), 13)).as_py():
            time.sleep(5.0)  # hung row — far past the watchdog budget
        return pa.table({"doc_id": t.column("doc_id"),
                         "doubled": pc.multiply(t.column("v"), 2)})

    return udf


class TestSafemapTimeout:

    def test_hung_row_quarantined_rest_flow(self, ray_session, tmp_path):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.stages.safemap import read_dead, safe_map_batches

        dead = str(tmp_path / "dead_t")
        n = 64
        vals = [13 if i == 21 else i + 1000 for i in range(n)]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "v": pa.array(vals, pa.int64())}))
        out = safe_map_batches(ds, _slow_udf(), dead, id_col="doc_id",
                               stage="slow", batch_size=32,
                               timeout_s=0.3).to_pandas()
        assert len(out) == n - 1
        assert 21 not in set(out["doc_id"])
        d = read_dead(dead).to_pandas()
        assert d["id"].tolist() == ["21"]
        assert d["error"].str.contains("BatchTimeout").all()

    def test_fast_batches_untouched(self, ray_session, tmp_path):
        import os

        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.stages.safemap import safe_map_batches

        dead = str(tmp_path / "dead_t2")
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(40), pa.int64()),
            "v": pa.array(range(1000, 1040), pa.int64())}))
        out = safe_map_batches(ds, _slow_udf(), dead, id_col="doc_id",
                               timeout_s=2.0)
        assert out.count() == 40
        assert os.listdir(dead) == []


def test_keep_latest_ties_deterministic_content_hash():
    """The full-shuffle keep_latest path picks the SAME min-md5 winner
    for max-ts ties regardless of row arrival order (consistent with
    resolve_tied on the metadata-plan path)."""
    import hashlib

    import pyarrow as pa

    from cosmos_ray.stages.extract import _batch_local_latest

    rows = [
        {"url": "u", "warc_ts": 5, "text": "bravo"},
        {"url": "u", "warc_ts": 5, "text": "alpha"},
        {"url": "u", "warc_ts": 3, "text": "older"},
        {"url": "v", "warc_ts": 9, "text": "only"},
    ]
    want = min(["bravo", "alpha"], key=lambda s: hashlib.md5(s.encode()).hexdigest())
    for perm in (rows, rows[::-1], [rows[1], rows[0], rows[3], rows[2]]):
        t = pa.table({
            "url": [r["url"] for r in perm],
            "warc_ts": pa.array([r["warc_ts"] for r in perm], pa.timestamp("us")),
            "text": [r["text"] for r in perm],
        })
        out = _batch_local_latest(t).to_pylist()
        got = {r["url"]: r["text"] for r in out}
        assert got == {"u": want, "v": "only"}, perm
