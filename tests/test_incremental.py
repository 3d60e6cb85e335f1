"""Incremental KG refresh: folding crawl B into a graph built from
crawl A must equal the single-shot build over A ∪ B, and re-crawling
already-known urls must be idempotent."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

from cosmos_ray.pipelines.incremental import run_kg_update
from cosmos_ray.pipelines.kg import run_kg_streaming
from cosmos_ray.sources.pages import generate_pages_table

SF = "/root/testdata/sf0.001"
TABLES = ("triples", "entities", "adjacency")


def _table(path: str) -> pd.DataFrame:
    df = pq.read_table(path).to_pandas()
    for c in ("aliases", "types"):
        if c in df.columns:
            df[c] = df[c].map(lambda x: "|".join(x))
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _build(pages_tbl, out_dir):
    return run_kg_streaming(rd.from_arrow(pages_tbl), str(out_dir),
                            driver_threshold=0)


def test_update_equals_full_build(tmp_path):
    docs = pq.read_table(f"{SF}/documents.parquet")
    pages = generate_pages_table(docs, inject_faults=False)
    a = pages.slice(0, pages.num_rows // 2)
    b = pages.slice(pages.num_rows // 2)

    full_dir = tmp_path / "full"
    inc_dir = tmp_path / "inc"
    _build(pages, full_dir)
    _build(a, inc_dir)
    metrics = run_kg_update(str(inc_dir), rd.from_arrow(b), driver_threshold=0)
    assert metrics["triples_rows"] > 0

    for name in TABLES:
        want = _table(str(full_dir / name))
        got = _table(str(inc_dir / name))
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name


def test_recrawl_is_idempotent(tmp_path):
    docs = pq.read_table(f"{SF}/documents.parquet")
    pages = generate_pages_table(docs, inject_faults=False)
    out = tmp_path / "g"
    _build(pages, out)
    before = {n: _table(str(out / n)) for n in TABLES}

    # re-crawl a third of the urls with identical content: replacement
    # must leave every table exactly as it was
    recrawl = pages.slice(0, pages.num_rows // 3)
    run_kg_update(str(out), rd.from_arrow(recrawl), driver_threshold=0)
    for name in TABLES:
        pd.testing.assert_frame_equal(_table(str(out / name)), before[name],
                                      check_dtype=False)


class TestMatviewMaintenance:
    """`functions/matview.py` — signed-delta (Z-set) view maintenance."""

    @staticmethod
    def _rows(rows):
        import pyarrow as pa

        import ray.data as rd

        k, sign, v = zip(*rows)
        return rd.from_arrow(pa.table({
            "k": pa.array(k, pa.string()),
            "sign": pa.array(sign, pa.int64()),
            "v": pa.array(v, pa.int64())}))

    def _view(self, rows):
        from cosmos_ray.functions.matview import delta_partials

        return delta_partials(self._rows(rows), ["k"], ["v"])

    def test_incremental_equals_full_recompute(self, ray_session):
        from cosmos_ray.functions.matview import maintain_view

        base = [("a", 1, 10), ("a", 1, 20), ("b", 1, 5), ("c", 1, 7)]
        delta = [("a", 1, 40), ("b", -1, 5), ("d", 1, 3)]
        got = maintain_view(self._view(base), self._rows(delta),
                            ["k"], ["v"]).to_pandas().sort_values("k")
        # full recompute of base + delta as multisets
        assert got["k"].tolist() == ["a", "c", "d"]
        assert got["n"].tolist() == [3, 1, 1]
        assert got["v"].tolist() == [70, 7, 3]

    def test_fully_retracted_group_leaves_view(self, ray_session):
        from cosmos_ray.functions.matview import maintain_view

        base = [("x", 1, 2), ("x", 1, 3), ("y", 1, 1)]
        delta = [("x", -1, 2), ("x", -1, 3)]
        got = maintain_view(self._view(base), self._rows(delta),
                            ["k"], ["v"]).to_pandas()
        assert got["k"].tolist() == ["y"]

    def test_over_retraction_raises(self, ray_session):
        import pytest as _pytest

        from cosmos_ray.functions.matview import maintain_view

        base = [("x", 1, 2)]
        delta = [("x", -1, 2), ("x", -1, 2)]
        with _pytest.raises(Exception, match="negative maintained count"):
            maintain_view(self._view(base), self._rows(delta),
                          ["k"], ["v"]).to_pandas()

    def test_empty_delta_is_identity(self, ray_session):
        from cosmos_ray.functions.matview import maintain_view

        base = [("a", 1, 10), ("b", 1, 5)]
        got = maintain_view(self._view(base), self._rows_empty(),
                            ["k"], ["v"]).to_pandas().sort_values("k")
        assert got["k"].tolist() == ["a", "b"]
        assert got["n"].tolist() == [1, 1]
        assert got["v"].tolist() == [10, 5]

    @staticmethod
    def _rows_empty():
        import pyarrow as pa

        import ray.data as rd

        return rd.from_arrow(pa.table({
            "k": pa.array([], pa.string()),
            "sign": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64())}))
