"""Incremental KG refresh: folding crawl B into a graph built from
crawl A must equal the single-shot build over A ∪ B, and re-crawling
already-known urls must be idempotent."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
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


class TestVersionDelta:
    """versioned.version_delta -> matview composition: the signed
    Z-set delta between snapshots maintains a view to bit-exact
    equality with a full recompute, reading only changed files."""

    @staticmethod
    def _kv(ids, langs, vals):
        return pa.table({"doc_id": pa.array(list(ids), pa.int64()),
                         "lang": pa.array(list(langs), pa.string()),
                         "v": pa.array(list(vals), pa.int64())})

    def _view(self, snap):
        from cosmos_ray.functions.matview import delta_partials

        signed = snap.map_batches(
            lambda t: t.append_column(
                "sign", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow")
        return delta_partials(signed, keys=["lang"], sum_cols=["v"])

    def _fixture(self, tmp_path):
        import ray.data as rd

        from cosmos_ray.state import versioned as V

        d = str(tmp_path / "vd")
        V.commit_append(d, rd.from_arrow(
            self._kv([1, 2, 3, 4], ["en", "en", "de", "fr"],
                     [10, 20, 30, 40])))
        V.commit_merge_upsert(d, "doc_id", rd.from_arrow(
            self._kv([2, 3, 9], ["en", "de", "fr"], [25, 30, 90])))
        V.commit_delete_keys(d, "doc_id", [4])
        return d

    def test_maintain_equals_recompute(self, ray_session, tmp_path):
        import ray.data as rd

        from cosmos_ray.functions.matview import maintain_view
        from cosmos_ray.state import versioned as V

        d = self._fixture(tmp_path)
        got = (maintain_view(self._view(V.read_snapshot(d, 1)),
                             V.version_delta(d, 1, 3),
                             keys=["lang"], sum_cols=["v"])
               .to_pandas().sort_values("lang").reset_index(drop=True))
        want = (maintain_view(self._view(V.read_snapshot(d, 3)),
                              rd.from_arrow(self._kv([], [], []).append_column(
                                  "sign", pa.array([], pa.int64()))),
                              keys=["lang"], sum_cols=["v"])
                .to_pandas().sort_values("lang").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
        # fr: doc 4 deleted, doc 9 inserted -> n=1, v=90; de rewrite
        # survivor (identical row moved files) cancelled exactly
        row = got.set_index("lang")
        assert (row.loc["fr", "n"], row.loc["fr", "v"]) == (1, 90)
        assert (row.loc["de", "n"], row.loc["de", "v"]) == (1, 30)
        assert (row.loc["en", "n"], row.loc["en", "v"]) == (2, 35)

    def test_reverse_delta_restores_old_view(self, ray_session, tmp_path):
        from cosmos_ray.functions.matview import maintain_view
        from cosmos_ray.state import versioned as V

        d = self._fixture(tmp_path)
        back = (maintain_view(self._view(V.read_snapshot(d, 3)),
                              V.version_delta(d, 3, 1),
                              keys=["lang"], sum_cols=["v"])
                .to_pandas().set_index("lang"))
        assert (back.loc["en", "n"], back.loc["en", "v"]) == (2, 30)
        assert (back.loc["fr", "n"], back.loc["fr", "v"]) == (1, 40)

    def test_delta_prunes_unchanged_files(self, ray_session, tmp_path):
        import ray.data as rd

        from cosmos_ray.state import versioned as V

        d = str(tmp_path / "pr")
        V.commit_append(d, rd.from_arrow(
            self._kv([1, 2], ["en", "en"], [1, 2])))
        V.commit_append(d, rd.from_arrow(
            self._kv([3], ["de"], [3])))
        # append-only delta: only the v2 file, +1 rows, v1 file unopened
        delta = V.version_delta(d, 1, 2).to_pandas()
        assert list(delta["doc_id"]) == [3]
        assert list(delta["sign"]) == [1]
        # identical versions: typed empty delta
        same = V.version_delta(d, 2, 2)
        assert same.count() == 0 and "sign" in same.schema().names
