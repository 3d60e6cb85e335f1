"""Gates for schema-evolution parquet reads (`sources/evolution.py`):
the widening lattice, union-by-name column fill, per-group casts, and
the conflict error path."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cosmos_ray.sources.evolution import (read_parquet_evolved,
                                          unify_schemas)


class TestUnify:
    def test_widening_lattice(self):
        a = pa.schema([("i", pa.int32()), ("f", pa.float32()),
                       ("s", pa.string())])
        b = pa.schema([("i", pa.int64()), ("f", pa.float64()),
                       ("s", pa.large_string()), ("new", pa.int8())])
        u = unify_schemas([a, b])
        assert u.field("i").type == pa.int64()
        assert u.field("f").type == pa.float64()
        assert u.field("s").type == pa.string()
        assert u.field("new").type == pa.int8()
        # column order: first appearance, oldest generation first
        assert u.names == ["i", "f", "s", "new"]

    def test_int_float_cross_promotes_to_float64(self):
        u = unify_schemas([pa.schema([("x", pa.int64())]),
                           pa.schema([("x", pa.float32())])])
        assert u.field("x").type == pa.float64()

    def test_signed_unsigned_to_int64(self):
        u = unify_schemas([pa.schema([("x", pa.uint32())]),
                           pa.schema([("x", pa.int16())])])
        assert u.field("x").type == pa.int64()

    def test_null_promotes(self):
        u = unify_schemas([pa.schema([("x", pa.null())]),
                           pa.schema([("x", pa.string())])])
        assert u.field("x").type == pa.string()

    def test_conflict_raises(self):
        with pytest.raises(ValueError, match="incompatible"):
            unify_schemas([pa.schema([("x", pa.string())]),
                           pa.schema([("x", pa.int64())])])


class TestEvolvedRead:
    def _write(self, d, name, tbl):
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, name))

    def test_union_by_name_fill_and_widen(self, tmp_path):
        g0 = str(tmp_path / "g0")
        g1 = str(tmp_path / "g1")
        self._write(g0, "a.parquet", pa.table({
            "id": pa.array([1, 2], pa.int32()),
            "v": pa.array([10, 20], pa.int32())}))
        self._write(g1, "a.parquet", pa.table({
            "id": pa.array([3], pa.int64()),
            "tag": pa.array(["x"], pa.string())}))
        ds = read_parquet_evolved([g0, g1])
        t = pa.Table.from_pandas(
            ds.to_pandas().sort_values("id").reset_index(drop=True))
        assert t.column("id").to_pylist() == [1, 2, 3]
        assert t.column("v").to_pylist() == [10, 20, None]
        assert t.column("tag").to_pylist() == [None, None, "x"]
        sch = ds.schema()
        assert dict(zip(sch.names, sch.types))["id"] == pa.int64()

    def test_explicit_target_schema(self, tmp_path):
        g0 = str(tmp_path / "g0")
        self._write(g0, "a.parquet", pa.table({
            "id": pa.array([1], pa.int32())}))
        target = pa.schema([("id", pa.int64()), ("extra", pa.float64())])
        out = read_parquet_evolved(g0, target=target).to_pandas()
        assert out["id"].tolist() == [1]
        assert out["extra"].isna().all()

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(ValueError, match="no parquet files"):
            read_parquet_evolved(str(tmp_path))

    def test_homogeneous_zero_copy_path(self, tmp_path):
        # identical schemas: single group, no normalization map needed
        g0 = str(tmp_path / "g0")
        self._write(g0, "a.parquet", pa.table({"id": pa.array([1, 2])}))
        self._write(g0, "b.parquet", pa.table({"id": pa.array([3])}))
        out = read_parquet_evolved(g0).to_pandas()
        assert sorted(out["id"].tolist()) == [1, 2, 3]

    def test_timezone_mismatch_raises(self):
        with pytest.raises(ValueError, match="timezone"):
            unify_schemas([
                pa.schema([("ts", pa.timestamp("us", tz="UTC"))]),
                pa.schema([("ts", pa.timestamp("us"))])])
