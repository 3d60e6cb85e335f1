"""Unit gates for the data-quality validation (expectations) operator —
planted nulls, out-of-set values, range breaches, regex misses and
duplicate keys, each counted exactly."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from cosmos_ray.functions.validate import validate


def _ds():
    return rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 2, 3, None], pa.int64()),
        "kind": pa.array(["a", "b", "zz", None, "a"]),
        "v": pa.array([0.0, 5.0, -1.0, 11.0, None], pa.float64()),
        "code": pa.array(["X1", "X2", "y3", "X4", None]),
    }))


def _run(rules):
    df = validate(_ds(), rules).to_pandas()
    return dict(zip(df["rule"], df["violations"]))


def test_each_rule_counts_exactly():
    got = _run([
        {"check": "not_null", "col": "id"},
        {"check": "in_set", "col": "kind", "values": ["a", "b"]},
        {"check": "range", "col": "v", "lo": 0.0, "hi": 10.0},
        {"check": "regex", "col": "code", "pattern": "^X"},
        {"check": "unique", "col": "id"},
    ])
    assert got == {
        "id_not_null": 1,        # one null id
        "kind_in_set": 2,        # 'zz' + null
        "v_range": 3,            # -1, 11, null
        "code_regex": 2,         # 'y3' + null
        "id_unique": 1,          # id 2 appears twice (nulls ignored)
    }


def test_open_ended_range_and_custom_name():
    got = _run([
        {"check": "range", "col": "v", "lo": 0.0, "hi": None,
         "name": "v_nonneg"},
    ])
    assert got == {"v_nonneg": 2}  # -1 and null


def test_clean_table_all_zero():
    ds = rd.from_arrow(pa.table({"id": pa.array([1, 2, 3], pa.int64())}))
    df = validate(ds, [{"check": "not_null", "col": "id"},
                       {"check": "unique", "col": "id"}]).to_pandas()
    assert df["violations"].tolist() == [0, 0]
