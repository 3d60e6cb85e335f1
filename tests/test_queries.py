"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its oracle_sql() via DuckDB
(row count, column names, order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def _all_sql_cases():
    from cosmos_ray.queries.driver_queries import ORACLES

    return sorted(ORACLES)


@pytest.mark.parametrize("name", _all_sql_cases())
def test_query_matches_oracle(name):
    from cosmos_ray.queries.driver_queries import ORACLES, QUERIES

    got = _norm(_to_df(QUERIES[name](SF)))
    want = _norm(_oracle(ORACLES[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:3]}"


def test_rows_only_queries_execute():
    """Queries without SQL oracles must still run and return rows with a
    stable schema (mirrors the driver's weaker check)."""
    from cosmos_ray.queries.driver_queries import ORACLES, QUERIES

    for name, fn in QUERIES.items():
        if name in ORACLES or name.startswith("kg_"):
            continue  # kg_* covered by dedicated fixture tests; SQL ones above
        df = _to_df(fn(SF))
        assert df.shape[1] >= 2, name


def test_guarded_driver_pull_fallbacks_agree():
    """cap_rows=0 forces the distributed join fallbacks of semi_join_ds /
    join_or_broadcast — they must agree exactly with the broadcast fast
    path (the at-scale degradation is a plan change, not a result change)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from cosmos_ray.queries.relational import join_or_broadcast, read, semi_join_ds

    def orders():
        return read(SF, "orders", ["o_custkey", "o_totalprice"])

    def customer():
        return read(SF, "customer", ["c_custkey", "c_name"])

    def big():
        return orders().map_batches(
            lambda t: t.filter(
                pc.greater(t.column("o_totalprice"), pa.scalar(300000.0))
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )

    for keep in (True, False):
        fast = _norm(_to_df(semi_join_ds(customer(), big(), "o_custkey",
                                         "c_custkey", keep=keep)))
        dist = _norm(_to_df(semi_join_ds(customer(), big(), "o_custkey",
                                         "c_custkey", keep=keep, cap_rows=0)))
        assert len(fast) > 0
        assert fast.equals(dist), f"semi_join_ds keep={keep} diverged"

    fast = _norm(_to_df(join_or_broadcast(orders(), customer(), key="c_custkey",
                                          add_cols=["c_name"], big_key="o_custkey")))
    dist = _norm(_to_df(join_or_broadcast(orders(), customer(), key="c_custkey",
                                          add_cols=["c_name"], big_key="o_custkey",
                                          cap_rows=0)))
    assert len(fast) > 0
    assert fast.equals(dist), "join_or_broadcast diverged"


def test_join_after_groupby_with_empty_partitions():
    """Regression: Ray's hash aggregator emits ZERO-COLUMN empty blocks
    for empty output partitions; a downstream Dataset.join partition
    receiving only those failed key resolution ('No match or multiple
    matches for key field reference'). drop_empty_blocks scrubs them —
    this chains join -> groupby -> join with num_partitions far above
    the key count so empty partitions are guaranteed."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from cosmos_ray.functions.dedup import _verify_pairs_by_join
    from cosmos_ray.queries.relational import drop_empty_blocks

    nb = rd.from_arrow(pa.table({
        "bid": [0, 1, 2], "bh": ["a", "b", "c"], "new_id": [10, 11, 12]}))
    ob = rd.from_arrow(pa.table({
        "bid": [0, 1, 2], "bh": ["a", "b", "c"], "old_id": [20, 21, 22]}))
    cand = (nb.join(ob, join_type="inner", num_partitions=16,
                    on=("bid", "bh"))
            .groupby(["new_id", "old_id"])
            .aggregate(Count(alias_name="__b")).drop_columns(["__b"]))

    # the scrubbed dataset joins cleanly at any partition count
    pairs = drop_empty_blocks(cand).map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b"]),
        batch_format="pyarrow")
    vals = rd.from_arrow(pa.table({
        "__id_a": [10, 11, 12, 20, 21, 22], "__v_a": list("uvwxyz")}))
    j = pairs.join(vals, join_type="inner", num_partitions=8,
                   on=("doc_a",), right_on=("__id_a",))
    assert j.count() == 3

    # the guarded verify path scrubs internally (crawl_dedup_index at
    # high cpu counts hit this in the wild)
    values = rd.from_arrow(pa.table({
        "doc_id": [10, 11, 12, 20, 21, 22],
        "text": ["x y z"] * 6}))
    cand2 = (nb.join(ob, join_type="inner", num_partitions=16,
                     on=("bid", "bh"))
             .groupby(["new_id", "old_id"])
             .aggregate(Count(alias_name="__b")).drop_columns(["__b"])
             .map_batches(lambda t: t.rename_columns(["doc_a", "doc_b"]),
                          batch_format="pyarrow"))
    scored = _verify_pairs_by_join(cand2, values, "text", "exact",
                                   num_partitions=8)
    assert scored.count() == 3


def test_broadcast_join_empty_small_side():
    """collect_small on an empty dataset keeps the schema, so the
    broadcast join degrades to an empty inner-join result instead of a
    KeyError."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from cosmos_ray.queries.relational import join_or_broadcast, read

    orders = read(SF, "orders", ["o_custkey", "o_totalprice"])
    none = read(SF, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda t: t.filter(pc.less(t.column("c_custkey"), pa.scalar(-1))),
        batch_format="pyarrow",
    )
    out = join_or_broadcast(orders, none, key="c_custkey",
                            add_cols=["c_name"], big_key="o_custkey")
    assert out.count() == 0


def test_entry_contract():
    import __ray_entry__ as e

    res = e.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert {"url", "subj", "pred", "obj"}.issubset(df.columns)
    assert set(e.oracle_sql()) <= set(e.queries())


def test_bloom_tier_agrees_with_exact_paths():
    """bloom_bits forces the bloom pre-filter tier (with cap_rows=0 so
    the keys never broadcast); a deliberately TINY bitmap (2^10 bits for
    ~300 keys => heavy false-positive rate) must still return exactly
    the broadcast-path result for both semi and anti — false positives
    are join-verified, false negatives are impossible."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from cosmos_ray.queries.relational import read, semi_join_ds

    def keys():
        return read(SF, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            lambda t: t.filter(
                pc.greater(t.column("o_totalprice"), pa.scalar(300000.0))
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )

    def cust():
        return read(SF, "customer", ["c_custkey", "c_name"])

    for keep in (True, False):
        fast = _norm(_to_df(semi_join_ds(cust(), keys(), "o_custkey",
                                         "c_custkey", keep=keep)))
        bloom = _norm(_to_df(semi_join_ds(cust(), keys(), "o_custkey",
                                          "c_custkey", keep=keep,
                                          cap_rows=0, bloom_bits=1 << 10)))
        assert len(fast) > 0
        assert fast.equals(bloom), f"bloom tier keep={keep} diverged"


def test_skew_join_paths_agree():
    """skew_join on a zipf-skewed fixture: (a) mixed hot/cold split
    agrees with the pandas merge ground truth, (b) all-cold (threshold
    above every key) and the max_hot_keys-overflow fallback both take
    the plain-join path and still agree, (c) hot-only (threshold 1)
    agrees — every branch returns the identical inner join."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.queries.relational import skew_join

    rng = np.random.default_rng(7)
    # zipf-ish: key 0 is ~half the rows, long uniform tail
    keys = np.where(rng.random(5000) < 0.5, 0,
                    rng.integers(1, 400, 5000)).astype(np.int64)
    big = pa.table({"row_id": pa.array(np.arange(5000, dtype=np.int64)),
                    "k": pa.array(keys)})
    dim_keys = np.arange(0, 380, dtype=np.int64)  # keys 380..399 unmatched
    dim = pa.table({"k": pa.array(dim_keys),
                    "label": pa.array([f"d{i}" for i in dim_keys])})
    want = (big.to_pandas().merge(dim.to_pandas(), on="k")
            [["row_id", "k", "label"]])
    want = want.sort_values("row_id").reset_index(drop=True)

    for hot_count, max_hot in [(500, 100),   # mixed: only key 0 is hot
                               (10**9, 100),  # all cold -> plain join
                               (2, 3),        # overflow -> plain fallback
                               (1, 10**6)]:   # everything hot -> broadcast
        got = (skew_join(rd.from_arrow(big), rd.from_arrow(dim), key="k",
                         add_cols=["label"], hot_count=hot_count,
                         max_hot_keys=max_hot)
               .to_pandas().sort_values("row_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["row_id", "k", "label"]], want,
                                      check_dtype=False), hot_count


def test_bloom_no_false_negatives_string_keys():
    """String-typed keys through the bloom: every true member survives
    the pre-filter (bitmap has no false negatives), checked directly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.queries.relational import (
        bloom_filter_ds,
        build_bloom,
    )

    keys = [f"url-{i}" for i in range(0, 4000, 2)]
    big = [f"url-{i}" for i in range(4000)]
    bloom = build_bloom(
        rd.from_arrow(pa.table({"k": pa.array(keys)})), "k", m_bits=1 << 16)
    hits = bloom_filter_ds(
        rd.from_arrow(pa.table({"k": pa.array(big)})), bloom, "k",
        keep_hits=True, m_bits=1 << 16).to_pandas()
    assert set(keys) <= set(hits["k"])


def test_weighted_sample_properties():
    """A-ES gates: a dominant-weight row is always selected, zero/negative
    weights never are, the sample is without replacement, and the draw
    keys are deterministic across runs."""
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.queries.relational import weighted_sample

    rows = [{"doc_id": i, "w": 1.0} for i in range(200)]
    rows.append({"doc_id": 900, "w": 1e9})
    rows.append({"doc_id": 901, "w": 0.0})
    rows.append({"doc_id": 902, "w": -5.0})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = weighted_sample(ds, n=20, weight_col="w").to_pandas()
    assert len(got) == 20
    assert got["doc_id"].is_unique
    assert 900 in set(got["doc_id"])  # ~1e9 weight: P(miss) astronomically small
    assert not {901, 902} & set(got["doc_id"])
    again = weighted_sample(rd.from_arrow(pa.Table.from_pylist(rows)),
                            n=20, weight_col="w").to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])


class TestLeftJoinOrBroadcast:
    @staticmethod
    def _sides():
        import pyarrow as pa

        import ray.data as rd

        big = rd.from_arrow(pa.table({
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64())}))
        small = rd.from_arrow(pa.table({
            "o_custkey": pa.array([2, 4], pa.int64()),
            "n_orders": pa.array([7, 9], pa.int64())}))
        return big, small

    def _run(self, cap):
        from cosmos_ray.queries.relational import left_join_or_broadcast

        big, small = self._sides()
        df = left_join_or_broadcast(
            big, small, key="o_custkey", add_cols=["n_orders"],
            big_key="c_custkey", fill=0, cap_rows=cap,
        ).to_pandas().sort_values("c_custkey").reset_index(drop=True)
        return list(zip(df["c_custkey"], df["n_orders"].astype(int)))

    def test_broadcast_path_fills_zero(self):
        assert self._run(cap=1000) == [(1, 0), (2, 7), (3, 0), (4, 9), (5, 0)]

    def test_distributed_fallback_agrees(self):
        # cap 0 forces the left_outer Dataset.join path
        assert self._run(cap=0) == self._run(cap=1000)


class TestMergeUpsert:
    def test_update_delete_insert_semantics(self):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.queries.relational import merge_upsert

        base = rd.from_arrow(pa.table({
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array(["a", "b", "c", "d"])}))
        changes = rd.from_arrow(pa.table({
            "id": pa.array([2, 3, 9, 5], pa.int64()),
            "v": pa.array(["B", "x", "zz", "e"]),
            "is_delete": pa.array([False, True, True, False])}))
        got = (merge_upsert(base, changes, key="id").to_pandas()
               .sort_values("id").reset_index(drop=True))
        # 1 kept, 2 updated, 3 deleted, 4 kept, 5 inserted,
        # 9 delete-of-absent-key stays absent
        assert list(zip(got["id"], got["v"])) == [
            (1, "a"), (2, "B"), (4, "d"), (5, "e")]

    def test_empty_changes_is_identity(self):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.queries.relational import merge_upsert

        base = rd.from_arrow(pa.table({
            "id": pa.array([1, 2], pa.int64()), "v": pa.array(["a", "b"])}))
        empty = rd.from_arrow(pa.table({
            "id": pa.array([], pa.int64()), "v": pa.array([], pa.string()),
            "is_delete": pa.array([], pa.bool_())}))
        got = (merge_upsert(base, empty, key="id").to_pandas()
               .sort_values("id").reset_index(drop=True))
        assert list(zip(got["id"], got["v"])) == [(1, "a"), (2, "b")]


def test_counted_quantiles_agree_with_gather():
    """group_quantiles_counted (skew-safe count exchange) must pick the
    identical elements as group_quantiles (row gather) on the same
    input — including over the hot event_type keys with float values."""
    from cosmos_ray.queries.relational import (
        group_quantiles,
        group_quantiles_counted,
        read,
    )

    ev = read(SF, "events", ["event_type", "value"])
    a = _norm(group_quantiles(ev, ["event_type"], "value").to_pandas())
    b = _norm(group_quantiles_counted(ev, ["event_type"], "value").to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_ntile_uneven_buckets_match_sql_rule():
    """ntile(4) over 10 rows: buckets sized 3,3,2,2 (first n%k get the
    extra row), ties ordered deterministically by doc_id."""
    import numpy as np
    from cosmos_ray.queries.driver_queries import q_ntile_chars
    import duckdb, os, tempfile
    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        t = pa.table({
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "lang": pa.array(["en"] * 10),
            "text": pa.array(["x"] * 10),
            "source": pa.array(["s"] * 10),
            "n_chars": pa.array([5, 5, 5, 5, 9, 9, 9, 2, 2, 2],
                                pa.int64())})
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = (q_ntile_chars(d).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", t)
        exp = con.sql(
            "SELECT doc_id, CAST(ntile(4) OVER (ORDER BY n_chars, doc_id)"
            " AS BIGINT) tile FROM documents ORDER BY doc_id").df()
        assert list(out["tile"]) == list(exp["tile"])
        sizes = out["tile"].value_counts().sort_index().tolist()
        assert sizes == [3, 3, 2, 2]
