"""Fuzzy record-linkage gates: exact batched Levenshtein DP, SymSpell
deletion-neighborhood blocking completeness, and the end-to-end
fuzzy_name_pairs operator (including the degenerate-bucket cap)."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pyarrow as pa
import ray.data as rd

from cosmos_ray.functions.linkage import (
    _delete_variants,
    fuzzy_name_pairs,
    levenshtein_batch,
)


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[lb]


def test_levenshtein_batch_matches_reference_dp():
    rng = random.Random(7)
    strs = ["".join(rng.choice("abcde") for _ in range(rng.randint(0, 9)))
            for _ in range(300)]
    a = [rng.choice(strs) for _ in range(400)]
    b = [rng.choice(strs) for _ in range(400)]
    got = levenshtein_batch(a, b)
    want = np.array([_ref_lev(x, y) for x, y in zip(a, b)])
    assert (got == want).all()


def test_levenshtein_batch_empty_strings():
    assert levenshtein_batch(["", "abc", ""], ["xy", "", ""]).tolist() == [2, 3, 0]


def test_deletion_blocking_is_complete_at_dist2():
    """Any pair within Levenshtein distance 2 must share a depth-2
    deletion variant (the SymSpell guarantee the operator relies on)."""
    rng = random.Random(3)
    strs = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(50)]
    for a, b in itertools.combinations(set(strs), 2):
        if _ref_lev(a, b) <= 2:
            assert _delete_variants(a, 2) & _delete_variants(b, 2), (a, b)


def test_fuzzy_name_pairs_end_to_end(ray_session):
    names = ["red rod", "old rod", "red rock", "blue bolt", "blue bolt",
             "glue bolt", "unrelated thing"]
    ds = rd.from_arrow(pa.table({"p_name": pa.array(names * 3)}))
    out = fuzzy_name_pairs(ds, "p_name", max_dist=2).to_pandas()
    got = {(r.name_a, r.name_b): r.dist for r in out.itertuples()}
    distinct = sorted(set(names))
    want = {}
    for a, b in itertools.combinations(distinct, 2):
        d = _ref_lev(a, b)
        if 1 <= d <= 2:
            want[(a, b)] = d
    assert got == want


def test_fuzzy_name_pairs_degenerate_bucket_cap(ray_session):
    # 40 names all within distance 1 of "aaaa": without the cap this is
    # O(m^2) in one bucket; cap=8 must bound output deterministically
    names = ["aaa" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789!@#$"]
    ds = rd.from_arrow(pa.table({"p_name": pa.array(names)}))
    out = fuzzy_name_pairs(ds, "p_name", max_dist=1, max_group=8).to_pandas()
    # every reported pair is real and within the cap's reach
    assert len(out) > 0
    assert (out["dist"] <= 1).all()
    first8 = set(sorted(names)[:8])
    # bucket truncation keeps the lexicographically first members
    assert set(out["name_a"]).issubset(first8)


class TestJaroWinkler:
    def test_classic_values(self):
        from cosmos_ray.functions.linkage import jaro_winkler_batch

        got = jaro_winkler_batch(
            ["martha", "DWAYNE", "abc", "", "", "abc"],
            ["marhta", "DUANE", "abc", "abc", "", "xyz"])
        want = [0.9611111111111111, 0.84, 1.0, 0.0, 0.0, 0.0]
        assert np.allclose(got, want, atol=1e-12)

    def test_fuzz_matches_duckdb(self):
        """Bit-exact vs DuckDB's jaro_winkler_similarity on 3000 random
        pairs (mixed alphabets, insert/delete/substitute edits) — the
        oracle-parity guarantee for jw_part_pairs."""
        import duckdb
        import pandas as pd

        from cosmos_ray.functions.linkage import jaro_winkler_batch

        rng = np.random.RandomState(13)
        pairs = []
        for alph in ["ab", "abcdef", "abcdefghijklm"]:
            for _ in range(800):
                la, lb = rng.randint(0, 14), rng.randint(0, 14)
                pairs.append(("".join(rng.choice(list(alph), la)),
                              "".join(rng.choice(list(alph), lb))))
        for _ in range(600):
            la = rng.randint(3, 18)
            a = "".join(rng.choice(list("abcdefgh"), la))
            b = list(a)
            for _ in range(rng.randint(0, 4)):
                op, i = rng.randint(3), rng.randint(0, max(1, len(b)))
                if op == 0 and b:
                    b[i % len(b)] = rng.choice(list("abcdefgh"))
                elif op == 1:
                    b.insert(i, rng.choice(list("abcdefgh")))
                elif op == 2 and len(b) > 1:
                    del b[i % len(b)]
            pairs.append((a, "".join(b)))
        A = [p[0] for p in pairs]
        B = [p[1] for p in pairs]
        got = jaro_winkler_batch(A, B)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"a": A, "b": B}))
        want = np.array([r[0] for r in con.execute(
            "SELECT jaro_winkler_similarity(a, b) FROM t").fetchall()])
        assert np.abs(got - want).max() <= 1e-12

    def test_jw_name_pairs_blocked(self):
        from cosmos_ray.functions.linkage import jw_name_pairs

        names = ["martha", "marhta", "marthaa", "dwayne", "duane", "zeta"]
        ds = rd.from_arrow(pa.table({"name": pa.array(names * 3)}))
        got = jw_name_pairs(ds, "name", threshold=0.9).to_pandas()
        pairs = set(zip(got["name_a"], got["name_b"]))
        assert ("marhta", "martha") in pairs
        assert ("martha", "marthaa") in pairs
        # dwayne/duane share 'd' block but JW 0.84 < 0.9
        assert not any("dwayne" in p or "duane" in p for pair in pairs for p in pair)
        assert (got["name_a"] < got["name_b"]).all()
