"""Reference-implementation gates for the statistics operators added in
round 3 (gini / KS / Mann-Whitney / chi2 / markov / ACF / z-test / LOCF
/ rolling median): each distributed result must equal a direct
single-process numpy/pandas computation on randomized-with-ties data —
independent evidence beyond the single sf0.01 oracle instance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _rng():
    return np.random.RandomState(42)


class TestGini:
    def test_matches_direct_formula_with_ties(self):
        from cosmos_ray.functions.stats import group_gini

        rng = _rng()
        key = rng.choice(["a", "b"], 500)
        val = rng.randint(0, 50, 500).astype(np.float64)  # heavy ties
        ds = rd.from_arrow(pa.table({"k": key, "v": val}))
        got = group_gini(ds, "k", "v").to_pandas().set_index("k")
        for g in ("a", "b"):
            x = np.sort(val[key == g])
            n = len(x)
            want = ((2 * np.arange(1, n + 1) - n - 1) * x).sum() / (n * x.sum())
            assert abs(got.loc[g, "gini"] - round(want, 6)) < 2e-6
            assert 0.0 <= got.loc[g, "gini"] < 1.0

    def test_constant_values_zero(self):
        from cosmos_ray.functions.stats import group_gini

        ds = rd.from_arrow(pa.table({"k": ["a"] * 10, "v": [7.0] * 10}))
        assert group_gini(ds, "k", "v").to_pandas()["gini"].iloc[0] == 0.0


class TestKSAndMW:
    def test_identical_distributions_d_zero(self):
        from cosmos_ray.functions.stats import ks_two_sample

        v = np.arange(100) % 10
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 100 + ["b"] * 100,
            "v": np.concatenate([v, v])}))
        out = ks_two_sample(ds, "g", "v", "a", "b").to_pandas()
        assert out["d_stat"].iloc[0] == 0.0
        assert out["n_a"].iloc[0] == out["n_b"].iloc[0] == 100

    def test_disjoint_supports_d_one(self):
        from cosmos_ray.functions.stats import ks_two_sample

        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 50 + ["b"] * 50,
            "v": np.concatenate([np.arange(50), 1000 + np.arange(50)])}))
        assert ks_two_sample(ds, "g", "v", "a", "b").to_pandas()[
            "d_stat"].iloc[0] == 1.0

    def test_mannwhitney_matches_direct_rank_sum(self):
        from cosmos_ray.functions.stats import mannwhitney_u

        rng = _rng()
        a = rng.randint(0, 30, 120)
        b = rng.randint(5, 35, 80)
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 120 + ["b"] * 80,
            "v": np.concatenate([a, b])}))
        got = mannwhitney_u(ds, "g", "v", "a", "b").to_pandas()
        allv = np.concatenate([a, b])
        ranks = pd.Series(allv).rank(method="average").to_numpy()
        r_a = ranks[:120].sum()
        want = 120 * 80 + 120 * 121 / 2.0 - r_a
        assert abs(got["u_stat"].iloc[0] - round(want, 6)) < 2e-6


class TestChi2:
    def test_independent_uniform_small_stat(self):
        from cosmos_ray.functions.stats import chi2_independence

        # perfectly balanced grid -> chi2 == 0
        a = np.repeat(["x", "y"], 50)
        b = np.tile(["p", "q"], 50)
        ds = rd.from_arrow(pa.table({"a": a, "b": b}))
        out = chi2_independence(ds, "a", "b").to_pandas()
        assert out["chi2"].iloc[0] == 0.0
        assert out["dof"].iloc[0] == 1

    def test_zero_cell_contributes_expected_mass(self):
        from cosmos_ray.functions.stats import chi2_independence

        # (x,q) never occurs: chi2 must include that cell's expectation
        ds = rd.from_arrow(pa.table({
            "a": ["x"] * 10 + ["y"] * 10,
            "b": ["p"] * 10 + ["q"] * 10}))
        out = chi2_independence(ds, "a", "b").to_pandas()
        assert out["chi2"].iloc[0] == 20.0  # full dependence, n=20

    def test_null_category_kept_like_sql_group_by(self):
        from cosmos_ray.functions.stats import chi2_independence

        # None is a category under SQL GROUP BY — n must count every
        # ingested row and dof must include the NULL level
        ds = rd.from_arrow(pa.table({
            "a": ["x", "x", None, None, "y", "y"],
            "b": ["p", "q", "p", "q", "p", "q"]}))
        out = chi2_independence(ds, "a", "b").to_pandas()
        assert out["n"].iloc[0] == 6          # null rows not dropped
        assert out["dof"].iloc[0] == 2        # (3-1)*(2-1): null is a level
        assert out["chi2"].iloc[0] == 0.0     # balanced grid


class TestWelch:
    def test_matches_direct_formula(self):
        from cosmos_ray.functions.stats import welch_ttest

        rng = _rng()
        a = rng.randint(50, 200, 300)
        b = rng.randint(80, 260, 200)
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 300 + ["b"] * 200,
            "v": np.concatenate([a, b])}))
        out = welch_ttest(ds, "g", "v", "a", "b").to_pandas()
        ma, mb = a.mean(), b.mean()
        va, vb = a.var(ddof=1), b.var(ddof=1)
        sea, seb = va / len(a), vb / len(b)
        t = (ma - mb) / np.sqrt(sea + seb)
        dof = (sea + seb) ** 2 / (sea ** 2 / (len(a) - 1)
                                  + seb ** 2 / (len(b) - 1))
        assert out["n_a"].iloc[0] == 300 and out["n_b"].iloc[0] == 200
        assert abs(out["t_stat"].iloc[0] - t) < 1e-5
        assert abs(out["dof"].iloc[0] - dof) < 1e-3

    def test_degenerate_group_null(self):
        from cosmos_ray.functions.stats import welch_ttest

        ds = rd.from_arrow(pa.table({
            "g": ["a", "a", "b"], "v": [1, 2, 3]}))
        out = welch_ttest(ds, "g", "v", "a", "b").to_pandas()
        assert pd.isna(out["t_stat"].iloc[0])  # nb == 1 -> NULL like SQL


class TestSpearman:
    def test_matches_scipy_free_reference(self):
        from cosmos_ray.functions.stats import spearman_corr

        rng = _rng()
        x = rng.randint(0, 20, 600)           # heavy ties, ordinal shape
        y = (x + rng.randint(0, 10, 600))     # positively associated
        ds = rd.from_arrow(pa.table({"x": x, "y": y}))
        out = spearman_corr(ds, "x", "y").to_pandas()

        def midranks(v):
            order = np.argsort(v, kind="stable")
            r = np.empty(len(v))
            sv = v[order]
            i = 0
            while i < len(sv):
                j = i
                while j < len(sv) and sv[j] == sv[i]:
                    j += 1
                r[order[i:j]] = (i + j + 1) / 2.0
                i = j
            return r

        rx, ry = midranks(x), midranks(y)
        want = np.corrcoef(rx, ry)[0, 1]
        assert out["n"].iloc[0] == 600
        assert abs(out["rho"].iloc[0] - want) < 1e-6
        assert out["rho"].iloc[0] > 0.5

    def test_monotone_transform_invariance(self):
        from cosmos_ray.functions.stats import spearman_corr

        rng = _rng()
        x = rng.randint(1, 30, 400)
        ds1 = rd.from_arrow(pa.table({"x": x, "y": x * x}))
        out = spearman_corr(ds1, "x", "y").to_pandas()
        assert out["rho"].iloc[0] == 1.0  # rho is rank-invariant


class TestMutualInformation:
    def test_independent_columns_near_zero(self):
        from cosmos_ray.functions.stats import mutual_information

        a = np.repeat(["x", "y"], 100)
        b = np.tile(["p", "q"], 100)          # perfectly balanced grid
        ds = rd.from_arrow(pa.table({"a": a, "b": b}))
        out = mutual_information(ds, "a", "b").to_pandas()
        assert out["mi"].iloc[0] == 0.0 and out["nmi"].iloc[0] == 0.0

    def test_identical_columns_full_information(self):
        from cosmos_ray.functions.stats import mutual_information

        rng = _rng()
        a = rng.choice(["x", "y", "z"], 300)
        ds = rd.from_arrow(pa.table({"a": a, "b": a}))
        out = mutual_information(ds, "a", "b").to_pandas()
        # I(A;A) = H(A), so NMI == 1
        assert abs(out["nmi"].iloc[0] - 1.0) < 1e-9
        p = np.unique(a, return_counts=True)[1] / 300
        assert abs(out["mi"].iloc[0] - (-(p * np.log(p)).sum())) < 1e-6


class TestDistributionDrift:
    def test_identical_distributions_zero(self):
        from cosmos_ray.functions.stats import distribution_drift

        rng = _rng()
        v = rng.randint(100, 5000, 400)
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 400 + ["b"] * 400,
            "v": np.concatenate([v, v])}))
        out = distribution_drift(ds, "g", "v", "a", "b").to_pandas()
        assert out["psi"].iloc[0] == 0.0 and out["jsd"].iloc[0] == 0.0

    def test_disjoint_supports_jsd_ln2(self):
        from cosmos_ray.functions.stats import distribution_drift

        # fully disjoint bins: JSD hits its maximum ln 2; PSI's
        # both-occupied convention contributes nothing
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 100 + ["b"] * 100,
            "v": np.concatenate([np.full(100, 100),
                                 np.full(100, 90_000)])}))
        out = distribution_drift(ds, "g", "v", "a", "b").to_pandas()
        assert abs(out["jsd"].iloc[0] - np.log(2)) < 1e-6
        assert out["psi"].iloc[0] == 0.0

    def test_matches_direct_formula(self):
        from cosmos_ray.functions.stats import distribution_drift

        rng = _rng()
        a = rng.randint(0, 3000, 500)
        b = rng.randint(500, 4000, 300)
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 500 + ["b"] * 300,
            "v": np.concatenate([a, b])}))
        out = distribution_drift(ds, "g", "v", "a", "b",
                                 bin_width=500).to_pandas()
        bins = np.arange(0, 9)
        p = np.bincount(a // 500, minlength=9)[:9] / 500
        q = np.bincount(b // 500, minlength=9)[:9] / 300
        both = (p > 0) & (q > 0)
        psi = ((p - q)[both] * np.log(p[both] / q[both])).sum()
        m = (p + q) / 2
        jsd = (0.5 * p[p > 0] * np.log(p[p > 0] / m[p > 0])).sum() + \
              (0.5 * q[q > 0] * np.log(q[q > 0] / m[q > 0])).sum()
        assert abs(out["psi"].iloc[0] - psi) < 1e-6
        assert abs(out["jsd"].iloc[0] - jsd) < 1e-6
        _ = bins


class TestMannKendall:
    def test_matches_direct_pairwise(self):
        from cosmos_ray.functions.stats import mann_kendall_hourly

        rng = _rng()
        hours = np.arange(120)
        # drifting series with ties (integer cents)
        cents = (hours * 3 + rng.randint(-40, 40, 120)) // 10 * 10
        ts = pd.Timestamp("2024-01-01").value // 1000 + hours * 3_600_000_000
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": cents / 100.0}))
        out = mann_kendall_hourly(ds).to_pandas()
        y = cents.astype(np.int64)
        s = int(np.sign(y[None, :] - y[:, None])[
            np.triu_indices(len(y), 1)].sum())
        assert out["n"].iloc[0] == 120
        assert out["s_stat"].iloc[0] == s
        assert out["z"].iloc[0] > 2.0  # clear upward drift

    def test_single_hour_degenerate_matches_sql_else(self):
        from cosmos_ray.functions.stats import mann_kendall_hourly

        ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:40"])
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": [1.0, 2.0]}))
        out = mann_kendall_hourly(ds).to_pandas()
        # one hour bucket: SQL CASE's ELSE yields 0.0, never NULL
        assert out["n"].iloc[0] == 1
        assert out["s_stat"].iloc[0] == 0
        assert out["z"].iloc[0] == 0.0

    def test_pre_epoch_floor_bucketing(self):
        from cosmos_ray.functions.stats import _hourly_series

        # 1969-12-31 23:30 is hour -1 under FLOOR division (SQL //),
        # hour 0 under truncation — the engine must floor
        ts = pd.to_datetime(["1969-12-31 23:30", "1970-01-01 00:30"])
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": [1.0, 2.0]}))
        hours = sorted(r["hour"] for r in
                       _hourly_series(ds, "ts", "value", "y").take_all())
        assert hours == [-1, 0]

    def test_strictly_decreasing(self):
        from cosmos_ray.functions.stats import mann_kendall_hourly

        hours = np.arange(50)
        ts = pd.Timestamp("2024-01-01").value // 1000 + hours * 3_600_000_000
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": (5000 - hours * 7) / 100.0}))
        out = mann_kendall_hourly(ds).to_pandas()
        assert out["s_stat"].iloc[0] == -(50 * 49) // 2  # all discordant


class TestCusum:
    def test_planted_level_shift_peaks_at_boundary(self):
        from cosmos_ray.functions.stats import cusum_hourly

        # 60 hours at 10.00 then 60 hours at 30.00: the upward-drift
        # CUSUM peaks at the LAST hour (drift keeps accumulating after
        # the shift); max drift = 60 * (30 - 20) = 600 value units
        hours = np.arange(120)
        vals = np.where(hours < 60, 10.0, 30.0)
        ts = pd.Timestamp("2024-01-01").value // 1000 + hours * 3_600_000_000
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": vals}))
        out = cusum_hourly(ds).to_pandas()
        assert out["n"].iloc[0] == 120
        assert abs(out["max_cusum"].iloc[0] - 600.0) < 1e-6
        assert out["peak_hour"].iloc[0] == int(ts[-1] // 3_600_000_000)

    def test_constant_series_zero_drift(self):
        from cosmos_ray.functions.stats import cusum_hourly

        hours = np.arange(24)
        ts = pd.Timestamp("2024-01-01").value // 1000 + hours * 3_600_000_000
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": np.full(24, 7.0)}))
        out = cusum_hourly(ds).to_pandas()
        assert out["max_cusum"].iloc[0] == 0.0
        # zero drift everywhere -> earliest hour wins the tie
        assert out["peak_hour"].iloc[0] == int(ts[0] // 3_600_000_000)


class TestTrailingTimeSum:
    def test_matches_direct_window_scan(self):
        from cosmos_ray.functions.windows import trailing_time_sum

        rng = _rng()
        n = 400
        user = rng.randint(0, 7, n)
        # bursty timestamps incl. exact ties (RANGE peer semantics)
        ts = np.sort(rng.randint(0, 4 * 3_600, n)) * 1_000_000
        ts[rng.choice(n, 30, replace=False)] = ts[0]  # forced ties
        cents = rng.randint(0, 50_000, n)
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array(user, pa.int64()),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": pa.array(cents / 100.0)}))
        out = (trailing_time_sum(ds, window_s=3600).to_pandas()
               .set_index("event_id").sort_index())
        W = 3_600_000_000
        for i in range(n):
            mask = ((user == user[i]) & (ts >= ts[i] - W) & (ts <= ts[i]))
            want = cents[mask].sum() / 100.0
            assert abs(out.loc[i, "win_sum"] - want) < 1e-9, i
            assert out.loc[i, "win_n"] == int(mask.sum()), i


class TestACF:
    def test_short_series_null_like_sql_corr(self):
        from cosmos_ray.functions.stats import acf_hourly

        # 3 distinct hours: lag1 has 2 pairs (real corr), lag2 has 1
        # pair and lag3 has 0 — SQL corr() is NULL there, so the engine
        # must emit null, not 0.0
        ts = pd.to_datetime(
            ["2024-01-01 00:10", "2024-01-01 01:20", "2024-01-01 02:30"])
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": [1.0, 2.0, 4.0]}))
        out = (acf_hourly(ds).to_pandas()
               .set_index("lag").sort_index())
        assert out.loc[1, "n_pairs"] == 2 and not pd.isna(out.loc[1, "acf"])
        assert out.loc[2, "n_pairs"] == 1 and pd.isna(out.loc[2, "acf"])
        assert out.loc[3, "n_pairs"] == 0 and pd.isna(out.loc[3, "acf"])

    def test_constant_series_null_variance(self):
        from cosmos_ray.functions.stats import acf_hourly

        ts = pd.to_datetime([f"2024-01-01 0{h}:00" for h in range(6)])
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": [5.0] * 6}))
        out = acf_hourly(ds).to_pandas()
        assert out["acf"].isna().all()  # zero variance -> SQL corr NULL


class TestMarkovStationary:
    def test_sums_to_one_and_matches_eig(self):
        from cosmos_ray.functions.stats import markov_stationary

        rng = _rng()
        n = 400
        types = rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2])
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array((np.arange(n) % 7).tolist(), pa.int64()),
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.arange(n) * 1_000_000,
                           pa.timestamp("us")),
            "event_type": types}))
        got = markov_stationary(ds, iters=50).to_pandas()
        assert abs(got["stationary"].sum() - 1.0) < 1e-4
        assert (got["stationary"] >= 0).all()
        # direct reference: same transition counts, same power iteration
        df = pd.DataFrame({"u": np.arange(n) % 7, "t": types})
        df = df.sort_values(["u"], kind="stable")
        P = np.zeros((3, 3))
        m = {"a": 0, "b": 1, "c": 2}
        tt = df["t"].to_numpy()
        uu = df["u"].to_numpy()
        for i in range(1, n):
            if uu[i] == uu[i - 1]:
                P[m[tt[i - 1]], m[tt[i]]] += 1
        P = P / P.sum(axis=1, keepdims=True)
        pi = np.full(3, 1 / 3)
        for _ in range(50):
            pi = pi @ P
        want = dict(zip(["a", "b", "c"], np.round(pi, 6)))
        got_d = dict(zip(got["event_type"], got["stationary"]))
        for k in want:
            assert abs(got_d[k] - want[k]) < 2e-6


class TestLocfAndRollingMedian:
    def _events(self, n=300):
        rng = _rng()
        return pa.table({
            "user_id": pa.array(rng.randint(0, 9, n), pa.int64()),
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(rng.randint(0, 10**9, n).astype("datetime64[us]")),
            "event_type": rng.choice(["purchase", "view"], n),
            "value": np.round(rng.uniform(0, 100, n), 2),
        })

    def test_locf_matches_pandas_ffill(self):
        from cosmos_ray.functions.windows import locf_fill

        t = self._events()
        got = (locf_fill(rd.from_arrow(t)).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                       kind="stable")
        marked = df["value"].where(df["event_type"] == "purchase")
        want = (marked.groupby(df["user_id"]).ffill().fillna(-1.0)
                .round(6))
        df["want"] = want
        df = df.sort_values("event_id").reset_index(drop=True)
        assert np.allclose(got["last_mark_value"], df["want"])

    def test_rolling_median_matches_pandas(self):
        from cosmos_ray.functions.windows import rolling_median

        t = self._events()
        got = (rolling_median(rd.from_arrow(t)).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                       kind="stable")
        want = (df.groupby("user_id")["value"]
                .rolling(5, min_periods=1).median()
                .reset_index(level=0, drop=True).round(6))
        df["want"] = want
        df = df.sort_values("event_id").reset_index(drop=True)
        assert np.allclose(got["roll_median"], df["want"])


class TestKendallTau:
    def test_matches_direct_pairwise_with_ties(self):
        from cosmos_ray.functions.stats import kendall_tau

        rng = _rng()
        x = rng.randint(0, 8, 300)
        y = (x * 2 + rng.randint(-5, 6, 300)) // 3  # correlated, tied
        ds = rd.from_arrow(pa.table({"x": x, "y": y}))
        out = kendall_tau(ds, "x", "y").to_pandas()
        sx = np.sign(x[None, :] - x[:, None])
        sy = np.sign(y[None, :] - y[:, None])
        iu = np.triu_indices(len(x), 1)
        s = int((sx * sy)[iu].sum())
        n0 = len(x) * (len(x) - 1) // 2
        n1 = sum(int(t) * (int(t) - 1) // 2 for t in np.bincount(x))
        n2 = sum(int(t) * (int(t) - 1) // 2
                 for t in pd.Series(y).value_counts())
        want = s / np.sqrt((n0 - n1) * (n0 - n2))
        assert out["n"].iloc[0] == 300
        assert out["s_stat"].iloc[0] == s
        assert abs(out["tau_b"].iloc[0] - round(want, 6)) < 2e-6

    def test_perfect_monotone_is_one(self):
        from cosmos_ray.functions.stats import kendall_tau

        ds = rd.from_arrow(pa.table({"x": np.arange(40),
                                     "y": np.arange(40) * 3 + 1}))
        assert kendall_tau(ds, "x", "y").to_pandas()["tau_b"].iloc[0] == 1.0

    def test_all_tied_column_zero_like_sql_else(self):
        from cosmos_ray.functions.stats import kendall_tau

        ds = rd.from_arrow(pa.table({"x": [1] * 20,
                                     "y": list(range(20))}))
        out = kendall_tau(ds, "x", "y").to_pandas()
        assert out["tau_b"].iloc[0] == 0.0

    def test_nulls_dropped_like_sql_where(self):
        from cosmos_ray.functions.stats import kendall_tau

        ds = rd.from_arrow(pa.table({
            "x": pa.array([1, 2, None, 4], pa.int64()),
            "y": pa.array([1, None, 3, 4], pa.int64())}))
        out = kendall_tau(ds, "x", "y").to_pandas()
        assert out["n"].iloc[0] == 2  # only (1,1) and (4,4) survive
        assert out["tau_b"].iloc[0] == 1.0


class TestTheilSen:
    def test_matches_direct_median_of_slopes(self):
        from cosmos_ray.functions.stats import theil_sen_hourly

        rng = _rng()
        hours = np.arange(80)
        cents = hours * 37 + rng.randint(-200, 200, 80)
        ts = pd.Timestamp("2024-01-01").value // 1000 + hours * 3_600_000_000
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": cents / 100.0}))
        out = theil_sen_hourly(ds).to_pandas()
        i, j = np.triu_indices(80, 1)
        want = np.median((cents[j] - cents[i]) / (hours[j] - hours[i])) / 100
        assert out["n_hours"].iloc[0] == 80
        assert out["n_pairs"].iloc[0] == 80 * 79 // 2
        assert abs(out["slope"].iloc[0] - round(want, 6)) < 2e-6

    def test_outlier_resistant_vs_ols(self):
        from cosmos_ray.functions.stats import theil_sen_hourly

        hours = np.arange(50)
        cents = hours * 100  # slope exactly 1.00/hour
        cents[-1] += 1_000_000  # one wild outlier
        ts = pd.Timestamp("2024-01-01").value // 1000 + hours * 3_600_000_000
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": cents / 100.0}))
        out = theil_sen_hourly(ds).to_pandas()
        assert abs(out["slope"].iloc[0] - 1.0) < 0.05  # barely moved

    def test_single_hour_null_slope(self):
        from cosmos_ray.functions.stats import theil_sen_hourly

        ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:40"])
        ds = rd.from_arrow(pa.table({
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": [1.0, 2.0]}))
        out = theil_sen_hourly(ds).to_pandas()
        assert out["n_hours"].iloc[0] == 1
        assert out["n_pairs"].iloc[0] == 0
        assert pd.isna(out["slope"].iloc[0])


class TestHellingerTVD:
    def test_identical_distributions_zero(self):
        from cosmos_ray.functions.stats import hellinger_tvd

        v = (np.arange(200) % 7) * 500
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 200 + ["b"] * 200,
            "v": np.concatenate([v, v])}))
        out = hellinger_tvd(ds, "g", "v", "a", "b").to_pandas()
        assert out["hellinger"].iloc[0] == 0.0
        assert out["tvd"].iloc[0] == 0.0

    def test_disjoint_supports_both_one(self):
        from cosmos_ray.functions.stats import hellinger_tvd

        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 60 + ["b"] * 60,
            "v": np.concatenate([np.zeros(60), np.full(60, 50_000)])}))
        out = hellinger_tvd(ds, "g", "v", "a", "b").to_pandas()
        assert out["hellinger"].iloc[0] == 1.0
        assert out["tvd"].iloc[0] == 1.0

    def test_matches_direct_formula(self):
        from cosmos_ray.functions.stats import hellinger_tvd

        rng = _rng()
        va = rng.randint(0, 10, 400) * 500
        vb = rng.randint(3, 13, 300) * 500
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 400 + ["b"] * 300,
            "v": np.concatenate([va, vb])}))
        out = hellinger_tvd(ds, "g", "v", "a", "b").to_pandas()
        bins = np.arange(14)
        p = np.bincount(va // 500, minlength=14) / 400
        q = np.bincount(vb // 500, minlength=14) / 300
        want_h = np.sqrt(max(0.0, 1.0 - np.sqrt(p * q).sum()))
        want_t = 0.5 * np.abs(p - q).sum()
        assert abs(out["hellinger"].iloc[0] - round(want_h, 6)) < 2e-6
        assert abs(out["tvd"].iloc[0] - round(want_t, 6)) < 2e-6
        assert out["n_a"].iloc[0] == 400 and out["n_b"].iloc[0] == 300
