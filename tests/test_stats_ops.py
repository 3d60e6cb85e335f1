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


class TestAnovaOneway:
    def test_matches_direct_formula(self):
        from cosmos_ray.functions.stats import anova_oneway

        rng = _rng()
        key = rng.choice(["a", "b", "c"], 600)
        val = (rng.randint(0, 400, 600)
               + (key == "b") * 40 + (key == "c") * 90)
        ds = rd.from_arrow(pa.table({"g": key, "v": val}))
        out = anova_oneway(ds, "g", "v").to_pandas()
        k = 3
        n = 600
        groups = [val[key == g].astype(np.float64) for g in "abc"]
        gm = val.mean()
        ssb = sum(len(x) * (x.mean() - gm) ** 2 for x in groups)
        ssw = sum(((x - x.mean()) ** 2).sum() for x in groups)
        want = (ssb / (k - 1)) / (ssw / (n - k))
        assert out["k"].iloc[0] == 3 and out["n"].iloc[0] == 600
        assert abs(out["f_stat"].iloc[0] - want) < 1e-4
        assert out["f_stat"].iloc[0] > 1.0  # planted group shift

    def test_identical_groups_f_near_zero(self):
        from cosmos_ray.functions.stats import anova_oneway

        v = np.tile(np.arange(50), 2)
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 50 + ["b"] * 50, "v": v}))
        out = anova_oneway(ds, "g", "v").to_pandas()
        assert out["f_stat"].iloc[0] == 0.0

    def test_degenerate_single_group_null(self):
        from cosmos_ray.functions.stats import anova_oneway

        ds = rd.from_arrow(pa.table({"g": ["a"] * 10,
                                     "v": list(range(10))}))
        out = anova_oneway(ds, "g", "v").to_pandas()
        assert pd.isna(out["f_stat"].iloc[0])

    def test_null_values_dropped_null_group_kept(self):
        from cosmos_ray.functions.stats import anova_oneway

        ds = rd.from_arrow(pa.table({
            "g": pa.array(["a", "a", None, None, "b", "b"]),
            "v": pa.array([1, 2, 3, 4, None, 6], pa.int64())}))
        out = anova_oneway(ds, "g", "v").to_pandas()
        assert out["k"].iloc[0] == 3  # NULL is a group (SQL GROUP BY)
        assert out["n"].iloc[0] == 5  # the NULL value is dropped


class TestKruskalWallis:
    def test_matches_direct_formula_with_ties(self):
        from cosmos_ray.functions.stats import kruskal_wallis

        rng = _rng()
        key = rng.choice(["a", "b", "c"], 400)
        val = rng.randint(0, 30, 400) + (key == "c") * 8  # tied, shifted
        ds = rd.from_arrow(pa.table({"g": key, "v": val}))
        out = kruskal_wallis(ds, "g", "v").to_pandas()
        # direct: midranks over the pooled sample
        s = pd.Series(val)
        ranks = s.rank(method="average").to_numpy()
        n = 400
        h = (12.0 / (n * (n + 1.0))
             * sum(ranks[key == g].sum() ** 2 / (key == g).sum()
                   for g in "abc") - 3.0 * (n + 1.0))
        _, t = np.unique(val, return_counts=True)
        corr = 1.0 - float(((t ** 3) - t).sum()) / (n ** 3 - n)
        want = h / corr
        assert out["k"].iloc[0] == 3 and out["n"].iloc[0] == 400
        assert abs(out["h_stat"].iloc[0] - round(want, 6)) < 2e-6
        assert out["h_stat"].iloc[0] > 6.0  # planted shift is detected

    def test_all_values_tied_null(self):
        from cosmos_ray.functions.stats import kruskal_wallis

        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 10 + ["b"] * 10, "v": [7] * 20}))
        out = kruskal_wallis(ds, "g", "v").to_pandas()
        assert pd.isna(out["h_stat"].iloc[0])  # zero tie-corr denominator

    def test_reduces_to_mannwhitney_for_two_groups(self):
        from cosmos_ray.functions.stats import kruskal_wallis

        # untied two-group case: H = (U - n1 n0 / 2)^2 * 12 / (n1 n0 (N+1))
        a = np.arange(0, 40, 2)
        b = np.arange(1, 31, 2)
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 20 + ["b"] * 15,
            "v": np.concatenate([a, b])}))
        out = kruskal_wallis(ds, "g", "v").to_pandas()
        ranks = pd.Series(np.concatenate([a, b])).rank().to_numpy()
        r1 = ranks[:20].sum()
        n1, n0, n = 20, 15, 35
        u = n1 * n0 + n1 * (n1 + 1) / 2 - r1
        want = (u - n1 * n0 / 2.0) ** 2 * 12.0 / (n1 * n0 * (n + 1.0))
        assert abs(out["h_stat"].iloc[0] - round(want, 6)) < 2e-6


class TestRocAuc:
    def test_perfect_separation_is_one(self):
        from cosmos_ray.functions.stats import roc_auc

        ds = rd.from_arrow(pa.table({
            "y": [True] * 30 + [False] * 30,
            "s": list(range(100, 130)) + list(range(30))}))
        out = roc_auc(ds, "y", "s").to_pandas()
        assert out["auc"].iloc[0] == 1.0
        assert out["n_pos"].iloc[0] == 30 and out["n_neg"].iloc[0] == 30

    def test_random_scores_near_half_and_matches_direct(self):
        from cosmos_ray.functions.stats import roc_auc

        rng = _rng()
        y = rng.rand(500) < 0.4
        s = rng.randint(0, 50, 500)  # heavy ties
        ds = rd.from_arrow(pa.table({"y": y, "s": s}))
        out = roc_auc(ds, "y", "s").to_pandas()
        # direct midrank AUC
        ranks = pd.Series(s).rank(method="average").to_numpy()
        n1, n0 = int(y.sum()), int((~y).sum())
        want = (ranks[y].sum() - n1 * (n1 + 1) / 2.0) / (n1 * n0)
        assert abs(out["auc"].iloc[0] - round(want, 6)) < 2e-6
        assert 0.4 < out["auc"].iloc[0] < 0.6

    def test_all_tied_scores_half(self):
        from cosmos_ray.functions.stats import roc_auc

        ds = rd.from_arrow(pa.table({
            "y": [True] * 10 + [False] * 10, "s": [5] * 20}))
        assert roc_auc(ds, "y", "s").to_pandas()["auc"].iloc[0] == 0.5

    def test_single_class_null(self):
        from cosmos_ray.functions.stats import roc_auc

        ds = rd.from_arrow(pa.table({"y": [True] * 5,
                                     "s": list(range(5))}))
        assert pd.isna(roc_auc(ds, "y", "s").to_pandas()["auc"].iloc[0])


class TestKaplanMeier:
    @staticmethod
    def _events(lifetimes_h, last_offsets_h, base="2024-01-01"):
        """One user per lifetime: first event at base, last at
        base + lifetime; corpus max set by the largest last ts."""
        rows = []
        b = pd.Timestamp(base).value // 1000
        for uid, (lt, off) in enumerate(zip(lifetimes_h, last_offsets_h)):
            first = b + off * 3_600_000_000
            rows.append((uid, first))
            rows.append((uid, first + lt * 3_600_000_000))
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array([r[1] for r in rows],
                                    "datetime64[us]"))})
        return rd.from_arrow(t)

    def test_matches_direct_km_product(self):
        from cosmos_ray.functions.stats import kaplan_meier

        # 6 users, lifetimes 5,5,10,10,20,30 h; all end >24h before max
        # except the 30h user, who defines max ts (thus censored)
        ds = self._events([5, 5, 10, 10, 20, 30],
                          [0, 1, 2, 3, 4, 200])
        out = (kaplan_meier(ds).to_pandas()
               .sort_values("t_hours").reset_index(drop=True))
        # observed deaths at 5 (x2), 10 (x2), 20; censored at 30
        assert list(out["t_hours"]) == [5, 10, 20]
        assert list(out["n_risk"]) == [6, 4, 2]
        assert list(out["n_events"]) == [2, 2, 1]
        want = np.cumprod([1 - 2 / 6, 1 - 2 / 4, 1 - 1 / 2])
        assert np.allclose(out["survival"], np.round(want, 6))

    def test_all_censored_empty_curve(self):
        from cosmos_ray.functions.stats import kaplan_meier

        # every user's last event is within 24h of the corpus max
        ds = self._events([5, 8], [0, 0])
        out = kaplan_meier(ds).to_pandas()
        assert len(out) == 0

    def test_survival_reaches_zero_when_last_risk_dies(self):
        from cosmos_ray.functions.stats import kaplan_meier

        ds = self._events([5, 10], [0, 0], base="2024-01-01")
        # add a sentinel user far in the future so both are observed
        import pyarrow as _pa
        far = pd.Timestamp("2024-06-01").value // 1000
        extra = pa.table({
            "user_id": pa.array([99, 99], pa.int64()),
            "ts": pa.array(np.array([far, far + 3_600_000_000 * 400],
                                    "datetime64[us]"))})
        ds = ds.union(rd.from_arrow(extra))
        out = (kaplan_meier(ds).to_pandas()
               .sort_values("t_hours").reset_index(drop=True))
        assert list(out["t_hours"]) == [5, 10]
        # 3 at risk at t=5 (the censored sentinel included), 2 at t=10
        assert list(out["n_risk"]) == [3, 2]
        assert out["survival"].iloc[-1] == round((1 - 1/3) * (1 - 1/2), 6)


class TestLogrank:
    @staticmethod
    def _two_group_events(l1, l0, base="2024-01-01"):
        """Group-1 users' first event is 'purchase'; group-0 'view'.
        A far-future sentinel pins the corpus max so all listed users
        are observed deaths."""
        rows = []
        b = pd.Timestamp(base).value // 1000
        uid = 0
        for lt_list, ty in ((l1, "purchase"), (l0, "view")):
            for lt in lt_list:
                first = b + uid * 3_600_000_000
                rows.append((uid, first, ty))
                rows.append((uid, first + lt * 3_600_000_000, "error"))
                uid += 1
        far = pd.Timestamp("2025-06-01").value // 1000
        rows += [(999, far, "view"), (999, far + 10 ** 12, "view")]
        return rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array([r[1] for r in rows],
                                    "datetime64[us]")),
            "event_type": pa.array([r[2] for r in rows])}))

    def test_matches_direct_logrank(self):
        from cosmos_ray.functions.stats import logrank_test

        l1, l0 = [5, 8, 8, 12], [3, 5, 7, 9, 11]
        ds = self._two_group_events(l1, l0)
        out = logrank_test(ds).to_pandas()
        # direct walk over pooled death times (sentinel censored)
        times = sorted(set(l1 + l0))
        at1 = np.array(l1)
        at0 = np.array(l0) 
        oe = v = 0.0
        cens = 1  # the sentinel, in group 0, lifetime huge
        for t in times:
            d1 = int((at1 == t).sum())
            d0 = int((at0 == t).sum())
            n1 = int((at1 >= t).sum())
            n0 = int((at0 >= t).sum()) + cens
            d, n = d1 + d0, n1 + n0
            oe += d1 - d * n1 / n
            if n > 1:
                v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
        assert out["n_1"].iloc[0] == 4 and out["n_0"].iloc[0] == 6
        assert abs(out["o_minus_e"].iloc[0] - round(oe, 6)) < 2e-6
        assert abs(out["chi2"].iloc[0] - round(oe * oe / v, 6)) < 2e-6

    def test_identical_groups_matched_pairs(self):
        from cosmos_ray.functions.stats import logrank_test

        out = logrank_test(
            self._two_group_events([4, 9, 15], [4, 9, 15])).to_pandas()
        # both groups die in matched pairs; the censored group-0
        # sentinel skews at-risk by one, giving oe = 1/7 + 1/5 + 1/3
        # exactly and a clearly insignificant chi2
        assert out["o_minus_e"].iloc[0] == round(1/7 + 1/5 + 1/3, 6)
        assert out["chi2"].iloc[0] < 1.0

    def test_first_event_tie_broken_by_type_string(self):
        from cosmos_ray.functions.stats import logrank_test

        # user 0 has TWO events at the identical first instant:
        # 'purchase' and 'click' — min string key picks 'click', so the
        # user lands in group 0
        b = pd.Timestamp("2024-01-01").value // 1000
        rows = [(0, b, "purchase"), (0, b, "click"),
                (0, b + 5 * 3_600_000_000, "error"),
                (9, b + 10 ** 12, "view"), (9, b + 2 * 10 ** 12, "view")]
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array([r[1] for r in rows],
                                    "datetime64[us]")),
            "event_type": pa.array([r[2] for r in rows])}))
        out = logrank_test(ds).to_pandas()
        assert out["n_1"].iloc[0] == 0 and out["n_0"].iloc[0] == 2


class TestAveragePrecision:
    def test_perfect_ranking_is_one(self):
        from cosmos_ray.functions.stats import average_precision

        ds = rd.from_arrow(pa.table({
            "y": [True] * 20 + [False] * 30,
            "s": list(range(100, 120)) + list(range(30))}))
        assert average_precision(ds, "y", "s").to_pandas()[
            "ap"].iloc[0] == 1.0

    def test_matches_direct_threshold_walk(self):
        from cosmos_ray.functions.stats import average_precision

        rng = _rng()
        y = rng.rand(400) < 0.3
        s = rng.randint(0, 40, 400)
        ds = rd.from_arrow(pa.table({"y": y, "s": s}))
        out = average_precision(ds, "y", "s").to_pandas()
        vals = np.unique(s)[::-1]
        n1 = y.sum()
        tp = fp = 0
        ap = 0.0
        for v in vals:
            cp = int((y & (s == v)).sum())
            cn = int((~y & (s == v)).sum())
            tp += cp
            fp += cn
            ap += (cp / n1) * (tp / (tp + fp))
        assert abs(out["ap"].iloc[0] - round(ap, 6)) < 2e-6
        # random scores: AP close to the base rate
        assert abs(out["ap"].iloc[0] - y.mean()) < 0.1

    def test_no_positives_null(self):
        from cosmos_ray.functions.stats import average_precision

        ds = rd.from_arrow(pa.table({"y": [False] * 5,
                                     "s": list(range(5))}))
        assert pd.isna(average_precision(ds, "y", "s").to_pandas()[
            "ap"].iloc[0])


class TestCalibrationBins:
    def test_matches_direct_bin_means(self):
        from cosmos_ray.functions.stats import calibration_bins

        rng = _rng()
        s = rng.randint(-250, 250, 500)
        y = rng.rand(500) < (s + 250) / 500.0  # calibrated-ish
        ds = rd.from_arrow(pa.table({"y": y, "s": s}))
        out = (calibration_bins(ds, "y", "s", bin_width=100).to_pandas()
               .sort_values("bin").reset_index(drop=True))
        # floor-division bins incl. negatives
        bins = np.floor_divide(s, 100)
        for _, row in out.iterrows():
            m = bins == row["bin"]
            assert row["n"] == int(m.sum())
            assert row["pos_rate"] == round(float(y[m].mean()), 6)
            assert row["mean_score"] == round(float(s[m].mean()), 6)
        assert list(out["bin"]) == sorted(set(bins))
        # monotone-ish calibration: top bin rate exceeds bottom
        assert out["pos_rate"].iloc[-1] > out["pos_rate"].iloc[0]


class TestIsotonicCalibration:
    def test_matches_direct_pava(self):
        from cosmos_ray.functions.stats import isotonic_calibration

        rng = _rng()
        s = rng.randint(0, 40, 600)
        y = rng.rand(600) < (s / 60.0 + 0.1)
        ds = rd.from_arrow(pa.table({"y": y, "s": s}))
        out = (isotonic_calibration(ds, "y", "s").to_pandas()
               .sort_values("score_min").reset_index(drop=True))
        # direct PAVA on (score, pos, n) cells
        cells = {}
        for sc, lab in zip(s, y):
            p, n = cells.get(sc, (0, 0))
            cells[sc] = (p + int(lab), n + 1)
        blocks = []
        for sc in sorted(cells):
            p, n = cells[sc]
            cur = [sc, sc, p, n]
            while blocks and blocks[-1][2] * cur[3] >= cur[2] * blocks[-1][3]:
                prev = blocks.pop()
                cur = [prev[0], cur[1], prev[2] + cur[2], prev[3] + cur[3]]
            blocks.append(cur)
        assert len(out) == len(blocks)
        for row, b in zip(out.itertuples(), blocks):
            assert (row.score_min, row.score_max, row.n) == (b[0], b[1], b[3])
            assert row.rate == round(b[2] / b[3], 6)
        # the defining property: strictly increasing block rates
        assert (out["rate"].diff().dropna() > 0).all()
        # and total mass is preserved
        assert out["n"].sum() == 600

    def test_perfectly_monotone_input_unpooled(self):
        from cosmos_ray.functions.stats import isotonic_calibration

        # scores 0..4, rates 0, .25, .5, .75, 1 — already isotonic
        ys, ss = [], []
        for sc in range(5):
            for i in range(4):
                ss.append(sc)
                ys.append(i < sc)
        ds = rd.from_arrow(pa.table({"y": ys, "s": ss}))
        out = (isotonic_calibration(ds, "y", "s").to_pandas()
               .sort_values("score_min").reset_index(drop=True))
        assert len(out) == 5
        assert list(out["rate"]) == [0.0, 0.25, 0.5, 0.75, 1.0]

    def test_antitonic_input_pools_to_one_block(self):
        from cosmos_ray.functions.stats import isotonic_calibration

        # decreasing rates: PAVA must pool everything into one block
        ys, ss = [], []
        for sc, r in ((0, 4), (1, 2), (2, 0)):
            for i in range(4):
                ss.append(sc)
                ys.append(i < r)
        ds = rd.from_arrow(pa.table({"y": ys, "s": ss}))
        out = isotonic_calibration(ds, "y", "s").to_pandas()
        assert len(out) == 1
        assert out["rate"].iloc[0] == 0.5
        assert out["score_min"].iloc[0] == 0
        assert out["score_max"].iloc[0] == 2


class TestSequenceMotif:
    @staticmethod
    def _events(seqs):
        rows = []
        b = pd.Timestamp("2024-01-01").value // 1000
        eid = 0
        for uid, seq in enumerate(seqs):
            for j, ty in enumerate(seq):
                rows.append((eid, uid, b + j * 60_000_000, ty))
                eid += 1
        return rd.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(np.array([r[2] for r in rows],
                                    "datetime64[us]")),
            "event_type": pa.array([r[3] for r in rows])}))

    def test_counts_non_overlapping_motifs(self):
        from cosmos_ray.functions.windows import sequence_motif_count

        ds = self._events([
            ["view", "view", "purchase", "view", "purchase"],  # vvpvp: 2
            ["view", "click", "purchase"],                     # vcp: 0
            ["purchase", "view", "view"],                      # pvv: 0
            ["view", "purchase"] * 3,                          # vpvpvp: 3
        ])
        out = (sequence_motif_count(ds, pattern="v+p").to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        assert list(out["motif_count"]) == [2, 0, 0, 3]
        assert list(out["n_events"]) == [5, 3, 3, 6]

    def test_same_instant_ties_broken_by_event_id(self):
        from cosmos_ray.functions.windows import sequence_motif_count

        # two events at the same ts: event_id order decides v-then-p
        b = pd.Timestamp("2024-01-01").value // 1000
        ds = rd.from_arrow(pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([0, 0], pa.int64()),
            "ts": pa.array(np.array([b, b], "datetime64[us]")),
            "event_type": pa.array(["view", "purchase"])}))
        out = sequence_motif_count(ds, pattern="v+p").to_pandas()
        assert out["motif_count"].iloc[0] == 1

    def test_unknown_types_encode_x(self):
        from cosmos_ray.functions.windows import sequence_motif_count

        ds = self._events([["view", "refund", "purchase"]])  # vxp
        out = sequence_motif_count(ds, pattern="v+p").to_pandas()
        assert out["motif_count"].iloc[0] == 0
        out2 = sequence_motif_count(ds, pattern="vxp").to_pandas()
        assert out2["motif_count"].iloc[0] == 1


class TestHoltHourly:
    @staticmethod
    def _series(cents):
        hours = np.arange(len(cents))
        ts = pd.Timestamp("2024-01-01").value // 1000 \
            + hours * 3_600_000_000
        return rd.from_arrow(pa.table({
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": np.asarray(cents) / 100.0}))

    def test_matches_direct_recursion(self):
        from cosmos_ray.functions.stats import holt_hourly

        rng = _rng()
        cents = (rng.randint(-80, 80, 60) + 5000
                 + np.arange(60) * 37).astype(np.float64)
        out = holt_hourly(self._series(cents)).to_pandas()
        lv, b = cents[0], cents[1] - cents[0]
        for i in range(1, 60):
            l_new = 0.5 * cents[i] + 0.5 * (lv + b)
            b = 0.5 * (l_new - lv) + 0.5 * b
            lv = l_new
        assert out["n_hours"].iloc[0] == 60
        assert out["level"].iloc[0] == round(lv / 100.0, 6)
        assert out["trend"].iloc[0] == round(b / 100.0, 6)
        assert out["forecast_next"].iloc[0] == round((lv + b) / 100.0, 6)
        # trend tracks the planted +0.37/hour drift
        assert 0.2 < out["trend"].iloc[0] < 0.6

    def test_linear_series_exact_trend(self):
        from cosmos_ray.functions.stats import holt_hourly

        # exactly linear input: Holt locks onto the true line
        cents = 1000 + 200 * np.arange(40)
        out = holt_hourly(self._series(cents)).to_pandas()
        assert out["trend"].iloc[0] == 2.0
        assert out["level"].iloc[0] == round((1000 + 200 * 39) / 100, 6)
        assert out["forecast_next"].iloc[0] == round(
            (1000 + 200 * 40) / 100, 6)

    def test_single_hour_degenerate(self):
        from cosmos_ray.functions.stats import holt_hourly

        out = holt_hourly(self._series([500])).to_pandas()
        assert out["n_hours"].iloc[0] == 1
        assert out["level"].iloc[0] == 5.0
        assert pd.isna(out["trend"].iloc[0])
        assert pd.isna(out["forecast_next"].iloc[0])


class TestWatermarkedWindow:
    """`windows.watermarked_window` — Flink-style lateness drop with the
    running-max watermark computed via the bucket-prefix pattern."""

    @staticmethod
    def _events(rows):
        import pyarrow as pa

        import ray.data as rd

        eid, ts_us, val = zip(*rows)
        return rd.from_arrow(pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(list(ts_us), pa.timestamp("us")),
            "value": pa.array(val, pa.float64())}))

    @staticmethod
    def _reference(rows, window_us, late_us):
        # direct sequential replay: inclusive running max watermark
        out = {}
        hi = -(1 << 62)
        for _, tu, v in sorted(rows):
            hi = max(hi, tu)
            w = (tu // window_us) * window_us
            n, s, late = out.get(w, (0, 0.0, 0))
            if tu >= hi - late_us:
                out[w] = (n + 1, s + v, late)
            else:
                out[w] = (n, s, late + 1)
        return out

    def test_out_of_order_drops_match_sequential_replay(self, ray_session):
        from cosmos_ray.functions.windows import watermarked_window

        H = 3_600_000_000
        # watermark jumps to 10h at event 2; events 3/4 are >15min late
        # (dropped); event 5 is within lateness (kept)
        rows = [
            (0, 1 * H, 1.0),
            (1, 1 * H + 5, 2.0),
            (2, 10 * H, 4.0),
            (3, 1 * H + 10, 8.0),          # late by ~9h -> dropped
            (4, 9 * H, 16.0),              # late by 1h -> dropped
            (5, 10 * H - 600_000_000, 32.0),  # 10 min late -> kept
            (6, 11 * H, 64.0),
        ]
        got = watermarked_window(self._events(rows), window_s=3600,
                                 lateness_s=900, bucket_size=2).to_pandas()
        ref = self._reference(rows, H, 900_000_000)
        assert len(got) == len(ref)
        for _, r in got.iterrows():
            n, s, late = ref[int(r["window_start_us"])]
            assert int(r["n_events"]) == n
            assert abs(float(r["sum_value"]) - round(s, 4)) < 1e-9
            assert int(r["n_late"]) == late

    def test_cross_bucket_watermark_carries(self, ray_session):
        """The high watermark set in bucket 0 must drop a late event in
        bucket 1 (exclusive driver prefix seeds the in-bucket scan)."""
        from cosmos_ray.functions.windows import watermarked_window

        H = 3_600_000_000
        rows = [(0, 10 * H, 1.0), (1, 10 * H + 1, 1.0),
                (2, 1 * H, 1.0), (3, 1 * H + 2, 1.0)]  # bucket 1, very late
        got = watermarked_window(self._events(rows), window_s=3600,
                                 lateness_s=900, bucket_size=2).to_pandas()
        w1 = got[got["window_start_us"] == 1 * H].iloc[0]
        assert int(w1["n_events"]) == 0 and int(w1["n_late"]) == 2

    def test_ordered_stream_never_drops(self, ray_session):
        from cosmos_ray.functions.windows import watermarked_window

        H = 3_600_000_000
        rows = [(i, i * H // 4, 1.0) for i in range(40)]
        got = watermarked_window(self._events(rows), window_s=3600,
                                 lateness_s=900, bucket_size=7).to_pandas()
        assert int(got["n_late"].sum()) == 0
        assert int(got["n_events"].sum()) == 40
