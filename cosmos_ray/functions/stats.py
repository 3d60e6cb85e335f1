"""Mergeable-moment statistical aggregates and time-series smoothing.

``grouped_corr`` is the classic distributed-statistics shape: every
batch reduces to the 6 power sums (n, Sx, Sy, Sxx, Syy, Sxy) per group
— a constant-size partial independent of batch rows — and one small
groupby combines them; corr/covar/stddev come from the closed forms.
The exchange is 6 doubles per (batch, group).

``ewma_value`` is the exponentially-weighted moving average per key in
event-time order (pandas ``ewm(adjust=True)`` semantics, which is the
weighted-mean form SQL can replay with power sums):

    ewma_i = sum_j<=i (1-a)^(i-j) v_j / sum_j<=i (1-a)^(i-j)

computed vectorized inside one coarse key-hash bucket exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def grouped_corr(ds, keys: list[str], x: str, y: str, round_to: int = 6):
    """-> (keys..., n, corr, covar_pop, stddev_x, stddev_y): population
    covariance / Pearson correlation of (x, y) per group via mergeable
    power-sum partials."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [x, y]).to_pandas()
        xv = df[x].to_numpy(dtype=float)
        yv = df[y].to_numpy(dtype=float)
        df = df[keys].assign(n=1.0, sx=xv, sy=yv, sxx=xv * xv,
                             syy=yv * yv, sxy=xv * yv)
        out = df.groupby(keys, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(keys)
              .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                         Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
                         Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        cov = sxy / n - (sx / n) * (sy / n)
        vx = sxx / n - (sx / n) ** 2
        vy = syy / n - (sy / n) ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = np.where((vx > 0) & (vy > 0),
                            cov / np.sqrt(vx * vy), np.nan)
        cols = {k: t.column(k) for k in keys}
        cols["n"] = pa.array(n.astype(np.int64))
        cols["corr"] = pa.array(np.round(corr, round_to), pa.float64())
        cols["covar_pop"] = pa.array(np.round(cov, round_to), pa.float64())
        cols["stddev_x"] = pa.array(
            np.round(np.sqrt(np.maximum(vx, 0.0)), round_to), pa.float64())
        cols["stddev_y"] = pa.array(
            np.round(np.sqrt(np.maximum(vy, 0.0)), round_to), pa.float64())
        return pa.table(cols)

    return merged.map_batches(finish, batch_format="pyarrow")


def ewma_value(events_ds, alpha: float = 0.3, round_to: int = 6):
    """-> (user_id, event_id, ts_us, ewma): exponentially-weighted moving
    average of ``value`` per user ordered by (ts, event_id), pandas
    ``ewm(alpha, adjust=True)`` semantics (SQL-replayable power sums)."""
    from cosmos_ray.functions.windows import _bucketed_by_user

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        e = (g.groupby("user_id", sort=False)["value"]
             .transform(lambda s: s.ewm(alpha=alpha, adjust=True).mean()))
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "ts_us": g["ts"].values.astype("datetime64[us]").astype(np.int64),
            "ewma": np.round(e.to_numpy(), round_to),
        })

    return _bucketed_by_user(events_ds, fn)


def key_skew_report(ds, key: str, top: int = 10, round_to: int = 6):
    """Shuffle-planning diagnostic: the ``top`` hottest keys with row
    counts and corpus share — the 'do I need to salt this key' check
    run before any groupby/join on it. Exchange = one row per distinct
    key (combiner counts), the head is a tiny sort."""
    from ray.data.aggregate import Count

    counts = ds.select_columns([key]).groupby(key).aggregate(
        Count(alias_name="n"))
    total = int(counts.sum("n") or 0)

    from cosmos_ray.queries.relational import topk

    head = topk(counts, [("n", True), (key, False)], top)

    def share(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            key: t.column(key),
            "n": t.column("n").cast(pa.int64()),
            "share": pa.array(np.round(n / total, round_to), pa.float64()),
        })

    return head.map_batches(share, batch_format="pyarrow")


def pca_fit(ds, col: str = "embedding", dim: int = 64, k: int = 8):
    """Distributed PCA fit: each batch reduces to (n, sum x, sum x^T x)
    — a dim + dim^2 partial independent of batch rows — merged on the
    driver into the covariance; eigh there is model-sized (dim x dim).
    Component signs are fixed (largest-|coef| coordinate positive) so
    the model is deterministic across partial-sum orders.

    -> dict(mean (dim,), components (k, dim), explained_var (k,))"""

    def partial(t: pa.Table) -> pa.Table:
        X = np.asarray(t.column(col).to_pylist(), dtype=np.float64)
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "ss": pa.array([(X.T @ X).ravel().tolist()],
                           pa.list_(pa.float64())),
        })

    n = 0
    s = np.zeros(dim)
    ss = np.zeros((dim, dim))
    for b in (ds.select_columns([col])
              .map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        n += int(np.sum(b.column("n").to_numpy(zero_copy_only=False)))
        for row in b.column("s").to_pylist():
            s += np.asarray(row)
        for row in b.column("ss").to_pylist():
            ss += np.asarray(row).reshape(dim, dim)
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    # deterministic sign: the largest-|coef| coordinate is positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mu, "components": comps,
            "explained_var": w[order]}


def pca_transform(ds, model, col: str = "embedding",
                  id_col: str = "vec_id", round_to: int = 6):
    """Project onto the fitted components: broadcast the (k, dim) model
    once, one matmul per batch. -> (id, pc_0..pc_{k-1})."""
    import ray

    ref = ray.put((model["mean"], model["components"]))

    def project(t: pa.Table, _m=ref) -> pa.Table:
        mu, comps = ray.get(_m)
        X = np.asarray(t.column(col).to_pylist(), dtype=np.float64)
        P = (X - mu) @ comps.T
        cols = {id_col: t.column(id_col)}
        for i in range(P.shape[1]):
            cols[f"pc_{i}"] = pa.array(np.round(P[:, i], round_to),
                                       pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def value_histogram(ds, keys: list[str], value_col: str, bin_width: float):
    """Fixed-width histogram per group: -> (keys..., bin_lo, n) with
    bin_lo = floor(value / bin_width) * bin_width. Partials combine in
    the batch (bincount per group), the exchange is one row per
    non-empty (group, bin)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [value_col]).to_pandas()
        df["bin_lo"] = np.floor(
            df[value_col].to_numpy(dtype=float) / bin_width) * bin_width
        out = (df.groupby(keys + ["bin_lo"], sort=False)
               .size().rename("n").reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(keys + ["bin_lo"])
            .aggregate(Sum("n", alias_name="n")))


def ols_trend(events_ds, key: str = "event_type", x_col: str = "ts",
              y_col: str = "value", round_to: int = 6):
    """Per-group simple linear regression (OLS of y on time) via moment
    partials: each batch emits (n, sx, sy, sxx, sxy, syy) per group —
    six floats per (group x batch) cross the exchange, never rows — and
    a tiny groupby-sum finishes slope / intercept / r2 in closed form.

    x is DAYS since 2020-01-01 (epoch_us / 86400e6 - 18262): slope and
    r2 are shift-invariant but the raw-microsecond moments square to
    ~1e30 and lose float64 precision against DuckDB's numerically
    stable regr_* aggregates; day-scale moments stay exact to well past
    the 6dp parity rounding."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        x = (t.column(x_col).cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False).astype(np.float64)
             / 86_400_000_000.0 - 18_262.0)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        g = t.column(key).to_pylist()
        df = pd.DataFrame({key: g, "n": 1.0, "sx": x, "sy": y,
                           "sxx": x * x, "sxy": x * y, "syy": y * y})
        agg = df.groupby(key, sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    sums = (events_ds.select_columns([key, x_col, y_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .aggregate(*[Sum(c, alias_name=c)
                         for c in ["n", "sx", "sy", "sxx", "sxy", "syy"]]))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(vx > 0, cov / vx, np.nan)
            intercept = (sy - slope * sx) / n
            r2 = np.where((vx > 0) & (vy > 0), (cov * cov) / (vx * vy), np.nan)
        return pa.table({
            key: t.column(key),
            "n": pa.array(n.astype(np.int64)),
            "slope": pa.array(np.round(slope, round_to)),
            "intercept": pa.array(np.round(intercept, round_to)),
            "r2": pa.array(np.round(r2, round_to)),
        })

    return sums.map_batches(finish, batch_format="pyarrow")


def group_zscore(ds, key: str, value_col: str, id_col: str,
                 round_to: int = 6):
    """Per-group z-score standardization (sample stddev, n-1): one
    moment-partial exchange computes each group's (n, sum, sumsq); the
    group-stat table (group-vocabulary-sized) broadcasts back into a
    vectorized per-row map — the two-pass standardize-features shape,
    no row ever crosses an exchange twice."""
    import ray

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({key: t.column(key).to_pylist(),
                           "n": 1.0, "s": v, "ss": v * v})
        return pa.Table.from_pandas(
            df.groupby(key, sort=False).sum().reset_index(),
            preserve_index=False)

    from cosmos_ray.queries.relational import collect_small

    stats = (ds.select_columns([key, value_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby(key)
             .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                        Sum("ss", alias_name="ss")))
    st_tbl = collect_small(stats)
    if st_tbl is None:  # pragma: no cover - group vocabulary past the cap
        raise ValueError("group-stat table exceeds broadcast cap; "
                         "use a distributed join variant")
    st = st_tbl.to_pandas()
    n, s, ss = st["n"].to_numpy(), st["s"].to_numpy(), st["ss"].to_numpy()
    mean = s / n
    with np.errstate(divide="ignore", invalid="ignore"):
        sd = np.sqrt(np.maximum(ss - n * mean * mean, 0.0) / np.where(n > 1, n - 1, 1))
        sd = np.where(n > 1, sd, np.nan)
    lookup_ref = ray.put({k: (m, d) for k, m, d in zip(st[key], mean, sd)})

    def apply(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        keys = t.column(key).to_pylist()
        md = np.array([lk[x] for x in keys], dtype=np.float64)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - md[:, 0]) / md[:, 1]
        return pa.table({
            id_col: t.column(id_col),
            key: t.column(key),
            value_col: t.column(value_col),
            "z": pa.array(np.round(z, round_to)),
        })

    return ds.select_columns([id_col, key, value_col]).map_batches(
        apply, batch_format="pyarrow")


def multi_ols_fit(events_ds, y_col: str = "value", ts_col: str = "ts",
                  round_to: int = 6):
    """Multivariate linear model fit, closed form: y ~ b0 + b1*day +
    b2*hour_of_day over the event stream. One combiner pass accumulates
    the normal-equation moments (X'X upper triangle + X'y + y'y — nine
    floats per batch cross the exchange); the 3x3 solve is model-sized
    driver arithmetic via Cramer's rule so the DuckDB oracle can replay
    it literally from the same SQL-computed sums. Day is shifted
    (epoch_us/86400e6 - 18262) for float64 headroom, as in
    ``ols_trend``."""
    from ray.data.aggregate import Sum

    cols = ["n", "sx1", "sx2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy"]

    def partial(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False).astype(np.float64))
        x1 = us / 86_400_000_000.0 - 18_262.0
        x2 = np.floor(us / 3_600_000_000.0) % 24.0
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        vals = [float(len(y)), x1.sum(), x2.sum(), (x1 * x1).sum(),
                (x1 * x2).sum(), (x2 * x2).sum(), y.sum(), (x1 * y).sum(),
                (x2 * y).sum(), (y * y).sum()]
        return pa.table({c: pa.array([v]) for c, v in zip(cols, vals)})

    sums = (events_ds.select_columns([ts_col, y_col])
            .map_batches(partial, batch_format="pyarrow")
            .sum(cols))
    n, sx1, sx2, s11, s12, s22, sy, s1y, s2y, syy = (sums[f"sum({c})"]
                                                     for c in cols)
    # Cramer's rule on the 3x3 normal equations
    det = (n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2)
           + sx2 * (sx1 * s12 - s11 * sx2))
    d0 = (sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y)
          + sx2 * (s1y * s12 - s11 * s2y))
    d1 = (n * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2)
          + sx2 * (sx1 * s2y - s1y * sx2))
    d2 = (n * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2)
          + sy * (sx1 * s12 - s11 * sx2))
    b0, b1, b2 = d0 / det, d1 / det, d2 / det
    # R^2 from the same moments: 1 - SSE/SST with
    # SSE = y'y - b.(X'y), SST = y'y - n*mean^2
    sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    sst = syy - sy * sy / n
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n": pa.array([int(n)], pa.int64()),
        "b0": pa.array([round(b0, round_to)]),
        "b1": pa.array([round(b1, round_to)]),
        "b2": pa.array([round(b2, round_to)]),
        "r2": pa.array([round(r2, round_to)]),
    }))


def group_gini(ds, key: str, value_col: str, round_to: int = 6):
    """Exact Gini coefficient per group — the inequality measure every
    corpus-curation dashboard wants over revenue / token / length
    distributions. Counted (skew-safe) formulation: each batch reduces
    to one row per batch-DISTINCT (group, value) with its count (same
    tier as `relational.group_quantiles_counted` — hot-group traffic
    bounded by distinct values, not rows); per group the rank-weighted
    sum uses the closed form over value runs:

        G = sum_i (2i - n - 1) x_(i)  /  (n * sum x)

    where a run of value v with count c starting after cumulative
    count a contributes v * c * (2a + c - n). The run identity is
    SPLIT-invariant — c1·(2a+c1−n) + c2·(2(a+c1)+c2−n) =
    (c1+c2)·(2a+(c1+c2)−n) — so batch partials of the same value need
    no global merge: ONE bucket exchange total, arrow-native combiner.
    -> (key, n, gini)."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select([key, value_col]).group_by([key, value_col])
             .aggregate([([], "count_all")]))
        return pa.table({key: g.column(key),
                         value_col: g.column(value_col),
                         "__c": g.column("count_all").cast(pa.int64())})

    counts = (ds.select_columns([key, value_col])
              .map_batches(partial, batch_format="pyarrow"))

    def gini(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col, kind="stable")
        v = g[value_col].to_numpy(dtype=np.float64)
        c = g["__c"].to_numpy(dtype=np.float64)
        n = c.sum()
        a = np.concatenate([[0.0], np.cumsum(c)[:-1]])
        num = float((v * c * (2.0 * a + c - n)).sum())
        den = n * float((v * c).sum())
        out = pd.DataFrame({key: [g[key].iloc[0]],
                            "n": [int(n)],
                            "gini": [round(num / den, round_to) if den
                                     else 0.0]})
        return out

    return bucketed_group_apply(counts, [key], gini)


def _two_group_value_counts(ds, group_col: str, value_col: str,
                            group_a, group_b):
    """Shared counted two-group exchange for the rank/CDF tests
    (`ks_two_sample`, `mannwhitney_u`): each batch reduces
    arrow-natively to (value, ca, cb) partial counts — bounded by
    batch-distinct values, not rows, so skewed value distributions
    stay cheap to move."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column(group_col),
                              value_set=pa.array([group_a, group_b])))
        ca = pc.cast(pc.equal(t.column(group_col), group_a), pa.int64())
        cb = pc.cast(pc.equal(t.column(group_col), group_b), pa.int64())
        g = (pa.table({value_col: t.column(value_col), "ca": ca, "cb": cb})
             .group_by([value_col])
             .aggregate([("ca", "sum"), ("cb", "sum")]))
        return pa.table({value_col: g.column(value_col),
                         "ca": g.column("ca_sum"),
                         "cb": g.column("cb_sum")})

    return (ds.select_columns([group_col, value_col])
            .map_batches(partial, batch_format="pyarrow"))


def _merge_value_runs(t: pa.Table, value_col: str):
    """Sort partial (value, ca, cb) rows and merge same-value runs into
    COMPLETE per-distinct-value counts (both the CDF gap and midranks
    are only valid at complete run boundaries).
    -> (ca, cb) float64 arrays in ascending value order."""
    v = t.column(value_col).to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    vs = v[order]
    ca = t.column("ca").to_numpy(zero_copy_only=False)[order].astype(
        np.float64)
    cb = t.column("cb").to_numpy(zero_copy_only=False)[order].astype(
        np.float64)
    if not len(vs):
        return ca, cb
    starts = np.flatnonzero(np.concatenate([[True], vs[1:] != vs[:-1]]))
    return np.add.reduceat(ca, starts), np.add.reduceat(cb, starts)


def ks_two_sample(ds, group_col: str, value_col: str, group_a, group_b,
                  round_to: int = 6):
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    ``value_col`` distributions of two groups — the drift probe a
    corpus-refresh pipeline runs between crawls. Counted (skew-safe)
    formulation: each batch reduces arrow-natively to one
    (value, count_a, count_b) row per batch-DISTINCT value; the finish
    pass re-merges same-value partials (reduceat over sorted runs — the
    CDF gap may only be evaluated at COMPLETE run boundaries) and takes
    D = max_v |F_a(v) - F_b(v)|. One converge pass, no global groupby.
    -> one row (n_a, n_b, d_stat)."""

    counts = _two_group_value_counts(ds, group_col, value_col,
                                     group_a, group_b)

    def finish(t: pa.Table) -> pa.Table:
        ca, cb = _merge_value_runs(t, value_col)
        na, nb = ca.sum(), cb.sum()
        fa = np.cumsum(ca) / (na if na else 1.0)
        fb = np.cumsum(cb) / (nb if nb else 1.0)
        d = float(np.abs(fa - fb).max()) if len(ca) else 0.0
        return pa.table({
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb)], pa.int64()),
            "d_stat": pa.array([round(d, round_to)], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def _contingency_counts(ds, col_a: str, col_b: str):
    """Shared categorical-pair exchange for `chi2_independence` /
    `mutual_information`: each batch reduces arrow-natively to its
    (a, b) contingency counts — bounded by the category product, not
    rows; downstream finishes SUM same-cell partials, so no global
    groupby is needed."""

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select([col_a, col_b]).group_by([col_a, col_b])
             .aggregate([([], "count_all")]))
        return pa.table({col_a: g.column(col_a), col_b: g.column(col_b),
                         "__c": g.column("count_all").cast(pa.int64())})

    return (ds.select_columns([col_a, col_b])
            .map_batches(partial, batch_format="pyarrow"))


def _pivot_cells(t: pa.Table, col_a: str, col_b: str) -> np.ndarray:
    """Sum partial contingency rows into a dense (a, b) count grid.
    Dict indexing keeps None a category (SQL GROUP BY NULL-group
    semantics); the grid is contingency-sized, so this is model-sized
    work."""
    a_keys = t.column(col_a).to_pylist()
    b_keys = t.column(col_b).to_pylist()
    cnt = t.column("__c").to_numpy(zero_copy_only=False)
    ai: dict = {}
    bi: dict = {}
    for v in a_keys:
        ai.setdefault(v, len(ai))
    for v in b_keys:
        bi.setdefault(v, len(bi))
    piv = np.zeros((max(len(ai), 1), max(len(bi), 1)), np.float64)
    if a_keys:
        np.add.at(piv, ([ai[v] for v in a_keys],
                        [bi[v] for v in b_keys]),
                  cnt.astype(np.float64))
    return piv


def chi2_independence(ds, col_a: str, col_b: str, round_to: int = 6):
    """Pearson chi-squared test of independence between two categorical
    columns (the lang x source association probe). Contingency-count
    exchange via `_contingency_counts`; the statistic covers the FULL
    marginal grid (absent cells contribute their expected count).
    -> one row (n, dof, chi2)."""
    counts = _contingency_counts(ds, col_a, col_b)

    def finish(t: pa.Table) -> pa.Table:
        piv = _pivot_cells(t, col_a, col_b)
        n = piv.sum()
        r = piv.sum(axis=1, keepdims=True)
        c = piv.sum(axis=0, keepdims=True)
        e = r @ c / (n if n else 1.0)
        chi2 = float(((piv - e) ** 2 / np.where(e > 0, e, 1.0)).sum())
        dof = (piv.shape[0] - 1) * (piv.shape[1] - 1)
        return pa.table({
            "n": pa.array([int(n)], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2": pa.array([round(chi2, round_to)], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def mutual_information(ds, col_a: str, col_b: str, round_to: int = 6):
    """Mutual information I(A; B) in nats between two categorical
    columns, plus the normalized variant I / sqrt(H(A) H(B)) — the
    feature-association probe a curation pipeline runs before using one
    column to stratify another. Same contingency exchange as
    `chi2_independence` (`_contingency_counts` — bounded by the
    category product); MI sums p_ab * ln(p_ab / (p_a p_b)) over
    OCCUPIED cells only (empty cells contribute 0 by continuity).
    -> one row (n, mi, nmi)."""
    counts = _contingency_counts(ds, col_a, col_b)

    def finish(t: pa.Table) -> pa.Table:
        piv = _pivot_cells(t, col_a, col_b)
        n = piv.sum()
        if n <= 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "mi": pa.array([None], pa.float64()),
                             "nmi": pa.array([None], pa.float64())})
        p = piv / n
        pa_m = p.sum(axis=1, keepdims=True)
        pb_m = p.sum(axis=0, keepdims=True)
        occ = p > 0
        mi = float((p[occ] * np.log(p[occ] / (pa_m @ pb_m)[occ])).sum())
        ha = float(-(pa_m[pa_m > 0] * np.log(pa_m[pa_m > 0])).sum())
        hb = float(-(pb_m[pb_m > 0] * np.log(pb_m[pb_m > 0])).sum())
        nmi = mi / np.sqrt(ha * hb) if ha > 0 and hb > 0 else None
        return pa.table({
            "n": pa.array([int(n)], pa.int64()),
            "mi": pa.array([round(mi, round_to)], pa.float64()),
            "nmi": pa.array([None if nmi is None else round(nmi, round_to)],
                            pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def mannwhitney_u(ds, group_col: str, value_col: str, group_a, group_b,
                  round_to: int = 6):
    """Exact Mann-Whitney U statistic (rank-sum with midrank ties)
    between two groups' value distributions — KS's rank-based sibling,
    sensitive to location shift. Same counted (skew-safe) shape as
    `ks_two_sample`: arrow-native batch partials, finish re-merges
    same-value runs (midranks need COMPLETE run counts), then
    U_a = n_a·n_b + n_a(n_a+1)/2 − R_a with R_a the midrank sum of
    group a. One converge pass, no global groupby.
    -> one row (n_a, n_b, u_stat)."""

    counts = _two_group_value_counts(ds, group_col, value_col,
                                     group_a, group_b)

    def finish(t: pa.Table) -> pa.Table:
        ca, cb = _merge_value_runs(t, value_col)
        c = ca + cb
        prior = np.concatenate([[0.0], np.cumsum(c)[:-1]])
        avgrank = prior + (c + 1.0) / 2.0
        na, nb = ca.sum(), cb.sum()
        r_a = float((ca * avgrank).sum())
        u = na * nb + na * (na + 1.0) / 2.0 - r_a
        return pa.table({
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb)], pa.int64()),
            "u_stat": pa.array([round(u, round_to)], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def markov_stationary(events_ds, iters: int = 20, round_to: int = 6):
    """Stationary distribution of the event-type Markov chain: row-
    normalized per-user transition counts, then ``iters`` power
    iterations pi <- pi·P from uniform. The transition exchange is one
    user-hash bucket pass (vectorized lag); the state space is the
    event-type vocabulary — model-sized by definition — so the chain
    solve is driver arithmetic the SQL oracle replays with unrolled
    CTEs. States with no outgoing transitions self-loop.
    -> (event_type, stationary)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from cosmos_ray.functions.windows import _bucketed_by_user
    from cosmos_ray.queries.relational import collect_small

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        et = g["event_type"].to_numpy()
        user = g["user_id"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = user[1:] == user[:-1]
        prev = np.roll(et, 1)
        df = pd.DataFrame({"prev": prev[same], "nxt": et[same]})
        df["c"] = 1
        return df.groupby(["prev", "nxt"], sort=False).count().reset_index()

    from ray.data.aggregate import Count

    counts = (_bucketed_by_user(events_ds, trans)
              .groupby(["prev", "nxt"]).aggregate(Sum("c", alias_name="c")))
    tbl = collect_small(counts)  # states² rows — vocabulary-bounded
    st_tbl = collect_small(
        events_ds.select_columns(["event_type"])
        .groupby("event_type").aggregate(Count(alias_name="__n")))
    if tbl is None or st_tbl is None:  # pragma: no cover - misuse
        raise ValueError("transition table exceeds driver cap")
    prev = np.asarray(tbl.column("prev").to_pylist())
    nxt = np.asarray(tbl.column("nxt").to_pylist())
    c = tbl.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
    states = np.unique(np.asarray(st_tbl.column("event_type").to_pylist()))
    m = {s: i for i, s in enumerate(states)}
    n = len(states)
    P = np.zeros((n, n))
    P[[m[a] for a in prev], [m[b] for b in nxt]] = c
    rs = P.sum(axis=1)
    dangling = rs == 0
    P[dangling, dangling.nonzero()[0]] = 1.0  # self-loop
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(n, 1.0 / n)
    for _ in range(iters):
        pi = pi @ P
    return rd.from_arrow(pa.table({
        "event_type": pa.array(states.tolist()),
        "stationary": pa.array(np.round(pi, round_to), pa.float64())}))


def _hourly_series(events_ds, ts_col: str, value_col: str, out: str,
                   cents: bool = False):
    """Shared tumbling-window exchange for the hourly-series probes
    (`acf_hourly` / `mann_kendall_hourly` / `cusum_hourly`): one groupby
    over hour buckets — calendar-bounded, i.e. model-sized output. With
    ``cents`` the series is summed in INTEGER cents (2-decimal values),
    so downstream tie/ordering comparisons are exact vs SQL."""
    from ray.data.aggregate import Sum

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col).cast(pa.timestamp("us")), pa.int64())
        # FLOOR division (SQL //), not Arrow's truncation toward zero —
        # they differ for pre-epoch timestamps (negative microseconds)
        d = pa.scalar(3_600_000_000, pa.int64())
        q = pc.divide(us, d)
        rem = pc.subtract(us, pc.multiply(q, d))
        hour = pc.subtract(q, pc.cast(pc.less(rem, pa.scalar(0, pa.int64())),
                                      pa.int64()))
        y = t.column(value_col)
        if cents:
            y = pc.cast(pc.round(pc.multiply(
                pc.cast(y, pa.float64()), pa.scalar(100.0))), pa.int64())
        return pa.table({"hour": hour, out: y})

    return (events_ds.select_columns([ts_col, value_col])
            .map_batches(bucket, batch_format="pyarrow")
            .groupby("hour").aggregate(Sum(out, alias_name=out)))


def acf_hourly(events_ds, lags: tuple[int, ...] = (1, 2, 3),
               ts_col: str = "ts", value_col: str = "value",
               round_to: int = 6):
    """Autocorrelation of the hourly total-value series at row lags —
    the seasonality probe over the event stream. One tumbling-window
    groupby exchange builds the hourly series (calendar-bounded, i.e.
    model-sized); the lagged Pearson correlations run in one
    whole-block pass over the hour-ordered rows.
    -> (lag, n_pairs, acf)."""
    hourly = _hourly_series(events_ds, ts_col, value_col, "y")

    def finish(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("hour", "ascending")])
        y = pc.take(t.column("y"), order).to_numpy(zero_copy_only=False)
        out_lag, out_n, out_acf = [], [], []
        for k in lags:
            a, b = y[:-k], y[k:]
            out_lag.append(k)
            out_n.append(len(a))
            # SQL corr() is NULL for <2 pairs or zero variance — emit
            # null (not 0.0) so engine and oracle agree on short series
            r = float(np.corrcoef(a, b)[0, 1]) if len(a) > 1 else float("nan")
            out_acf.append(None if np.isnan(r) else round(r, round_to))
        return pa.table({
            "lag": pa.array(out_lag, pa.int64()),
            "n_pairs": pa.array(out_n, pa.int64()),
            "acf": pa.array(out_acf, pa.float64())})

    return hourly.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def two_proportion_ztest(events_ds, user_col: str = "user_id",
                         type_col: str = "event_type",
                         mark_type: str = "purchase",
                         value_col: str = "value",
                         threshold: float = 200.0, round_to: int = 6):
    """Two-proportion z-test of conversion (did the user ever emit a
    ``mark_type`` event with value > ``threshold``) between the
    even/odd user-id arms — the A/B
    readout shape over an assignment that is a pure function of the
    key. Per-user conversion is one groupby-max exchange (rows bounded
    by users); the z statistic z = (p1−p0) / sqrt(p̂(1−p̂)(1/n0+1/n1))
    uses the pooled estimate and is driver arithmetic the SQL oracle
    replays literally. -> one row (n_0, n_1, conv_0, conv_1, z)."""
    from ray.data.aggregate import Max, Sum

    def tag(t: pa.Table) -> pa.Table:
        u = t.column(user_col)
        conv = pc.cast(pc.and_(
            pc.equal(t.column(type_col), mark_type),
            pc.greater(t.column(value_col), threshold)), pa.int64())
        return pa.table({"user_id": u, "conv": conv})

    per_user = (events_ds.select_columns([user_col, type_col, value_col])
                .map_batches(tag, batch_format="pyarrow")
                .groupby("user_id").aggregate(Max("conv", alias_name="conv")))

    def arm(t: pa.Table) -> pa.Table:
        a = pc.cast(pc.bit_wise_and(t.column("user_id"), 1), pa.int64())
        one = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({"arm": a, "n": one, "c": t.column("conv")})

    agg = (per_user.map_batches(arm, batch_format="pyarrow")
           .groupby("arm").aggregate(Sum("n", alias_name="n"),
                                     Sum("c", alias_name="c")))

    def finish(t: pa.Table) -> pa.Table:
        d = {int(a): (int(n), int(c)) for a, n, c in
             zip(t.column("arm").to_pylist(), t.column("n").to_pylist(),
                 t.column("c").to_pylist())}
        n0, c0 = d.get(0, (0, 0))
        n1, c1 = d.get(1, (0, 0))
        p0, p1 = c0 / max(n0, 1), c1 / max(n1, 1)
        pool = (c0 + c1) / max(n0 + n1, 1)
        se = np.sqrt(pool * (1.0 - pool) * (1.0 / max(n0, 1)
                                            + 1.0 / max(n1, 1)))
        z = (p1 - p0) / se if se > 0 else 0.0
        return pa.table({
            "n_0": pa.array([n0], pa.int64()),
            "n_1": pa.array([n1], pa.int64()),
            "conv_0": pa.array([round(p0, round_to)], pa.float64()),
            "conv_1": pa.array([round(p1, round_to)], pa.float64()),
            "z": pa.array([round(float(z), round_to)], pa.float64())})

    return agg.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def welch_ttest(ds, group_col: str, value_col: str, group_a, group_b,
                round_to: int = 6):
    """Welch's unequal-variance two-sample t statistic between two
    groups' integer ``value_col`` distributions — the parametric sibling
    of `ks_two_sample` / `mannwhitney_u`. Each batch reduces
    arrow-natively to six int64 moment partials (n, sum, sum-of-squares
    per group — integer-exact to 2^63, so the finish arithmetic is
    bit-identical to the SQL replay's sum-based formula); one-row
    partials, one converge pass, no global groupby.
    -> one row (n_a, n_b, mean_diff, t_stat, dof) with dof by
    Welch–Satterthwaite; t/dof are null when either group has < 2
    rows (SQL's NULL-on-degenerate convention)."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column(group_col),
                              value_set=pa.array([group_a, group_b])))
        t = t.filter(pc.is_valid(t.column(value_col)))
        v = pc.cast(t.column(value_col), pa.int64())
        v2 = pc.multiply(v, v)
        isa = pc.equal(t.column(group_col), group_a)
        zero = pa.scalar(0, pa.int64())

        def msum(arr, mask):
            return pc.sum(pc.if_else(mask, arr, zero), min_count=0)

        isb = pc.invert(isa)
        ones = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({
            "na": pa.array([msum(ones, isa).as_py() or 0], pa.int64()),
            "sa": pa.array([msum(v, isa).as_py() or 0], pa.int64()),
            "ssa": pa.array([msum(v2, isa).as_py() or 0], pa.int64()),
            "nb": pa.array([msum(ones, isb).as_py() or 0], pa.int64()),
            "sb": pa.array([msum(v, isb).as_py() or 0], pa.int64()),
            "ssb": pa.array([msum(v2, isb).as_py() or 0], pa.int64())})

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        na = float(pc.sum(t.column("na")).as_py() or 0)
        sa = float(pc.sum(t.column("sa")).as_py() or 0)
        ssa = float(pc.sum(t.column("ssa")).as_py() or 0)
        nb = float(pc.sum(t.column("nb")).as_py() or 0)
        sb = float(pc.sum(t.column("sb")).as_py() or 0)
        ssb = float(pc.sum(t.column("ssb")).as_py() or 0)
        if na >= 2 and nb >= 2:
            # mirror the SQL replay's expression tree exactly
            md = sa / na - sb / nb
            va = (ssa - sa * sa / na) / (na - 1.0)
            vb = (ssb - sb * sb / nb) / (nb - 1.0)
            sea = va / na
            seb = vb / nb
            tstat = md / np.sqrt(sea + seb)
            dof = ((sea + seb) ** 2
                   / (sea ** 2 / (na - 1.0) + seb ** 2 / (nb - 1.0)))
            tv, dv = round(tstat, round_to), round(dof, round_to)
            mdv = round(md, round_to)
        else:
            mdv = (round(sa / na - sb / nb, round_to)
                   if na >= 1 and nb >= 1 else None)
            tv = dv = None
        return pa.table({
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb)], pa.int64()),
            "mean_diff": pa.array([mdv], pa.float64()),
            "t_stat": pa.array([tv], pa.float64()),
            "dof": pa.array([dv], pa.float64())})

    return parts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def spearman_corr(ds, x_col: str, y_col: str, round_to: int = 6):
    """Spearman rank correlation between two ORDINAL/DISCRETE columns:
    Pearson over global midranks. Partitioning contract: the counted
    exchange is bounded by DISTINCT values per column (the quantity /
    discount / rating shape) — a continuous column would make the rank
    table row-sized; bucket or quantize it first.

    Shape: one counted groupby per column (distinct-value-sized rank
    tables), midrank closed form rank = cum_lt + (cnt+1)/2 computed in
    one value-ordered pass, maps joined back onto rows through the
    size-guarded broadcast tier (`join_or_broadcast` — distributed
    hash-join fallback past the cap), then six float moment partials.
    Midranks are half-integers, so float64 sums stay exact.
    -> one row (n, rho)."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import join_or_broadcast

    def rank_table(col: str, out: str):
        counts = (ds.select_columns([col])
                  .groupby(col).aggregate(Count(alias_name="__c")))

        def midrank(t: pa.Table) -> pa.Table:
            order = pc.sort_indices(t, sort_keys=[(col, "ascending")])
            v = pc.take(t.column(col), order)
            c = pc.take(t.column("__c"), order).to_numpy(
                zero_copy_only=False).astype(np.float64)
            cum_lt = np.concatenate([[0.0], np.cumsum(c)[:-1]])
            return pa.table({col: v,
                             out: pa.array(cum_lt + (c + 1.0) / 2.0,
                                           pa.float64())})

        return counts.repartition(1).map_batches(
            midrank, batch_format="pyarrow", batch_size=None)

    ranked = join_or_broadcast(
        ds.select_columns([x_col, y_col]), rank_table(x_col, "__rx"),
        key=x_col, add_cols=["__rx"])
    ranked = join_or_broadcast(ranked, rank_table(y_col, "__ry"),
                               key=y_col, add_cols=["__ry"])

    def partial(t: pa.Table) -> pa.Table:
        rx = t.column("__rx").to_numpy(zero_copy_only=False)
        ry = t.column("__ry").to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([float(len(rx))], pa.float64()),
            "sx": pa.array([rx.sum()], pa.float64()),
            "sy": pa.array([ry.sum()], pa.float64()),
            "sxx": pa.array([(rx * rx).sum()], pa.float64()),
            "syy": pa.array([(ry * ry).sum()], pa.float64()),
            "sxy": pa.array([(rx * ry).sum()], pa.float64())})

    parts = ranked.map_batches(partial, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        n = float(pc.sum(t.column("n")).as_py() or 0)
        sx = float(pc.sum(t.column("sx")).as_py() or 0)
        sy = float(pc.sum(t.column("sy")).as_py() or 0)
        sxx = float(pc.sum(t.column("sxx")).as_py() or 0)
        syy = float(pc.sum(t.column("syy")).as_py() or 0)
        sxy = float(pc.sum(t.column("sxy")).as_py() or 0)
        rho = None
        if n >= 2:
            cov = sxy / n - (sx / n) * (sy / n)
            vx = sxx / n - (sx / n) ** 2
            vy = syy / n - (sy / n) ** 2
            rho = (round(cov / np.sqrt(vx * vy), round_to)
                   if vx > 0 and vy > 0 else None)
        return pa.table({
            "n": pa.array([int(n)], pa.int64()),
            "rho": pa.array([rho], pa.float64())})

    return parts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def mann_kendall_hourly(events_ds, ts_col: str = "ts",
                        value_col: str = "value", round_to: int = 6):
    """Mann-Kendall monotonic-trend test over the hourly total-value
    series — the nonparametric "is volume drifting" probe (ACF's
    trend-side sibling). The hourly series is built in INTEGER CENTS on
    one tumbling-window groupby exchange (2-decimal values, so engine
    and SQL agree on tie equality bit-for-bit); the calendar-bounded
    finish computes S = sum_{i<j} sign(y_j - y_i) with a Fenwick count
    over rank-compressed values (O(H log H), no H^2 blowup on decade
    spans) and the tie-corrected normal z.
    -> one row (n, s_stat, z)."""
    hourly = _hourly_series(events_ds, ts_col, value_col, "yc",
                            cents=True)

    def finish(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("hour", "ascending")])
        y = pc.take(t.column("yc"), order).to_numpy(zero_copy_only=False)
        n = len(y)
        # concordant-minus-discordant via a Fenwick tree over value
        # ranks: for each j (time order), add (#i<j: y_i < y_j) and
        # subtract (#i<j: y_i > y_j)
        ranks = {v: i + 1 for i, v in enumerate(np.unique(y))}
        m = len(ranks)
        tree = np.zeros(m + 1, np.int64)

        def add(i):
            while i <= m:
                tree[i] += 1
                i += i & (-i)

        def cum(i):
            s = 0
            while i > 0:
                s += tree[i]
                i -= i & (-i)
            return s

        s_stat = 0
        for j in range(n):
            r = ranks[y[j]]
            less = cum(r - 1)
            s_stat += less - (j - cum(r))  # greater = seen - (<= r)
            add(r)
        _, counts = np.unique(y, return_counts=True)
        ties = counts[counts > 1].astype(np.float64)
        nf = float(n)
        var = (nf * (nf - 1.0) * (2.0 * nf + 5.0)
               - float((ties * (ties - 1.0) * (2.0 * ties + 5.0)).sum())
               ) / 18.0
        if n >= 2 and var > 0 and s_stat != 0:
            adj = s_stat - 1 if s_stat > 0 else s_stat + 1
            z = round(adj / np.sqrt(var), round_to)
        else:
            # mirror the SQL CASE's ELSE branch exactly: any degenerate
            # series (n == 1, all-tied, S == 0) reports z = 0.0
            z = 0.0
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s_stat": pa.array([int(s_stat)], pa.int64()),
            "z": pa.array([z], pa.float64())})

    return hourly.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def cusum_hourly(events_ds, ts_col: str = "ts", value_col: str = "value",
                 round_to: int = 6):
    """One-sided CUSUM changepoint scan over the hourly total-value
    series — "when did volume shift upward": drift_i = cum_i - min_{j<=i}
    cum_j with cum the running sum of (y_j - mean), maximized over i
    (the window-function closed form of the recursive CUSUM). The series
    is built in integer cents on one tumbling-window exchange, and the
    drift comparison runs in scaled integers (n*cum is integral), so
    the peak location is exact — no float tie ambiguity vs the SQL
    replay. Bound: n_hours * total_cents must fit int64 (decades of
    hours x petacent volumes before overflow).
    -> one row (n, max_cusum, peak_hour)."""
    hourly = _hourly_series(events_ds, ts_col, value_col, "yc",
                            cents=True)

    def finish(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("hour", "ascending")])
        hours = pc.take(t.column("hour"), order).to_numpy(
            zero_copy_only=False)
        y = pc.take(t.column("yc"), order).to_numpy(zero_copy_only=False)
        n = len(y)
        if n == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "max_cusum": pa.array([None], pa.float64()),
                             "peak_hour": pa.array([None], pa.int64())})
        total = int(y.sum())
        # scaled integer cumsum: n*cum_i = n*sum_{j<=i} y_j - (i+1)*total
        scum = n * np.cumsum(y) - (np.arange(1, n + 1)) * total
        sdrift = scum - np.minimum.accumulate(scum)
        k = int(np.argmax(sdrift))  # first max = earliest peak hour
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "max_cusum": pa.array(
                [round(float(sdrift[k]) / (100.0 * n), round_to)],
                pa.float64()),
            "peak_hour": pa.array([int(hours[k])], pa.int64())})

    return hourly.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def distribution_drift(ds, group_col: str, value_col: str, group_a, group_b,
                       bin_width: int = 500, round_to: int = 6):
    """Population-stability index and Jensen-Shannon divergence between
    two groups' ``value_col`` distributions over fixed-width bins — the
    crawl-over-crawl drift report a refresh pipeline gates on (PSI > 0.2
    = retrain-worthy shift, by the usual credit-scoring rule of thumb).

    Same counted exchange as `ks_two_sample` but on floor(value /
    bin_width) buckets (bounded by the bin range, not rows). Term
    conventions are exactly SQL-replayable: PSI sums only bins occupied
    on BOTH sides; JSD uses the 0*ln(0) = 0 convention, so it is
    epsilon-free and defined everywhere. -> one row (n_a, n_b, psi,
    jsd)."""

    def binned(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.int64())
        b = pc.divide(v, pa.scalar(int(bin_width), pa.int64()))
        return pa.table({group_col: t.column(group_col), "__bin": b})

    counts = _two_group_value_counts(
        ds.select_columns([group_col, value_col])
        .map_batches(binned, batch_format="pyarrow"),
        group_col, "__bin", group_a, group_b)

    def finish(t: pa.Table) -> pa.Table:
        ca, cb = _merge_value_runs(t, "__bin")
        na, nb = ca.sum(), cb.sum()
        p = ca / (na if na else 1.0)
        q = cb / (nb if nb else 1.0)
        both = (p > 0) & (q > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            psi = float(((p - q) * np.log(p / np.where(q > 0, q, 1.0))
                         )[both].sum())
            m = (p + q) / 2.0
            ja = np.where(p > 0, 0.5 * p * np.log(
                np.where(p > 0, p, 1.0) / np.where(m > 0, m, 1.0)), 0.0)
            jb = np.where(q > 0, 0.5 * q * np.log(
                np.where(q > 0, q, 1.0) / np.where(m > 0, m, 1.0)), 0.0)
            jsd = float(ja.sum() + jb.sum())
        return pa.table({
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb)], pa.int64()),
            "psi": pa.array([round(psi, round_to)], pa.float64()),
            "jsd": pa.array([round(jsd, round_to)], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def kendall_tau(ds, x_col: str, y_col: str, round_to: int = 6):
    """Kendall's tau-b rank correlation between two ordinal columns —
    the pairwise-concordance sibling of `spearman_corr`, with the
    standard tie correction. Counted formulation: one contingency-cell
    exchange via `_contingency_counts` (bounded by the distinct-pair
    grid, not rows — the same boundedness assumption `chi2_independence`
    documents); null pairs are dropped (SQL WHERE x IS NOT NULL AND y
    IS NOT NULL). The finish computes

        S = sum_{cells i<j} c_i c_j sign(x_j - x_i) sign(y_j - y_i)

    with outer products over the model-sized cell grid — every term and
    partial sum is an integer below 2^53, so the float64 accumulation
    is exact — and the tie-pair counts n1/n2 from the cell marginals.
    tau_b = S / sqrt((n0 - n1)(n0 - n2)) with n0 = n(n-1)/2; 0.0 on a
    degenerate all-tied column, mirroring the SQL CASE's ELSE.
    -> one row (n, s_stat, tau_b)."""
    counts = _contingency_counts(ds, x_col, y_col)

    def finish(t: pa.Table) -> pa.Table:
        g = (t.group_by([x_col, y_col]).aggregate([("__c", "sum")])
             .drop_null())
        x = g.column(x_col).to_numpy(zero_copy_only=False)
        y = g.column(y_col).to_numpy(zero_copy_only=False)
        c = g.column("__c_sum").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = int(c.sum())
        # each unordered pair appears twice in the full outer grid with
        # the same sign product; the diagonal contributes zero
        sx = np.sign(np.subtract.outer(x, x))
        sy = np.sign(np.subtract.outer(y, y))
        s_stat = int(round((sx * sy * np.outer(c, c)).sum())) // 2
        n0 = n * (n - 1) // 2

        def tie_pairs(keys):
            _, inv = np.unique(keys, return_inverse=True)
            tk = np.bincount(inv, weights=c) if len(keys) else np.array([])
            return int(sum(int(v) * (int(v) - 1) // 2 for v in tk))

        n1, n2 = tie_pairs(x), tie_pairs(y)
        d1, d2 = n0 - n1, n0 - n2
        if d1 > 0 and d2 > 0:
            tau = round(float(s_stat) / np.sqrt(float(d1) * float(d2)),
                        round_to)
        else:
            tau = 0.0
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s_stat": pa.array([s_stat], pa.int64()),
            "tau_b": pa.array([tau], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def theil_sen_hourly(events_ds, ts_col: str = "ts",
                     value_col: str = "value", round_to: int = 6):
    """Theil-Sen robust trend slope of the hourly total-value series:
    the median of all pairwise slopes (y_j - y_i) / (h_j - h_i), i < j —
    the breakdown-resistant sibling of `ols_trend` and the magnitude
    companion to `mann_kendall_hourly`'s direction test. The series is
    built in INTEGER CENTS on the shared tumbling-window exchange, so
    every slope is a ratio of exact integers and the engine/SQL float64
    divisions agree bit-for-bit. The finish materializes the pair
    slopes (H(H-1)/2 of them — calendar-bounded: a full year of hours
    is ~38M pairs; decade-plus spans need upstream coarsening, the same
    quadratic bound the SQL replay pays). Slope is reported in value
    units per hour (cents / 100). -> one row (n_hours, n_pairs, slope);
    slope is null for a < 2-hour series (SQL median-over-empty)."""
    hourly = _hourly_series(events_ds, ts_col, value_col, "yc",
                            cents=True)

    def finish(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("hour", "ascending")])
        h = pc.take(t.column("hour"), order).to_numpy(zero_copy_only=False)
        y = pc.take(t.column("yc"), order).to_numpy(zero_copy_only=False)
        n = len(y)
        if n < 2:
            return pa.table({
                "n_hours": pa.array([n], pa.int64()),
                "n_pairs": pa.array([0], pa.int64()),
                "slope": pa.array([None], pa.float64())})
        i, j = np.triu_indices(n, 1)
        slopes = (y[j] - y[i]) / (h[j] - h[i])
        med = float(np.median(slopes))
        return pa.table({
            "n_hours": pa.array([n], pa.int64()),
            "n_pairs": pa.array([len(slopes)], pa.int64()),
            "slope": pa.array([round(med / 100.0, round_to)],
                              pa.float64())})

    return hourly.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def hellinger_tvd(ds, group_col: str, value_col: str, group_a, group_b,
                  bin_width: int = 500, round_to: int = 6):
    """Hellinger distance and total-variation distance between two
    groups' ``value_col`` distributions over fixed-width bins — the
    bounded-metric companions to `distribution_drift`'s PSI/JSD (both
    live in [0, 1], so thresholds transfer across corpora). Same
    counted floor(value / bin_width) exchange; the finish computes the
    Bhattacharyya coefficient BC = sum_k sqrt(p_k q_k), H = sqrt(max(0,
    1 - BC)) (clamped — SQL greatest(0, .) — against float sum error),
    and TVD = 0.5 * sum_k |p_k - q_k|. -> one row (n_a, n_b,
    hellinger, tvd)."""

    def binned(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.int64())
        b = pc.divide(v, pa.scalar(int(bin_width), pa.int64()))
        return pa.table({group_col: t.column(group_col), "__bin": b})

    counts = _two_group_value_counts(
        ds.select_columns([group_col, value_col])
        .map_batches(binned, batch_format="pyarrow"),
        group_col, "__bin", group_a, group_b)

    def finish(t: pa.Table) -> pa.Table:
        ca, cb = _merge_value_runs(t, "__bin")
        na, nb = ca.sum(), cb.sum()
        p = ca / (na if na else 1.0)
        q = cb / (nb if nb else 1.0)
        bc = float(np.sqrt(p * q).sum())
        hell = float(np.sqrt(max(0.0, 1.0 - bc)))
        tvd = float(0.5 * np.abs(p - q).sum())
        return pa.table({
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb)], pa.int64()),
            "hellinger": pa.array([round(hell, round_to)], pa.float64()),
            "tvd": pa.array([round(tvd, round_to)], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def anova_oneway(ds, group_col: str, value_col: str, round_to: int = 6):
    """One-way ANOVA F statistic across ALL groups of ``group_col`` —
    the k-group generalization of `welch_ttest` (pooled-variance,
    classic Fisher form). Values are cast to int64, so the per-group
    moment partials (n, sum, sum-of-squares) are integer-exact through
    both groupby levels; only the final between/within mean-square
    ratio is float, mirrored expression-for-expression by the SQL
    replay. Shuffle shape: arrow-native batch combiner, then one
    model-sized groupby over the group vocabulary. NULL groups are kept
    as a category (SQL GROUP BY) but NULL values are dropped (SQL
    aggregate semantics). F is null when k < 2, N <= k, or the
    within-group variance is zero. -> one row (k, n, f_stat)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.int64())
        keep = pc.is_valid(v)
        v = v.filter(keep)
        grp = t.column(group_col).filter(keep)
        one = pa.array(np.ones(len(v), np.int64))
        g = (pa.table({group_col: grp, "__s": v,
                       "__q": pc.multiply(v, v), "__n": one})
             .group_by([group_col])
             .aggregate([("__s", "sum"), ("__q", "sum"), ("__n", "sum")]))
        return pa.table({group_col: g.column(group_col),
                         "__s": g.column("__s_sum"),
                         "__q": g.column("__q_sum"),
                         "__n": g.column("__n_sum")})

    moments = (ds.select_columns([group_col, value_col])
               .map_batches(partial, batch_format="pyarrow")
               .groupby(group_col)
               .aggregate(Sum("__s", alias_name="__s"),
                          Sum("__q", alias_name="__q"),
                          Sum("__n", alias_name="__n")))

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("__s").to_numpy(zero_copy_only=False).astype(np.float64)
        q = t.column("__q").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        k, big_n = len(n), float(n.sum())
        tot_s, tot_q = float(s.sum()), float(q.sum())
        w = float((s * s / n).sum())  # sum of per-group s^2/n
        f = None
        if k > 1 and big_n > k:
            between = (w - tot_s * tot_s / big_n) / (k - 1.0)
            within = (tot_q - w) / (big_n - k)
            if within > 0:
                f = round(between / within, round_to)
        return pa.table({
            "k": pa.array([k], pa.int64()),
            "n": pa.array([int(big_n)], pa.int64()),
            "f_stat": pa.array([f], pa.float64())})

    return moments.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def kruskal_wallis(ds, group_col: str, value_col: str, round_to: int = 6):
    """Kruskal-Wallis H (rank one-way ANOVA) across ALL groups — the
    k-group generalization of `mannwhitney_u`, with the standard tie
    correction. Counted formulation: one (group, value) cell exchange
    via `_contingency_counts` (bounded by groups x distinct values, not
    rows); the finish derives global midranks from COMPLETE per-value
    run totals, takes per-group rank sums (exact: half-integer ranks x
    integer counts below 2^53), and computes

        H = 12 / (N(N+1)) * sum_g R_g^2 / n_g - 3(N+1)
        H' = H / (1 - sum_v (t_v^3 - t_v) / (N^3 - N))

    expression-for-expression as the SQL replay. Null values are
    dropped on both sides; H is null when k < 2 or every value is tied
    (zero tie-correction denominator). -> one row (k, n, h_stat)."""
    counts = _contingency_counts(
        ds.select_columns([group_col, value_col]).map_batches(
            lambda t: t.filter(pc.is_valid(t.column(value_col))),
            batch_format="pyarrow"),
        group_col, value_col)

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col, value_col]).aggregate([("__c", "sum")])
        v = g.column(value_col).to_numpy(zero_copy_only=False)
        c = g.column("__c_sum").to_numpy(zero_copy_only=False).astype(
            np.float64)
        grp = g.column(group_col).to_pylist()
        order = np.argsort(v, kind="stable")
        vs, cs = v[order], c[order]
        boundary = (np.concatenate([[True], vs[1:] != vs[:-1]])
                    if len(vs) else np.array([], bool))
        starts = np.flatnonzero(boundary)
        run_tot = np.add.reduceat(cs, starts) if len(vs) else cs
        prior = np.concatenate([[0.0], np.cumsum(run_tot)[:-1]])
        avgrank = prior + (run_tot + 1.0) / 2.0
        run_of = np.cumsum(boundary) - 1  # run index per sorted cell
        cell_rank = avgrank[run_of]
        grp_sorted = np.array(grp, dtype=object)[order]
        gi: dict = {}
        for x in grp_sorted:
            gi.setdefault(x, len(gi))
        idx = (np.array([gi[x] for x in grp_sorted], np.int64)
               if grp else np.array([], np.int64))
        rsum = np.zeros(max(len(gi), 1))
        ng = np.zeros(max(len(gi), 1))
        np.add.at(rsum, idx, cs * cell_rank)
        np.add.at(ng, idx, cs)
        big_n = float(ng.sum())
        k = len(gi)
        h = None
        denom = big_n ** 3 - big_n
        if k > 1 and denom > 0:
            raw = (12.0 / (big_n * (big_n + 1.0))
                   * float((rsum * rsum / ng).sum())
                   - 3.0 * (big_n + 1.0))
            corr = 1.0 - float(((run_tot ** 3) - run_tot).sum()) / denom
            if corr > 0:
                h = round(raw / corr, round_to)
        return pa.table({
            "k": pa.array([k], pa.int64()),
            "n": pa.array([int(big_n)], pa.int64()),
            "h_stat": pa.array([h], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def roc_auc(ds, label_col: str, score_col: str, round_to: int = 6):
    """ROC AUC of a numeric score against a boolean label — the
    model-eval metric in its exact rank (Mann-Whitney) form:
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with midrank
    ties, i.e. P(score_pos > score_neg) + 0.5 P(tie). Rides the same
    counted two-group exchange as `mannwhitney_u` (bounded by distinct
    scores, not rows; rank sums are exact half-integers below 2^53).
    Null when either class is empty. -> one row (n_pos, n_neg, auc)."""

    def to_groups(t: pa.Table) -> pa.Table:
        lab = pc.cast(t.column(label_col), pa.bool_())
        return pa.table({"__lab": pc.cast(lab, pa.int64()),
                         score_col: t.column(score_col)})

    counts = _two_group_value_counts(
        ds.select_columns([label_col, score_col])
        .map_batches(to_groups, batch_format="pyarrow"),
        "__lab", score_col, 1, 0)

    def finish(t: pa.Table) -> pa.Table:
        cp, cn = _merge_value_runs(t, score_col)
        c = cp + cn
        prior = np.concatenate([[0.0], np.cumsum(c)[:-1]])
        avgrank = prior + (c + 1.0) / 2.0
        n1, n0 = cp.sum(), cn.sum()
        auc = None
        if n1 > 0 and n0 > 0:
            r_pos = float((cp * avgrank).sum())
            auc = round((r_pos - n1 * (n1 + 1.0) / 2.0) / (n1 * n0),
                        round_to)
        return pa.table({
            "n_pos": pa.array([int(n1)], pa.int64()),
            "n_neg": pa.array([int(n0)], pa.int64()),
            "auc": pa.array([auc], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def kaplan_meier(events_ds, ts_col: str = "ts", user_col: str = "user_id",
                 censor_horizon_s: int = 86_400, round_to: int = 6):
    """Kaplan-Meier survival curve over per-user lifetimes (first to
    last event, in whole hours). A user whose last event falls within
    ``censor_horizon_s`` of the corpus' max timestamp is right-CENSORED
    (still active when observation ended); everyone else's lifetime is
    an observed "death". Survival steps only at observed times:

        S(t_i) = prod_{t_j <= t_i} (1 - d_j / n_j),
        n_j = #users with lifetime >= t_j  (censored-at-t_j at risk)

    Shuffle shape: one tiny distributed max(ts) pass, one per-user
    min/max groupby, then a counted (duration, observed) cell exchange
    — the finish is bounded by distinct durations, not users, and the
    cumulative product multiplies in ascending-t order exactly like the
    SQL replay's windowed product(). -> (t_hours, n_risk, n_events,
    survival), one row per observed duration."""
    from ray.data.aggregate import Max, Min, Sum

    def to_us(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col).cast(pa.timestamp("us")), pa.int64())
        return pa.table({user_col: t.column(user_col), "__us": us})

    us_ds = events_ds.select_columns([user_col, ts_col]).map_batches(
        to_us, batch_format="pyarrow")
    # distributed scalar aggregate: the censoring boundary
    max_us = int(us_ds.max("__us"))
    cutoff = max_us - int(censor_horizon_s) * 1_000_000

    spans = us_ds.groupby(user_col).aggregate(
        Min("__us", alias_name="__f"), Max("__us", alias_name="__l"))

    def cells(t: pa.Table) -> pa.Table:
        f = t.column("__f").to_numpy(zero_copy_only=False)
        l = t.column("__l").to_numpy(zero_copy_only=False)
        dur = (l - f) // 3_600_000_000
        obs = (l <= cutoff).astype(np.int64)
        g = (pa.table({"t_hours": pa.array(dur, pa.int64()),
                       "__d": pa.array(obs, pa.int64()),
                       "__c": pa.array(np.ones(len(dur), np.int64))})
             .group_by(["t_hours"])
             .aggregate([("__d", "sum"), ("__c", "sum")]))
        return pa.table({"t_hours": g.column("t_hours"),
                         "__d": g.column("__d_sum"),
                         "__c": g.column("__c_sum")})

    counted = (spans.map_batches(cells, batch_format="pyarrow")
               .groupby("t_hours")
               .aggregate(Sum("__d", alias_name="__d"),
                          Sum("__c", alias_name="__c")))

    def finish(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("t_hours", "ascending")])
        th = pc.take(t.column("t_hours"), order).to_numpy(
            zero_copy_only=False)
        d = pc.take(t.column("__d"), order).to_numpy(
            zero_copy_only=False).astype(np.float64)
        c = pc.take(t.column("__c"), order).to_numpy(
            zero_copy_only=False).astype(np.float64)
        n_risk = np.cumsum(c[::-1])[::-1]  # lifetimes >= t
        keep = d > 0
        surv = np.cumprod(1.0 - d[keep] / n_risk[keep])
        return pa.table({
            "t_hours": pa.array(th[keep], pa.int64()),
            "n_risk": pa.array(n_risk[keep].astype(np.int64), pa.int64()),
            "n_events": pa.array(d[keep].astype(np.int64), pa.int64()),
            "survival": pa.array(np.round(surv, round_to), pa.float64())})

    return counted.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def logrank_test(events_ds, ts_col: str = "ts", user_col: str = "user_id",
                 type_col: str = "event_type", split_type: str = "purchase",
                 censor_horizon_s: int = 86_400, round_to: int = 6):
    """Two-group log-rank test over the `kaplan_meier` lifetimes —
    group 1 = users whose FIRST event (earliest ts; event_id-free, so
    ties broken by min event-type string at the same instant) is
    ``split_type``. At each pooled observed death time t_i with d_i
    deaths and n_i at risk (n_1i in group 1):

        O1 - E1 = sum_i d_1i - d_i * n_1i / n_i
        V = sum_i d_i * (n_1i/n_i) * (1 - n_1i/n_i) * (n_i - d_i)
                  / (n_i - 1)
        chi2 = (O1 - E1)^2 / V

    Shuffle shape: one distributed max, one per-user groupby carrying
    (min ts, max ts, first-event flag), then a counted
    (duration, group) cell exchange; the finish walks the model-sized
    distinct-duration table with exact integer at-risk/death counts, so
    engine and SQL agree bit-for-bit before rounding. chi2 is null when
    V == 0 (one group empty or no deaths off the boundary).
    -> one row (n_1, n_0, o_minus_e, chi2)."""
    from ray.data.aggregate import Max, Min, Sum

    def to_us(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col).cast(pa.timestamp("us")), pa.int64())
        return pa.table({user_col: t.column(user_col), "__us": us,
                         "__ty": t.column(type_col)})

    us_ds = events_ds.select_columns([user_col, ts_col, type_col]) \
        .map_batches(to_us, batch_format="pyarrow")
    max_us = int(us_ds.max("__us"))
    cutoff = max_us - int(censor_horizon_s) * 1_000_000

    def first_flag(t: pa.Table) -> pa.Table:
        # batch-local partial: keep per-user (min us, max us) plus the
        # lexicographically-least (us, ty) pair for first-event typing
        df = t.to_pandas()
        df = df.sort_values(["__us", "__ty"], kind="stable")
        g = df.groupby(user_col, sort=False)
        out = pd.DataFrame({
            "__f": g["__us"].min(), "__l": g["__us"].max(),
            "__ty0": g["__ty"].first()})
        # zero-pad the epoch so string min == numeric min across digit
        # widths (SQL side lpads identically)
        out["__k"] = (out["__f"].astype("string").str.zfill(20) + "\x1f"
                      + out["__ty0"].astype("string"))
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    spans = (us_ds.map_batches(first_flag, batch_format="pyarrow")
             .groupby(user_col)
             .aggregate(Min("__f", alias_name="__f"),
                        Max("__l", alias_name="__l"),
                        Min("__k", alias_name="__k")))

    def cells(t: pa.Table) -> pa.Table:
        f = t.column("__f").to_numpy(zero_copy_only=False)
        l = t.column("__l").to_numpy(zero_copy_only=False)
        ty0 = np.array([k.split("\x1f", 1)[1]
                        for k in t.column("__k").to_pylist()], object)
        dur = (l - f) // 3_600_000_000
        obs = (l <= cutoff).astype(np.int64)
        g1 = (ty0 == split_type).astype(np.int64)
        tb = (pa.table({"t": pa.array(dur, pa.int64()),
                        "g1": pa.array(g1, pa.int64()),
                        "__d": pa.array(obs, pa.int64()),
                        "__c": pa.array(np.ones(len(dur), np.int64))})
              .group_by(["t", "g1"])
              .aggregate([("__d", "sum"), ("__c", "sum")]))
        return pa.table({"t": tb.column("t"), "g1": tb.column("g1"),
                         "__d": tb.column("__d_sum"),
                         "__c": tb.column("__c_sum")})

    counted = (spans.map_batches(cells, batch_format="pyarrow")
               .groupby(["t", "g1"])
               .aggregate(Sum("__d", alias_name="__d"),
                          Sum("__c", alias_name="__c")))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("t", kind="stable")
        piv_d = df.pivot_table(index="t", columns="g1", values="__d",
                               aggfunc="sum", fill_value=0)
        piv_c = df.pivot_table(index="t", columns="g1", values="__c",
                               aggfunc="sum", fill_value=0)
        for col in (0, 1):
            if col not in piv_d.columns:
                piv_d[col] = 0
                piv_c[col] = 0
        d1 = piv_d[1].to_numpy(np.float64)
        d0 = piv_d[0].to_numpy(np.float64)
        c1 = piv_c[1].to_numpy(np.float64)
        c0 = piv_c[0].to_numpy(np.float64)
        n1 = np.cumsum(c1[::-1])[::-1]  # group-1 at risk at each t
        n0 = np.cumsum(c0[::-1])[::-1]
        n_tot, d_tot = n1 + n0, d1 + d0
        keep = d_tot > 0
        o_e = v = 0.0
        for di, n1i, ni, d1i in zip(d_tot[keep], n1[keep], n_tot[keep],
                                    d1[keep]):
            o_e += d1i - di * n1i / ni
            if ni > 1:
                v += di * (n1i / ni) * (1.0 - n1i / ni) \
                    * (ni - di) / (ni - 1.0)
        chi2 = round(o_e * o_e / v, round_to) if v > 0 else None
        return pa.table({
            "n_1": pa.array([int(c1.sum())], pa.int64()),
            "n_0": pa.array([int(c0.sum())], pa.int64()),
            "o_minus_e": pa.array([round(o_e, round_to)], pa.float64()),
            "chi2": pa.array([chi2], pa.float64())})

    return counted.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def average_precision(ds, label_col: str, score_col: str,
                      round_to: int = 6):
    """Average precision (area under the precision-recall curve, the
    step-wise threshold form) of a numeric score against a boolean
    label — `roc_auc`'s companion for class-imbalanced eval. Ties are
    handled threshold-wise (every equal score enters together):

        AP = sum_i (R_i - R_{i-1}) * P_i

    over distinct scores DESCENDING, with P_i = TP_i / (TP_i + FP_i)
    and R_i = TP_i / n_pos at threshold i. Same counted two-group
    exchange as `roc_auc` (bounded by distinct scores); cumulative
    TP/FP counts are exact integers on both sides, and the sum order
    (descending score) matches the SQL window replay exactly. Null when
    there are no positives. -> one row (n_pos, n_neg, ap)."""

    def to_groups(t: pa.Table) -> pa.Table:
        lab = pc.cast(t.column(label_col), pa.bool_())
        return pa.table({"__lab": pc.cast(lab, pa.int64()),
                         score_col: t.column(score_col)})

    counts = _two_group_value_counts(
        ds.select_columns([label_col, score_col])
        .map_batches(to_groups, batch_format="pyarrow"),
        "__lab", score_col, 1, 0)

    def finish(t: pa.Table) -> pa.Table:
        cp, cn = _merge_value_runs(t, score_col)
        cp, cn = cp[::-1], cn[::-1]  # descending score
        n1, n0 = cp.sum(), cn.sum()
        ap = None
        if n1 > 0:
            tp, fp = np.cumsum(cp), np.cumsum(cn)
            prec = tp / (tp + fp)
            # recall increment at threshold i is cp_i / n_pos DIRECTLY
            # (not a diff of rounded cumulative recalls) so each term is
            # the same single float division the SQL replay computes
            ap = round(float(((cp / n1) * prec).sum()), round_to)
        return pa.table({
            "n_pos": pa.array([int(n1)], pa.int64()),
            "n_neg": pa.array([int(n0)], pa.int64()),
            "ap": pa.array([ap], pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def calibration_bins(ds, label_col: str, score_col: str, bin_width: int,
                     round_to: int = 6):
    """Reliability / calibration table: fixed-width score bins with the
    empirical positive rate and mean score per bin — the calibration
    companion to `roc_auc` / `average_precision`. One (bin, n, n_pos,
    score_sum) combiner exchange (integer-exact partials; means are
    single exact-integer divisions, so engine and SQL agree
    bit-for-bit before rounding). Scores are cast to int64 and binned
    by FLOOR division, matching SQL ``//``.
    -> (bin, n, pos_rate, mean_score)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(score_col), pa.int64())
        d = pa.scalar(int(bin_width), pa.int64())
        q = pc.divide(v, d)
        rem = pc.subtract(v, pc.multiply(q, d))
        b = pc.subtract(q, pc.cast(pc.less(rem, pa.scalar(0, pa.int64())),
                                   pa.int64()))
        lab = pc.cast(pc.cast(t.column(label_col), pa.bool_()), pa.int64())
        g = (pa.table({"bin": b, "__p": lab, "__s": v,
                       "__n": pa.array(np.ones(len(v), np.int64))})
             .group_by(["bin"])
             .aggregate([("__p", "sum"), ("__s", "sum"), ("__n", "sum")]))
        return pa.table({"bin": g.column("bin"),
                         "__p": g.column("__p_sum"),
                         "__s": g.column("__s_sum"),
                         "__n": g.column("__n_sum")})

    counted = (ds.select_columns([label_col, score_col])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("bin")
               .aggregate(Sum("__p", alias_name="__p"),
                          Sum("__s", alias_name="__s"),
                          Sum("__n", alias_name="__n")))

    def finish(t: pa.Table) -> pa.Table:
        b = t.column("bin").to_numpy(zero_copy_only=False)
        p = t.column("__p").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("__s").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "bin": pa.array(b, pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "pos_rate": pa.array(np.round(p / n, round_to), pa.float64()),
            "mean_score": pa.array(np.round(s / n, round_to),
                                   pa.float64())})

    return counted.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def isotonic_calibration(ds, label_col: str, score_col: str,
                         round_to: int = 6):
    """Isotonic-regression calibration (pool-adjacent-violators) of a
    boolean label on an integer score — the non-parametric monotone
    companion to `calibration_bins` (no bin width to choose; the output
    IS the optimal monotone fit in L2). One counted (score, n, n_pos)
    cell exchange bounded by distinct scores; the finish runs the
    classic stack-based PAVA over the ascending-score cells (exact
    integer pooled counts; each block rate is one integer division) and
    emits one row per pooled block. Not SQL-expressible (iterative
    pooling), so this operator is pytest-gated rather than
    oracle-checked. -> (score_min, score_max, n, rate),
    ascending, with rate non-decreasing."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(score_col), pa.int64())
        lab = pc.cast(pc.cast(t.column(label_col), pa.bool_()), pa.int64())
        g = (pa.table({"s": v, "__p": lab,
                       "__n": pa.array(np.ones(len(v), np.int64))})
             .group_by(["s"])
             .aggregate([("__p", "sum"), ("__n", "sum")]))
        return pa.table({"s": g.column("s"),
                         "__p": g.column("__p_sum"),
                         "__n": g.column("__n_sum")})

    counted = (ds.select_columns([label_col, score_col])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("s")
               .aggregate(Sum("__p", alias_name="__p"),
                          Sum("__n", alias_name="__n")))

    def finish(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("s", "ascending")])
        s = pc.take(t.column("s"), order).to_numpy(zero_copy_only=False)
        p = pc.take(t.column("__p"), order).to_numpy(zero_copy_only=False)
        n = pc.take(t.column("__n"), order).to_numpy(zero_copy_only=False)
        # stack-based PAVA on (sum_pos, sum_n) blocks: merge while the
        # previous block's rate >= the new block's rate (weighted-mean
        # pooling; integer sums keep every comparison exact via
        # cross-multiplication)
        blocks: list[list[int]] = []  # [s_min, s_max, pos, cnt]
        for i in range(len(s)):
            cur = [int(s[i]), int(s[i]), int(p[i]), int(n[i])]
            while blocks and blocks[-1][2] * cur[3] >= cur[2] * blocks[-1][3]:
                prev = blocks.pop()
                cur = [prev[0], cur[1], prev[2] + cur[2], prev[3] + cur[3]]
            blocks.append(cur)
        return pa.table({
            "score_min": pa.array([b[0] for b in blocks], pa.int64()),
            "score_max": pa.array([b[1] for b in blocks], pa.int64()),
            "n": pa.array([b[3] for b in blocks], pa.int64()),
            "rate": pa.array([round(b[2] / b[3], round_to)
                              for b in blocks], pa.float64())})

    return counted.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def holt_hourly(events_ds, ts_col: str = "ts", value_col: str = "value",
                alpha: float = 0.5, beta: float = 0.5,
                round_to: int = 6):
    """Holt double-exponential smoothing (level + linear trend, no
    seasonality) of the hourly total-value series — the forecasting
    companion to `ewma_value` / `ols_trend`. Standard init l_1 = y_1,
    b_1 = y_2 - y_1, then for t >= 2:

        l_t = a y_t + (1-a)(l_{t-1} + b_{t-1})
        b_t = B (l_t - l_{t-1}) + (1-B) b_{t-1}

    The series is built in INTEGER cents on the shared tumbling-window
    exchange; with the default a = B = 0.5 (exact binary fractions)
    every recursion step is the same IEEE float expression the SQL
    replay's recursive CTE evaluates, so engine and oracle agree
    bit-for-bit before rounding. The recursion itself is model-sized
    (calendar-bounded hour count) driver-side work inside the finish.
    One-step-ahead forecast = l_H + b_H. -> one row
    (n_hours, level, trend, forecast_next); trend/forecast are null for
    a < 2-hour series."""
    hourly = _hourly_series(events_ds, ts_col, value_col, "yc",
                            cents=True)

    def finish(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("hour", "ascending")])
        y = pc.take(t.column("yc"), order).to_numpy(
            zero_copy_only=False).astype(np.float64)
        n = len(y)
        if n < 2:
            lev = round(y[0] / 100.0, round_to) if n else None
            return pa.table({
                "n_hours": pa.array([n], pa.int64()),
                "level": pa.array([lev], pa.float64()),
                "trend": pa.array([None], pa.float64()),
                "forecast_next": pa.array([None], pa.float64())})
        lv, b = y[0], y[1] - y[0]
        for i in range(1, n):
            l_new = alpha * y[i] + (1.0 - alpha) * (lv + b)
            b = beta * (l_new - lv) + (1.0 - beta) * b
            lv = l_new
        return pa.table({
            "n_hours": pa.array([n], pa.int64()),
            "level": pa.array([round(lv / 100.0, round_to)], pa.float64()),
            "trend": pa.array([round(b / 100.0, round_to)], pa.float64()),
            "forecast_next": pa.array([round((lv + b) / 100.0, round_to)],
                                      pa.float64())})

    return hourly.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)
