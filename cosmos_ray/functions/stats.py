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
