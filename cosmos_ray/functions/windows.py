"""Stream-shaped operators over the events table, batch form.

Ray Data has no event-time watermarks; stream semantics are expressed as
groupby(key) + in-group ordered computation (ray_guide 'Streaming-shaped
workloads'). Both operators here are SQL-window-expressible, so the
driver's DuckDB oracle checks them value-for-value:

- ``sessionize``: gap-based session ids per user (new session when the
  gap to the previous event exceeds ``gap_s``);
- ``cumulative_value``: running sum of ``value`` per user in ts order.

Both shuffle once on a coarse hash of user_id and do vectorized pandas
work inside the bucket (per-group python overhead amortized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucketed_by_user(ds, fn, num_buckets: int = 64):
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["user_id"].to_numpy())
        out = df.copy()
        out["__bucket"] = (h % num_buckets).astype(np.int64)
        return out

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )


def sessionize(events_ds, gap_s: int = 1800):
    """-> (user_id, event_id, ts_us, session_id) where session_id is the
    0-based session index per user (ordered by ts, ties by event_id)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        user = g["user_id"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap = np.zeros(len(g), dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        new_session = new_user | (gap > gap_s * 1_000_000)
        # session_id = session starts so far within the user, 0-based:
        # global cumsum of starts minus its value at the user's first row
        s = np.cumsum(new_session)
        first_idx = np.flatnonzero(new_user)
        runs = np.diff(np.append(first_idx, len(s)))
        base = np.repeat(s[first_idx], runs)
        sid = s - base
        return pd.DataFrame(
            {
                "user_id": user,
                "event_id": g["event_id"].to_numpy(),
                "ts_us": ts_us,
                "session_id": sid,
            }
        )

    return _bucketed_by_user(events_ds, fn)


def cumulative_value(events_ds, round_to: int = 4):
    """-> (user_id, event_id, ts_us, cum_value): running sum of value per
    user ordered by (ts, event_id)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        cum = g.groupby("user_id", sort=False)["value"].cumsum().round(round_to)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "ts_us": ts_us,
                "cum_value": cum.to_numpy(),
            }
        )

    return _bucketed_by_user(events_ds, fn)
