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


def hopping_window(events_ds, window_s: int = 3600, hop_s: int = 900,
                   round_to: int = 4):
    """Hopping (sliding) window aggregate over ALL events: for every
    window start ``k*hop`` (µs since epoch) count events and sum value
    over [start, start+window). Each event lands in ``window/hop``
    windows — the expansion happens INSIDE the batch (np.repeat) and is
    immediately pre-aggregated to one partial row per (batch, window),
    so the shuffle moves window partials, never per-event fan-out rows.

    -> (window_start_us, n_events, sum_value)
    """
    from ray.data.aggregate import Sum

    window_us, hop_us = window_s * 1_000_000, hop_s * 1_000_000

    def partials(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        val = t.column("value").to_numpy(zero_copy_only=False)
        # window starts k*hop with k in [floor((t-window)/hop)+1, floor(t/hop)]
        k_hi = ts // hop_us
        k_lo = (ts - window_us) // hop_us + 1
        counts = (k_hi - k_lo + 1).astype(np.int64)
        total = int(counts.sum())
        starts = np.repeat(k_lo, counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        k = starts + offs
        v = np.repeat(val, counts)
        uniq, inv = np.unique(k, return_inverse=True)
        return pa.table({
            "window_start_us": pa.array(uniq * hop_us, pa.int64()),
            "n_events": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_value": pa.array(np.bincount(inv, weights=v), pa.float64()),
        })

    agg = (
        events_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value",
            pa.array(np.round(t.column("sum_value").to_numpy(zero_copy_only=False),
                              round_to), pa.float64())),
        batch_format="pyarrow",
    )


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


def cohort_retention(events_ds, ts_col: str = "ts", user_col: str = "user_id"):
    """Cohort-retention rollup (the product-analytics staple): a user's
    cohort is the epoch-day of their FIRST event; for every distinct
    (user, active day) the offset from their cohort day is counted ->
    (cohort_day, day_offset, n_users).

    Scale shape: per-batch distinct (user, day) combiners feed one
    groupby-distinct (exchange = one row per distinct pair, never per
    event); cohorts are a second groupby min; the cohort re-keys onto
    the pairs with the bucketed union-groupby pattern (ints only); the
    final rollup exchange is bounded by cohorts x horizon."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Min

    from cosmos_ray.queries.relational import bucketed_group_apply

    def pairs_batch(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column(ts_col), pa.int64()), 86_400_000_000)
        df = pd.DataFrame({
            "user_id": t.column(user_col).to_numpy(zero_copy_only=False),
            "day": day.to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (events_ds.select_columns([user_col, ts_col])
             .map_batches(pairs_batch, batch_format="pyarrow")
             .groupby(["user_id", "day"]).aggregate(Count(alias_name="__n"))
             .drop_columns(["__n"]).materialize())
    cohorts = pairs.groupby("user_id").aggregate(Min("day", alias_name="cohort"))

    tagged = pairs.map_batches(
        lambda t: t.append_column("cohort", pa.nulls(len(t), pa.int64())),
        batch_format="pyarrow").union(
        cohorts.map_batches(lambda t: pa.table({
            "user_id": t.column("user_id"),
            "day": pa.nulls(len(t), pa.int64()),
            "cohort": t.column("cohort").cast(pa.int64())}),
            batch_format="pyarrow"))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        c = int(g.loc[g["day"].isna(), "cohort"].iloc[0])
        days = g.loc[g["day"].notna(), "day"].astype("int64")
        return pd.DataFrame({
            "cohort_day": np.full(len(days), c, dtype=np.int64),
            "day_offset": days.to_numpy() - c,
        })

    per_pair = bucketed_group_apply(tagged, ["user_id"], attach)
    return per_pair.groupby(["cohort_day", "day_offset"]).aggregate(
        Count(alias_name="n_users"))
