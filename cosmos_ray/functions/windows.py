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


def rolling_value(events_ds, window_rows: int = 5, round_to: int = 6):
    """Frame-bounded rolling aggregate (the SQL ``ROWS BETWEEN N-1
    PRECEDING AND CURRENT ROW`` window): per user, ordered by
    (ts, event_id), the mean and sum of ``value`` over the current row
    and up to ``window_rows - 1`` preceding rows.

    -> (user_id, event_id, ts_us, roll_sum, roll_mean)

    Scale shape: one coarse user-hash exchange (same as `sessionize`);
    inside a bucket the frame sums are ``window_rows`` shifted vectorized
    adds, accumulated left-to-right within the frame so float order
    matches the oracle's ascending frame scan — no per-row Python.
    """

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        n = len(g)
        val = g["value"].to_numpy(dtype=np.float64)
        user = g["user_id"].to_numpy()
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        idx = np.arange(n)
        starts = np.flatnonzero(new_user)
        first = np.repeat(starts, np.diff(np.append(starts, n)))
        acc = np.zeros(n)
        cnt = np.zeros(n, dtype=np.int64)
        for j in range(window_rows - 1, -1, -1):  # ascending frame order
            src = idx - j
            ok = src >= first
            acc[ok] += val[src[ok]]
            cnt[ok] += 1
        return pd.DataFrame(
            {
                "user_id": user,
                "event_id": g["event_id"].to_numpy(),
                "ts_us": g["ts"].values.astype("datetime64[us]").astype(np.int64),
                "roll_sum": np.round(acc, round_to),
                "roll_mean": np.round(acc / cnt, round_to),
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


def funnel(events_ds, steps: list[str], window_s: int = 86_400):
    """Ordered funnel over the events stream (the product-analytics
    sequence-match): a user completes step ``i`` when there exist events
    of types ``steps[0..i]`` at strictly increasing timestamps, all
    within ``window_s`` seconds of the user's FIRST step-0 event
    (earliest-completion greedy semantics — each step matches its
    earliest admissible event, which is SQL-replayable step by step).
    -> one row per step: (step 1-based, event_type, users).

    Scale shape: the input is pre-filtered to the funnel's event types
    and projected to three columns before the single user-hash exchange;
    inside a bucket the per-step matching is vectorized pandas merges
    (rows = that bucket's funnel events only). Per-user output is one
    row per COMPLETED step, so the final rollup exchange is bounded by
    n_steps x users."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    if not steps:
        raise ValueError("funnel needs at least one step")
    w_us = window_s * 1_000_000

    def keep(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_type"])
        return t.filter(pc.is_in(t.column("event_type"), pa.array(steps)))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                           "ts": ts_us,
                           "event_type": g["event_type"].to_numpy()})
        cur = (df[df["event_type"] == steps[0]]
               .groupby("user_id", as_index=False)["ts"].min())
        cur["t1"] = cur["ts"]
        out = [pd.DataFrame({"user_id": cur["user_id"], "step": 1})]
        for i, s in enumerate(steps[1:], start=2):
            cand = df[df["event_type"] == s].merge(cur[["user_id", "ts", "t1"]],
                                                   on="user_id",
                                                   suffixes=("", "_prev"))
            cand = cand[(cand["ts"] > cand["ts_prev"])
                        & (cand["ts"] <= cand["t1"] + w_us)]
            if len(cand) == 0:
                break
            cur = (cand.groupby("user_id", as_index=False)
                   .agg(ts=("ts", "min"), t1=("t1", "first")))
            out.append(pd.DataFrame({"user_id": cur["user_id"], "step": i}))
        res = pd.concat(out, ignore_index=True)
        res["step"] = res["step"].astype(np.int64)
        return res

    per_user = _bucketed_by_user(
        events_ds.map_batches(keep, batch_format="pyarrow"), fn)
    counts = per_user.groupby("step").aggregate(Count(alias_name="users"))

    name = {i + 1: s for i, s in enumerate(steps)}

    def label(t: pa.Table) -> pa.Table:
        st = t.column("step").to_numpy()
        return pa.table({
            "step": t.column("step"),
            "event_type": pa.array([name[int(x)] for x in st]),
            "users": t.column("users"),
        })

    return counts.map_batches(label, batch_format="pyarrow")


def daily_anomalies(events_ds, z_thresh: float = 2.0, round_to: int = 6):
    """Per-event-type daily-volume anomaly flags: day counts whose
    z-score against that type's own daily distribution (population
    stddev over the days the type appears) meets ``|z| >= z_thresh``.
    Types with zero variance are never anomalous. -> (event_type, day,
    n, z) with z rounded.

    Scale shape: per-batch (type, day) count partials are the only
    exchange (bounded by types x days, independent of event rows); the
    per-type stats run as one map_groups over that tiny table."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()), 86_400_000_000)
        grp = (pa.table({"event_type": t.column("event_type"), "day": day})
               .group_by(["event_type", "day"])
               .aggregate([([], "count_all")]))
        return pa.table({"event_type": grp.column("event_type"),
                         "day": grp.column("day"),
                         "n": grp.column("count_all").cast(pa.int64())})

    daily = (events_ds.select_columns(["event_type", "ts"])
             .map_batches(partials, batch_format="pyarrow")
             .groupby(["event_type", "day"]).aggregate(Sum("n", alias_name="n")))

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        # float parity with the SQL oracle: counts and their squares are
        # exact in float64 and their sums stay < 2^53, so mu / E[n^2] are
        # order-independent; sd uses the same sqrt(E[n^2] - mu^2) formula
        # as the SQL, and rounding is half-away-from-zero like DuckDB's.
        n = g["n"].to_numpy(dtype=np.float64)
        mu = n.sum() / len(n)
        sd = np.sqrt((n * n).sum() / len(n) - mu * mu)
        if not sd > 0.0:
            keep = np.zeros(len(n), dtype=bool)
            z = n
        else:
            z = (n - mu) / sd
            scale = 10.0 ** round_to
            z = np.sign(z) * np.floor(np.abs(z) * scale + 0.5) / scale
            keep = np.abs(z) >= z_thresh
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy()[keep],
            "day": g["day"].to_numpy()[keep].astype(np.int64),
            "n": g["n"].to_numpy()[keep].astype(np.int64),
            "z": z[keep].astype(np.float64),
        })

    return daily.groupby("event_type").map_groups(flag, batch_format="pandas")


def locf_fill(events_ds, mark_type: str = "purchase", round_to: int = 6):
    """Last-observation-carried-forward imputation per user in event
    time (SQL ``last_value(x IGNORE NULLS)``): carries each user's most
    recent ``mark_type`` event value forward onto every later event;
    events before the user's first mark get the -1.0 sentinel (a
    null-free output keeps the driver's value-hash compare
    unambiguous; COALESCE on the oracle side). The classic sparse-
    signal densification every feature pipeline runs (last purchase
    amount, last login tier, ...). One coarse user-hash exchange,
    vectorized index-propagation fill inside the bucket.
    -> (event_id, user_id, ts_us, last_mark_value)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        user = g["user_id"].to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        is_mark = (g["event_type"].to_numpy() == mark_type)
        n = len(g)
        # index of the latest mark at or before each row, -1 if none
        idx = np.where(is_mark, np.arange(n), -1)
        idx = np.maximum.accumulate(idx)
        # reset at user boundaries: a carried index from a previous user
        # is invalid — compare against the user's first row position
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        first = np.maximum.accumulate(np.where(new_user, np.arange(n), -1))
        idx = np.where(idx >= first, idx, -1)
        filled = np.where(idx >= 0, val[np.clip(idx, 0, None)], -1.0)
        filled = np.round(filled, round_to)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": user,
            "ts_us": ts_us,
            "last_mark_value": filled.astype(np.float64),
        })

    return _bucketed_by_user(events_ds, fn)


def rolling_median(events_ds, window_rows: int = 5, round_to: int = 6):
    """Frame-bounded rolling MEDIAN (SQL ``median(value) OVER (ROWS
    BETWEEN N-1 PRECEDING AND CURRENT ROW)``): per user, ordered by
    (ts, event_id) — the robust counterpart to `rolling_value`'s
    mean (spike-insensitive smoothing). One user-hash exchange; inside
    a bucket the frame is a (rows x window) NaN-padded matrix and the
    median one vectorized ``nanmedian`` (midpoint interpolation on even
    counts, matching SQL median over DOUBLE).
    -> (user_id, event_id, ts_us, roll_median)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        n = len(g)
        val = g["value"].to_numpy(dtype=np.float64)
        user = g["user_id"].to_numpy()
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        idx = np.arange(n)
        starts = np.flatnonzero(new_user)
        first = np.repeat(starts, np.diff(np.append(starts, n)))
        m = np.full((n, window_rows), np.nan)
        for j in range(window_rows):
            src = idx - j
            ok = src >= first
            m[ok, j] = val[src[ok]]
        return pd.DataFrame({
            "user_id": user,
            "event_id": g["event_id"].to_numpy(),
            "ts_us": g["ts"].values.astype("datetime64[us]").astype(np.int64),
            "roll_median": np.round(np.nanmedian(m, axis=1), round_to),
        })

    return _bucketed_by_user(events_ds, fn)


def trailing_time_sum(events_ds, window_s: int = 3600, round_to: int = 6):
    """Time-RANGE windowed aggregate (the SQL ``RANGE BETWEEN INTERVAL
    W PRECEDING AND CURRENT ROW`` frame — the row-count window's
    time-based sibling): per user, ordered by ts, the sum and count of
    ``value`` over [ts - W, ts], INCLUDING current-row ts peers (SQL
    RANGE frames end at the last peer of the current row).

    -> (user_id, event_id, ts_us, win_sum, win_n)

    Scale shape: one coarse user-hash exchange; inside a bucket the
    frame edges are TWO global searchsorted calls over a per-user
    monotone composite key (user_ord * span + ts — other users' keys
    sit >= span apart, so the binary search cannot cross a user
    boundary), and the frame sums are prefix-sum differences over
    integer cents (values are 2-decimal, so cents arithmetic is exact —
    no prefix-difference float drift vs the oracle's ascending frame
    scan). No per-row Python on the common path; a per-user fallback
    guards the pathological span*users int64 overflow."""
    W = int(window_s) * 1_000_000

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        n = len(g)
        ts = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        user = g["user_id"].to_numpy()
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        uord = np.cumsum(new_user) - 1
        if n == 0:
            # defensive only (map_groups never calls fn on an empty
            # group): typed-empty frame matching the real output schema
            return pd.DataFrame({
                "user_id": user,
                "event_id": g["event_id"].to_numpy(),
                "ts_us": ts,
                "win_sum": np.array([], np.float64),
                "win_n": np.array([], np.int64)})
        span = int(ts.max()) - int(ts.min()) + W + 2
        if (int(uord[-1]) + 1) * span < 2 ** 62:
            key = uord * span + (ts - ts.min())
            lo = np.searchsorted(key, key - W, side="left")
            hi = np.searchsorted(key, key, side="right")
        else:
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            starts = np.flatnonzero(new_user)
            for s, e in zip(starts, np.append(starts[1:], n)):
                lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - W, "left")
                hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], "right")
        cents = np.round(g["value"].to_numpy(dtype=np.float64)
                         * 100.0).astype(np.int64)
        pref = np.concatenate([[0], np.cumsum(cents)])
        return pd.DataFrame({
            "user_id": user,
            "event_id": g["event_id"].to_numpy(),
            "ts_us": ts,
            "win_sum": np.round((pref[hi] - pref[lo]) / 100.0, round_to),
            "win_n": (hi - lo).astype(np.int64)})

    return _bucketed_by_user(events_ds, fn)


# single-char codes for event-type sequence strings (motif matching);
# unknown types map to 'x'
EVENT_CODES = {"click": "c", "view": "v", "purchase": "p",
               "signup": "s", "error": "e"}


def sequence_motif_count(events_ds, pattern: str = "v+p",
                         num_buckets: int = 64):
    """Per-user event-sequence motif counting — the MATCH_RECOGNIZE-lite
    pattern probe (`funnel`'s regex-powered sibling): each user's events
    are ordered by (ts, event_id), encoded one char per event via
    ``EVENT_CODES``, and the NON-OVERLAPPING occurrences of ``pattern``
    (a regex over the code alphabet) are counted. Python re and the SQL
    replay's RE2 agree on non-overlapping greedy semantics for patterns
    over this alphabet. Shuffle shape: one user-hash bucket exchange;
    encoding and counting are vectorized pandas string kernels inside
    the bucket. -> (user_id, n_events, motif_count)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        codes = g["event_type"].map(EVENT_CODES).fillna("x")
        seq = codes.groupby(g["user_id"], sort=False).agg("".join)
        out = pd.DataFrame({
            "user_id": seq.index.to_numpy(),
            "n_events": seq.str.len().to_numpy(np.int64),
            "motif_count": seq.str.count(pattern).to_numpy(np.int64)})
        return out

    return _bucketed_by_user(
        events_ds.select_columns(["user_id", "ts", "event_id",
                                  "event_type"]),
        fn, num_buckets=num_buckets)


def watermarked_window(events_ds, window_s: int = 3600,
                       lateness_s: int = 900, bucket_size: int = 100_000,
                       round_to: int = 4):
    """Event-time tumbling window with a processing-order WATERMARK —
    the Flink/Beam late-data discipline replayed deterministically in
    batch. Arrival order is ``event_id`` (the stream's ingestion
    sequence); the watermark after processing event i is
    ``max(ts[0..i]) - lateness``; an event is dropped as too-late iff
    its own ts is below the watermark. Per window the operator emits
    the on-time count/sum plus the dropped-late count — the number a
    real streaming job would surface as its late-data side output.

    Scale shape (the global-prefix pattern of `pack_sequences` — a
    running max over a total order WITHOUT a global sort):

    1. one combiner pass computes per-BUCKET ts maxima, where bucket =
       ``event_id // bucket_size`` (contiguous arrival ranges); only
       O(n / bucket_size) rows cross the exchange;
    2. the driver takes the exclusive prefix-max over the tiny ordered
       bucket list and broadcasts it;
    3. one bucket-hash exchange co-locates each bucket, where the
       in-bucket running max is a vectorized ``np.maximum.accumulate``
       seeded with the bucket's prefix, and rows pre-aggregate to
       per-window partials before the final window groupby.

    -> (window_start_us, n_events, sum_value, n_late), on-time only in
    n_events/sum_value; every event lands in exactly one window.
    """
    import ray
    from ray.data.aggregate import Max, Sum

    from cosmos_ray.queries.relational import (bucketed_group_apply,
                                               collect_small)

    window_us = window_s * 1_000_000
    late_us = lateness_s * 1_000_000

    def to_cols(t: pa.Table) -> pa.Table:
        ts = (t.column("ts").cast(pa.timestamp("us"))
              .to_numpy(zero_copy_only=False).astype("datetime64[us]")
              .astype(np.int64))
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(eid // bucket_size, pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
            "tu": pa.array(ts, pa.int64()),
            "value": t.column("value").cast(pa.float64())})

    cols = events_ds.select_columns(["event_id", "ts", "value"]).map_batches(
        to_cols, batch_format="pyarrow")

    bmax = collect_small(
        cols.groupby("bucket").aggregate(Max("tu", alias_name="mx")),
        cap_rows=5_000_000)
    if bmax is None:  # n_events/bucket_size buckets exceeded the guard
        raise ValueError(
            "watermarked_window: bucket list exceeds the driver cap; "
            "raise bucket_size so n_events/bucket_size <= 5M")
    order = np.argsort(bmax.column("bucket").to_numpy(zero_copy_only=False))
    bids = bmax.column("bucket").to_numpy(zero_copy_only=False)[order]
    mxs = bmax.column("mx").to_numpy(zero_copy_only=False)[order]
    # exclusive prefix: the watermark carried INTO each bucket
    prefix = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(mxs)[:-1]))
    prefix_ref = ray.put(dict(zip(bids.tolist(), prefix.tolist())))

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        carried = ray.get(prefix_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("event_id", kind="stable")
        tu = g["tu"].to_numpy(np.int64)
        hi = np.maximum.accumulate(np.maximum(tu, carried))
        ok = tu >= hi - late_us
        win = (tu // window_us) * window_us
        val = g["value"].to_numpy(np.float64)
        uniq, inv = np.unique(win, return_inverse=True)
        return pd.DataFrame({
            "window_start_us": uniq,
            "n_events": np.bincount(inv, weights=ok).astype(np.int64),
            "sum_value": np.bincount(inv, weights=val * ok),
            "n_late": np.bincount(inv, weights=~ok).astype(np.int64)})

    partials = bucketed_group_apply(cols, ["bucket"], in_bucket)
    agg = (partials.groupby("window_start_us")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_value", alias_name="sum_value"),
                      Sum("n_late", alias_name="n_late")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start_us": t.column("window_start_us"),
            "n_events": t.column("n_events").cast(pa.int64()),
            "sum_value": pa.array(
                np.round(t.column("sum_value").to_numpy(zero_copy_only=False),
                         round_to), pa.float64()),
            "n_late": t.column("n_late").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")
