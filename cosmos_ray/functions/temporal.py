"""Temporal joins over event streams, batch form: as-of join and
range(interval) join — the two classic operators Ray Data's relational
API lacks (the reference's nearest-neighbour associations,
`ingest/process/aggregations/caption_assoc.py`, are the spatial cousins
of the same "closest earlier row" semantics).

Scale shape (both operators): tag each side, union, ONE coarse shuffle
on hash(key) % num_buckets (every key's rows co-locate — the same
partitioning invariant the LSH/session operators use), then a fully
vectorized in-bucket pandas pass (`merge_asof` / `searchsorted`).
Partitioning assumption: a single key's rows fit in one bucket's
memory; skewed hot keys should be salted upstream if a key alone
exceeds a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _union_tagged(left_ds, right_ds, key: str, left_ts: str, right_ts: str,
                  left_cols: list[str], right_cols: list[str]):
    """Union the two sides under a common (key, __ts, __side, *cols)
    schema, null-filling the other side's payload columns."""

    payload = sorted(set(left_cols) | set(right_cols))

    def norm(side: int, ts_col: str, own: list[str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                key: t.column(key),
                "__ts": t.column(ts_col).cast(pa.timestamp("us")),
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            # identical column order on both sides — a union of mismatched
            # schemas silently reorders/coerces blocks downstream
            for c in payload:
                cols[c] = t.column(c) if c in own else pa.nulls(n, pa.int64())
            return pa.table(cols)

        return f

    l = left_ds.map_batches(norm(0, left_ts, left_cols), batch_format="pyarrow")
    r = right_ds.map_batches(norm(1, right_ts, right_cols), batch_format="pyarrow")
    return l.union(r)


def _bucketed_by_key(ds, key: str, fn, num_buckets: int):
    # arrow-side bucketing: all-null int64 payload columns keep their
    # type (a pandas block would silently widen them to float64 and the
    # union's block schemas would diverge)
    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t.column(key).to_numpy(zero_copy_only=False))
        return t.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )


def asof_join(left_ds, right_ds, key: str, left_ts: str = "ts",
              right_ts: str = "ts", left_id: str = "event_id",
              right_id: str = "event_id", num_buckets: int = 64):
    """For every left row, the LATEST right row of the same ``key`` with
    ``right_ts <= left_ts`` (backward as-of; left rows with no earlier
    right row keep nulls). Ties on right_ts break by the larger
    ``right_id`` — a total order, so the result is deterministic.

    -> (key, <left_id>, ts_us, matched_<right_id>, matched_ts_us,
    lag_us) with lag_us = left_ts - matched_ts in integer microseconds
    (exact — no float drift between engine and SQL oracle).
    """
    lid, rid = f"__l_{left_id}", f"__r_{right_id}"
    u = _union_tagged(
        left_ds.map_batches(
            lambda t: t.append_column(lid, t.column(left_id).cast(pa.int64())),
            batch_format="pyarrow"),
        right_ds.map_batches(
            lambda t: t.append_column(rid, t.column(right_id).cast(pa.int64())),
            batch_format="pyarrow"),
        key, left_ts, right_ts, [lid], [rid],
    )

    out_l = f"{left_id}"
    out_r = f"matched_{right_id}"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g["__ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = g.assign(__ts_us=ts_us)
        l = g[g["__side"] == 0]
        r = g[g["__side"] == 1]
        # merge_asof keeps the LAST right row at an equal timestamp, so
        # sorting right by (ts, id) makes ties resolve to the max id
        l = l.sort_values("__ts_us", kind="stable")
        r = r.sort_values(["__ts_us", rid], kind="stable")
        if len(l) == 0:
            return pd.DataFrame({
                key: [], out_l: [], "ts_us": [],
                out_r: [], "matched_ts_us": [], "lag_us": [],
            }).astype({key: np.int64, out_l: np.int64, "ts_us": np.int64,
                       out_r: "Int64", "matched_ts_us": "Int64",
                       "lag_us": "Int64"})
        m = pd.merge_asof(
            l[[key, lid, "__ts_us"]],
            r[[key, rid, "__ts_us"]].rename(columns={"__ts_us": "__rts_us"}),
            left_on="__ts_us", right_on="__rts_us", by=key,
            direction="backward", allow_exact_matches=True,
        )
        return pd.DataFrame({
            key: m[key].to_numpy().astype(np.int64),
            out_l: m[lid].to_numpy().astype(np.int64),
            "ts_us": m["__ts_us"].to_numpy().astype(np.int64),
            out_r: m[rid].astype("Int64"),
            "matched_ts_us": m["__rts_us"].astype("Int64"),
            "lag_us": (m["__ts_us"] - m["__rts_us"]).astype("Int64"),
        })

    return _bucketed_by_key(u, key, fn, num_buckets)


def range_count_join(left_ds, right_ds, key: str, left_ts: str = "ts",
                     right_ts: str = "ts", left_id: str = "event_id",
                     lo_us: int = 0, hi_us: int = 3_600_000_000,
                     exclusive_lo: bool = True, count_col: str = "n_in_range",
                     num_buckets: int = 64):
    """For every left row, the COUNT of right rows of the same ``key``
    whose timestamp falls in the window (left_ts + lo_us, left_ts +
    hi_us] (half-open by default: strictly after the anchor, up to and
    including the horizon). Vectorized per key via two ``searchsorted``
    probes against the key's sorted right timestamps — never a pair
    fan-out, so a dense window costs O(log n) per left row.

    -> (key, <left_id>, ts_us, <count_col>)
    """
    lid = f"__l_{left_id}"
    u = _union_tagged(
        left_ds.map_batches(
            lambda t: t.append_column(lid, t.column(left_id).cast(pa.int64())),
            batch_format="pyarrow"),
        right_ds,
        key, left_ts, right_ts, [lid], [],
    )
    side_lo = "right" if exclusive_lo else "left"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g["__ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = g.assign(__ts_us=ts_us)
        out = []
        for _, kg in g.groupby(key, sort=False):
            l = kg[kg["__side"] == 0]
            if len(l) == 0:
                continue
            r_ts = np.sort(kg.loc[kg["__side"] == 1, "__ts_us"].to_numpy())
            anchors = l["__ts_us"].to_numpy()
            n = (np.searchsorted(r_ts, anchors + hi_us, side="right")
                 - np.searchsorted(r_ts, anchors + lo_us, side=side_lo))
            out.append(pd.DataFrame({
                key: l[key].to_numpy().astype(np.int64),
                left_id: l[lid].to_numpy().astype(np.int64),
                "ts_us": anchors.astype(np.int64),
                count_col: n.astype(np.int64),
            }))
        if not out:
            return pd.DataFrame({key: [], left_id: [], "ts_us": [],
                                 count_col: []}).astype(np.int64)
        return pd.concat(out, ignore_index=True)

    return _bucketed_by_key(u, key, fn, num_buckets)


def scd2_intervals(events_ds, key: str = "user_id", attr: str = "event_type",
                   ts_col: str = "ts", tie_col: str = "event_id"):
    """Slowly-changing-dimension (type 2) history build: per key, order
    events by (ts, tie), collapse consecutive runs of an unchanged
    tracked attribute, and emit one VERSION row per run with its
    validity interval — ``valid_to_us = -1`` marks the current (open)
    version (a sentinel instead of NULL for value-hash parity).

    Scale shape: the same one-key-hash-exchange as sessionize — each key's
    events land in one bucketed group, where the run-length encoding is
    vectorized numpy (change-point diff + minimum.reduceat); no driver
    pull, no second exchange."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    ev = events_ds.select_columns([key, attr, ts_col, tie_col])

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tie_col], kind="stable")
        a = g[attr].to_numpy()
        ts_us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(new)
        vfrom = ts_us[starts]
        vto = np.empty(len(starts), dtype=np.int64)
        vto[:-1] = vfrom[1:]
        vto[-1] = -1
        return pd.DataFrame({
            key: g[key].to_numpy()[starts],
            "version": np.arange(1, len(starts) + 1, dtype=np.int64),
            attr: a[starts],
            "valid_from_us": vfrom,
            "valid_to_us": vto,
        })

    return bucketed_group_apply(ev, [key], runs)
