"""Driver-contract queries: every entry returns a callable(sf_dir) and a
matching DuckDB oracle SQL (where SQL-expressible).

Parity rules (driver hashes values column-by-column after sorting by
column name):
- every computed column gets the SAME name in Ray and SQL;
- every float aggregate is rounded on BOTH sides (2dp money, 6dp
  ratios/cosines) so accumulation-order drift can't flip the hash;
- timestamps are reduced to int64 epoch values before comparison.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from cosmos_ray.queries.relational import (
    join_or_broadcast,
    read,
    semi_join_ds,
    topk,
)

# --------------------------------------------------------------------------
# Relational pipelines (Cosmos "retrieval" capability parity in batch form:
# filters, counts, top-k, joins — `elastic_retriever.py:228-342,615-629`)
# --------------------------------------------------------------------------


def q_lineitem_agg(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with a derived revenue column."""
    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
               "l_discount", "l_shipdate"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"),
                                   pa.scalar(pd.Timestamp("1998-09-02"))))
        disc_price = pc.multiply(t.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("disc_price", disc_price).drop_columns(["l_shipdate"])

    agg = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.set_column(t.schema.get_field_index("sum_qty"), "sum_qty",
                         pc.round(t.column("sum_qty"), 2, round_mode="half_towards_infinity"))
        t = t.set_column(t.schema.get_field_index("sum_base_price"), "sum_base_price",
                         pc.round(t.column("sum_base_price"), 2, round_mode="half_towards_infinity"))
        t = t.set_column(t.schema.get_field_index("sum_disc_price"), "sum_disc_price",
                         pc.round(t.column("sum_disc_price"), 2, round_mode="half_towards_infinity"))
        t = t.set_column(t.schema.get_field_index("avg_disc"), "avg_disc",
                         pc.round(t.column("avg_disc"), 6, round_mode="half_towards_infinity"))
        return t

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                    AS sum_qty,
       round(sum(l_extendedprice), 2)               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6)                    AS avg_disc,
       count(*)                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_segment(sf_dir: str):
    """orders ⨝ customer (broadcast small side) → revenue per segment."""
    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = join_or_broadcast(orders, customer, key="c_custkey",
                               add_cols=["c_mktsegment"], big_key="o_custkey")
    agg = joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="n_orders"),
    )
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("revenue"), "revenue",
                               pc.round(t.column("revenue"), 2, round_mode="half_towards_infinity")),
        batch_format="pyarrow",
    )


SQL_REVENUE_BY_SEGMENT = """
SELECT c_mktsegment,
       round(sum(o_totalprice), 2) AS revenue,
       count(*)                    AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_top_customers(sf_dir: str):
    """Top-10 customers by order revenue: groupby + broadcast join + global
    top-k (sample-sort + limit)."""
    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = read(sf_dir, "customer", ["c_custkey", "c_name"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue")
    )
    per_cust = per_cust.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("revenue"), "revenue",
                               pc.round(t.column("revenue"), 2, round_mode="half_towards_infinity")),
        batch_format="pyarrow",
    )
    named = join_or_broadcast(per_cust, customer, key="c_custkey",
                              add_cols=["c_name"], big_key="o_custkey")
    return topk(named, [("revenue", True), ("o_custkey", False)], 10)


SQL_TOP_CUSTOMERS = """
SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue, any_value(c_name) AS c_name
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey
ORDER BY revenue DESC, o_custkey
LIMIT 10
"""


def q_top_customers_page2(sf_dir: str):
    """Second result page (rows 11-20) of the top-customers ranking — the
    retriever's ``[start:end]`` pagination window (O5,
    `elastic_retriever.py:252-257`)."""
    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = read(sf_dir, "customer", ["c_custkey", "c_name"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue")
    )
    per_cust = per_cust.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("revenue"), "revenue",
                               pc.round(t.column("revenue"), 2, round_mode="half_towards_infinity")),
        batch_format="pyarrow",
    )
    named = join_or_broadcast(per_cust, customer, key="c_custkey",
                              add_cols=["c_name"], big_key="o_custkey")
    return topk(named, [("revenue", True), ("o_custkey", False)], 10, offset=10)


SQL_TOP_CUSTOMERS_PAGE2 = """
SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue, any_value(c_name) AS c_name
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey
ORDER BY revenue DESC, o_custkey
LIMIT 10 OFFSET 10
"""


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape — the deepest relational chain: revenue from 1996
    ASIA lineitems where the supplier's nation equals the customer's
    nation. Dimension hops (region, nation, supplier) ride the guarded
    broadcast tier; customer->orders rides join_or_broadcast. The
    orders ⨝ lineitem edge ALSO rides join_or_broadcast: the orders
    side is pre-filtered to one year × one region (~3% of orders), so
    at any realistic scale it fits the broadcast cap and lineitem — the
    truly large side — never moves; past the cap the same call degrades
    to the hash-partitioned native Dataset.join. The same-nation
    predicate is a post-join vectorized filter, and every input is
    column-pruned at the read."""
    import datetime

    nation = read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = read(sf_dir, "region", ["r_regionkey", "r_name"])
    asia_nations = join_or_broadcast(
        nation, region.filter(lambda r: r["r_name"] == "ASIA"),
        key="r_regionkey", add_cols=["r_name"], big_key="n_regionkey",
    ).select_columns(["n_nationkey", "n_name"])

    customer = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = join_or_broadcast(customer, asia_nations, key="n_nationkey",
                             add_cols=["n_name"], big_key="c_nationkey")

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)

    def in_1996(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        return t.filter(pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                                pc.less(d, pa.scalar(hi)))).drop_columns(
            ["o_orderdate"])

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        in_1996, batch_format="pyarrow")
    ordn = join_or_broadcast(orders, cust, key="c_custkey",
                             add_cols=["c_nationkey", "n_name"],
                             big_key="o_custkey")

    items = read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    joined = join_or_broadcast(
        items, ordn.select_columns(["o_orderkey", "c_nationkey", "n_name"]),
        key="o_orderkey", add_cols=["c_nationkey", "n_name"],
        big_key="l_orderkey")

    supplier = read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    withsup = join_or_broadcast(joined, supplier, key="s_suppkey",
                                add_cols=["s_nationkey"], big_key="l_suppkey")

    def local_rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("s_nationkey"), t.column("c_nationkey")))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"n_name": t.column("n_name"), "rev": rev})

    agg = (withsup.map_batches(local_rev, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("rev", alias_name="revenue"),
                      Count(alias_name="n_items")))
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("revenue"), "revenue",
                               pc.round(t.column("revenue"), 4)),
        batch_format="pyarrow")


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_weekly_growth(sf_dir: str):
    """Week-over-week growth rate per event_type: weekly counts (epoch-
    week buckets) with lag-1 percent change — the trend KPI on the
    weeks-x-types-bounded rollup (exchange is count partials; the lag
    align is driver work under the usual cap)."""
    from cosmos_ray.queries.relational import collect_small

    ev = read(sf_dir, "events", ["event_type", "ts"])
    WEEK = 7 * 86_400_000_000

    def to_week(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        wk = pc.multiply(pc.divide(us, pa.scalar(WEEK)), pa.scalar(WEEK))
        return pa.table({"event_type": t.column("event_type"),
                         "week_us": wk})

    counts = (ev.map_batches(to_week, batch_format="pyarrow")
              .groupby(["event_type", "week_us"])
              .aggregate(Count(alias_name="n")))
    tbl = collect_small(counts, cap_rows=2_000_000)
    if tbl is None:
        raise ValueError("(type, week) table exceeded the driver cap")
    df = tbl.to_pandas().sort_values(["event_type", "week_us"])
    prev = df.groupby("event_type")["n"].shift(1)
    prev_wk = df.groupby("event_type")["week_us"].shift(1)
    m = prev.notna() & (prev_wk == df["week_us"] - WEEK)
    out = df[m].copy()
    p = prev[m].to_numpy(dtype=np.float64)
    out["growth"] = np.round((out["n"].to_numpy() - p) / p, 6)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"].tolist(), pa.string()),
        "week_us": pa.array(out["week_us"].to_numpy(), pa.int64()),
        "n": pa.array(out["n"].to_numpy(), pa.int64()),
        "growth": pa.array(out["growth"].to_numpy(), pa.float64()),
    }))


SQL_WEEKLY_GROWTH = """
WITH w AS (SELECT event_type,
                  (epoch_us(ts) // 604800000000) * 604800000000 AS week_us,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
l AS (SELECT event_type, week_us, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY week_us) AS pn,
             LAG(week_us) OVER (PARTITION BY event_type
                                ORDER BY week_us) AS pw
      FROM w)
SELECT event_type, week_us, n,
       round((n - pn) * 1.0 / pn, 6) AS growth
FROM l
WHERE pn IS NOT NULL AND pw = week_us - 604800000000
"""


def q_value_percentiles_cont(sf_dir: str):
    """Interpolated percentiles (SQL quantile_cont) of value per
    event_type: v[f] + frac * (v[f+1] - v[f]) at rank q*(n-1) — the
    continuous twin of the discrete group quantiles, same one-bucket
    exchange, identical interpolation formula on both sides."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    ev = read(sf_dir, "events", ["event_type", "value"])

    def qc(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        n = len(v)
        row = {"event_type": [g["event_type"].iloc[0]]}
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            pos = q * (n - 1)
            f = int(np.floor(pos))
            c = min(f + 1, n - 1)
            frac = pos - f
            row[name] = [round(v[f] + frac * (v[c] - v[f]), 6)]
        return pd.DataFrame(row)

    return bucketed_group_apply(ev, ["event_type"], qc)


SQL_VALUE_PERCENTILES_CONT = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY 1
"""


def q_twap_value(sf_dir: str):
    """Time-weighted average value per user (the TWAP staple): each
    event's value held until the next event, weighted by its share of
    the user's active span — sum(v_i * dur_i/T). Weights are
    normalized BEFORE the sum so terms stay O(value) and the 6dp round
    dominates float order; single-event users (T = 0) are excluded on
    both sides. One user-hash exchange, vectorized in-bucket."""
    from cosmos_ray.functions.windows import _bucketed_by_user

    ev = read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def twap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        user = g["user_id"].to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        same_next = np.zeros(len(g), dtype=bool)
        same_next[:-1] = user[1:] == user[:-1]
        dur = np.zeros(len(g), dtype=np.float64)
        dur[:-1] = ts_us[1:] - ts_us[:-1]
        dur[~same_next] = 0.0
        d = pd.DataFrame({"u": user, "dur": dur, "val": val})
        t_total = d.groupby("u", sort=False)["dur"].transform("sum")
        keep = t_total > 0
        d = d[keep]
        w = d["dur"].to_numpy() / t_total[keep].to_numpy()
        d = d.assign(term=w * d["val"].to_numpy())
        out = d.groupby("u", sort=False)["term"].sum().reset_index()
        return pd.DataFrame({"user_id": out["u"].to_numpy(),
                             "twap": np.round(out["term"].to_numpy(), 6)})

    return _bucketed_by_user(ev, twap)


SQL_TWAP_VALUE = """
WITH l AS (
  SELECT user_id, value, epoch_us(ts) AS t0,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t1
  FROM events),
d AS (SELECT user_id, value,
             CAST(COALESCE(t1 - t0, 0) AS DOUBLE) AS dur
      FROM l),
t AS (SELECT user_id, sum(dur) AS total FROM d GROUP BY 1)
SELECT d.user_id, round(sum(d.value * (d.dur / t.total)), 6) AS twap
FROM d JOIN t USING (user_id)
WHERE t.total > 0
GROUP BY 1
"""


def q_media_image_features(sf_dir: str):
    """End-to-end multimodal decode, oracle-checked: a media table is
    synthesized from documents (one REAL 24-bit BMP per doc — dims and
    constant pixel value are doc_id arithmetic), decoded by the
    pure-numpy codec through the `DecodeImage` actor pool (fake=False),
    and the recovered geometry + mean pixel must equal the planted
    arithmetic. Proves the binary-column plumbing AND the codec, not a
    stand-in. Scale shape: encode/decode are per-batch actor work; no
    exchange at all."""
    import numpy as np

    from cosmos_ray.functions.imagecodec import encode_bmp
    from cosmos_ray.stages import multimodal

    docs = read(sf_dir, "documents", ["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            w = 16 + d % 32
            h = 16 + (d // 7) % 32
            v = d % 256
            payloads.append(encode_bmp(np.full((h, w, 3), v, np.uint8)))
        return pa.table({
            "media_id": pa.array([f"m{d}" for d in ids], pa.string()),
            "kind": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/bmp"] * len(ids), pa.string()),
            "meta": pa.array(["{}"] * len(ids), pa.string()),
        })

    media = docs.map_batches(to_media, batch_format="pyarrow",
                             batch_size=256)
    feats = multimodal.decode_images(media, fake=False)

    def finish(t: pa.Table) -> pa.Table:
        f0 = pa.array(
            [int(round(f[0] * 255.0)) for f in t.column("feature").to_pylist()],
            pa.int64())
        return pa.table({
            "media_id": t.column("media_id"),
            "width": t.column("width").cast(pa.int64()),
            "height": t.column("height").cast(pa.int64()),
            "channels": t.column("channels").cast(pa.int64()),
            "mean_pixel": f0,
        })

    return feats.map_batches(finish, batch_format="pyarrow")


SQL_MEDIA_IMAGE_FEATURES = """
SELECT 'm' || doc_id AS media_id,
       CAST(16 + doc_id % 32 AS BIGINT) AS width,
       CAST(16 + (doc_id // 7) % 32 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels,
       CAST(doc_id % 256 AS BIGINT) AS mean_pixel
FROM documents
"""


def q_media_jpeg_features(sf_dir: str):
    """End-to-end BASELINE JPEG decode, oracle-checked (finishes S8 —
    reference recompresses page images to JPG,
    `htcosmos/make_parquet.py:786-806`): per doc, (a) one real 16x16
    grayscale 4:4:4 JPEG and (b) one real 16x16 color 4:2:0 JPEG (the
    dominant wild format: 4 Y + 1 Cb + 1 Cr blocks per MCU, chroma
    replicate-upsampled on decode), both built from four flat 8x8 tiles
    whose values are doc_id arithmetic, pushed through encode
    (DCT+Huffman) and the `DecodeImage` actor pool. Flat tiles make the
    lossy DCT path EXACTLY replayable: recon(v) = min(floor((v-128)/2 +
    0.5)*2 + 128, 255) with the Annex-K DC quantizer 16. The color
    payload uses GRAY tiles (r=g=b=v): Y == v bit-for-bit through the
    RGB->YCbCr weights, Cb/Cr are flat 128 whose subsampled blocks
    quantize to exactly zero — so every decoded channel equals the same
    recon(v) and the SQL oracle replays the full 4:2:0 interleave/
    upsample path with the SAME formula. Proves zigzag/Huffman/DC-diff/
    IDCT plus MCU interleave + chroma upsample end to end."""
    import numpy as np

    from cosmos_ray.functions.imagecodec import encode_jpeg
    from cosmos_ray.stages import multimodal

    docs = read(sf_dir, "documents", ["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        mids, payloads = [], []
        for d in ids:
            img = np.zeros((16, 16), np.uint8)
            for ti in range(4):
                v = (d * 7 + ti * 31) % 256
                by, bx = divmod(ti, 2)
                img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
            mids.append(f"j{d}")
            payloads.append(encode_jpeg(img))
            col = np.zeros((16, 16, 3), np.uint8)
            for ti in range(4):
                v = (d * 7 + ti * 31 + 13) % 256
                by, bx = divmod(ti, 2)
                col[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
            mids.append(f"jc{d}")
            payloads.append(encode_jpeg(col, subsample="420"))
        return pa.table({
            "media_id": pa.array(mids, pa.string()),
            "kind": pa.array(["image"] * len(mids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/jpeg"] * len(mids), pa.string()),
            "meta": pa.array(["{}"] * len(mids), pa.string()),
        })

    media = docs.map_batches(to_media, batch_format="pyarrow", batch_size=256)
    feats = multimodal.decode_images(media, fake=False)

    def finish(t: pa.Table) -> pa.Table:
        # sum of the four tile reconstructions (feature[0] = mean/255
        # over the 256 px; x4 tiles of 64 px -> exact integer)
        s4 = pa.array(
            [int(round(f[0] * 255.0 * 4)) for f in t.column("feature").to_pylist()],
            pa.int64())
        return pa.table({
            "media_id": t.column("media_id"),
            "width": t.column("width").cast(pa.int64()),
            "height": t.column("height").cast(pa.int64()),
            "channels": t.column("channels").cast(pa.int64()),
            "tile_sum": s4,
        })

    return feats.map_batches(finish, batch_format="pyarrow")


# recon(v) replays the pinned JPEG rounding chain for a flat tile:
# DC = 8*(v-128); quant 16 -> floor(DC/16 + 0.5); dequant*16/8 + 128;
# final pixel floor(x + 0.5) is already integer; clip to [0, 255].
_SQL_JPEG_RECON = ("least(greatest(CAST(floor((v - 128.0) / 2.0 + 0.5) * 2"
                   " + 128 AS BIGINT), 0), 255)")

SQL_MEDIA_JPEG_FEATURES = f"""
WITH tiles AS (
  SELECT doc_id, unnest(range(0, 4)) AS ti FROM documents
), vals AS (
  SELECT doc_id, (doc_id * 7 + ti * 31) % 256 AS v FROM tiles
), cvals AS (
  SELECT doc_id, (doc_id * 7 + ti * 31 + 13) % 256 AS v FROM tiles
)
SELECT 'j' || doc_id AS media_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS channels,
       CAST(sum({_SQL_JPEG_RECON}) AS BIGINT) AS tile_sum
FROM vals GROUP BY doc_id
UNION ALL
-- the 4:2:0 color payloads: gray tiles (r=g=b=v) give Y == v, flat-128
-- chroma quantizes to zero and upsamples back to exactly 128, so every
-- channel reconstructs to the SAME recon(v) the gray formula replays
SELECT 'jc' || doc_id AS media_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels,
       CAST(sum({_SQL_JPEG_RECON}) AS BIGINT) AS tile_sum
FROM cvals GROUP BY doc_id
"""


def q_media_audio_features(sf_dir: str):
    """End-to-end audio decode, oracle-checked (the WAV sibling of
    media_image_features): one real 16-bit PCM WAV per document —
    sample count, rate and constant amplitude are doc_id arithmetic —
    decoded through the `DecodeAudio` actor pool; the recovered rms,
    re-quantized to the 16-bit grid (exact: constant dyadic samples),
    must equal the planted quantized amplitude."""
    import numpy as np

    from cosmos_ray.functions.audiocodec import encode_wav
    from cosmos_ray.stages import multimodal

    docs = read(sf_dir, "documents", ["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            n = 200 + d % 300
            sr = 8000 + (d % 4) * 4000
            a = (d % 128) / 128.0
            payloads.append(encode_wav(np.full(n, a), sample_rate=sr))
        return pa.table({
            "media_id": pa.array([f"a{d}" for d in ids], pa.string()),
            "kind": pa.array(["audio"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/wav"] * len(ids), pa.string()),
            "meta": pa.array(["{}"] * len(ids), pa.string()),
        })

    media = docs.map_batches(to_media, batch_format="pyarrow",
                             batch_size=256)
    feats = multimodal.decode_audio(media)

    def finish(t: pa.Table) -> pa.Table:
        rms = t.column("rms").to_numpy(zero_copy_only=False)
        return pa.table({
            "media_id": t.column("media_id"),
            "sample_rate": t.column("sample_rate").cast(pa.int64()),
            "n_samples": t.column("n_samples"),
            "channels": t.column("channels").cast(pa.int64()),
            "amp_q": pa.array(np.round(rms * 32768.0).astype(np.int64)),
        })

    return feats.map_batches(finish, batch_format="pyarrow")


SQL_MEDIA_AUDIO_FEATURES = """
SELECT 'a' || doc_id AS media_id,
       CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
       CAST(200 + doc_id % 300 AS BIGINT) AS n_samples,
       CAST(1 AS BIGINT) AS channels,
       CAST(round((doc_id % 128) * 32767.0 / 128.0) AS BIGINT) AS amp_q
FROM documents
"""


def q_media_video_features(sf_dir: str):
    """End-to-end video decode, oracle-checked (the Y4M sibling of
    media_image_features): one real YUV4MPEG2 C420 clip per document —
    frame count, even dims, fps and constant luma all doc_id
    arithmetic — decoded through the `DecodeVideo` actor pool; the
    recovered geometry and mean luma must equal the planted values."""
    import numpy as np

    from cosmos_ray.functions.videocodec import encode_y4m
    from cosmos_ray.stages import multimodal

    docs = read(sf_dir, "documents", ["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = []
        for d in ids:
            w = 16 + (d % 16) * 2
            h = 16 + ((d // 3) % 16) * 2
            n = 2 + d % 5
            v = d % 256
            payloads.append(encode_y4m(
                np.full((n, h, w), v, np.uint8),
                fps=(24 + d % 2, 1)))
        return pa.table({
            "media_id": pa.array([f"v{d}" for d in ids], pa.string()),
            "kind": pa.array(["video"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-y4m"] * len(ids), pa.string()),
            "meta": pa.array(["{}"] * len(ids), pa.string()),
        })

    media = docs.map_batches(to_media, batch_format="pyarrow",
                             batch_size=128)
    feats = multimodal.decode_video(media)

    def finish(t: pa.Table) -> pa.Table:
        ml = t.column("mean_luma").to_numpy(zero_copy_only=False)
        return pa.table({
            "media_id": t.column("media_id"),
            "width": t.column("width").cast(pa.int64()),
            "height": t.column("height").cast(pa.int64()),
            "n_frames": t.column("n_frames"),
            "fps_num": t.column("fps_num").cast(pa.int64()),
            "mean_luma": pa.array(np.round(ml).astype(np.int64)),
        })

    return feats.map_batches(finish, batch_format="pyarrow")


SQL_MEDIA_VIDEO_FEATURES = """
SELECT 'v' || doc_id AS media_id,
       CAST(16 + (doc_id % 16) * 2 AS BIGINT) AS width,
       CAST(16 + ((doc_id // 3) % 16) * 2 AS BIGINT) AS height,
       CAST(2 + doc_id % 5 AS BIGINT) AS n_frames,
       CAST(24 + doc_id % 2 AS BIGINT) AS fps_num,
       CAST(doc_id % 256 AS BIGINT) AS mean_luma
FROM documents
"""


def q_profile_docs(sf_dir: str):
    """Generic column profiler (the data-quality dashboard table): for
    each profiled column — n_null, n_distinct, min, max — in long
    format (column, metric, value-as-string). Per-batch partials carry
    (nulls, batch-distincts, batch min/max); the only exchange is the
    two-stage distinct, bounded by each column's cardinality."""
    from cosmos_ray.functions.sketch import distinct_count_exact
    from cosmos_ray.queries.relational import collect_small

    cols = ["doc_id", "lang", "source", "n_chars"]
    docs = read(sf_dir, "documents", cols)
    rows: list[tuple[str, str, str]] = []
    for c in cols:
        one = docs.select_columns([c])
        nulls = one.map_batches(
            lambda t, _c=c: pa.table({
                "n": pa.array([t.column(_c).null_count], pa.int64())}),
            batch_format="pyarrow").sum("n")
        # two-stage distinct: one row per distinct value, then count
        dd = (one.groupby(c).aggregate(Count(alias_name="__n"))
              .drop_columns(["__n"]))
        nd = dd.count()
        ext = collect_small(dd, cap_rows=5_000_000)
        vals = ext.column(c).to_pylist()
        rows += [(c, "n_null", str(int(nulls or 0))),
                 (c, "n_distinct", str(int(nd))),
                 (c, "min", str(min(vals))),
                 (c, "max", str(max(vals)))]
    return rd.from_arrow(pa.table({
        "column": pa.array([r[0] for r in rows], pa.string()),
        "metric": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.string()),
    }))


SQL_PROFILE_DOCS = """
SELECT * FROM (
  SELECT 'doc_id' AS "column", 'n_null' AS metric,
         CAST(count(*) - count(doc_id) AS VARCHAR) AS value FROM documents
  UNION ALL SELECT 'doc_id', 'n_distinct',
         CAST(count(DISTINCT doc_id) AS VARCHAR) FROM documents
  UNION ALL SELECT 'doc_id', 'min', CAST(min(doc_id) AS VARCHAR) FROM documents
  UNION ALL SELECT 'doc_id', 'max', CAST(max(doc_id) AS VARCHAR) FROM documents
  UNION ALL SELECT 'lang', 'n_null',
         CAST(count(*) - count(lang) AS VARCHAR) FROM documents
  UNION ALL SELECT 'lang', 'n_distinct',
         CAST(count(DISTINCT lang) AS VARCHAR) FROM documents
  UNION ALL SELECT 'lang', 'min', min(lang) FROM documents
  UNION ALL SELECT 'lang', 'max', max(lang) FROM documents
  UNION ALL SELECT 'source', 'n_null',
         CAST(count(*) - count(source) AS VARCHAR) FROM documents
  UNION ALL SELECT 'source', 'n_distinct',
         CAST(count(DISTINCT source) AS VARCHAR) FROM documents
  UNION ALL SELECT 'source', 'min', min(source) FROM documents
  UNION ALL SELECT 'source', 'max', max(source) FROM documents
  UNION ALL SELECT 'n_chars', 'n_null',
         CAST(count(*) - count(n_chars) AS VARCHAR) FROM documents
  UNION ALL SELECT 'n_chars', 'n_distinct',
         CAST(count(DISTINCT n_chars) AS VARCHAR) FROM documents
  UNION ALL SELECT 'n_chars', 'min', CAST(min(n_chars) AS VARCHAR) FROM documents
  UNION ALL SELECT 'n_chars', 'max', CAST(max(n_chars) AS VARCHAR) FROM documents
)
"""


def q_dedup_report(sf_dir: str):
    """One-row dedup-rate dashboard: corpus size, distinct texts, dup
    rows and the duplication rate — the before/after KPI every dedup
    pass reports. Exact two-stage distinct (hash-sized exchange)."""
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()

    def h(t: pa.Table) -> pa.Table:
        import hashlib

        return pa.table({"hh": pa.array(
            [hashlib.md5(x.encode()).hexdigest() for x in
             t.column("text").to_pylist()], pa.string())})

    nd = (docs.map_batches(h, batch_format="pyarrow")
          .groupby("hh").aggregate(Count(alias_name="__n")).count())
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_distinct_texts": pa.array([nd], pa.int64()),
        "n_dup_rows": pa.array([n - nd], pa.int64()),
        "dup_rate": pa.array([round((n - nd) / n, 6)], pa.float64()),
    }))


SQL_DEDUP_REPORT = """
SELECT count(*) AS n_docs,
       count(DISTINCT text) AS n_distinct_texts,
       count(*) - count(DISTINCT text) AS n_dup_rows,
       round((count(*) - count(DISTINCT text)) * 1.0 / count(*), 6)
           AS dup_rate
FROM documents
"""


def q_copurchase_pairs(sf_dir: str):
    """Co-purchase affinity: the 20 most frequent part pairs appearing
    in the same order — the recommender's co-occurrence table at the
    real join key (orders), not the tiny type vocabulary. Pair fan-out
    is per-order (bounded by lines-per-order^2) and pre-counted in the
    bucket before the global pair rollup; top-k is one tiny sort."""
    from cosmos_ray.queries.relational import bucketed_group_apply, topk

    li = read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, h in g.groupby("l_orderkey", sort=False):
            p = np.sort(h["l_partkey"].unique())
            if len(p) < 2:
                continue
            i, j = np.triu_indices(len(p), k=1)
            out_a.append(p[i])
            out_b.append(p[j])
        if not out_a:
            return pd.DataFrame({"part_a": pd.Series([], dtype=np.int64),
                                 "part_b": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        d = pd.DataFrame({"part_a": np.concatenate(out_a),
                          "part_b": np.concatenate(out_b)})
        return (d.groupby(["part_a", "part_b"], sort=False)
                .size().rename("c").reset_index())

    counts = (bucketed_group_apply(li, ["l_orderkey"], pairs)
              .groupby(["part_a", "part_b"])
              .aggregate(Sum("c", alias_name="n_orders")))

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({
            "part_a": t.column("part_a").cast(pa.int64()),
            "part_b": t.column("part_b").cast(pa.int64()),
            "n_orders": t.column("n_orders").cast(pa.int64()),
        })

    return topk(counts.map_batches(fix, batch_format="pyarrow"),
                [("n_orders", True), ("part_a", False), ("part_b", False)], 20)


SQL_COPURCHASE_PAIRS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""


def q_gap_quantiles(sf_dir: str):
    """Composition: per-user inter-event gaps (lag) -> exact discrete
    gap quantiles per event_type (p50/p90/p99) — the latency-percentile
    rollup every stream monitor runs. Gaps need one user-hash exchange;
    quantiles one coarse type bucket."""
    from cosmos_ray.functions.windows import _bucketed_by_user
    from cosmos_ray.queries.relational import group_quantiles

    ev = read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        user = g["user_id"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = user[1:] == user[:-1]
        gap = np.zeros(len(g), dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        return pd.DataFrame({"event_type": g["event_type"].to_numpy()[same],
                             "gap_us": gap[same]})

    g = _bucketed_by_user(ev, gaps)
    return group_quantiles(g, ["event_type"], "gap_us",
                           qs=(0.5, 0.9, 0.99))


SQL_GAP_QUANTILES = """
WITH l AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_type,
       quantile_disc(gap_us, 0.5) AS q50,
       quantile_disc(gap_us, 0.9) AS q90,
       quantile_disc(gap_us, 0.99) AS q99
FROM l WHERE gap_us IS NOT NULL
GROUP BY 1
"""


def q_peak_concurrency(sf_dir: str):
    """Peak concurrent sessions (sweep-line over intervals): sessions
    from the gap rule, each contributing +1 at its start and -1 just
    after its end; the running sum's max is the peak, reported with the
    first instant it is reached. The delta stream is 2 rows per session
    (session-bounded, not event-bounded); the scan is one distributed
    sort + a days-bounded driver cumsum under the usual cap."""
    from cosmos_ray.functions.windows import _bucketed_by_user
    from cosmos_ray.queries.relational import collect_small

    ev = read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def sess_bounds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        user = g["user_id"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap = np.zeros(len(g), dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        new_session = new_user | (gap > 1800 * 1_000_000)
        sid = np.cumsum(new_session)
        d = pd.DataFrame({"sid": sid, "ts": ts_us})
        b = d.groupby("sid").agg(t0=("ts", "min"), t1=("ts", "max"))
        return pd.DataFrame({"t0": b["t0"].to_numpy(),
                             "t1": b["t1"].to_numpy()})

    bounds = _bucketed_by_user(ev, sess_bounds)

    def deltas(t: pa.Table) -> pa.Table:
        t0 = t.column("t0").to_numpy(zero_copy_only=False)
        t1 = t.column("t1").to_numpy(zero_copy_only=False)
        return pa.table({
            "ts_us": pa.array(np.concatenate([t0, t1 + 1]), pa.int64()),
            "delta": pa.array(np.concatenate([
                np.ones(len(t0), np.int64),
                -np.ones(len(t1), np.int64)]), pa.int64()),
        })

    # pre-aggregate per (ts, delta) so the pulled stream is bounded by
    # distinct boundary instants, then exact driver sweep
    agg = (bounds.map_batches(deltas, batch_format="pyarrow")
           .groupby(["ts_us", "delta"]).aggregate(Count(alias_name="c")))
    tbl = collect_small(agg, cap_rows=2_000_000)
    if tbl is None:
        raise ValueError("boundary stream exceeded the driver cap")
    df = tbl.to_pandas().sort_values(["ts_us", "delta"])  # ends before starts
    run = (df["delta"] * df["c"]).cumsum()
    peak = int(run.max())
    at = int(df["ts_us"].to_numpy()[int(np.argmax(run.to_numpy()))])
    return rd.from_arrow(pa.table({
        "peak": pa.array([peak], pa.int64()),
        "at_ts_us": pa.array([at], pa.int64()),
    }))


SQL_PEAK_CONCURRENCY = """
WITH l AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_ts
  FROM events),
s AS (
  SELECT user_id, ts_us,
         SUM(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
                  THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts_us
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM l),
b AS (SELECT user_id, sid, min(ts_us) AS t0, max(ts_us) AS t1
      FROM s GROUP BY 1, 2),
d AS (SELECT t0 AS ts_us, CAST(1 AS BIGINT) AS delta FROM b
      UNION ALL
      SELECT t1 + 1, -1 FROM b),
r AS (SELECT ts_us, delta,
             SUM(delta) OVER (ORDER BY ts_us, delta
                              ROWS UNBOUNDED PRECEDING) AS run
      FROM d)
SELECT CAST(max(run) AS BIGINT) AS peak,
       (SELECT min(ts_us) FROM r
        WHERE run = (SELECT max(run) FROM r)) AS at_ts_us
FROM r
"""


def q_source_prior(sf_dir: str):
    """Bayesian-shrunk per-source quality prior (empirical Bayes, the
    'rate small sources sanely' staple): each source's mean
    stopword_ratio shrunk toward the global mean with m=20
    pseudo-counts — shrunk = (sum + m*global)/(n + m). Per-doc ratios
    are the ROUNDED quality features both engines already agree on, so
    only summation order differs (1e-13 under the 6dp round)."""
    from cosmos_ray.functions.textops import quality_score_batch

    docs = read(sf_dir, "documents", ["doc_id", "source", "text"])

    def ratios(t: pa.Table) -> pa.Table:
        q = quality_score_batch(t.select(["doc_id", "text"]))
        return pa.table({"source": t.column("source"),
                         "r": q.column("stopword_ratio")})

    per_doc = docs.map_batches(ratios, batch_format="pyarrow")
    agg = per_doc.groupby("source").aggregate(
        Sum("r", alias_name="s"), Count(alias_name="n"))
    tot = per_doc.sum("r")
    cnt = per_doc.count()
    g = tot / cnt
    M = 20.0

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "source": t.column("source"),
            "n_docs": t.column("n").cast(pa.int64()),
            "mean_ratio": pa.array(np.round(s / n, 6), pa.float64()),
            "shrunk_ratio": pa.array(np.round((s + M * g) / (n + M), 6),
                                     pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_SOURCE_PRIOR = """
WITH r AS (
  SELECT source,
         round(CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN ('the', 'a', 'and', 'of', 'to')))
                    AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1), 6) AS r
  FROM documents),
g AS (SELECT sum(r) / count(*) AS g FROM r)
SELECT source, count(*) AS n_docs,
       round(sum(r) / count(*), 6) AS mean_ratio,
       round((sum(r) + 20.0 * (SELECT g FROM g)) / (count(*) + 20.0), 6)
           AS shrunk_ratio
FROM r GROUP BY 1
"""


def q_key_skew(sf_dir: str):
    """Shuffle-planning skew report (`stats.key_skew_report`): the 10
    hottest user_ids with row count and corpus share — the
    salt-or-not diagnostic run before keyed exchanges."""
    from cosmos_ray.functions.stats import key_skew_report

    return key_skew_report(read(sf_dir, "events", ["user_id"]),
                           "user_id", top=10)


SQL_KEY_SKEW = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
SELECT user_id, n, round(n / (SELECT total FROM t), 6) AS share
FROM c ORDER BY n DESC, user_id LIMIT 10
"""


def q_pca_embed(sf_dir: str):
    """Distributed PCA (`stats.pca_fit` + `pca_transform`): covariance
    from (n, sum x, sum x^T x) batch partials — dim^2 bytes per batch,
    never the data — eigh on the driver is model-sized, projections one
    broadcast matmul per batch. Eigendecomposition is not
    SQL-expressible; the pytest gate replays the whole fit in plain
    numpy (sign-fixed) and requires matching projections."""
    from cosmos_ray.functions.stats import pca_fit, pca_transform

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    model = pca_fit(ds, k=4)
    return pca_transform(ds, model)


_PCA_Q_SCALE = 1048576.0  # 2^20 — quantization step for the moments oracle


def q_pca_moments(sf_dir: str):
    """The DISTRIBUTED half of PCA, oracle-checked: the scatter-matrix
    moments (n, Σq_i, Σ q_i·q_j for i<=j) that `stats.pca_fit` reduces
    before its driver-side eigh — same (dim + dim²)-per-batch partial
    shape, same associative merge — computed over the deterministic
    integer quantization q = floor(x·2^20 + 0.5) of each float32
    coordinate so the accumulation is EXACT integer arithmetic DuckDB
    replays bit-identically (the `hash_embed_long` trick). eigh itself
    stays under the pytest numpy replay; with this, pca_embed's only
    unverified-by-SQL piece is the model-sized driver eigendecomposition.

    Output is dim-bounded (dim·(dim+1)/2 = 2080 rows at dim=64) at any
    corpus size; each batch contributes one dim²-int partial."""
    ds = read(sf_dir, "embeddings", ["embedding"])
    dim = 64

    def partial(t: pa.Table) -> pa.Table:
        X = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        X = X.reshape(-1, dim)  # keep 2-D on a zero-row block
        Q = np.floor(X * _PCA_Q_SCALE + 0.5).astype(np.int64)
        return pa.table({
            "n": pa.array([len(Q)], pa.int64()),
            "s": pa.array([Q.sum(axis=0).tolist()], pa.list_(pa.int64())),
            "ss": pa.array([(Q.T @ Q).ravel().tolist()],
                           pa.list_(pa.int64()))})

    n = 0
    s = np.zeros(dim, dtype=np.int64)
    ss = np.zeros((dim, dim), dtype=np.int64)
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        n += int(np.sum(b.column("n").to_numpy(zero_copy_only=False)))
        for row in b.column("s").to_pylist():
            s += np.asarray(row, dtype=np.int64)
        for row in b.column("ss").to_pylist():
            ss += np.asarray(row, dtype=np.int64).reshape(dim, dim)
    iu, ju = np.triu_indices(dim)
    return pa.table({
        "i": pa.array(iu.astype(np.int64)),
        "j": pa.array(ju.astype(np.int64)),
        "n": pa.array(np.full(len(iu), n, dtype=np.int64)),
        "s_i": pa.array(s[iu]), "s_j": pa.array(s[ju]),
        "sxx": pa.array(ss[iu, ju])})


SQL_PCA_MOMENTS = """
WITH e AS (
  SELECT vec_id,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0 + 0.5)
              AS BIGINT) AS q,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i
  FROM embeddings
), s AS (SELECT i, CAST(sum(q) AS BIGINT) AS s FROM e GROUP BY i),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
SELECT a.i AS i, b.i AS j, (SELECT n FROM n) AS n,
       sa.s AS s_i, sb.s AS s_j,
       CAST(sum(a.q * b.q) AS BIGINT) AS sxx
FROM e a
JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
JOIN s sa ON sa.i = a.i
JOIN s sb ON sb.i = b.i
GROUP BY a.i, b.i, sa.s, sb.s
"""


def q_events_range_scan(sf_dir: str):
    """Time-slice scan over SORTED at-rest storage with zone-map
    pruning (`state.sorted_store`): events written once in ts order,
    the Jan-10..15 slice read via the footer-stats manifest — only
    overlapping files open (~1/5 of the store); residual filter keeps
    it exact. Counts per type over the slice."""
    import datetime
    import tempfile

    from cosmos_ray.state.sorted_store import read_range, write_sorted

    store = tempfile.mkdtemp(prefix="sorted_", dir="/tmp")
    write_sorted(read(sf_dir, "events", ["event_type", "ts"]), "ts", store,
                 num_partitions=16)
    lo = int(datetime.datetime(2024, 1, 10,
                               tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    hi = int(datetime.datetime(2024, 1, 15, 23, 59, 59, 999999,
                               tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    epoch = datetime.datetime(1970, 1, 1)
    ds = read_range(store, lo, hi,
                    key_scalar=lambda us: epoch
                    + datetime.timedelta(microseconds=us))
    return ds.groupby("event_type").aggregate(Count(alias_name="n"))


SQL_EVENTS_RANGE_SCAN = """
SELECT event_type, count(*) AS n FROM events
WHERE ts >= TIMESTAMP '2024-01-10'
  AND ts <= TIMESTAMP '2024-01-15 23:59:59.999999'
GROUP BY 1
"""


def q_copart_join_revenue(sf_dir: str):
    """The SAME revenue-per-status join served SHUFFLE-FREE from
    co-partitioned at-rest tables (`state.copartition`): orders and
    lineitem are written once as bucket-aligned hive partitions, then
    the join is K independent bucket-local merges — the pay-the-
    exchange-once pattern (Hive/Spark bucketed tables) for joins that
    repeat at 100 TB. Shares order_lineitem_join's SQL oracle shape."""
    import os
    import tempfile

    from cosmos_ray.state.copartition import join_copartitioned, write_bucketed

    base = tempfile.mkdtemp(prefix="copart_", dir="/tmp")
    da, db = os.path.join(base, "orders"), os.path.join(base, "lineitem")
    write_bucketed(read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]),
                   "o_orderkey", da, num_buckets=16)
    write_bucketed(read(sf_dir, "lineitem",
                        ["l_orderkey", "l_extendedprice", "l_discount"]),
                   "l_orderkey", db, num_buckets=16)
    joined = join_copartitioned(da, db, "o_orderkey", "l_orderkey",
                                num_buckets=16)

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"o_orderstatus": t.column("o_orderstatus"), "rev": r})

    agg = (joined.map_batches(rev, batch_format="pyarrow")
           .groupby("o_orderstatus")
           .aggregate(Sum("rev", alias_name="revenue"),
                      Count(alias_name="n_items")))
    return agg.map_batches(
        lambda t: pa.table({
            "o_orderstatus": t.column("o_orderstatus"),
            "revenue": pa.array(np.round(
                t.column("revenue").to_numpy(zero_copy_only=False), 4),
                pa.float64()),
            "n_items": t.column("n_items").cast(pa.int64()),
        }), batch_format="pyarrow")


SQL_COPART_JOIN_REVENUE = """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q_order_lineitem_join(sf_dir: str):
    """Large-large hash join via native ``Dataset.join`` (hash-partitioned
    on the key — the non-broadcast join shape, J5): revenue per order
    status from orders ⨝ lineitem."""
    orders = read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    items = read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "rev": r})

    joined = orders.join(
        items.map_batches(rev, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=16,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    agg = joined.groupby("o_orderstatus").aggregate(
        Sum("rev", alias_name="revenue"), Count(alias_name="n_items")
    )
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("revenue"), "revenue",
                               pc.round(t.column("revenue"), 2, round_mode="half_towards_infinity")),
        batch_format="pyarrow",
    )


SQL_ORDER_LINEITEM_JOIN = """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
"""


def q_phrase_search(sf_dir: str):
    """Filtered phrase search over documents (ES match_phrase analog,
    `elastic_retriever.py:260-273`)."""
    docs = read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    return docs.map_batches(
        lambda t: t.filter(pc.match_substring(t.column("text"), "spark join"))
        .drop_columns(["text"]),
        batch_format="pyarrow",
    )


SQL_PHRASE_SEARCH = """
SELECT doc_id, lang, n_chars FROM documents WHERE contains(text, 'spark join')
"""


def q_substring_lookup(sf_dir: str):
    """Substring (LIKE '%needle%') search served from the at-rest
    byte-trigram index (`state/trigram.py`, the pg_trgm analog):
    the corpus is written once into hash file-parts plus a distinct
    (trigram, part) posting table; the query intersects its trigrams'
    part sets and scans ONLY candidate parts with a vectorized
    residual — exact rows, pruned read. The full-scan sibling is
    phrase_search; this is the indexed form."""
    import tempfile

    from cosmos_ray.state.trigram import build_trigram_index, substring_search

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    idx = tempfile.mkdtemp(prefix="trigram_", dir="/tmp")
    build_trigram_index(docs, idx)
    return substring_search(idx, "spark join")


SQL_SUBSTRING_LOOKUP = """
SELECT doc_id FROM documents WHERE contains(text, 'spark join')
"""


def q_count_by_lang(sf_dir: str):
    docs = read(sf_dir, "documents", ["doc_id", "lang"])
    return docs.groupby("lang").aggregate(Count(alias_name="n_docs"))


SQL_COUNT_BY_LANG = "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: per (event_type, hour) count + sum.
    Window = epoch-hour bucket (streaming-shaped workload in batch form,
    ray_guide 'Streaming-shaped workloads')."""
    ev = read(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(t.column("ts"), pa.int64()), 3_600_000_000)
        return pa.table(
            {"event_type": t.column("event_type"), "hour": hour, "value": t.column("value")}
        )

    agg = ev.map_batches(bucket, batch_format="pyarrow").groupby(
        ["event_type", "hour"]
    ).aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("sum_value"), "sum_value",
                               pc.round(t.column("sum_value"), 4, round_mode="half_towards_infinity")),
        batch_format="pyarrow",
    )


SQL_EVENTS_HOURLY = """
SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, hour
"""


def q_events_hourly_incremental(sf_dir: str):
    """Incremental materialized-view maintenance
    (`functions/matview.py`, the Z-set/DBSP signed-delta algebra): the
    hourly count/sum view is built from 80% of events (event_id % 5 <
    4), then refreshed from a SIGNED delta — the remaining events as
    +1 inserts and every event_id % 10 == 0 row as a -1 RETRACTION
    (those live in the base, so the refresh must subtract, and an
    hour fully retracted must leave the view). The maintained result
    must equal a full recompute over (events minus retracted) — which
    is exactly what the oracle states. Sums ride as integer
    micro-units so incremental and recompute are bit-identical."""
    from cosmos_ray.functions.matview import delta_partials, maintain_view

    ev = read(sf_dir, "events", ["event_id", "ts", "value"])

    def prep(which: str):
        def f(t: pa.Table) -> pa.Table:
            eid = t.column("event_id").to_numpy(zero_copy_only=False)
            ts = (t.column("ts").cast(pa.timestamp("us"))
                  .to_numpy(zero_copy_only=False).astype("datetime64[us]")
                  .astype(np.int64))
            vm = np.floor(
                t.column("value").to_numpy(zero_copy_only=False) * 1e6
                + 0.5).astype(np.int64)
            hour = (ts // 3_600_000_000) * 3_600_000_000
            if which == "base":
                m = eid % 5 < 4
                sign = np.ones(int(m.sum()), np.int64)
            else:  # inserts eid%5==4 (+1), retractions eid%10==0 (-1)
                m = (eid % 5 == 4) | (eid % 10 == 0)
                sign = np.where(eid[m] % 10 == 0, -1, 1).astype(np.int64)
            return pa.table({"hour_us": pa.array(hour[m]),
                             "sign": pa.array(sign),
                             "svm": pa.array(vm[m])})

        return f

    from ray.data.aggregate import Sum as _Sum

    base_view = (delta_partials(
        ev.map_batches(prep("base"), batch_format="pyarrow"),
        ["hour_us"], ["svm"])
        .groupby("hour_us")
        .aggregate(_Sum("n", alias_name="n"), _Sum("svm", alias_name="svm")))
    delta = ev.map_batches(prep("delta"), batch_format="pyarrow")
    out = maintain_view(base_view, delta, ["hour_us"], ["svm"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "hour_us": t.column("hour_us"),
            "n_events": t.column("n").cast(pa.int64()),
            "sum_value": pa.array(
                t.column("svm").to_numpy(zero_copy_only=False) / 1e6,
                pa.float64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_HOURLY_INCREMENTAL = """
WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
  FROM events WHERE event_id % 10 <> 0)
SELECT hour_us, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(vm) AS DOUBLE) / 1000000.0 AS sum_value
FROM e GROUP BY 1
"""


def q_order_window_overlaps(sf_dir: str):
    """INTERVAL-OVERLAP self-join (the temporal-join member SQL writes
    as ``a.lo <= b.hi AND b.lo <= a.hi``): each order spans the 8-day
    window [date, date+7]; emit every same-customer order pair whose
    windows overlap, with the overlap length in days. Shape: one
    customer-hash bucket exchange co-locates each key, then the
    in-group sweep is fully vectorized — sort by day, one
    ``searchsorted`` finds each interval's last overlapping neighbor,
    and the pair list materializes via repeat/offset arithmetic (no
    per-pair Python). Per-key output is quadratic in co-window orders
    — inherent to the join's own semantics, bounded here by orders per
    customer per week."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        d = (t.column("o_orderdate").cast(pa.timestamp("us"))
             .to_numpy(zero_copy_only=False).astype("datetime64[us]")
             .astype(np.int64) // 86_400_000_000)
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "o_orderkey": t.column("o_orderkey"),
                         "day": pa.array(d, pa.int64())})

    def in_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["day", "o_orderkey"], kind="stable")
        d = g["day"].to_numpy(np.int64)
        k = g["o_orderkey"].to_numpy(np.int64)
        n = len(d)
        if n < 2:
            return pa.table({"custkey": pa.array([], pa.int64()),
                             "order_a": pa.array([], pa.int64()),
                             "order_b": pa.array([], pa.int64()),
                             "overlap_days": pa.array([], pa.int64())})
        hi = np.searchsorted(d, d + 7, side="right")
        cnt = hi - np.arange(n) - 1
        total = int(cnt.sum())
        ia = np.repeat(np.arange(n), cnt)
        offs = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
        ib = ia + 1 + offs
        a, b = k[ia], k[ib]
        return pd.DataFrame({
            "custkey": np.full(total, g["o_custkey"].iloc[0] if n else 0,
                               np.int64),
            "order_a": np.minimum(a, b), "order_b": np.maximum(a, b),
            "overlap_days": 8 - (d[ib] - d[ia])})

    return bucketed_group_apply(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"], in_group)


SQL_ORDER_WINDOW_OVERLAPS = """
WITH o AS (SELECT o_orderkey AS k, o_custkey AS c,
                  epoch_us(o_orderdate) // 86400000000 AS d
           FROM orders)
SELECT a.c AS custkey, least(a.k, b.k) AS order_a,
       greatest(a.k, b.k) AS order_b,
       CAST(8 - abs(a.d - b.d) AS BIGINT) AS overlap_days
FROM o a JOIN o b
  ON b.c = a.c AND a.k < b.k AND abs(a.d - b.d) <= 7
"""


def q_big_spenders(sf_dir: str):
    """Semi-join: customers having at least one order above 300k
    (broadcast key-set filter; ES doc-filter semi-join analog,
    `elastic_retriever.py:260-310`)."""
    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), pa.scalar(300000.0)))
        .select(["o_custkey"]),
        batch_format="pyarrow",
    )
    customer = read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    return semi_join_ds(customer, big, key_col="o_custkey", big_key="c_custkey")


SQL_BIG_SPENDERS = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


def q_region_customers(sf_dir: str):
    """3-way dimension join via chained broadcast lookups."""
    customer = read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    nation = read(sf_dir, "nation")
    region = read(sf_dir, "region")
    withn = join_or_broadcast(customer, nation, key="n_nationkey",
                              add_cols=["n_regionkey"], big_key="c_nationkey")
    withr = join_or_broadcast(withn, region, key="r_regionkey",
                              add_cols=["r_name"], big_key="n_regionkey")
    agg = withr.groupby("r_name").aggregate(
        Count(alias_name="n_customers"), Mean("c_acctbal", alias_name="avg_acctbal")
    )
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("avg_acctbal"), "avg_acctbal",
                               pc.round(t.column("avg_acctbal"), 6, round_mode="half_towards_infinity")),
        batch_format="pyarrow",
    )


SQL_REGION_CUSTOMERS = """
SELECT r_name, count(*) AS n_customers, round(avg(c_acctbal), 6) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_customer_order_counts(sf_dir: str):
    """Per-customer order counts INCLUDING zero-order customers — the
    left-outer-join tier (`relational.left_join_or_broadcast`: broadcast
    lookup with fill under the cap, distributed left_outer join past
    it)."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import left_join_or_broadcast

    cust = read(sf_dir, "customer", ["c_custkey"])
    counts = (read(sf_dir, "orders", ["o_custkey"])
              .groupby("o_custkey").aggregate(Count(alias_name="n_orders")))
    return left_join_or_broadcast(cust, counts, key="o_custkey",
                                  add_cols=["n_orders"],
                                  big_key="c_custkey", fill=0)


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c.c_custkey, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) cnt
ON cnt.o_custkey = c.c_custkey
"""


def q_customers_no_orders(sf_dir: str):
    """Anti-join: customers with no order above 400k (broadcast key-set
    filter, keep=False)."""
    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), pa.scalar(400000.0)))
        .select(["o_custkey"]),
        batch_format="pyarrow",
    )
    customer = read(sf_dir, "customer", ["c_custkey", "c_name"])
    return semi_join_ds(customer, big, key_col="o_custkey", big_key="c_custkey",
                        keep=False)


SQL_CUSTOMERS_NO_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def q_distinct_pairs(sf_dir: str):
    """Distinct (lang, source) combinations (set-op / unique shape)."""
    docs = read(sf_dir, "documents", ["lang", "source"])
    return docs.groupby(["lang", "source"]).aggregate(Count(alias_name="n")).drop_columns(["n"])


SQL_DISTINCT_PAIRS = "SELECT DISTINCT lang, source FROM documents"


def q_median_order(sf_dir: str):
    """Exact median order value per priority — a holistic aggregate that
    needs the whole group (groupby + in-group numpy), vs the mergeable
    sums elsewhere."""
    import pandas as pd

    ds = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    import math

    def med(g: pd.DataFrame) -> pd.DataFrame:
        m = float(np.median(g["o_totalprice"]))
        # DuckDB's round() is half-away-from-zero; python's is half-even
        m = math.floor(m * 100 + 0.5) / 100
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "median_price": [m],
                "n_orders": [len(g)],
            }
        )

    return ds.groupby("o_orderpriority").map_groups(med, batch_format="pandas")


SQL_MEDIAN_ORDER = """
SELECT o_orderpriority, round(median(o_totalprice), 2) AS median_price,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def q_top2_orders_per_segment(sf_dir: str):
    """Top-k per group (window rank): the 2 largest orders per market
    segment, deterministic tie-break by key."""
    import pandas as pd

    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = join_or_broadcast(orders, customer, key="c_custkey",
                               add_cols=["c_mktsegment"], big_key="o_custkey")

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="stable").head(2)
        g = g.copy()
        g["rnk"] = range(1, len(g) + 1)
        return g[["c_mktsegment", "o_orderkey", "o_totalprice", "rnk"]]

    return joined.groupby("c_mktsegment").map_groups(top2, batch_format="pandas")


SQL_TOP2_ORDERS_PER_SEGMENT = """
SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rnk <= 2
"""


# --------------------------------------------------------------------------
# Text-analysis / training-data operators over `documents`
# --------------------------------------------------------------------------


def q_token_counts(sf_dir: str):
    from cosmos_ray.functions.textops import token_counts

    return token_counts(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       len(string_split(text, ' '))  AS n_tokens,
       length(text)                  AS n_chars_measured
FROM documents
"""


def q_quality(sf_dir: str):
    from cosmos_ray.functions.textops import quality_scores

    return quality_scores(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_QUALITY = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             / greatest(len(string_split(text, ' ')), 1), 6) AS mean_token_len,
       round(CAST(len(list_filter(string_split(text, ' '),
                                  x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
             / greatest(len(string_split(text, ' ')), 1), 6) AS stopword_ratio,
       (len(string_split(text, ' ')) >= 10 AND
        CAST(len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        / greatest(len(string_split(text, ' ')), 1) <= 0.5) AS keep
FROM documents
"""


def q_regex_tokens(sf_dir: str):
    """BPE-ish regex token counts (letter runs / digit runs / punct)."""
    from cosmos_ray.functions.textops import regex_token_counts

    return regex_token_counts(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_REGEX_TOKENS = """
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_regex_tokens
FROM documents
"""


def q_rolling_fp(sf_dir: str):
    """Rolling-hash (winnowing-style) document fingerprints; the 62-bit
    Rabin-Karp arithmetic replays exactly in SQL (ASCII corpus)."""
    from cosmos_ray.functions.textops import rolling_fingerprints

    return rolling_fingerprints(read(sf_dir, "documents", ["doc_id", "text"]))


def _sql_rolling_fp() -> str:
    """DuckDB replay of ``rolling_fingerprint`` (window=16): per-position
    base-257 Mersenne-31 window hashes over the text BYTES (== ``ord`` of
    chars on this ASCII corpus), argmin with first-occurrence ties
    (min_by key = h*2^20 + i, valid for docs under 1 MiB), then the
    independent base-263 hash of the winning window; fp = h1<<31 | h2.
    Assumes every doc is >= 16 bytes (corpus min is 48)."""
    from cosmos_ray.functions.textops import _ROLL_BASE, _ROLL_BASE2, _ROLL_MOD

    W = 16
    pow1 = [pow(_ROLL_BASE, W - 1 - k, _ROLL_MOD) for k in range(W)]
    pow2 = [pow(_ROLL_BASE2, W - 1 - k, _ROLL_MOD) for k in range(W)]
    h1_terms = " + ".join(
        f"ord(substr(text, i+{k}, 1))::HUGEINT * {pow1[k]}" for k in range(W))
    h2_terms = " + ".join(
        f"ord(substr(d.text, w.j+{k}, 1))::HUGEINT * {pow2[k]}" for k in range(W))
    return f"""
WITH pos AS (SELECT doc_id, text,
                    unnest(range(1, length(text) - {W} + 2)) AS i
             FROM documents),
h1 AS (SELECT doc_id, i, CAST(({h1_terms}) % {_ROLL_MOD} AS UBIGINT) AS h
       FROM pos),
win AS (SELECT doc_id, min_by(i, h * 1048576 + i) AS j, min(h) AS h1min
        FROM h1 GROUP BY doc_id),
fp AS (SELECT w.doc_id,
              (w.h1min << 31) | CAST(({h2_terms}) % {_ROLL_MOD} AS UBIGINT)
                AS rolling_fp
       FROM win w JOIN documents d ON d.doc_id = w.doc_id)
SELECT doc_id, rolling_fp FROM fp
"""


SQL_ROLLING_FP = _sql_rolling_fp()


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking (rsync/LBFS boundary rule) — sub-document
    chunk spans + md5 chunk ids for chunk-level dedup
    (`textops.cdc_chunks`; stateless map, no exchange)."""
    from cosmos_ray.functions.textops import cdc_chunks

    return cdc_chunks(read(sf_dir, "documents", ["doc_id", "text"]))


def _sql_cdc_chunks(window: int = 16, modulus: int = 64) -> str:
    """Replay of ``cdc_chunk_batch``: base-257 Mersenne-31 window hashes
    over text bytes (ASCII corpus), a cut after byte i+W-1 wherever
    h % modulus == 0, chunk spans from lagged cut ends plus a tail
    chunk, chunk ids = md5 of the substring."""
    from cosmos_ray.functions.textops import _ROLL_BASE, _ROLL_MOD

    W = window
    pow1 = [pow(_ROLL_BASE, W - 1 - k, _ROLL_MOD) for k in range(W)]
    h_terms = " + ".join(
        f"ord(substr(text, i+{k}, 1))::HUGEINT * {pow1[k]}" for k in range(W))
    return f"""
WITH pos AS (SELECT doc_id, text,
                    unnest(range(1, greatest(length(text) - {W} + 2, 1))) AS i
             FROM documents WHERE length(text) > 0),
h AS (SELECT doc_id, i, CAST(({h_terms}) % {_ROLL_MOD} AS UBIGINT) AS h
      FROM pos),
cuts AS (SELECT doc_id, i + {W} - 1 AS e FROM h WHERE h % {modulus} = 0),
nume AS (SELECT doc_id, e,
                row_number() OVER (PARTITION BY doc_id ORDER BY e) AS rn
         FROM cuts),
ch AS (SELECT doc_id, rn - 1 AS chunk_idx,
              COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s,
              e
       FROM nume),
lastc AS (SELECT d.doc_id, COALESCE(max(n.rn), 0) AS nc,
                 COALESCE(max(n.e), 0) AS laste, length(d.text) AS L
          FROM documents d LEFT JOIN nume n USING (doc_id)
          WHERE length(d.text) > 0
          GROUP BY d.doc_id, length(d.text)),
tail AS (SELECT doc_id, nc AS chunk_idx, laste + 1 AS s, L AS e
         FROM lastc WHERE laste < L),
allc AS (SELECT * FROM ch UNION ALL SELECT * FROM tail)
SELECT a.doc_id, a.chunk_idx::BIGINT AS chunk_idx,
       (a.s - 1)::BIGINT AS chunk_start, (a.e - 1)::BIGINT AS chunk_end,
       md5(substr(d.text, a.s, a.e - a.s + 1)) AS chunk_hash
FROM allc a JOIN documents d USING (doc_id)
"""


SQL_CDC_CHUNKS = _sql_cdc_chunks()


def q_subdoc_dedup(sf_dir: str):
    """Chunk-level exact substring dedup: CDC chunks duplicated anywhere
    in the corpus are removed except their first (doc_id, chunk_idx)
    occurrence; docs rewritten from kept chunks
    (`dedup.subdoc_dedup` — Lee et al. 2022 at CDC granularity)."""
    from cosmos_ray.functions.dedup import subdoc_dedup

    return subdoc_dedup(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_SUBDOC_DEDUP = f"""
WITH cdc AS ({SQL_CDC_CHUNKS}),
occ AS (SELECT doc_id, chunk_start, chunk_end, chunk_hash,
               doc_id * 4294967296 + chunk_idx AS packed
        FROM cdc),
win AS (SELECT chunk_hash, min(packed) AS win FROM occ GROUP BY chunk_hash),
flag AS (SELECT o.doc_id, o.chunk_start, o.chunk_end,
                CASE WHEN o.packed = w.win THEN 1 ELSE 0 END AS kept
         FROM occ o JOIN win w USING (chunk_hash)),
agg AS (SELECT f.doc_id,
               coalesce(string_agg(
                   substr(d.text, f.chunk_start + 1,
                          f.chunk_end - f.chunk_start + 1), ''
                   ORDER BY f.chunk_start) FILTER (WHERE f.kept = 1),
                   '') AS dedup_text,
               sum(f.kept)::BIGINT AS n_kept,
               (count(*) - sum(f.kept))::BIGINT AS n_removed
        FROM flag f JOIN documents d USING (doc_id)
        GROUP BY f.doc_id)
SELECT d.doc_id,
       coalesce(a.dedup_text, '') AS dedup_text,
       coalesce(a.n_kept, 0)::BIGINT AS n_kept,
       coalesce(a.n_removed, 0)::BIGINT AS n_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_exact_substring_dedup(sf_dir: str):
    """EXACT substring dedup at character granularity (Lee et al. 2022
    ExactSubstr, full semantics — not the CDC-chunk approximation of
    `subdoc_dedup`): every position covered by a 40-char window whose
    content occurs at a smaller (doc_id, pos) anywhere in the corpus is
    removed; duplicated spans are caught wherever they fall, including
    straddling any chunk boundary (`dedup.exact_substring_dedup`)."""
    from cosmos_ray.functions.dedup import exact_substring_dedup

    return exact_substring_dedup(read(sf_dir, "documents",
                                      ["doc_id", "text"]))


_ESD_L = 40

SQL_EXACT_SUBSTRING_DEDUP = f"""
WITH w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         substr(text, CAST(i AS INT), {_ESD_L}) AS win
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - {_ESD_L} + 1)) AS i
        FROM documents WHERE length(text) >= {_ESD_L})),
g AS (SELECT win, min(doc_id * 4294967296 + (i - 1)) AS winner
      FROM w GROUP BY win),
lost AS (
  SELECT w.doc_id, w.i - 1 AS pos
  FROM w JOIN g ON g.win = w.win
  WHERE w.doc_id * 4294967296 + (w.i - 1) <> g.winner),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  > {_ESD_L} THEN 1 ELSE 0 END AS brk
  FROM lost),
isl2 AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM isl),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + {_ESD_L} AS e
  FROM isl2 GROUP BY doc_id, island),
segs AS (
  SELECT doc_id, s, e,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
           AS keep_from
  FROM spans),
agg AS (
  SELECT sg.doc_id,
         string_agg(substr(d.text, CAST(sg.keep_from + 1 AS INT),
                           CAST(sg.s - sg.keep_from AS INT)), ''
                    ORDER BY sg.s) AS head_part,
         max(sg.e) AS last_e,
         count(*)::BIGINT AS n_spans,
         sum(sg.e - sg.s)::BIGINT AS chars_removed
  FROM segs sg JOIN documents d USING (doc_id)
  GROUP BY sg.doc_id)
SELECT d.doc_id,
       CASE WHEN a.doc_id IS NULL THEN d.text
            ELSE a.head_part || substr(d.text, CAST(a.last_e + 1 AS INT))
       END AS dedup_text,
       coalesce(a.n_spans, 0)::BIGINT AS n_spans,
       coalesce(a.chars_removed, 0)::BIGINT AS chars_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_fingerprints(sf_dir: str):
    from cosmos_ray.functions.textops import fingerprints

    return fingerprints(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_FINGERPRINTS = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def q_ngram_jaccard_adjacent(sf_dir: str):
    """Exact 3-gram Jaccard between each (doc_id, doc_id+1) pair — the
    n-gram-similarity operator with a DuckDB oracle (raw string shingles
    on the SQL side; hashed shingles here — the dedup family's
    token-hash combine (`functions/dedup._shingle_hashes`), identical
    Jaccard statistics at ~2^-64 collision odds). Shape: vectorized
    per-doc shingle hashing (cached token md5s + one numpy combine),
    sorted-unique uint64 sets riding the shifted self-join as binary
    blobs (arrow joins reject list payloads), numpy intersect per pair;
    no driver pull, no per-doc string-set building."""
    from cosmos_ray.functions.dedup import _SH_COEF, _TOKEN_HASHES
    from cosmos_ray.queries.relational import join_or_broadcast

    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def shingles(t: pa.Table) -> pa.Table:
        blobs = []
        for x in t.column("text").to_pylist():
            w = (x or "").split(" ")  # oracle splits on single space
            n = len(w)
            if n < 3:
                blobs.append(b"")  # <3 tokens: empty shingle set
                continue
            th = _TOKEN_HASHES.hashes(w)
            with np.errstate(over="ignore"):
                acc = (th[: n - 2] * _SH_COEF[0]
                       + th[1: n - 1] * _SH_COEF[1]
                       + th[2:] * _SH_COEF[2])
            blobs.append(np.unique(acc).tobytes())
        return pa.table(
            {"doc_id": t.column("doc_id").cast(pa.int64()),
             "sh": pa.array(blobs, pa.binary())}
        )

    a = docs.map_batches(shingles, batch_format="pyarrow")
    b = docs.map_batches(shingles, batch_format="pyarrow").map_batches(
        lambda t: pa.table(
            {"prev_id": pc.subtract(t.column("doc_id"), pa.scalar(1)),
             "sh_b": t.column("sh")}
        ),
        batch_format="pyarrow",
    )
    # guarded-broadcast tier (hash-join degrade past the cap): the
    # shifted side is (id, blob) rows, so under the cap the corpus side
    # never moves and no hash-shuffle actors spin up
    j = join_or_broadcast(a, b, key="prev_id", add_cols=["sh_b"],
                          big_key="doc_id")

    def jac(t: pa.Table) -> pa.Table:
        import math

        sa = t.column("sh").to_pylist()
        sb = t.column("sh_b").to_pylist()
        out = []
        for x, y in zip(sa, sb):
            xs = np.frombuffer(x, dtype=np.uint64)
            ys = np.frombuffer(y, dtype=np.uint64)
            inter = np.intersect1d(xs, ys, assume_unique=True).size
            u = xs.size + ys.size - inter
            # DuckDB round() is half-away-from-zero; python round is
            # half-even (they diverge on exact ties like 1/128).
            # Both-empty (docs under 3 tokens) is NULL on both sides —
            # the oracle's 0/0 via NULLIF, None here.
            out.append(math.floor(inter / u * 1e6 + 0.5) / 1e6 if u else None)
        return pa.table(
            {
                "doc_a": t.column("doc_id"),
                "doc_b": pc.add(t.column("doc_id"), pa.scalar(1)),
                "jaccard": pa.array(out, pa.float64()),
            }
        )

    return j.map_batches(jac, batch_format="pyarrow")


SQL_NGRAM_JACCARD_ADJACENT = """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2])) AS sh
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / NULLIF(len(list_distinct(a.sh || b.sh)), 0), 6) AS jaccard
FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
"""


def q_similar_pairs(sf_dir: str):
    """Exact all-pairs set-similarity self-join at Jaccard >= 0.7
    (`dedup.set_similarity_join`, AllPairs/PPJoin prefix filter): only
    each doc's rarest n - ceil(t*n) + 1 shingles are exchanged (rarity
    from a broadcast count-min grid — any consistent order keeps the
    filter lossless), candidates verify with exact n-gram Jaccard via
    the distributed two-join fetch. The oracle replays the full token
    self-join in SQL; the engine's prefix filter must lose nothing."""
    from cosmos_ray.functions.dedup import set_similarity_join

    return set_similarity_join(read(sf_dir, "documents", ["doc_id", "text"]),
                               threshold=0.7)


SQL_SIMILAR_PAIRS = """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2])) AS sh
  FROM documents),
tok AS (SELECT doc_id, unnest(sh) AS tk FROM s),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM tok a JOIN tok b ON a.tk = b.tk AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(CAST(c.inter AS DOUBLE)
             / (len(sa.sh) + len(sb.sh) - c.inter), 6) AS jaccard
FROM cand c
JOIN s sa ON sa.doc_id = c.doc_a
JOIN s sb ON sb.doc_id = c.doc_b
WHERE round(CAST(c.inter AS DOUBLE)
            / (len(sa.sh) + len(sb.sh) - c.inter), 6) >= 0.7
"""


def q_dedup_exact(sf_dir: str):
    from cosmos_ray.functions.dedup import exact_dedup

    return exact_dedup(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_DEDUP_EXACT = "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"


def q_events_latest(sf_dir: str):
    """Keep-latest per (user_id, event_type): the warc_ts keep-latest
    dedup shape (SURVEY.md §2.10) on the events table."""
    ev = read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    return ev.map_batches(to_us, batch_format="pyarrow").groupby(
        ["user_id", "event_type"]
    ).aggregate(Max("ts_us", alias_name="last_ts_us"), Count(alias_name="n_events"))


SQL_EVENTS_LATEST = """
SELECT user_id, event_type, max(epoch_us(ts)) AS last_ts_us, count(*) AS n_events
FROM events GROUP BY user_id, event_type
"""


def q_sessionize(sf_dir: str):
    """Gap-based sessionization per user (30-min gap) — the stream-shaped
    groupby + in-group ordered window (SURVEY §2.10 / ray_guide)."""
    from cosmos_ray.functions.windows import sessionize

    return sessionize(read(sf_dir, "events", ["user_id", "event_id", "ts"]))


SQL_SESSIONIZE = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR epoch_us(ts) - prev_ts > 1800000000
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, ts,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
"""


def q_lineitem_corr(sf_dir: str):
    """Pearson correlation / covariance / stddev of (quantity,
    extendedprice) per returnflag via mergeable power-sum partials
    (`stats.grouped_corr`): 6 doubles per (batch, group) move, nothing
    else. The oracle replays the identical closed form over SQL SUMs
    (the daily_anomalies shared-formula convention) so float parity
    holds to the rounding digit."""
    from cosmos_ray.functions.stats import grouped_corr

    return grouped_corr(
        read(sf_dir, "lineitem", ["l_returnflag", "l_quantity",
                                  "l_extendedprice"]),
        ["l_returnflag"], "l_quantity", "l_extendedprice")


SQL_LINEITEM_CORR = """
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         sum(l_quantity * l_quantity) AS sxx,
         sum(l_extendedprice * l_extendedprice) AS syy,
         sum(l_quantity * l_extendedprice) AS sxy
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round((sxy/n - (sx/n)*(sy/n)) /
             sqrt((sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n))), 6)
           AS corr,
       round(sxy/n - (sx/n)*(sy/n), 6) AS covar_pop,
       round(sqrt(sxx/n - (sx/n)*(sx/n)), 6) AS stddev_x,
       round(sqrt(syy/n - (sy/n)*(sy/n)), 6) AS stddev_y
FROM s
"""


def q_ewma_value(sf_dir: str):
    """Exponentially-weighted moving average of value per user in
    event-time order (`stats.ewma_value`, alpha=0.3, adjust=True
    weighted-mean semantics — SQL-replayable as normalized power sums
    over preceding rows)."""
    from cosmos_ray.functions.stats import ewma_value

    return ewma_value(read(sf_dir, "events",
                           ["user_id", "event_id", "ts", "value"]), alpha=0.3)


SQL_EWMA_VALUE = """
WITH r AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)
SELECT a.user_id, a.event_id, epoch_us(a.ts) AS ts_us,
       round(sum(b.value * pow(0.7, a.rn - b.rn)) /
             sum(pow(0.7, a.rn - b.rn)), 6) AS ewma
FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn <= a.rn
GROUP BY a.user_id, a.event_id, a.ts
"""


def q_value_histogram(sf_dir: str):
    """Fixed-width value histogram per event_type
    (`stats.value_histogram`, bin width 5): batch-local bincount
    partials, one row per non-empty (type, bin) exchanged."""
    from cosmos_ray.functions.stats import value_histogram

    return value_histogram(read(sf_dir, "events", ["event_type", "value"]),
                           ["event_type"], "value", bin_width=5.0)


SQL_VALUE_HISTOGRAM = """
SELECT event_type, floor(value / 5.0) * 5.0 AS bin_lo, count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_mad_outlier_days(sf_dir: str):
    """Robust (median/MAD) daily-volume outliers per event_type — the
    median-based twin of daily_anomalies' z-score: flag days where
    |n - median| > 3 * MAD. The (type, day) count table is bounded by
    days x types (not corpus size), so after the count exchange the
    two-level holistic medians are model-sized driver work (the
    mixture_weights convention); dev/MAD are exact 0.5-step floats, so
    the strict > threshold is float-exact vs SQL."""
    from cosmos_ray.queries.relational import collect_small

    ev = read(sf_dir, "events", ["event_type", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        day = pc.multiply(pc.divide(us, pa.scalar(86_400_000_000)),
                          pa.scalar(86_400_000_000))
        return pa.table({"event_type": t.column("event_type"),
                         "day_us": day})

    counts = (ev.map_batches(to_day, batch_format="pyarrow")
              .groupby(["event_type", "day_us"])
              .aggregate(Count(alias_name="n")))
    tbl = collect_small(counts, cap_rows=2_000_000)
    if tbl is None:
        raise ValueError("(type, day) table exceeded the driver cap")
    df = tbl.to_pandas()
    med = df.groupby("event_type")["n"].transform(lambda s: float(np.median(s)))
    dev = (df["n"] - med).abs()
    mad = dev.groupby(df["event_type"]).transform(lambda s: float(np.median(s)))
    out = df[dev > 3 * mad]
    return rd.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"].tolist(), pa.string()),
        "day_us": pa.array(out["day_us"].tolist(), pa.int64()),
        "n": pa.array(out["n"].tolist(), pa.int64()),
    }))


SQL_MAD_OUTLIER_DAYS = """
WITH d AS (SELECT event_type,
                  (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
m AS (SELECT event_type, median(n) AS med FROM d GROUP BY 1),
a AS (SELECT d.event_type, d.day_us, d.n, abs(d.n - m.med) AS dev
      FROM d JOIN m USING (event_type)),
md AS (SELECT event_type, median(dev) AS mad FROM a GROUP BY 1)
SELECT a.event_type, a.day_us, CAST(a.n AS BIGINT) AS n
FROM a JOIN md USING (event_type)
WHERE a.dev > 3 * md.mad
"""


def q_scaled_lengths(sf_dir: str):
    """Per-language min-max feature scaling of doc length (the
    normalize-before-training staple): (x - min) / (max - min), groups
    with max == min excluded on both sides. Group extrema are a tiny
    broadcast; the scale map is stateless."""
    from cosmos_ray.queries.relational import collect_small

    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    ext = collect_small(
        docs.groupby("lang").aggregate(Min("n_chars", alias_name="mn"),
                                       Max("n_chars", alias_name="mx")),
        cap_rows=1_000_000)
    if ext is None:
        raise ValueError("per-lang extrema exceeded the driver cap")
    mn = dict(zip(ext.column("lang").to_pylist(), ext.column("mn").to_pylist()))
    mx = dict(zip(ext.column("lang").to_pylist(), ext.column("mx").to_pylist()))

    def scale(t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_pylist()
        n = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        lo = np.array([mn[x] for x in lang], np.float64)
        hi = np.array([mx[x] for x in lang], np.float64)
        keep = hi > lo
        s = np.round((n[keep] - lo[keep]) / (hi[keep] - lo[keep]), 6)
        return pa.table({
            "doc_id": t.column("doc_id").filter(pa.array(keep)),
            "lang": t.column("lang").filter(pa.array(keep)),
            "scaled": pa.array(s, pa.float64()),
        })

    return docs.map_batches(scale, batch_format="pyarrow")


SQL_SCALED_LENGTHS = """
SELECT doc_id, lang,
       round((n_chars - mn) * 1.0 / (mx - mn), 6) AS scaled
FROM (SELECT doc_id, lang, n_chars,
             min(n_chars) OVER (PARTITION BY lang) AS mn,
             max(n_chars) OVER (PARTITION BY lang) AS mx
      FROM documents)
WHERE mx > mn
"""


def q_session_stats(sf_dir: str):
    """Composition: sessionize -> per-session rollup (n_events, duration,
    sum of value rounded 4) — the session-window aggregate analytics
    stacks on gap-based sessions. One extra groupby over the sessionize
    exchange; value rides along so no second scan."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from cosmos_ray.functions.windows import _bucketed_by_user

    ev = read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        user = g["user_id"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap = np.zeros(len(g), dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        new_session = new_user | (gap > 1800 * 1_000_000)
        s = np.cumsum(new_session)
        first_idx = np.flatnonzero(new_user)
        runs = np.diff(np.append(first_idx, len(s)))
        base = np.repeat(s[first_idx], runs)
        return pd.DataFrame({
            "user_id": user, "session_id": s - base,
            "ts_us": ts_us, "value": g["value"].to_numpy(),
        })

    sess = _bucketed_by_user(ev, fn)
    agg = (sess.groupby(["user_id", "session_id"])
           .aggregate(Count(alias_name="n_events"),
                      Min("ts_us", alias_name="t0"),
                      Max("ts_us", alias_name="t1"),
                      Sum("value", alias_name="sum_value")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "session_id": t.column("session_id").cast(pa.int64()),
            "n_events": t.column("n_events").cast(pa.int64()),
            "duration_us": pc.subtract(t.column("t1"), t.column("t0")),
            # np.round, not pc.round: pyarrow's kernel lands on a
            # different ulp of the unrepresentable decimal than DuckDB
            "sum_value": pa.array(np.round(
                t.column("sum_value").to_numpy(zero_copy_only=False), 4),
                pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_SESSION_STATS = """
WITH l AS (
  SELECT user_id, event_id, ts, value,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_ts
  FROM events),
s AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value,
         CAST(SUM(CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - prev_ts > 1800000000
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM l)
SELECT user_id, session_id, count(*) AS n_events,
       max(ts_us) - min(ts_us) AS duration_us,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY 1, 2
"""


def q_user_cumsum(sf_dir: str):
    """Running sum of value per user in event-time order (window
    aggregate in batch form)."""
    from cosmos_ray.functions.windows import cumulative_value

    return cumulative_value(read(sf_dir, "events", ["user_id", "event_id", "ts", "value"]))


SQL_USER_CUMSUM = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       round(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4) AS cum_value
FROM events
"""


def q_fuzzy_parts(sf_dir: str):
    """Fuzzy record linkage: all pairs of distinct part names within
    Levenshtein distance 2, found via complete SymSpell deletion-
    neighborhood blocking (no cross join) + batched exact DP verify."""
    from cosmos_ray.functions.linkage import fuzzy_name_pairs

    return fuzzy_name_pairs(read(sf_dir, "part", ["p_name"]), "p_name", max_dist=2)


SQL_FUZZY_PARTS = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
"""


def q_rolling_value(sf_dir: str):
    """Frame-bounded rolling window (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW): per-user rolling sum/mean of value over the last 5
    events in (ts, event_id) order."""
    from cosmos_ray.functions.windows import rolling_value

    return rolling_value(read(sf_dir, "events", ["user_id", "event_id", "ts", "value"]))


SQL_ROLLING_VALUE = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       round(SUM(value) OVER w, 6) AS roll_sum,
       round(AVG(value) OVER w, 6) AS roll_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q_event_attribution(sf_dir: str):
    """As-of join (attribution): every click matched to the user's most
    recent signup at or before it — the temporal custom operator Ray
    Data lacks natively, run as one key-hash exchange + in-bucket
    ``merge_asof`` (`functions/temporal.py`)."""
    from cosmos_ray.functions.temporal import asof_join

    def only(t: str):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("event_type"), pa.scalar(t))).drop_columns(
                ["event_type"]
            )

        return f

    ev = lambda: read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])  # noqa: E731
    clicks = ev().map_batches(only("click"), batch_format="pyarrow")
    signups = ev().map_batches(only("signup"), batch_format="pyarrow")
    res = asof_join(clicks, signups, key="user_id")

    # inner semantics for the driver gate: drop never-signed-up clicks so
    # the output is null-free (nullable Int64 vs SQL NULL hashes diverge)
    def finalize(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        return pa.table({c: t.column(c).cast(pa.int64()) for c in t.column_names})

    return res.map_batches(finalize, batch_format="pyarrow")


SQL_EVENT_ATTRIBUTION = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
j AS (SELECT c.user_id, c.event_id, epoch_us(c.ts) AS ts_us,
             s.event_id AS matched_event_id, epoch_us(s.ts) AS matched_ts_us,
             epoch_us(c.ts) - epoch_us(s.ts) AS lag_us,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY s.ts DESC, s.event_id DESC) AS rn
      FROM c JOIN s ON s.user_id = c.user_id AND s.ts <= c.ts)
SELECT user_id, event_id, ts_us, matched_event_id, matched_ts_us, lag_us
FROM j WHERE rn = 1
"""


def q_error_burst(sf_dir: str):
    """Range (interval) join: for every signup, the count of the same
    user's error events strictly within the following hour — interval
    semantics via two vectorized ``searchsorted`` probes per key, never
    a pair fan-out (`functions/temporal.py:range_count_join`)."""
    from cosmos_ray.functions.temporal import range_count_join

    def only(t: str):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("event_type"), pa.scalar(t))).drop_columns(
                ["event_type"]
            )

        return f

    ev = lambda: read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])  # noqa: E731
    signups = ev().map_batches(only("signup"), batch_format="pyarrow")
    errors = ev().map_batches(only("error"), batch_format="pyarrow")
    return range_count_join(signups, errors, key="user_id",
                            count_col="n_errors_1h")


SQL_ERROR_BURST = """
WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
e AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
SELECT s.user_id, s.event_id, epoch_us(s.ts) AS ts_us,
       count(e.ts) AS n_errors_1h
FROM s LEFT JOIN e
  ON e.user_id = s.user_id
 AND epoch_us(e.ts) > epoch_us(s.ts)
 AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
GROUP BY s.user_id, s.event_id, epoch_us(s.ts)
"""


def q_mixture_weights(sf_dir: str):
    """Temperature-scaled source-mixture weights (the multinomial
    sampling-probability step of pretraining-mix assembly, tau = 0.7):
    one combiner groupby for per-source token totals (model-sized), then
    driver arithmetic on the 20-row table."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["source", "text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(t.column("text"), " ")).cast(pa.int64())
        return pa.table({"source": t.column("source"), "n": toks})

    per_src = (ds.map_batches(counts, batch_format="pyarrow")
               .groupby("source").aggregate(Sum("n", alias_name="n_tokens")))

    def finish(t: pa.Table) -> pa.Table:
        # sources table is model-sized; weights need the global sum, so
        # this runs on the single reduced block
        n = t.column("n_tokens").to_numpy().astype(np.float64)
        p = n ** 0.7
        w = p / p.sum()
        return pa.table({
            "source": t.column("source"),
            "n_tokens": t.column("n_tokens"),
            "weight": pa.array(np.floor(w * 1e6 + 0.5) / 1e6, pa.float64()),
        })

    import pyarrow as _pa

    tbl = per_src.take_all()  # 20 rows — bounded by the source vocabulary
    cols = {k: [r[k] for r in tbl] for k in ("source", "n_tokens")}
    return rd.from_arrow(finish(_pa.table({
        "source": _pa.array(cols["source"]),
        "n_tokens": _pa.array(cols["n_tokens"], _pa.int64())})))


SQL_MIXTURE_WEIGHTS = """
WITH t AS (SELECT source,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                    AS n_tokens
           FROM documents GROUP BY source)
SELECT source, n_tokens,
       floor(pow(n_tokens, 0.7)
             / sum(pow(n_tokens, 0.7)) OVER () * 1e6 + 0.5) / 1e6 AS weight
FROM t
"""


def q_token_budget(sf_dir: str):
    """Per-source token-budget sampling (`pack.token_budget_sample`):
    keep docs in md5-of-id order until each source's running token total
    exceeds 700 — the per-source cap step of pretraining-mix assembly."""
    from cosmos_ray.functions.pack import token_budget_sample

    return token_budget_sample(
        read(sf_dir, "documents", ["doc_id", "source", "text"]),
        budget=700)


SQL_TOKEN_BUDGET = """
WITH t AS (SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents)
SELECT doc_id, source, n_tokens,
       CAST(sum(n_tokens) OVER (PARTITION BY source
                                ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
FROM t
QUALIFY cum_tokens <= 700
"""


def q_event_pivot(sf_dir: str):
    """Daily event-type pivot (wide per-day counts — the reshape every
    analytics consumer of the events stream wants): one vectorized
    conditional-count combiner per batch, one small groupby."""
    from ray.data.aggregate import Sum

    types = ["click", "error", "purchase", "signup", "view"]
    ds = read(sf_dir, "events", ["event_type", "ts"])

    def partials(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()),
                        86_400_000_000).to_numpy()
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(day, return_inverse=True)
        cols = {"day": pa.array(uniq, pa.int64())}
        for ty in types:
            cols[f"n_{ty}"] = pa.array(
                np.bincount(inv, weights=(et == ty).astype(np.float64),
                            minlength=len(uniq)).astype(np.int64))
        return pa.table(cols)

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("day")
            .aggregate(*[Sum(f"n_{ty}", alias_name=f"n_{ty}")
                         for ty in types]))


SQL_EVENT_PIVOT = """
SELECT epoch_us(ts) // 86400000000 AS day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY 1
"""


def q_bm25_docs(sf_dir: str):
    """BM25 top-10 for a fixed query — the batch analog of the
    reference's ES ranked retrieval (`elastic_retriever.py:228-342`),
    two streaming passes: combiner-style corpus stats + vectorized
    scoring into a distributed top-k."""
    from cosmos_ray.functions.retrieval import bm25_topk

    return bm25_topk(read(sf_dir, "documents", ["doc_id", "text"]),
                     query="spark data processing", k=10)


def _sql_bm25(query: str, limit: int = 10) -> str:
    """BM25 replay: identical idf/tf formula with per-term contributions
    added in the same fixed (sorted-term) order, so the IEEE float sum
    is bit-identical before the 6dp round."""
    terms = sorted(set(query.lower().split()))
    k1, b = 1.2, 0.75
    tf_exprs = [
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE)" for t in terms
    ]
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS df_{i}"
        for i, t in enumerate(terms)
    )
    contribs = " + ".join(
        f"ln(1.0 + (st.n - st.df_{i} + 0.5) / (st.df_{i} + 0.5))"
        f" * ({tf_exprs[i]} / ({tf_exprs[i]} + {k1} * (1.0 - {b} + {b} *"
        f" (CAST(len(toks) AS DOUBLE) / st.avgdl))))"
        for i in range(len(terms))
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl,
              {df_cols}
       FROM d)
SELECT doc_id,
       floor(({contribs}) * 1e6 + 0.5) / 1e6 AS bm25
FROM d, st
ORDER BY bm25 DESC, doc_id LIMIT {limit}
"""


SQL_BM25_DOCS = _sql_bm25("spark data processing", 10)


def q_bm25_index_docs(sf_dir: str):
    """Same ranking served from the AT-REST inverted index — the disk
    analog of the reference's persisted ES index (`elasticsearch_ingest`
    bulk index + `elastic_retriever` query): postings are written
    hive-partitioned by term-hash bucket and the query reads ONLY its
    terms' buckets. Bit-identical to `bm25_topk` (fixed-order float
    sums), so it shares its SQL oracle."""
    import tempfile

    from cosmos_ray.functions.retrieval import bm25_query_index, build_text_index

    idx = tempfile.mkdtemp(prefix="txtidx_", dir="/tmp")
    build_text_index(read(sf_dir, "documents", ["doc_id", "text"]), idx)
    return bm25_query_index(idx, "spark data processing", k=10)


_BOOLEAN_QUERY = '(spark OR flink) AND "hash join" AND NOT slow'


def q_boolean_query(sf_dir: str):
    """Boolean query composition over the retrieval primitives — the ES
    ``query_string`` analog (`elastic_retriever.py:228-342`): AND/OR/NOT
    tree with a quoted phrase, matches ranked by BM25 over the positive
    terms. One stats combiner pass + one vectorized match-and-score pass
    (the boolean tree costs no extra passes)."""
    from cosmos_ray.functions.retrieval import boolean_query_topk

    return boolean_query_topk(read(sf_dir, "documents", ["doc_id", "text"]),
                              _BOOLEAN_QUERY, k=10)


def _sql_boolean_query(query: str, limit: int = 10) -> str:
    """Replay of ``boolean_query_topk``: the SAME parser builds the
    match condition (list_contains / space-bounded phrase / NOT / AND /
    OR) and the BM25 scoring reuses the fixed-order float-sum form of
    ``_sql_bm25`` over the positive terms."""
    from cosmos_ray.functions.retrieval import (
        parse_boolean_query,
        positive_terms,
    )

    def esc(s: str) -> str:
        return s.replace("'", "''")

    def cond(node) -> str:
        if node.kind == "term":
            return f"list_contains(toks, '{esc(node.val)}')"
        if node.kind == "phrase":
            return f"contains(pt, ' {esc(' '.join(node.val))} ')"
        if node.kind == "fuzzy":
            ft, fd = node.val
            return (f"len(list_filter(toks, x -> levenshtein(x, '{esc(ft)}')"
                    f" <= {fd})) > 0")
        if node.kind == "not":
            return f"(NOT {cond(node.val)})"
        op = " AND " if node.kind == "and" else " OR "
        return "(" + op.join(cond(c) for c in node.val) + ")"

    tree = parse_boolean_query(query)
    terms = sorted(positive_terms(tree))
    k1, b = 1.2, 0.75
    tf_exprs = [
        f"CAST(len(list_filter(toks, x -> x = '{esc(t)}')) AS DOUBLE)"
        for t in terms
    ]
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN list_contains(toks, '{esc(t)}') THEN 1 ELSE 0 END)"
        f" AS DOUBLE) AS df_{i}"
        for i, t in enumerate(terms)
    )
    contribs = " + ".join(
        f"ln(1.0 + (st.n - st.df_{i} + 0.5) / (st.df_{i} + 0.5))"
        f" * ({tf_exprs[i]} / ({tf_exprs[i]} + {k1} * (1.0 - {b} + {b} *"
        f" (CAST(len(toks) AS DOUBLE) / st.avgdl))))"
        for i in range(len(terms))
    )
    return f"""
WITH d AS (SELECT doc_id, ' ' || lower(text) || ' ' AS pt,
                  string_split(lower(text), ' ') AS toks FROM documents),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl,
              {df_cols}
       FROM d)
SELECT doc_id,
       floor(({contribs}) * 1e6 + 0.5) / 1e6 AS bm25
FROM d, st
WHERE {cond(tree)}
ORDER BY bm25 DESC, doc_id LIMIT {limit}
"""




def q_fuzzy_search(sf_dir: str):
    """ES fuzzy-match analog: docs ranked by the count of tokens within
    1 edit of the (misspelled) term 'spak' — integer tf, replayed via
    DuckDB's levenshtein()."""
    from cosmos_ray.functions.retrieval import fuzzy_search

    return fuzzy_search(read(sf_dir, "documents", ["doc_id", "text"]),
                        "spak", max_dist=1, k=10)


SQL_FUZZY_SEARCH = """
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
h AS (SELECT doc_id,
             len(list_filter(toks, x -> levenshtein(x, 'spak') <= 1)) AS tf
      FROM d)
SELECT doc_id, tf FROM h WHERE tf > 0 ORDER BY tf DESC, doc_id LIMIT 10
"""


_BOOLEAN_FUZZY_QUERY = '(spak~1 OR flink) AND "hash join" AND NOT slow AND data'


def q_boolean_fuzzy(sf_dir: str):
    """query_string composition with a FUZZY leaf (term~N): the typo
    spak~1 matches spark; ranking stays BM25 over the exact positive
    terms (fuzzy leaves are match-only)."""
    from cosmos_ray.functions.retrieval import boolean_query_topk

    return boolean_query_topk(read(sf_dir, "documents", ["doc_id", "text"]),
                              _BOOLEAN_FUZZY_QUERY, k=10)


def q_snippets(sf_dir: str):
    """Matched-context snippets (ES highlighting analog,
    `retrieval.snippet_extract`): +/-5 tokens around the earliest first
    occurrence of any query term."""
    from cosmos_ray.functions.retrieval import snippet_extract

    return snippet_extract(read(sf_dir, "documents", ["doc_id", "text"]),
                           "spark shuffle", window=5)


SQL_SNIPPETS = """
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
p AS (SELECT doc_id, toks,
             least(coalesce(NULLIF(list_position(toks, 'shuffle'), 0),
                            999999999),
                   coalesce(NULLIF(list_position(toks, 'spark'), 0),
                            999999999)) AS pos
      FROM d)
SELECT doc_id,
       array_to_string(list_slice(toks, greatest(1, pos - 5), pos + 5),
                       ' ') AS snippet
FROM p WHERE pos < 999999999
"""


def q_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion of two BM25 runs
    (`retrieval.rrf_fuse` — the ES `rrf` retriever analog; ranker-
    agnostic, so the same combiner fuses lexical + embedding lists)."""
    from cosmos_ray.functions.retrieval import bm25_topk, rrf_fuse

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    a = bm25_topk(docs, query="spark data processing", k=10)
    b = bm25_topk(read(sf_dir, "documents", ["doc_id", "text"]),
                  query="window batch stream", k=10)
    return rrf_fuse([(a, "bm25"), (b, "bm25")], n=10)


def _sql_hybrid_rrf() -> str:
    a = _sql_bm25("spark data processing", 10)
    b = _sql_bm25("window batch stream", 10)
    return f"""
WITH la AS ({a}),
lb AS ({b}),
ra AS (SELECT doc_id,
              row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM la),
rb AS (SELECT doc_id,
              row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM lb),
u AS (SELECT doc_id, 1.0 / (60 + r) AS c FROM ra
      UNION ALL SELECT doc_id, 1.0 / (60 + r) FROM rb)
SELECT doc_id, round(sum(c), 6) AS rrf
FROM u GROUP BY doc_id
ORDER BY round(sum(c), 6) DESC, doc_id LIMIT 10
"""


SQL_HYBRID_RRF = _sql_hybrid_rrf()


def q_stratified_docs(sf_dir: str):
    """Deterministic stratified sample: 5 docs per language under the
    md5-of-id order (training-data subsampling that any engine replays
    exactly — no PRNG)."""
    from cosmos_ray.queries.relational import stratified_sample

    return stratified_sample(
        read(sf_dir, "documents", ["doc_id", "lang"]), group_col="lang",
        n=5, id_col="doc_id",
    )


SQL_STRATIFIED_DOCS = """
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 5
"""


def q_hopping_counts(sf_dir: str):
    """Hopping-window aggregate (1h window, 15min hop) over all events —
    the sliding-window member of the streaming family; in-batch window
    expansion is pre-aggregated so the shuffle moves window partials."""
    from cosmos_ray.functions.windows import hopping_window

    return hopping_window(read(sf_dir, "events", ["ts", "value"]),
                          window_s=3600, hop_s=900)


SQL_HOPPING_COUNTS = """
WITH e AS (SELECT epoch_us(ts) AS t, value FROM events),
w AS (SELECT unnest(generate_series((t - 3600000000) // 900000000 + 1,
                                    t // 900000000)) AS k,
             value
      FROM e)
SELECT k * 900000000 AS window_start_us,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM w GROUP BY 1
"""


def q_user_key_moments(sf_dir: str):
    """Exact frequency moments of the event key distribution — the
    numbers a planner reads before choosing a join/shuffle strategy:
    F0 = distinct users, F1 = total events, F2 = sum of squared per-key
    counts (the SELF-JOIN SIZE the AMS sketch estimates), and the skew
    factor F2*F0/F1^2 (1.0 = uniform keys). Shape: per-batch key-count
    combiner, one vocabulary-bounded groupby, then a single-row
    reduce of squared counts."""
    from ray.data.aggregate import Sum as _Sum

    ev = read(sf_dir, "events", ["user_id"])

    def batch_counts(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("user_id").combine_chunks())
        return pa.table({"user_id": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    per_key = (ev.map_batches(batch_counts, batch_format="pyarrow")
               .groupby("user_id").aggregate(_Sum("c", alias_name="c")))

    def moments(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({"f0": pa.array([len(c)], pa.int64()),
                         "f1": pa.array([int(c.sum())], pa.int64()),
                         "f2": pa.array([int((c * c).sum())], pa.int64())})

    agg = (per_key.map_batches(moments, batch_format="pyarrow")
           .aggregate(_Sum("f0", alias_name="f0"),
                      _Sum("f1", alias_name="f1"),
                      _Sum("f2", alias_name="f2")))
    f0, f1, f2 = int(agg["f0"]), int(agg["f1"]), int(agg["f2"])
    return pd.DataFrame({"f0": [f0], "f1": [f1], "f2": [f2],
                         "skew": [round(f2 * f0 / (f1 * f1), 6)]})


SQL_USER_KEY_MOMENTS = """
WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS f0,
       CAST(sum(n) AS BIGINT) AS f1,
       CAST(sum(n * n) AS BIGINT) AS f2,
       round(CAST(sum(n * n) * count(*) AS DOUBLE)
             / CAST(sum(n) * sum(n) AS DOUBLE), 6) AS skew
FROM c
"""


def q_hopping_distinct_users(sf_dir: str):
    """EXACT sliding-window cardinality (1h window, 15min hop): distinct
    users per hopping window — the streaming COUNT(DISTINCT) the HLL
    sketch approximates, done exactly via the two-stage distinct: the
    in-batch window explode dedups (window, user) pairs BEFORE the
    exchange, one groupby collapses them globally, and only one row
    per distinct pair ever shuffles (never per-event fan-out)."""
    from ray.data.aggregate import Count as _Count

    window_us, hop_us = 3_600_000_000, 900_000_000
    ev = read(sf_dir, "events", ["ts", "user_id"])

    def explode_dedup(t: pa.Table) -> pa.Table:
        ts = (t.column("ts").cast(pa.timestamp("us"))
              .to_numpy(zero_copy_only=False).astype("datetime64[us]")
              .astype(np.int64))
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        k_hi = ts // hop_us
        k_lo = (ts - window_us) // hop_us + 1
        counts = (k_hi - k_lo + 1).astype(np.int64)
        total = int(counts.sum())
        starts = np.repeat(k_lo, counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        pairs = np.stack([(starts + offs) * hop_us,
                          np.repeat(uid, counts)], axis=1)
        uniq = np.unique(pairs, axis=0)
        return pa.table({"window_start_us": pa.array(uniq[:, 0], pa.int64()),
                         "user_id": pa.array(uniq[:, 1], pa.int64())})

    distinct = (ev.map_batches(explode_dedup, batch_format="pyarrow")
                .groupby(["window_start_us", "user_id"])
                .aggregate(_Count(alias_name="__n")).drop_columns(["__n"]))
    return (distinct.groupby("window_start_us")
            .aggregate(_Count(alias_name="n_users")))


SQL_HOPPING_DISTINCT_USERS = """
WITH e AS (SELECT epoch_us(ts) AS t, user_id FROM events),
w AS (SELECT unnest(generate_series((t - 3600000000) // 900000000 + 1,
                                    t // 900000000)) AS k,
             user_id
      FROM e)
SELECT k * 900000000 AS window_start_us,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM w GROUP BY 1
"""


def q_watermarked_counts(sf_dir: str):
    """Event-time tumbling window with a processing-order watermark and
    late-data drop (`windows.watermarked_window`, Flink/Beam lateness
    semantics replayed deterministically): arrival order = event_id,
    watermark = running max event time minus 15 min; per hourly window
    the on-time count/sum plus the dropped-late count. The oracle
    replays the running max as a SQL window over the arrival order, so
    a wrong prefix seed, bucket boundary or drop rule changes the
    hash."""
    from cosmos_ray.functions.windows import watermarked_window

    return watermarked_window(
        read(sf_dir, "events", ["event_id", "ts", "value"]),
        window_s=3600, lateness_s=900)


SQL_WATERMARKED_COUNTS = """
WITH w AS (
  SELECT epoch_us(ts) AS tu, value,
         max(epoch_us(ts)) OVER (ORDER BY event_id) AS hi
  FROM events),
f AS (SELECT (tu // 3600000000) * 3600000000 AS window_start_us, value,
             tu >= hi - 900000000 AS ok
      FROM w)
SELECT window_start_us,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
       round(sum(CASE WHEN ok THEN value ELSE 0 END), 4) AS sum_value,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_late
FROM f GROUP BY 1
"""


def q_distinct_users_daily(sf_dir: str):
    """Exact daily distinct users via the two-stage distinct (the
    exchange carries one row per DISTINCT (day, user), never per event;
    `functions/sketch.py:distinct_count_exact`). The HLL sketch in the
    same module is the approximate 100-TB path (pytest error-bound
    gated — sketch estimates aren't SQL-replayable)."""
    from cosmos_ray.functions.sketch import distinct_count_exact

    ev = read(sf_dir, "events", ["ts", "user_id"]).map_batches(
        lambda t: pa.table({
            "day_us": pc.multiply(
                pc.divide(t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                          pa.scalar(86_400_000_000)),
                pa.scalar(86_400_000_000)),
            "user_id": t.column("user_id"),
        }),
        batch_format="pyarrow",
    )
    return distinct_count_exact(ev, ["day_us"], "user_id")


SQL_DISTINCT_USERS_DAILY = """
SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
       count(DISTINCT user_id) AS n_distinct_user_id
FROM events GROUP BY 1
"""


def q_docs_merged(sf_dir: str):
    """MERGE / upsert (`relational.merge_upsert`): apply a CDC changeset
    to the documents table — updates (doc_id % 7 == 0 gains 1000
    n_chars), deletes (doc_id % 11 == 3, unless updated), inserts
    (doc_id % 13 == 0 re-keyed +1_000_000) — in one key-hash exchange."""
    from cosmos_ray.queries.relational import merge_upsert

    base = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def make_changes(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        lang = t.column("lang")
        n = t.column("n_chars").to_numpy(zero_copy_only=False)
        m_upd = d % 7 == 0
        m_del = (d % 11 == 3) & ~m_upd
        m_ins = d % 13 == 0
        parts = []
        if m_upd.any():
            parts.append(pa.table({
                "doc_id": pa.array(d[m_upd]), "lang": lang.filter(pa.array(m_upd)),
                "n_chars": pa.array(n[m_upd] + 1000),
                "is_delete": pa.array(np.zeros(int(m_upd.sum()), bool))}))
        if m_del.any():
            parts.append(pa.table({
                "doc_id": pa.array(d[m_del]), "lang": lang.filter(pa.array(m_del)),
                "n_chars": pa.array(n[m_del]),
                "is_delete": pa.array(np.ones(int(m_del.sum()), bool))}))
        if m_ins.any():
            parts.append(pa.table({
                "doc_id": pa.array(d[m_ins] + 1_000_000),
                "lang": lang.filter(pa.array(m_ins)),
                "n_chars": pa.array(n[m_ins]),
                "is_delete": pa.array(np.zeros(int(m_ins.sum()), bool))}))
        if not parts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "n_chars": pa.array([], pa.int64()),
                             "is_delete": pa.array([], pa.bool_())})
        return pa.concat_tables(parts)

    changes = base.map_batches(make_changes, batch_format="pyarrow")
    return merge_upsert(base, changes, key="doc_id")


SQL_DOCS_MERGED = """
WITH changes AS (
  SELECT doc_id, lang, n_chars + 1000 AS n_chars, FALSE AS is_delete
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, lang, n_chars, TRUE
  FROM documents WHERE doc_id % 11 = 3 AND doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000, lang, n_chars, FALSE
  FROM documents WHERE doc_id % 13 = 0
)
SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
       COALESCE(c.lang, b.lang) AS lang,
       COALESCE(c.n_chars, b.n_chars) AS n_chars
FROM (SELECT doc_id, lang, n_chars FROM documents) b
FULL OUTER JOIN changes c ON b.doc_id = c.doc_id
WHERE NOT COALESCE(c.is_delete, FALSE)
"""


def q_fuzzy_clusters(sf_dir: str):
    """Entity resolution end-to-end: fuzzy Levenshtein pairs
    (`linkage.fuzzy_name_pairs`) fed into `graph.connected_components`;
    every distinct part name gets the lexicographic-min member of its
    fuzzy component as canonical representative (singletons map to
    themselves)."""
    from cosmos_ray.functions.graph import connected_components
    from cosmos_ray.functions.linkage import fuzzy_name_pairs

    names = read(sf_dir, "part", ["p_name"]).groupby("p_name").map_groups(
        lambda g: g.iloc[:1][["p_name"]], batch_format="pandas")
    pairs = fuzzy_name_pairs(read(sf_dir, "part", ["p_name"]), "p_name",
                             max_dist=2)
    comp = connected_components(pairs, src="name_a", dst="name_b")
    single = semi_join_ds(
        names,
        comp.map_batches(lambda t: pa.table({"k": t.column("entity")}),
                         batch_format="pyarrow"),
        key_col="k", big_key="p_name", keep=False)
    return comp.map_batches(
        lambda t: pa.table({"p_name": t.column("entity"),
                            "cluster": t.column("component")}),
        batch_format="pyarrow").union(
        single.map_batches(
            lambda t: pa.table({"p_name": t.column("p_name"),
                                "cluster": t.column("p_name")}),
            batch_format="pyarrow"))


SQL_FUZZY_CLUSTERS = """
WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
pairs AS (SELECT a.p_name AS x, b.p_name AS y FROM names a JOIN names b
          ON a.p_name < b.p_name
          WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2),
und AS (SELECT x AS a, y AS b FROM pairs UNION SELECT y, x FROM pairs),
reach(a, b) AS (SELECT p_name, p_name FROM names
                UNION
                SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b)
SELECT a AS p_name, min(b) AS cluster FROM reach GROUP BY a
"""


def q_distinct_users_kmv(sf_dir: str):
    """K-minimum-values distinct sketch per event_type — deterministic
    (md5-hash order statistic), so the approximate estimate itself is
    oracle-checked bit-for-bit (`sketch.kmv_distinct`, k=64)."""
    from cosmos_ray.functions.sketch import kmv_distinct

    return kmv_distinct(read(sf_dir, "events", ["event_type", "user_id"]),
                        ["event_type"], "user_id", k=64)


SQL_DISTINCT_USERS_KMV = """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, md5_number_upper('kmv0:' || user_id) AS hh FROM d),
r AS (SELECT event_type, hh,
             row_number() OVER (PARTITION BY event_type ORDER BY hh) AS rn
      FROM h)
SELECT event_type,
       round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                  ELSE 63.0 * 18446744073709551616.0 /
                       CAST(max(CASE WHEN rn = 64 THEN hh END) AS DOUBLE)
             END, 6) AS n_distinct_est
FROM r GROUP BY event_type
"""


def q_weekly_users_kmv(sf_dir: str):
    """Mergeable-sketch ROLLUP (`sketch.kmv_sketch_table` +
    `sketch.kmv_rollup`): per-(week, day) KMV sketches are built once —
    the at-rest sketch table a 100-TB OLAP layer persists beside the
    facts — then WEEKLY distinct-user estimates come from merging the
    daily sketches alone, never re-reading events. KMV's min-k union
    makes the merged estimate bit-equal to a direct weekly sketch, so
    the oracle states the rollup from the fact table directly."""
    from cosmos_ray.functions.sketch import kmv_rollup, kmv_sketch_table

    ev = read(sf_dir, "events", ["ts", "user_id"]).map_batches(
        lambda t: pa.table({
            "week_us": pc.multiply(
                pc.divide(t.column("ts").cast(pa.timestamp("us"))
                          .cast(pa.int64()), pa.scalar(604_800_000_000)),
                pa.scalar(604_800_000_000)),
            "day_us": pc.multiply(
                pc.divide(t.column("ts").cast(pa.timestamp("us"))
                          .cast(pa.int64()), pa.scalar(86_400_000_000)),
                pa.scalar(86_400_000_000)),
            "user_id": t.column("user_id")}),
        batch_format="pyarrow")
    sketches = kmv_sketch_table(ev, ["week_us", "day_us"], "user_id", k=64)
    return kmv_rollup(sketches, ["week_us"], k=64)


SQL_WEEKLY_USERS_KMV = """
WITH d AS (SELECT DISTINCT
             (epoch_us(ts) // 604800000000) * 604800000000 AS week_us,
             user_id
           FROM events),
h AS (SELECT week_us, md5_number_upper('kmv0:' || user_id) AS hh FROM d),
r AS (SELECT week_us, hh,
             row_number() OVER (PARTITION BY week_us ORDER BY hh) AS rn
      FROM h)
SELECT week_us,
       round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                  ELSE 63.0 * 18446744073709551616.0 /
                       CAST(max(CASE WHEN rn = 64 THEN hh END) AS DOUBLE)
             END, 6) AS n_distinct_est
FROM r GROUP BY week_us
"""


def q_top_terms_by_lang(sf_dir: str):
    """Exact heavy hitters: top-10 tokens per language (combiner counts
    inside each batch; the exchange is vocabulary-bounded)."""
    from cosmos_ray.functions.textops import top_terms_per_group

    return top_terms_per_group(read(sf_dir, "documents", ["lang", "text"]), k=10)


SQL_TOP_TERMS_BY_LANG = """
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
c AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2)
SELECT lang, token, n,
       row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS "rank"
FROM c QUALIFY "rank" <= 10
"""


def q_value_quantiles(sf_dir: str):
    """Exact per-type value quantiles (holistic aggregate beyond
    median): inverted-CDF discrete pick, DuckDB-quantile_disc-identical
    (`relational.group_quantiles`)."""
    from cosmos_ray.queries.relational import group_quantiles

    return group_quantiles(read(sf_dir, "events", ["event_type", "value"]),
                           ["event_type"], "value", qs=(0.5, 0.9, 0.99))


SQL_VALUE_QUANTILES = """
SELECT event_type,
       quantile_disc(value, 0.5) AS q50,
       quantile_disc(value, 0.9) AS q90,
       quantile_disc(value, 0.99) AS q99
FROM events GROUP BY event_type
"""


def q_value_quantiles_sketch(sf_dir: str):
    """Mergeable histogram-quantile sketch per event_type — the bounded-
    exchange percentile path for hot keys (`sketch.histogram_quantiles`;
    exchange = keys x nbins counts, partials merge by addition)."""
    from cosmos_ray.functions.sketch import histogram_quantiles

    return histogram_quantiles(read(sf_dir, "events", ["event_type", "value"]),
                               ["event_type"], "value",
                               lo=0.0, hi=1024.0, nbins=256)


SQL_VALUE_QUANTILES_SKETCH = """
WITH b AS (SELECT event_type,
                  least(greatest(floor(value / 4.0), 0), 255)::BIGINT AS bin
           FROM events),
c AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
t AS (SELECT event_type, sum(n) AS total FROM c GROUP BY 1),
cum AS (SELECT event_type, bin,
               sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum
        FROM c),
qv(q) AS (VALUES (0.5), (0.9), (0.99)),
r AS (SELECT event_type, q, greatest(ceil(q * total), 1)::BIGINT AS rnk
      FROM t CROSS JOIN qv),
pick AS (SELECT r.event_type, r.q, min(cum.bin) AS bin
         FROM r JOIN cum ON cum.event_type = r.event_type
                        AND cum.cum >= r.rnk
         GROUP BY 1, 2)
SELECT event_type, q::DOUBLE AS q,
       round(4.0 * bin, 6) AS approx_value
FROM pick
"""


def q_props_k_by_type(sf_dir: str):
    """Semi-structured JSON column extraction (web-pipeline staple):
    pull ``k`` out of the props JSON with one vectorized arrow
    ``extract_regex`` — no per-row json.loads — then aggregate per
    event_type."""
    from ray.data.aggregate import Count, Sum

    ev = read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        out = pa.table({"event_type": t.column("event_type"), "k": k})
        return out.filter(pc.is_valid(k))  # arrow-side null drop

    return (
        ev.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
    )


SQL_PROPS_K_BY_TYPE = """
SELECT event_type, count(*) AS n,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
"""


def q_curate_docs(sf_dir: str):
    """The composed training-data curation pipeline (exact dedup →
    quality gate → language gate → token annotation → per-source
    stratified sample) as ONE streaming Dataset chain
    (`pipelines/curate.py`) — oracle-checked end to end."""
    from cosmos_ray.pipelines.curate import curate_documents

    return curate_documents(read(sf_dir, "documents", ["doc_id", "text", "source"]),
                            lang="en", per_source=20)


def _sql_curate_docs(lang: str = "en", per_source: int = 20) -> str:
    """Composed replay: dedup winners IN-subquery, the quality keep
    predicate, the cue-count language argmax restricted to ``lang``
    (first-wins ties ⇒ a language wins iff its score equals the max and
    no earlier language does; 'en' is first so s_en = mx AND mx > 0),
    token annotation and the md5 stratified head."""
    from cosmos_ray.functions.textops import _LANG_CUES

    def count_expr(cue: str) -> str:
        c = cue.replace("'", "''")
        return f"(length(t) - length(replace(t, '{c}', ''))) // {len(cue)}"

    langs = list(_LANG_CUES)
    first_idx = langs.index(lang)
    score_cols = ",\n       ".join(
        f"CAST({' + '.join(count_expr(c) for c in cues)} AS DOUBLE) / l AS s_{lg}"
        for lg, cues in _LANG_CUES.items()
    )
    mx = "greatest(" + ", ".join(f"s_{x}" for x in langs) + ")"
    earlier = " AND ".join(f"s_{langs[j]} < mx" for j in range(first_idx)) or "TRUE"
    return f"""
WITH win AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
q AS (SELECT doc_id, text, source FROM documents
      WHERE len(string_split(text, ' ')) >= 10
        AND CAST(len(list_filter(string_split(text, ' '),
                                 x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
            / greatest(len(string_split(text, ' ')), 1) <= 0.5
        AND doc_id IN (SELECT doc_id FROM win)),
sc AS (SELECT doc_id, text, source, lower(text) AS lo,
              greatest(length(lower(text)), 1) AS l
       FROM q),
scored AS (SELECT doc_id, text, source,
       {score_cols}
       FROM (SELECT doc_id, text, source, lo AS t, l FROM sc)),
mxd AS (SELECT *, {mx} AS mx FROM scored),
kept AS (SELECT doc_id, source, '{lang}' AS lang_pred,
                len(string_split(text, ' ')) AS n_tokens
         FROM mxd WHERE mx > 0 AND s_{lang} = mx AND {earlier})
SELECT doc_id, source, lang_pred, n_tokens FROM kept
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        <= {per_source}
"""


SQL_CURATE_DOCS = _sql_curate_docs()


def q_join_key_overlap(sf_dir: str):
    """Join-PLANNING cardinality probe: KMV set-operation estimates of
    the distinct-key overlap between orders.o_custkey and
    customer.c_custkey — per-side distinct counts, union and
    intersection all estimated from two 64-value k-min sketches (the
    sketch a cost-based planner consults before picking broadcast vs
    shuffle), with the exact overlap beside them. The sketches are
    DETERMINISTIC md5 k-mins (`sketch.kmv_distinct` convention), so
    the DuckDB oracle replays the ESTIMATES bit-for-bit.

    Scale shape: each side's sketch comes from per-batch k-min partials
    (k uint64s per batch cross the exchange; batch-local distinct
    first); sketch set-algebra is driver work on 128 values; the exact
    overlap is a two-stage distinct + size-guarded semi-join count."""
    import hashlib

    from cosmos_ray.queries.relational import semi_join_ds

    K = 64

    def kmin(ds, col: str) -> np.ndarray:
        def part(df: pd.DataFrame) -> pd.DataFrame:
            vals = df[col].drop_duplicates().tolist()
            hs = np.unique(np.fromiter(
                (int.from_bytes(
                    hashlib.md5(f"kmv0:{v}".encode()).digest()[:8],
                    "little") for v in vals),
                dtype=np.uint64, count=len(vals)))[:K]
            return pd.DataFrame({"h": [hs.tolist()]})

        parts = (ds.select_columns([col])
                 .map_batches(part, batch_format="pandas").take_all())
        if not parts:
            return np.array([], np.uint64)
        allh = np.unique(np.concatenate(
            [np.asarray(r["h"], np.uint64) for r in parts]))
        return allh[:K]

    def est(sk: np.ndarray) -> float:
        if len(sk) < K:
            return float(len(sk))
        return round((K - 1) * 2.0 ** 64 / float(sk[K - 1]), 6)

    orders = read(sf_dir, "orders", ["o_custkey"])
    customer = read(sf_dir, "customer", ["c_custkey"])
    sa, sb = kmin(orders, "o_custkey"), kmin(customer, "c_custkey")
    u = np.unique(np.concatenate([sa, sb]))[:K]
    ea, eb, eu = est(sa), est(sb), est(u)
    sa_set, sb_set = set(sa.tolist()), set(sb.tolist())
    both = sum(1 for h in u.tolist() if h in sa_set and h in sb_set)
    ei = round(both / len(u) * eu, 6) if len(u) else 0.0

    da = orders.groupby("o_custkey").count()
    exact = semi_join_ds(da, customer, key_col="c_custkey",
                         big_key="o_custkey").count()
    return rd.from_arrow(pa.table({
        "est_a": pa.array([ea], pa.float64()),
        "est_b": pa.array([eb], pa.float64()),
        "est_union": pa.array([eu], pa.float64()),
        "est_intersection": pa.array([ei], pa.float64()),
        "exact_overlap": pa.array([exact], pa.int64())}))


SQL_JOIN_KEY_OVERLAP = """
WITH da AS (SELECT DISTINCT o_custkey AS v FROM orders),
db AS (SELECT DISTINCT c_custkey AS v FROM customer),
ka AS (SELECT md5_number_upper('kmv0:' || v) AS h FROM da
       ORDER BY h LIMIT 64),
kb AS (SELECT md5_number_upper('kmv0:' || v) AS h FROM db
       ORDER BY h LIMIT 64),
ku AS (SELECT DISTINCT h FROM
         (SELECT h FROM ka UNION ALL SELECT h FROM kb)
       ORDER BY h LIMIT 64),
ea AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
              ELSE round(63.0 * 18446744073709551616.0 /
                         CAST(max(h) AS DOUBLE), 6) END AS e FROM ka),
eb AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
              ELSE round(63.0 * 18446744073709551616.0 /
                         CAST(max(h) AS DOUBLE), 6) END AS e FROM kb),
eu AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
              ELSE round(63.0 * 18446744073709551616.0 /
                         CAST(max(h) AS DOUBLE), 6) END AS e FROM ku),
bi AS (SELECT CAST(count(*) AS DOUBLE) AS nb,
              (SELECT CAST(count(*) AS DOUBLE) FROM ku) AS nu
       FROM ku WHERE h IN (SELECT h FROM ka)
                 AND h IN (SELECT h FROM kb)),
ex AS (SELECT CAST(count(*) AS BIGINT) AS n FROM da JOIN db USING (v))
SELECT ea.e AS est_a, eb.e AS est_b, eu.e AS est_union,
       CASE WHEN bi.nu = 0 THEN 0.0
            ELSE round(bi.nb / bi.nu * eu.e, 6) END AS est_intersection,
       ex.n AS exact_overlap
FROM ea, eb, eu, bi, ex
"""


def q_curation_funnel(sf_dir: str):
    """Curation FUNNEL report — the per-source removal accounting every
    production data pipeline publishes beside its output (how many docs
    each curation rule dropped: input -> exact-dedup survivors ->
    quality survivors -> language survivors), using exactly the
    `pipelines/curate.py` gate semantics so the report audits the real
    pipeline, not a reimplementation.

    Shape: gate flags compute in ONE text pass that immediately drops
    text (narrow (doc_id, source, flags) stream); the dedup-winner
    marker joins via `left_join_or_broadcast` (distributed fallback
    past the cap); one source-keyed groupby of integer partials."""
    from ray.data.aggregate import Count

    from cosmos_ray.functions.dedup import hashed_winner_ids
    from cosmos_ray.pipelines.curate import _LangGate, _quality_mask
    from cosmos_ray.queries.relational import left_join_or_broadcast

    docs = read(sf_dir, "documents", ["doc_id", "text", "source"])
    gate = _LangGate("en")

    def flags(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        q = _quality_mask(t)
        lm = gate.mask(t.column("text").to_pandas())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "q1": pa.array(q.astype(np.int64)),
            "ql1": pa.array((q & lm).astype(np.int64))})

    narrow = docs.map_batches(flags, batch_format="pyarrow")
    winners = hashed_winner_ids(docs, text_col="text", id_col="doc_id")
    marked = left_join_or_broadcast(
        narrow,
        winners.map_batches(lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "w1": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        key="doc_id", add_cols=["w1"], fill=0)

    def products(t: pa.Table) -> pa.Table:
        w = t.column("w1").to_numpy(zero_copy_only=False)
        q = t.column("q1").to_numpy(zero_copy_only=False)
        ql = t.column("ql1").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": t.column("source"),
            "w": pa.array(w), "wq": pa.array(w * q),
            "wql": pa.array(w * ql)})

    return (marked.map_batches(products, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Count(alias_name="n_input"),
                       Sum("w", alias_name="n_after_dedup"),
                       Sum("wq", alias_name="n_after_quality"),
                       Sum("wql", alias_name="n_after_lang")))


def _sql_curation_funnel(lang: str = "en") -> str:
    from cosmos_ray.functions.textops import _LANG_CUES

    def count_expr(cue: str) -> str:
        c = cue.replace("'", "''")
        return f"(length(t) - length(replace(t, '{c}', ''))) // {len(cue)}"

    langs = list(_LANG_CUES)
    first_idx = langs.index(lang)
    score_cols = ",\n       ".join(
        f"CAST({' + '.join(count_expr(c) for c in cues)} AS DOUBLE) / l"
        f" AS s_{lg}"
        for lg, cues in _LANG_CUES.items())
    mx = "greatest(" + ", ".join(f"s_{x}" for x in langs) + ")"
    earlier = " AND ".join(
        f"s_{langs[j]} < mx" for j in range(first_idx)) or "TRUE"
    return f"""
WITH win AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
base AS (SELECT doc_id, source, text,
                doc_id IN (SELECT doc_id FROM win) AS is_win,
                (len(string_split(text, ' ')) >= 10
                 AND CAST(len(list_filter(string_split(text, ' '),
                          x -> x IN ('the', 'a', 'and', 'of', 'to')))
                          AS DOUBLE)
                     / greatest(len(string_split(text, ' ')), 1) <= 0.5)
                  AS is_q
         FROM documents),
scored AS (SELECT doc_id, source, is_win, is_q,
       {score_cols}
       FROM (SELECT doc_id, source, is_win, is_q, lower(text) AS t,
                    greatest(length(lower(text)), 1) AS l FROM base)),
mxd AS (SELECT *, {mx} AS mx FROM scored),
fl AS (SELECT source, is_win, is_q,
              (mx > 0 AND s_{lang} = mx AND {earlier}) AS is_l
       FROM mxd)
SELECT source, CAST(count(*) AS BIGINT) AS n_input,
       CAST(sum(CASE WHEN is_win THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after_dedup,
       CAST(sum(CASE WHEN is_win AND is_q THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after_quality,
       CAST(sum(CASE WHEN is_win AND is_q AND is_l THEN 1 ELSE 0 END)
            AS BIGINT) AS n_after_lang
FROM fl GROUP BY source
"""


SQL_CURATION_FUNNEL = _sql_curation_funnel()


def q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing map: each doc's position in the
    concatenated doc_id-ordered token stream and the 512-token sequence
    range it overlaps — global ordered cumsum WITHOUT a global sort
    (`functions/pack.py`)."""
    from cosmos_ray.functions.pack import pack_sequences

    return pack_sequences(read(sf_dir, "documents", ["doc_id", "text"]),
                          seq_len=512)


SQL_PACK_SEQUENCES = """
WITH n AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS start_offset
      FROM n)
SELECT doc_id, n_tokens, start_offset,
       start_offset // 512 AS first_seq,
       greatest(start_offset // 512,
                (start_offset + greatest(n_tokens, 1) - 1) // 512) AS last_seq
FROM c
"""


def q_dup_ngram_frac(sf_dir: str):
    """Per-doc fraction of distinct 8-grams shared with any other doc
    (`textops.dup_ngram_fraction` — gram-only exchange, no join)."""
    from cosmos_ray.functions.textops import dup_ngram_fraction

    return dup_ngram_fraction(read(sf_dir, "documents", ["doc_id", "text"]),
                              n=8)


SQL_DUP_NGRAM_FRAC = """
WITH sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 6, 1)),
           i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')))) AS g
  FROM documents
  WHERE len(string_split(text, ' ')) >= 8),
df AS (SELECT g, count(*) AS df FROM sh GROUP BY g)
SELECT sh.doc_id, count(*)::BIGINT AS n_grams,
       round(sum(CASE WHEN df.df > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS dup_frac
FROM sh JOIN df USING (g)
GROUP BY sh.doc_id
"""


def q_tfidf_keywords(sf_dir: str):
    """Top-3 tf-idf terms per doc (`textops.tfidf_keywords` — vocabulary
    df broadcast, in-bucket top-k)."""
    from cosmos_ray.functions.textops import tfidf_keywords

    return tfidf_keywords(read(sf_dir, "documents", ["doc_id", "text"]), k=3)


SQL_TFIDF_KEYWORDS = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
s AS (SELECT tf.doc_id, tf.term,
             round(tf.tf * ln((SELECT n_docs FROM n)::DOUBLE / df.df), 6)
               AS tfidf
      FROM tf JOIN df USING (term)),
r AS (SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rank
      FROM s)
SELECT doc_id, term, tfidf, rank::BIGINT AS rank FROM r WHERE rank <= 3
"""


def q_shuffle_shards(sf_dir: str):
    """Deterministic training-export shuffle plan: md5-draw shard + rank
    (`functions/pack.py:shuffle_shards`; ids-only exchange)."""
    from cosmos_ray.functions.pack import shuffle_shards

    return shuffle_shards(read(sf_dir, "documents", ["doc_id"]), n_shards=8,
                          seed="s0")


SQL_SHUFFLE_SHARDS = """
WITH h AS (SELECT doc_id, md5_number_upper('s0:' || doc_id) AS hh FROM documents)
SELECT doc_id, (hh % 8)::BIGINT AS shard,
       (row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) - 1)::BIGINT
         AS pos
FROM h
"""


def q_contamination(sf_dir: str):
    """Decontamination pass: docs sharing an 8-gram with the 'benchmark'
    subset (doc_id % 97 == 0) — shingle semi-join, corpus text never
    shuffled (`functions/dedup.py:contaminated_docs`)."""
    from cosmos_ray.functions.dedup import contaminated_docs

    def is_bench(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    bench = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        is_bench, batch_format="pyarrow")
    return contaminated_docs(docs, bench, n=8)


SQL_CONTAMINATION = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 6, 1)),
           i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')))) AS g
  FROM documents
  WHERE len(string_split(text, ' ')) >= 8),
b AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0)
SELECT DISTINCT doc_id FROM sh WHERE g IN (SELECT g FROM b)
"""


def q_embedding_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means over the embeddings table
    (`similarity.kmeans_fit`, replayable configuration) -> (vec_id,
    cluster). ORACLE-EXACT since round 5 (was rows-only): with
    deterministic first-k init, 6dp-rounded centroids after every
    update and 6dp-rounded full squared distances at assignment (ties
    -> lowest cluster), each of the 5 Lloyd iterations computes over
    identical values in the engine and in the unrolled-CTE DuckDB
    oracle — the `centroid_assign` trick applied iteratively. The
    default (sampled-init, matmul-distance) mode stays pytest-gated in
    test_similarity."""
    from cosmos_ray.functions.similarity import kmeans_fit

    assigns, _ = kmeans_fit(read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                            k=8, iters=5, replayable=True)
    return assigns


def _sql_embedding_kmeans(k: int = 8, iters: int = 5) -> str:
    """Unrolled Lloyd's in SQL: assignment (6dp distances, ties ->
    lowest cluster) + centroid update (6dp means, empty clusters keep
    the previous centroid) per iteration, mirroring
    `kmeans_fit(replayable=True)` value-for-value."""
    parts = [f"""
WITH x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                    AS dim
           FROM embeddings),
c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, dim, v AS m
       FROM x WHERE vec_id < {k})"""]
    for i in range(iters):
        parts.append(f"""
, a{i} AS (
  SELECT x.vec_id, c.cluster,
         round(sum((x.v - c.m) * (x.v - c.m)), 6) AS dist
  FROM x JOIN c{i} c ON c.dim = x.dim GROUP BY 1, 2),
asg{i} AS (
  SELECT vec_id, cluster FROM a{i}
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist, cluster) = 1),
cn{i} AS (
  SELECT a.cluster, x.dim, round(avg(x.v), 6) AS m
  FROM asg{i} a JOIN x ON x.vec_id = a.vec_id GROUP BY 1, 2),
c{i + 1} AS (
  SELECT p.cluster, p.dim, coalesce(n.m, p.m) AS m
  FROM c{i} p LEFT JOIN cn{i} n
    ON n.cluster = p.cluster AND n.dim = p.dim)""")
    parts.append(f"""
, af AS (
  SELECT x.vec_id, c.cluster,
         round(sum((x.v - c.m) * (x.v - c.m)), 6) AS dist
  FROM x JOIN c{iters} c ON c.dim = x.dim GROUP BY 1, 2)
SELECT vec_id, cluster FROM af
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1""")
    return "".join(parts)


SQL_EMBEDDING_KMEANS = _sql_embedding_kmeans()


def q_semantic_dedup(sf_dir: str):
    """SemDedup over the embeddings table (`dedup.semantic_dedup`):
    k-means buckets + in-cluster greedy cosine prune. Iterative float
    clustering — no SQL oracle (like embedding_kmeans); planted-duplicate
    recall and greedy semantics are pytest-gated in test_dedup."""
    from cosmos_ray.functions.dedup import semantic_dedup

    return semantic_dedup(read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                          n_clusters=8, threshold=0.99, iters=5)


def q_vocab_counts(sf_dir: str):
    """Corpus token counts (global representation-learning pass, G8)."""
    from cosmos_ray.functions.embed import corpus_vocab

    return corpus_vocab(read(sf_dir, "documents", ["doc_id", "text"]), min_count=2)


SQL_VOCAB_COUNTS = """
SELECT token, count(*) AS count
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token HAVING count(*) >= 2
"""


def q_redact_pii(sf_dir: str):
    """PII redaction (crawl hygiene). The synthetic corpus carries no
    PII, so both sides deterministically inject a per-doc email, IP and
    phone before redacting — making the oracle a real value check of
    the patterns and replacement order (`textops.redact_pii`)."""
    from cosmos_ray.functions.textops import redact_pii_batch

    def inject(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        suffix = pa.array(
            [f" contact user{i}@example.com from 10.0.{i % 256}.7"
             f" call 555-123-4567" for i in ids], pa.string())
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pc.binary_join_element_wise(
                             t.column("text"), suffix, "")})

    return (read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(inject, batch_format="pyarrow")
            .map_batches(redact_pii_batch, batch_format="pyarrow"))


SQL_REDACT_PII = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com from 10.0.'
              || (doc_id % 256) || '.7 call 555-123-4567' AS t
  FROM documents),
s1 AS (SELECT doc_id,
  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
  regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM aug),
s2 AS (SELECT doc_id, c1,
  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c2,
  regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
  FROM s1),
s3 AS (SELECT doc_id, c1, c2,
  len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS c3,
  regexp_replace(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t
  FROM s2)
SELECT doc_id, t AS clean_text, (c1 + c2 + c3)::BIGINT AS n_redactions FROM s3
"""


def q_repetition_stats(sf_dir: str):
    """Gopher-family repetition filters: duplicate-'line' fraction and
    most-frequent-word character mass (`textops.repetition_stats`)."""
    from cosmos_ray.functions.textops import repetition_stats

    return repetition_stats(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_REPETITION_STATS = """
WITH lines AS (SELECT doc_id, string_split(text, '. ') AS ls FROM documents),
lf AS (SELECT doc_id,
              (len(ls) - len(list_distinct(ls)))::DOUBLE
                / greatest(len(ls), 1) AS dup_raw
       FROM lines),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
c AS (SELECT doc_id, w, count(*) * len(w) AS mass FROM w GROUP BY doc_id, w),
tot AS (SELECT doc_id, sum(mass) AS total FROM c GROUP BY doc_id),
top AS (SELECT doc_id, mass FROM c
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY mass DESC, w DESC) = 1),
j AS (SELECT lf.doc_id, lf.dup_raw,
             CASE WHEN tot.total > 0
                  THEN top.mass::DOUBLE / tot.total ELSE 0 END AS top_raw
      FROM lf JOIN top ON lf.doc_id = top.doc_id
              JOIN tot ON lf.doc_id = tot.doc_id)
SELECT doc_id, round(dup_raw, 6) AS dup_line_frac,
       round(top_raw, 6) AS top_word_char_frac,
       (dup_raw <= 0.3 AND top_raw <= 0.2) AS rep_keep
FROM j
"""


def q_table_checksum(sf_dir: str):
    """Order-insensitive corpus checksum (`sketch.table_checksum`): XOR
    of per-row md5s — the migration/resume equality probe; one partial
    row per batch crosses the exchange."""
    from cosmos_ray.functions.sketch import table_checksum

    return table_checksum(read(sf_dir, "documents", ["doc_id", "text"]),
                          ["doc_id", "text"])


SQL_TABLE_CHECKSUM = """
SELECT lower(to_hex(bit_xor(
           md5_number_upper(CAST(doc_id AS VARCHAR) || ':' || text))))
         AS checksum,
       count(*) AS n_rows
FROM documents
"""


def q_validate_events(sf_dir: str):
    """Data-quality expectations over the events stream
    (`functions/validate.py`): per-rule violation counts, evaluated as
    per-batch combiners (+ one distinct pass for uniqueness)."""
    from cosmos_ray.functions.validate import validate

    ev = read(sf_dir, "events",
              ["event_id", "ts", "user_id", "event_type", "value"])
    return validate(ev, [
        {"check": "not_null", "col": "user_id"},
        {"check": "in_set", "col": "event_type",
         "values": ["click", "error", "purchase", "signup", "view"]},
        {"check": "range", "col": "value", "lo": 0.0, "hi": 30.0},
        {"check": "unique", "col": "event_id"},
    ])


SQL_VALIDATE_EVENTS = """
SELECT 'user_id_not_null' AS rule,
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM events
UNION ALL
SELECT 'event_type_in_set',
       CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                ('click', 'error', 'purchase', 'signup', 'view')
                THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'value_range',
       CAST(sum(CASE WHEN value IS NULL OR value < 0.0 OR value > 30.0
                THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'event_id_unique',
       CAST(count(CASE WHEN event_id IS NOT NULL THEN 1 END)
       - count(DISTINCT event_id) AS BIGINT)
FROM events
"""


def q_funnel(sf_dir: str):
    """Ordered view->click->purchase funnel within 24h of the user's
    first view (`windows.funnel`, earliest-completion greedy semantics
    replayed step by step in SQL)."""
    from cosmos_ray.functions.windows import funnel

    return funnel(read(sf_dir, "events", ["user_id", "ts", "event_type"]),
                  steps=["view", "click", "purchase"], window_s=86_400)


SQL_FUNNEL = """
WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(s1.t1) AS t1
       FROM events e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
         AND epoch_us(e.ts) <= s1.t1 + 86400000000
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id FROM events e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
         AND epoch_us(e.ts) <= s2.t1 + 86400000000
       GROUP BY e.user_id)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
       count(*) AS users FROM s1
UNION ALL SELECT 2, 'click', count(*) FROM s2
UNION ALL SELECT 3, 'purchase', count(*) FROM s3
"""


def q_daily_anomalies(sf_dir: str):
    """Per-event-type daily-volume anomaly flags
    (`windows.daily_anomalies`): z-score vs the type's own daily
    distribution, |z| >= 2."""
    from cosmos_ray.functions.windows import daily_anomalies

    return daily_anomalies(read(sf_dir, "events", ["event_type", "ts"]),
                           z_thresh=2.0)


SQL_DAILY_ANOMALIES = """
WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                      count(*) AS n
               FROM events GROUP BY 1, 2),
st AS (SELECT event_type,
              sum(CAST(n AS DOUBLE)) / count(*) AS mu,
              sqrt(sum(CAST(n AS DOUBLE) * n) / count(*)
                   - (sum(CAST(n AS DOUBLE)) / count(*))
                     * (sum(CAST(n AS DOUBLE)) / count(*))) AS sd
       FROM daily GROUP BY 1)
SELECT d.event_type, d.day, d.n, round((d.n - st.mu) / st.sd, 6) AS z
FROM daily d JOIN st USING (event_type)
WHERE st.sd > 0 AND abs(round((d.n - st.mu) / st.sd, 6)) >= 2.0
"""


def q_event_gaps(sf_dir: str):
    """Per-user inter-event gap (the SQL lag() window): microseconds
    since the user's previous event, -1 for their first. Same
    one-user-hash-exchange shape as sessionize."""
    from cosmos_ray.functions.windows import _bucketed_by_user

    ev = read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        user = g["user_id"].to_numpy()
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = -1
        if len(g) > 1:
            gap[1:] = np.where(user[1:] == user[:-1],
                               ts_us[1:] - ts_us[:-1], -1)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": user, "ts_us": ts_us,
                             "gap_us": gap})

    return _bucketed_by_user(ev, fn)


SQL_EVENT_GAPS = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
FROM events
"""


def q_cohort_retention(sf_dir: str):
    """Cohort-retention rollup over the events stream
    (`windows.cohort_retention`): users bucketed by first-event day,
    distinct active days counted per (cohort, offset)."""
    from cosmos_ray.functions.windows import cohort_retention

    return cohort_retention(read(sf_dir, "events", ["user_id", "ts"]))


SQL_COHORT_RETENTION = """
WITH pd AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS day FROM events),
co AS (SELECT user_id, min(day) AS cohort FROM pd GROUP BY user_id)
SELECT c.cohort AS cohort_day, p.day - c.cohort AS day_offset,
       count(*) AS n_users
FROM pd p JOIN co c USING (user_id)
GROUP BY 1, 2
"""


def q_doc_splits(sf_dir: str):
    """Deterministic leakage-safe train/val/test assignment
    (`pack.assign_splits`: md5(seed:id) % 1000 thresholds — stable
    across runs, engines and re-shards)."""
    from cosmos_ray.functions.pack import assign_splits

    return assign_splits(read(sf_dir, "documents", ["doc_id"]))


SQL_DOC_SPLITS = """
WITH h AS (SELECT doc_id,
                  (md5_number_upper('sp0:' || doc_id) % 1000)::BIGINT AS draw
           FROM documents)
SELECT doc_id, draw,
       CASE WHEN draw < 900 THEN 'train'
            WHEN draw < 950 THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis one-pass keys over md5 uniforms, `relational.weighted_sample`)
    — 50 docs with inclusion probability proportional to n_chars."""
    from cosmos_ray.queries.relational import weighted_sample

    return weighted_sample(read(sf_dir, "documents", ["doc_id", "n_chars"]),
                           n=50, weight_col="n_chars")


SQL_WEIGHTED_SAMPLE = """
WITH h AS (SELECT doc_id, n_chars,
                  md5_number_upper('w0:' || doc_id) AS hh
           FROM documents WHERE n_chars > 0),
k AS (SELECT doc_id, n_chars,
             ln((hh::DOUBLE + 0.5) / 18446744073709551616.0)
               / n_chars::DOUBLE AS key
      FROM h)
SELECT doc_id, n_chars, round(key, 9) AS draw
FROM k ORDER BY key DESC, doc_id ASC LIMIT 50
"""


def q_nb_lang(sf_dir: str):
    """Trainable corpus classifier (CCNet-style fastText-filter analog,
    count-based so it replays exactly in SQL): multinomial Naive Bayes
    trained distributed on (lang, token) counts, scored distributed with
    the model broadcast once (`functions/classify.py`). Argmax over
    6dp-rounded class scores, lowest-label tie-break."""
    from cosmos_ray.functions.classify import naive_bayes_predict

    return naive_bayes_predict(
        read(sf_dir, "documents", ["doc_id", "lang", "text"]))


SQL_NB_LANG = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
lab AS (SELECT doc_id, lang AS c FROM documents),
cnt AS (SELECT l.c, t.w, count(*)::DOUBLE AS n
        FROM tok t JOIN lab l USING (doc_id) GROUP BY 1, 2),
nd AS (SELECT lang AS c, count(*)::DOUBLE AS d FROM documents GROUP BY 1),
tot AS (SELECT c, sum(n) AS tc FROM cnt GROUP BY c),
v AS (SELECT count(DISTINCT w)::DOUBLE AS V FROM tok),
td AS (SELECT sum(d) AS t FROM nd),
sc AS (SELECT t.doc_id, n.c,
              ln(n.d / td.t)
              + sum(ln((coalesce(cn.n, 0) + 1.0) / (tt.tc + v.V))) AS s
       FROM tok t
       CROSS JOIN nd n
       JOIN tot tt ON tt.c = n.c
       CROSS JOIN v CROSS JOIN td
       LEFT JOIN cnt cn ON cn.c = n.c AND cn.w = t.w
       GROUP BY t.doc_id, n.c, n.d, tt.tc, v.V, td.t),
rs AS (SELECT doc_id, c, round(s, 6) AS r FROM sc),
pick AS (SELECT doc_id, c AS pred, r AS score,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY r DESC, c ASC) AS rn
         FROM rs)
SELECT doc_id, pred, score FROM pick WHERE rn = 1
"""


def q_perplexity(sf_dir: str):
    """Model-based quality filter: per-doc perplexity under an
    add-1-smoothed bigram LM trained on the same corpus
    (`functions/lm.py` — distributed count combiners, model broadcast
    once, vectorized scoring)."""
    from cosmos_ray.functions.lm import perplexity_scores

    return perplexity_scores(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_PERPLEXITY = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
uc AS (SELECT w, count(*) AS c FROM (SELECT unnest(l) AS w FROM toks) GROUP BY w),
v AS (SELECT count(*) AS V FROM uc),
bi AS (SELECT doc_id,
              unnest(list_transform(range(1, len(l)), i -> l[i])) AS w1,
              unnest(list_transform(range(1, len(l)), i -> l[i+1])) AS w2
       FROM toks),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
s AS (SELECT bi.doc_id,
             ln((bc.c12 + 1.0) / (uc.c + 1.0 * (SELECT V FROM v))) AS lp
      FROM bi JOIN bc USING (w1, w2) JOIN uc ON bi.w1 = uc.w),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS lp_sum FROM s GROUP BY doc_id)
SELECT d.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams,
       round(agg.lp_sum, 6) AS logprob,
       round(exp(-agg.lp_sum / agg.n_bigrams), 6) AS ppl
FROM documents d LEFT JOIN agg USING (doc_id)
"""


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training (distributed word counts -> model-sized
    driver merge loop, `functions/bpe.py`) -> (rank, left, right).
    Iterative/non-SQL, rows-only; exact gate = independent-reference
    replay in tests/test_bpe.py."""
    from cosmos_ray.functions.bpe import train_bpe

    merges = train_bpe(read(sf_dir, "documents", ["doc_id", "text"]),
                       num_merges=64)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
    })


def q_bpe_token_counts(sf_dir: str):
    """Per-doc subword token counts under a corpus-trained BPE (broadcast
    ranks, actor-pool encode with per-actor memoization) — rows-only."""
    from cosmos_ray.functions.bpe import bpe_token_counts, train_bpe

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    merges = train_bpe(docs, num_merges=64)
    return bpe_token_counts(docs, merges)


def q_word_vectors(sf_dir: str):
    """Corpus word vectors via PPMI+SVD (D6, the compute_word_vecs
    global-reduce analog) — rows-only; semantics tested in
    tests/test_embed_vectors.py."""
    from cosmos_ray.functions.embed import train_word_vectors

    return train_word_vectors(read(sf_dir, "documents", ["doc_id", "text"]),
                              dim=16, vocab_size=512)


def q_embed_docs(sf_dir: str):
    """Feature-hashing document embeddings (actor-pool embedder, D6/D7
    analog) — non-SQL, rows-only."""
    from cosmos_ray.functions.embed import embed_documents

    return embed_documents(read(sf_dir, "documents", ["doc_id", "text"]))


def q_doc_windows(sf_dir: str):
    """Sliding-window context splitter (S11), window=64 stride=16 —
    SQL-expressible via range + list_slice (start grid =
    range(0, max(len-48, 1), 16), which provably equals the generator's
    emit-then-break-on-cover loop)."""
    from cosmos_ray.stages.export import sliding_windows

    return sliding_windows(read(sf_dir, "documents", ["doc_id", "text"]),
                           window=64, stride=16)


SQL_DOC_WINDOWS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
           WHERE length(trim(text)) > 0)
SELECT doc_id,
       CAST(st // 16 AS INT) AS window_id,
       array_to_string(list_slice(ws, st + 1, st + 64), ' ') AS window_text
FROM (SELECT doc_id, ws,
             unnest(range(0, greatest(len(ws) - 48, 1), 16)) AS st
      FROM w)
"""


# --------------------------------------------------------------------------
# Similarity search over `embeddings`
# --------------------------------------------------------------------------


def q_embedding_topk(sf_dir: str):
    """Exact cosine top-10 for the query vector = embedding of vec_id 0."""
    import pyarrow.parquet as pq

    from cosmos_ray.functions.similarity import brute_force_topk

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qvec = np.asarray(
        tbl.filter(pc.equal(tbl.column("vec_id"), 0)).column("embedding").to_pylist(),
        dtype=np.float64,
    )
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, qvec, k=10)
    return out.map_batches(
        lambda t: t.drop_columns(["query_id"]).set_column(
            1, "cosine", pc.round(t.column("cosine"), 6, round_mode="half_towards_infinity")
        ).set_column(2, "rank", pc.cast(t.column("rank"), pa.int64())),
        batch_format="pyarrow",
    )


def q_mmr_rerank(sf_dir: str):
    """Diversity re-ranking of a retrieved candidate page with MMR
    (`retrieval.mmr_rerank`): greedy relevance-vs-redundancy tradeoff
    over the first 50 vectors, query = embedding of vec_id 0. The
    greedy selection is replayed in SQL by unrolling the k=10 steps
    into chained pick/sel CTEs (argmax with the same id tie-break)."""
    import pyarrow.parquet as pq

    from cosmos_ray.functions.retrieval import mmr_rerank

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qvec = np.asarray(
        tbl.filter(pc.equal(tbl.column("vec_id"), 0))
        .column("embedding").to_pylist(), dtype=np.float64)
    cands = read(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        expr="vec_id < 50")
    return mmr_rerank(cands, qvec, k=10, lam=0.7, id_col="vec_id")


def _sql_mmr_rerank(k: int = 10, lam: float = 0.7, n_cands: int = 50) -> str:
    """DuckDB replay of the greedy MMR loop: step i's pick is the
    unselected candidate maximizing ``lam*rel - (1-lam)*max cos(d,
    selected)`` (ties -> lowest vec_id), unrolled into k chained CTEs.
    Exact modulo float argmax near-ties (none in the synthetic data —
    the same tolerance embedding_topk's oracle already relies on)."""
    # MATERIALIZED everywhere: DuckDB inlines plain CTEs, so an
    # un-materialized sel{i} (referenced 3x by level i+1) expands
    # ~3^k-fold and hangs the planner; the base CTEs would also
    # rescan the parquet source once per unrolled step
    parts = [f"""
q AS MATERIALIZED (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0),
c AS MATERIALIZED (
  SELECT vec_id,
         list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                (SELECT qv FROM q)) AS rel
  FROM embeddings WHERE vec_id < {n_cands}),
sims AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS s
  FROM embeddings a JOIN embeddings b
    ON a.vec_id < {n_cands} AND b.vec_id < {n_cands}),
pick0 AS (SELECT vec_id, {lam}*rel AS mmr, 1 AS rank FROM c
          ORDER BY mmr DESC, vec_id LIMIT 1),
sel0 AS MATERIALIZED (SELECT vec_id, mmr, rank FROM pick0)"""]
    for i in range(1, k):
        parts.append(f"""
pick{i} AS (
  SELECT c.vec_id,
         {lam}*c.rel - {round(1 - lam, 12)}*(
             SELECT max(s) FROM sims
             WHERE sims.ia = c.vec_id
               AND sims.ib IN (SELECT vec_id FROM sel{i - 1})
         ) AS mmr,
         {i + 1} AS rank
  FROM c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  ORDER BY mmr DESC, c.vec_id LIMIT 1),
sel{i} AS MATERIALIZED (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM pick{i})""")
    return ("WITH " + ",".join(parts) +
            f"\nSELECT vec_id, round(mmr, 6) AS mmr, CAST(rank AS BIGINT) AS rank FROM sel{k - 1}")


SQL_MMR_RERANK = _sql_mmr_rerank()


def q_percent_rank(sf_dir: str):
    """Per-language percentile-rank normalization of doc length (the
    SQL window function percent_rank, replayed distributed): rank ties
    share the min rank; single-row groups rank 0."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pr(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_chars"].to_numpy()
        sv = np.sort(v)
        r = np.searchsorted(sv, v, side="left")  # count strictly less
        denom = max(len(v) - 1, 1)
        out = g[["doc_id", "lang", "n_chars"]].copy()
        p = r / denom
        out["pr"] = np.floor(p * 1e6 + 0.5) / 1e6
        return out

    return bucketed_group_apply(docs, ["lang"], pr)


SQL_PERCENT_RANK = """
SELECT doc_id, lang, n_chars,
       round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars),
             6) AS pr
FROM documents
"""


def q_seasonal_naive(sf_dir: str):
    """Seasonal-naive backtest: predict each day's event volume with the
    count 7 days earlier and score MAE per event_type — the sanity
    baseline every volume forecast is judged against. The (type, day)
    count table is days x types bounded; the lag-7 align + MAE is
    vectorized driver work under the usual cap."""
    from cosmos_ray.queries.relational import collect_small

    ev = read(sf_dir, "events", ["event_type", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        day = pc.multiply(pc.divide(us, pa.scalar(86_400_000_000)),
                          pa.scalar(86_400_000_000))
        return pa.table({"event_type": t.column("event_type"),
                         "day_us": day})

    counts = (ev.map_batches(to_day, batch_format="pyarrow")
              .groupby(["event_type", "day_us"])
              .aggregate(Count(alias_name="n")))
    tbl = collect_small(counts, cap_rows=2_000_000)
    if tbl is None:
        raise ValueError("(type, day) table exceeded the driver cap")
    df = tbl.to_pandas()
    week = 7 * 86_400_000_000
    prev = df.rename(columns={"day_us": "pday", "n": "n_prev"})
    prev["day_us"] = prev["pday"] + week
    m = df.merge(prev[["event_type", "day_us", "n_prev"]],
                 on=["event_type", "day_us"], how="inner")
    err = (m["n"] - m["n_prev"]).abs()
    out = (pd.DataFrame({"event_type": m["event_type"], "err": err})
           .groupby("event_type", as_index=False)
           .agg(mae=("err", "mean"), n_days=("err", "size")))
    return rd.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"].tolist(), pa.string()),
        "mae": pa.array(np.round(out["mae"].to_numpy(), 6), pa.float64()),
        "n_days": pa.array(out["n_days"].to_numpy(), pa.int64()),
    }))


SQL_SEASONAL_NAIVE = """
WITH d AS (SELECT event_type,
                  (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
                  count(*) AS n
           FROM events GROUP BY 1, 2)
SELECT a.event_type,
       round(avg(abs(a.n - b.n)), 6) AS mae,
       count(*) AS n_days
FROM d a JOIN d b ON b.event_type = a.event_type
                 AND b.day_us = a.day_us - 7 * 86400000000
GROUP BY 1
"""


def q_source_entropy(sf_dir: str):
    """Diversity metric per language: Shannon entropy (nats) of the
    source distribution — the mix-health check before sampling. Exact
    (lang, source) counts exchange; entropy from ratios of BIGINTs is
    a sources-bounded map, rounded 6dp."""
    counts = (read(sf_dir, "documents", ["lang", "source"])
              .groupby(["lang", "source"])
              .aggregate(Count(alias_name="n")))
    totals = counts.groupby("lang").aggregate(Sum("n", alias_name="tot"))
    j = join_or_broadcast(counts, totals, key="lang", add_cols=["tot"])

    def plogp(t: pa.Table) -> pa.Table:
        p = (t.column("n").to_numpy(zero_copy_only=False)
             / t.column("tot").to_numpy(zero_copy_only=False))
        return pa.table({"lang": t.column("lang"),
                         "e": pa.array(-p * np.log(p), pa.float64())})

    ent = (j.map_batches(plogp, batch_format="pyarrow")
           .groupby("lang").aggregate(Sum("e", alias_name="entropy"),
                                      Count(alias_name="n_sources")))
    return ent.map_batches(
        lambda t: pa.table({
            "lang": t.column("lang"),
            "entropy": pa.array(np.round(
                t.column("entropy").to_numpy(zero_copy_only=False), 6),
                pa.float64()),
            "n_sources": t.column("n_sources").cast(pa.int64()),
        }), batch_format="pyarrow")


SQL_SOURCE_ENTROPY = """
WITH c AS (SELECT lang, source, count(*) AS n
           FROM documents GROUP BY 1, 2),
t AS (SELECT lang, sum(n) AS tot FROM c GROUP BY 1)
SELECT c.lang,
       round(sum(-(c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 6)
           AS entropy,
       count(*) AS n_sources
FROM c JOIN t USING (lang)
GROUP BY 1
"""


def q_assoc_rules(sf_dir: str):
    """Association rules over per-user event-type baskets (market-basket
    support / confidence / lift): ordered type pairs both done by the
    same user. Baskets reduce to DISTINCT (user, type) first; in-bucket
    per-user pair fan-out is bounded by the type vocabulary; the final
    (from, to) rollup is vocabulary-sized. Ratios are computed from
    exact BIGINT counts identically on both sides, rounded 6dp."""
    from cosmos_ray.functions.windows import _bucketed_by_user
    from cosmos_ray.queries.relational import collect_small

    ev = read(sf_dir, "events", ["user_id", "event_type"])
    distinct = (ev.groupby(["user_id", "event_type"])
                .aggregate(Count(alias_name="__n")).drop_columns(["__n"]))

    n_users = (distinct.groupby("user_id")
               .aggregate(Count(alias_name="__k")).count())

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_f, out_t = [], []
        for _, h in g.groupby("user_id", sort=False):
            tps = np.sort(h["event_type"].unique())
            if len(tps) < 2:
                continue
            i, j = np.meshgrid(np.arange(len(tps)), np.arange(len(tps)),
                               indexing="ij")
            m = i.ravel() != j.ravel()
            out_f.append(tps[i.ravel()[m]])
            out_t.append(tps[j.ravel()[m]])
        if not out_f:
            return pd.DataFrame({"from_type": pd.Series([], dtype=str),
                                 "to_type": pd.Series([], dtype=str)})
        return pd.DataFrame({"from_type": np.concatenate(out_f),
                             "to_type": np.concatenate(out_t)})

    pair_counts = (_bucketed_by_user(distinct, pairs)
                   .groupby(["from_type", "to_type"])
                   .aggregate(Count(alias_name="n_both")))
    type_counts_t = collect_small(
        distinct.groupby("event_type").aggregate(Count(alias_name="n")),
        cap_rows=1_000_000)
    tc = dict(zip(type_counts_t.column("event_type").to_pylist(),
                  type_counts_t.column("n").to_pylist()))

    def finish(t: pa.Table) -> pa.Table:
        f = t.column("from_type").to_pylist()
        to = t.column("to_type").to_pylist()
        nb = t.column("n_both").to_numpy(zero_copy_only=False).astype(np.float64)
        nf = np.array([tc[x] for x in f], np.float64)
        nt = np.array([tc[x] for x in to], np.float64)
        return pa.table({
            "from_type": t.column("from_type"),
            "to_type": t.column("to_type"),
            "n_both": t.column("n_both").cast(pa.int64()),
            "support": pa.array(np.round(nb / n_users, 6), pa.float64()),
            "confidence": pa.array(np.round(nb / nf, 6), pa.float64()),
            "lift": pa.array(np.round(nb / nf / (nt / n_users), 6),
                             pa.float64()),
        })

    return pair_counts.map_batches(finish, batch_format="pyarrow")


SQL_ASSOC_RULES = """
WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n FROM b),
tcnt AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n FROM b GROUP BY 1),
p AS (SELECT a.event_type AS from_type, c.event_type AS to_type,
             count(*) AS n_both
      FROM b a JOIN b c ON a.user_id = c.user_id
                       AND a.event_type <> c.event_type
      GROUP BY 1, 2)
SELECT p.from_type, p.to_type, p.n_both,
       round(p.n_both / (SELECT n FROM nu), 6) AS support,
       round(p.n_both / f.n, 6) AS confidence,
       round(p.n_both / f.n / (t.n / (SELECT n FROM nu)), 6) AS lift
FROM p JOIN tcnt f ON f.event_type = p.from_type
       JOIN tcnt t ON t.event_type = p.to_type
"""


def q_balanced_docs(sf_dir: str):
    """Balanced class downsampling: every language reduced to the size
    of the SMALLEST language by the deterministic md5-draw order (the
    shuffle_shards convention) — the class-rebalance pass before
    training. Group sizes broadcast tiny; selection is a vectorized
    rank-within-group cut, payload untouched."""
    from cosmos_ray.queries.relational import bucketed_group_apply, collect_small

    docs = read(sf_dir, "documents", ["doc_id", "lang"])
    sizes = collect_small(
        docs.groupby("lang").aggregate(Count(alias_name="n")),
        cap_rows=1_000_000)
    min_n = int(min(sizes.column("n").to_pylist()))

    import hashlib

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        d = g["doc_id"].to_numpy()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(f"bs0:{i}".encode()).digest()[:8],
                            "little") for i in d),
            dtype=np.uint64, count=len(d))
        order = np.lexsort((d, h))
        keep = np.zeros(len(d), dtype=bool)
        # per-lang groups arrive whole; rank within THIS group
        keep[order[:min_n]] = True
        out = g.loc[keep, ["doc_id", "lang"]]
        return out

    return bucketed_group_apply(docs, ["lang"], cut)


SQL_BALANCED_DOCS = """
WITH m AS (SELECT min(n) AS min_n
           FROM (SELECT count(*) AS n FROM documents GROUP BY lang)),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5_number_upper('bs0:' || doc_id),
                                         doc_id) AS rn
      FROM documents)
SELECT doc_id, lang FROM r WHERE rn <= (SELECT min_n FROM m)
"""


def q_user_modal_type(sf_dir: str):
    """Per-group MODE: each user's most frequent event_type (ties ->
    lexicographic min, DuckDB mode()'s deterministic pick replayed with
    an explicit (count desc, type asc) argmax). Two-stage: (user, type)
    count exchange, then a vectorized per-user argmax."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    counts = (read(sf_dir, "events", ["user_id", "event_type"])
              .groupby(["user_id", "event_type"])
              .aggregate(Count(alias_name="n")))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="stable")
        h = g.groupby("user_id", sort=False).head(1)
        return pd.DataFrame({"user_id": h["user_id"].to_numpy(),
                             "modal_type": h["event_type"].to_numpy(),
                             "n": h["n"].to_numpy()})

    return bucketed_group_apply(counts, ["user_id"], argmax)


SQL_USER_MODAL_TYPE = """
WITH c AS (SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY 1, 2)
SELECT user_id, event_type AS modal_type, n
FROM c
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) = 1
"""


def q_user_growth(sf_dir: str):
    """Cumulative-distinct growth curve: running total of users ever
    seen, by day — first-seen day per user (one groupby-min), then a
    day-bounded cumulative sum (the table is days-sized, driver-safe by
    construction)."""
    from cosmos_ray.queries.relational import collect_small

    ev = read(sf_dir, "events", ["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        day = pc.multiply(pc.divide(us, pa.scalar(86_400_000_000)),
                          pa.scalar(86_400_000_000))
        return pa.table({"user_id": t.column("user_id"), "day_us": day})

    first = (ev.map_batches(to_day, batch_format="pyarrow")
             .groupby("user_id").aggregate(Min("day_us", alias_name="d0")))
    per_day = first.groupby("d0").aggregate(Count(alias_name="new_users"))
    tbl = collect_small(per_day, cap_rows=2_000_000)
    if tbl is None:
        raise ValueError("per-day table exceeded the driver cap")
    df = tbl.to_pandas().sort_values("d0")
    return rd.from_arrow(pa.table({
        "day_us": pa.array(df["d0"].to_numpy(), pa.int64()),
        "new_users": pa.array(df["new_users"].to_numpy(), pa.int64()),
        "total_users": pa.array(df["new_users"].cumsum().to_numpy(),
                                pa.int64()),
    }))


SQL_USER_GROWTH = """
WITH f AS (SELECT user_id,
                  min((epoch_us(ts) // 86400000000) * 86400000000) AS d0
           FROM events GROUP BY 1),
d AS (SELECT d0 AS day_us, count(*) AS new_users FROM f GROUP BY 1)
SELECT day_us, new_users,
       SUM(new_users) OVER (ORDER BY day_us
                            ROWS UNBOUNDED PRECEDING) AS total_users
FROM d
"""


def q_event_transitions(sf_dir: str):
    """Markov transition counts: (prev event_type -> event_type) pairs
    per user in time order, counted corpus-wide — the event-sequence
    model input. One user-hash exchange; the in-bucket lag is a
    vectorized shift."""
    from cosmos_ray.functions.windows import _bucketed_by_user

    ev = read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        et = g["event_type"].to_numpy()
        user = g["user_id"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = user[1:] == user[:-1]
        src = np.empty_like(et)
        src[1:] = et[:-1]
        d = pd.DataFrame({"from_type": src[same], "to_type": et[same]})
        return (d.groupby(["from_type", "to_type"], sort=False)
                .size().rename("n").reset_index())

    partials = _bucketed_by_user(ev, trans)
    return (partials.groupby(["from_type", "to_type"])
            .aggregate(Sum("n", alias_name="n")))


SQL_EVENT_TRANSITIONS = """
WITH l AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events)
SELECT from_type, to_type, count(*) AS n
FROM l WHERE from_type IS NOT NULL GROUP BY 1, 2
"""


def q_winsorized_values(sf_dir: str):
    """Winsorization (outlier capping at group quantiles): clip value
    into [p05, p95] per event_type, then roll up sum/count of the
    clipped column. Quantiles are discrete (quantile_disc pick — exact
    data values, no interpolation floats); caps broadcast tiny."""
    from cosmos_ray.queries.relational import collect_small, group_quantiles

    ev = read(sf_dir, "events", ["event_type", "value"])
    caps_t = collect_small(
        group_quantiles(ev, ["event_type"], "value", qs=(0.05, 0.95)),
        cap_rows=1_000_000)
    if caps_t is None:
        raise ValueError("per-type caps exceeded the driver cap")
    lo = dict(zip(caps_t.column("event_type").to_pylist(),
                  caps_t.column("q5").to_pylist()))
    hi = dict(zip(caps_t.column("event_type").to_pylist(),
                  caps_t.column("q95").to_pylist()))

    def clip(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        lov = np.array([lo[x] for x in et])
        hiv = np.array([hi[x] for x in et])
        return pa.table({
            "event_type": t.column("event_type"),
            "w": pa.array(np.minimum(np.maximum(v, lov), hiv), pa.float64()),
        })

    agg = (ev.map_batches(clip, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("w", alias_name="sum_winsorized"),
                      Count(alias_name="n")))
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t.column("event_type"),
            "sum_winsorized": pa.array(np.round(
                t.column("sum_winsorized").to_numpy(zero_copy_only=False), 4),
                pa.float64()),
            "n": t.column("n").cast(pa.int64()),
        }), batch_format="pyarrow")


SQL_WINSORIZED_VALUES = """
WITH caps AS (
  SELECT event_type,
         quantile_disc(value, 0.05) AS lo, quantile_disc(value, 0.95) AS hi
  FROM events GROUP BY 1)
SELECT e.event_type,
       round(sum(least(greatest(e.value, c.lo), c.hi)), 4) AS sum_winsorized,
       count(*) AS n
FROM events e JOIN caps c USING (event_type)
GROUP BY 1
"""


def q_revenue_share(sf_dir: str):
    """Percent-of-total window (SUM OVER ()): each nation's share of
    total ASIA-1996 local revenue — one grand-total broadcast over the
    Q5 aggregate (the 'ratio to report' reporting window)."""
    agg = q_local_supplier_volume(sf_dir)

    def share(t: pa.Table) -> pa.Table:
        rev = t.column("revenue").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": t.column("n_name"),
            "revenue": t.column("revenue"),
            "share": pa.array(np.round(rev / rev.sum(), 6), pa.float64()),
        })

    # the aggregate is nations-sized: one block, so the in-batch total
    # IS the grand total (repartition(1) keeps that true if it ever
    # arrives split)
    return agg.repartition(1).map_batches(share, batch_format="pyarrow")


SQL_REVENUE_SHARE = """
WITH a AS (
  SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN orders ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY n_name)
SELECT n_name, revenue,
       round(revenue / sum(revenue) OVER (), 6) AS share
FROM a
"""


def q_order_quartiles(sf_dir: str):
    """SQL NTILE(4) replayed distributed: quartile bucket of
    o_totalprice within each priority (first n%4 buckets take the extra
    row, ties broken by orderkey exactly like the window's ORDER BY
    o_totalprice, o_orderkey)."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def ntile4(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="stable")
        n = len(g)
        q, rem = divmod(n, 4)
        r = np.arange(n)  # 0-based rank
        cut = rem * (q + 1)
        bucket = np.where(r < cut, r // max(q + 1, 1),
                          rem + (r - cut) // max(q, 1)) + 1
        out = g[["o_orderkey", "o_orderpriority"]].copy()
        out["quartile"] = bucket.astype(np.int64)
        return out

    return bucketed_group_apply(orders, ["o_orderpriority"], ntile4)


SQL_ORDER_QUARTILES = """
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS BIGINT)
           AS quartile
FROM orders
"""


def q_user_paths(sf_dir: str):
    """Path analysis: the '>'-joined sequence of each user's FIRST 5
    event types (ts, event_id order), counted across users — the
    product-analytics 'common onboarding paths' rollup. Per-user
    assembly is one hash-bucket exchange; the path strings (bounded:
    5 short tokens) then take a tiny groupby."""
    from cosmos_ray.functions.windows import _bucketed_by_user

    ev = read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        h = g.groupby("user_id", sort=False).head(5)
        p = h.groupby("user_id", sort=False)["event_type"].agg(">".join)
        return pd.DataFrame({"path5": p.to_numpy()})

    seqs = _bucketed_by_user(ev, paths)
    return seqs.groupby("path5").aggregate(Count(alias_name="n_users"))


SQL_USER_PATHS = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path5
      FROM r WHERE rn <= 5 GROUP BY user_id)
SELECT path5, count(*) AS n_users FROM p GROUP BY 1
"""


def q_events_rollup(sf_dir: str):
    """GROUPING-SETS rollup of events: (type, day) cells, per-type
    subtotals and the grand total in one result (sentinels day=-1,
    event_type='ALL'), built from ONE combiner pass reused by all three
    levels."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["event_type", "ts"])

    def partials(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()),
                        86_400_000_000)
        grp = (pa.table({"event_type": t.column("event_type"), "day": day})
               .group_by(["event_type", "day"])
               .aggregate([([], "count_all")]))
        return pa.table({"event_type": grp.column("event_type"),
                         "day": grp.column("day"),
                         "n": grp.column("count_all").cast(pa.int64())})

    cells = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby(["event_type", "day"])
             .aggregate(Sum("n", alias_name="n")).materialize())
    by_type = (cells.groupby("event_type").aggregate(Sum("n", alias_name="n"))
               .map_batches(lambda t: t.append_column(
                   "day", pa.array([-1] * t.num_rows, pa.int64())),
                   batch_format="pyarrow")
               .select_columns(["event_type", "day", "n"]))
    total = int(cells.sum("n") or 0)
    grand = rd.from_arrow(pa.table({
        "event_type": pa.array(["ALL"]),
        "day": pa.array([-1], pa.int64()),
        "n": pa.array([total], pa.int64())}))
    return cells.select_columns(["event_type", "day", "n"]).union(
        by_type).union(grand)


SQL_EVENTS_ROLLUP = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, -1) AS day,
       n
FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             count(*) AS n
      FROM events GROUP BY ROLLUP (event_type, day))
"""


def q_char_outliers(sf_dir: str):
    """Per-language length-outlier docs: n_chars strictly above the
    lang's own exact p95 (`relational.group_quantiles` composed into a
    broadcast filter — the percentile-based quality-filter shape)."""
    from cosmos_ray.queries.relational import collect_small, group_quantiles

    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    qs = group_quantiles(docs, ["lang"], "n_chars", qs=(0.95,))
    t = collect_small(qs, cap_rows=100_000)  # one row per language
    cut = dict(zip(t.column("lang").to_pylist(),
                   t.column("q95").to_pylist()))

    def keep(b: pa.Table) -> pa.Table:
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        lim = np.empty(len(lang), dtype=np.float64)
        for lg, v in cut.items():  # loop over LANGUAGES, not rows
            lim[lang == lg] = v
        return b.filter(pa.array(b.column("n_chars").to_numpy() > lim))

    return docs.map_batches(keep, batch_format="pyarrow")


SQL_CHAR_OUTLIERS = """
WITH q AS (SELECT lang, quantile_disc(n_chars, 0.95) AS p95
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN q USING (lang)
WHERE d.n_chars > q.p95
"""


def q_class_centroids(sf_dir: str):
    """Per-label embedding centroids (the class-prototype computation
    behind centroid classifiers and SemDedup cells): per-batch
    (label, dim-sum, count) combiners, one small groupby — the exchange
    is labels x dims, independent of corpus size. -> (label, dim, mean),
    mean rounded to 6dp."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "embeddings", ["label", "embedding"])
    DIM = 64

    def partials(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False)
        V = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), V.shape[1]))
        np.add.at(sums, inv, V)
        cnt = np.bincount(inv)
        cols = {"label": pa.array(uniq, pa.int64()),
                "c": pa.array(cnt, pa.int64())}
        for d in range(V.shape[1]):
            cols[f"s_{d}"] = pa.array(sums[:, d], pa.float64())
        return pa.table(cols)

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("label")
           .aggregate(Sum("c", alias_name="c"),
                      *[Sum(f"s_{d}", alias_name=f"s_{d}")
                        for d in range(DIM)]))

    def finish(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy()
        c = t.column("c").to_numpy().astype(np.float64)
        n = t.num_rows
        labs, dims, means = [], [], []
        for d in range(DIM):  # loop over DIMS, not rows
            m = t.column(f"s_{d}").to_numpy() / c
            labs.append(lab)
            dims.append(np.full(n, d, np.int64))
            means.append(np.sign(m) * np.floor(np.abs(m) * 1e6 + 0.5) / 1e6)
        return pa.table({
            "label": pa.array(np.concatenate(labs), pa.int64()),
            "dim": pa.array(np.concatenate(dims), pa.int64()),
            "mean": pa.array(np.concatenate(means), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_CLASS_CENTROIDS = """
WITH x AS (SELECT CAST(label AS BIGINT) AS label,
                  CAST(unnest(embedding) AS DOUBLE) AS v,
                  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
           FROM embeddings)
SELECT label, dim, round(avg(v), 6) AS mean
FROM x GROUP BY label, dim
"""


def q_centroid_assign(sf_dir: str):
    """Nearest-centroid classification: every vector assigned to the
    closest per-label centroid (squared euclidean on 6dp-rounded
    centroids so engine and oracle argmin over identical values; ties
    -> lowest label). Centroids move as (labels x dims) combiner
    partials; assignment is one broadcast matrix per batch."""
    import ray as _ray

    from cosmos_ray.queries.relational import collect_small

    ds = read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
    DIM = 64

    def partials(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False)
        V = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), V.shape[1]))
        np.add.at(sums, inv, V)
        cols = {"label": pa.array(uniq, pa.int64()),
                "c": pa.array(np.bincount(inv), pa.int64())}
        for d in range(V.shape[1]):
            cols[f"s_{d}"] = pa.array(sums[:, d], pa.float64())
        return pa.table(cols)

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("label")
           .aggregate(Sum("c", alias_name="c"),
                      *[Sum(f"s_{d}", alias_name=f"s_{d}")
                        for d in range(DIM)]))
    cent = collect_small(agg, cap_rows=100_000)
    if cent is None:
        raise ValueError("centroid table exceeded the broadcast cap")
    order = np.argsort(cent.column("label").to_numpy())
    labels = cent.column("label").to_numpy()[order]
    cnt = cent.column("c").to_numpy().astype(np.float64)[order]
    C = np.stack([cent.column(f"s_{d}").to_numpy()[order] / cnt
                  for d in range(DIM)], axis=1)
    C = np.round(C, 6)
    c_ref = _ray.put((labels, C))

    def assign(t: pa.Table, _c=c_ref) -> pa.Table:
        labs, cm = _ray.get(_c)
        V = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        d2 = ((V[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        j = np.argmin(d2, axis=1)  # labels sorted asc -> tie = lowest
        return pa.table({
            "vec_id": t.column("vec_id"),
            "label": pa.array(labs[j], pa.int64()),
            "dist": pa.array(np.round(d2[np.arange(len(j)), j], 6),
                             pa.float64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


SQL_CENTROID_ASSIGN = """
WITH x AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                  CAST(unnest(embedding) AS DOUBLE) AS v,
                  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
           FROM embeddings),
cent AS (SELECT label, dim, round(avg(v), 6) AS m FROM x GROUP BY 1, 2),
d AS (SELECT x.vec_id, cent.label,
             round(sum((x.v - cent.m) * (x.v - cent.m)), 6) AS dist
      FROM (SELECT vec_id, v, dim FROM x) x
      JOIN cent ON cent.dim = x.dim GROUP BY 1, 2)
SELECT vec_id, label, dist FROM d
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, label) = 1
"""


def q_knn_join(sf_dir: str):
    """kNN similarity join: each of the first 5 vectors joined to its 3
    nearest OTHER vectors (`similarity.knn_join`, slabbed broadcast +
    streaming partial top-k over the right side)."""
    from cosmos_ray.functions.similarity import knn_join

    emb = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    left = emb.filter(expr="vec_id < 5")
    right = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_join(left, right, k=3, exclude_self=True)


SQL_KNN_JOIN = """
WITH l AS (SELECT vec_id AS left_id, CAST(embedding AS DOUBLE[]) AS le
           FROM embeddings WHERE vec_id < 5),
p AS (SELECT l.left_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), l.le)
               AS raw,
             CAST(row_number() OVER (PARTITION BY l.left_id
                  ORDER BY list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]), l.le) DESC, e.vec_id)
               AS BIGINT) AS rank
      FROM embeddings e, l WHERE e.vec_id <> l.left_id)
SELECT left_id, vec_id, round(raw, 6) AS cosine, rank
FROM p WHERE rank <= 3
"""


SQL_EMBEDDING_TOPK = """
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
       CAST(row_number() OVER (
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])) DESC,
                     e.vec_id) AS BIGINT) AS rank
FROM embeddings e, q
ORDER BY rank
LIMIT 10
"""


# --------------------------------------------------------------------------
# KG over documents.text — SQL-expressible regex-SVO variant
# --------------------------------------------------------------------------

_DOC_SVO = re.compile(r"([a-z]+) (join|merge|scan) ([a-z]+)")


def _doc_triples_batch(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    o_id, o_s, o_p, o_o = [], [], [], []
    for did, text in zip(ids, texts):
        for m in _DOC_SVO.finditer(text):
            o_id.append(did)
            o_s.append(m.group(1))
            o_p.append(m.group(2))
            o_o.append(m.group(3))
    return pa.table(
        {
            "doc_id": pa.array(o_id, pa.int64()),
            "subj": pa.array(o_s, pa.string()),
            "pred": pa.array(o_p, pa.string()),
            "obj": pa.array(o_o, pa.string()),
        }
    )


def q_doc_triples(sf_dir: str):
    """Distinct (doc_id, subj, pred, obj) from a regex SVO pattern —
    groupby-dedup (the canonicalization shape) with a SQL oracle."""
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    raw = docs.map_batches(_doc_triples_batch, batch_format="pyarrow")
    return raw.groupby(["doc_id", "subj", "pred", "obj"]).aggregate(
        Count(alias_name="n")
    ).drop_columns(["n"])


SQL_DOC_TRIPLES = """
SELECT DISTINCT doc_id,
       unnest(regexp_extract_all(text, '([a-z]+) (join|merge|scan) ([a-z]+)', 1)) AS subj,
       unnest(regexp_extract_all(text, '([a-z]+) (join|merge|scan) ([a-z]+)', 2)) AS pred,
       unnest(regexp_extract_all(text, '([a-z]+) (join|merge|scan) ([a-z]+)', 3)) AS obj
FROM documents
"""


def q_doc_adjacency(sf_dir: str):
    """Corpus-level edge weights: groupby (subj, pred, obj) count over ALL
    raw matches (the adjacency materialization shape)."""
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    raw = docs.map_batches(_doc_triples_batch, batch_format="pyarrow")
    return raw.groupby(["subj", "pred", "obj"]).aggregate(Count(alias_name="weight"))


SQL_DOC_ADJACENCY = """
WITH m AS (
  SELECT unnest(regexp_extract_all(text, '([a-z]+) (join|merge|scan) ([a-z]+)', 1)) AS subj,
         unnest(regexp_extract_all(text, '([a-z]+) (join|merge|scan) ([a-z]+)', 2)) AS pred,
         unnest(regexp_extract_all(text, '([a-z]+) (join|merge|scan) ([a-z]+)', 3)) AS obj
  FROM documents
)
SELECT subj, pred, obj, count(*) AS weight FROM m GROUP BY subj, pred, obj
"""


# --------------------------------------------------------------------------
# KG pipelines over the synthesized pages corpus. The generator's planted
# draws are integer arithmetic on doc_id (pages._h), so DuckDB oracles can
# reconstruct the expected outputs exactly from `documents` — see
# `queries/oracle_gen.py`. Each query projects to the deterministic
# columns (no float32 scores / list columns) for the value-hash compare;
# the full-width outputs stay covered by exact pytest goldens.
# --------------------------------------------------------------------------

from cosmos_ray.queries.oracle_gen import layout_ctes, with_goldens


_KG_CACHE: dict = {}


def _built_kg(sf_dir: str):
    """Session-scoped memo of the built KG per sf dir: ~20 kg_* queries
    consume the SAME materialized graph, so the driver's side-by-side
    correctness run builds it once instead of once per query. The
    KgDatasets hold materialized Datasets (object-store refs), valid for
    the life of the Ray session."""
    kg = _KG_CACHE.get(sf_dir)
    if kg is None:
        from dataclasses import replace

        from cosmos_ray.pipelines.kg import build_kg

        # task-fused stages: identical results to the actor-pool mode
        # (parity-gated), without per-query pool spin-up latency
        kg = build_kg(_pages_ds(sf_dir), stage_mode="tasks")
        # pin the two most-consumed derived tables: ~20 kg_* queries read
        # triples/adjacency, and each un-pinned consumer would re-run the
        # canonicalization exchange from `linked`
        kg = replace(kg, triples=kg.triples.materialize(),
                     adjacency=kg.adjacency.materialize())
        _KG_CACHE[sf_dir] = kg
    return kg


def _pages_ds(sf_dir: str):
    """HARNESS-ONLY pages synthesis: the driver's sf dirs ship a
    documents table, not pages, so the oracle queries regenerate pages
    driver-side. This is a correctness surface over ≤sf0.1 inputs — the
    BENCH/production path reads SHARDED pages parquet via
    `rd.read_parquet` (bench.py `_prepare_pages`); do not reuse this
    helper for at-scale inputs."""
    import pyarrow.parquet as pq

    from cosmos_ray.sources.pages import generate_pages_table

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    tbl = generate_pages_table(docs)
    # many blocks, not one: blocks are the unit of task parallelism for
    # every downstream stage (a single from_arrow block would serialize
    # extract/segment/link into one task each)
    chunk = 128
    slices = [tbl.slice(off, chunk) for off in range(0, tbl.num_rows, chunk)]
    return rd.from_arrow(slices or [tbl])


def q_kg_triples(sf_dir: str):

    return _built_kg(sf_dir).triples.select_columns(
        ["url", "subj", "pred", "obj", "n_mentions"]
    )


SQL_KG_TRIPLES = with_goldens("""
SELECT url, subj, pred, obj, count(*) AS n_mentions
FROM facts GROUP BY url, subj, pred, obj
""")


def q_kg_entities(sf_dir: str):

    return _built_kg(sf_dir).entities.select_columns(
        ["canonical_id", "name", "n_mentions"]
    )


SQL_KG_ENTITIES = with_goldens("""
, ends AS (
  SELECT s.canonical_id FROM facts f JOIN surf s ON s.surface = f.subj
  UNION ALL
  SELECT s.canonical_id FROM facts f JOIN surf s ON s.surface = f.obj
)
SELECT e.canonical_id, any_value(k.name) AS name, count(*) AS n_mentions
FROM ends e JOIN kbname k USING (canonical_id)
GROUP BY e.canonical_id
""")


def q_kg_adjacency(sf_dir: str):

    return _built_kg(sf_dir).adjacency


SQL_KG_ADJACENCY = with_goldens("""
SELECT ss.canonical_id AS src_entity, so.canonical_id AS dst_entity,
       f.pred, count(*) AS weight
FROM facts f
JOIN surf ss ON ss.surface = f.subj
JOIN surf so ON so.surface = f.obj
GROUP BY 1, 2, 3
""")


# shared graph CTE for the degree/pagerank oracles: the (src, dst, w)
# edge table the engine's _edge_weights derives from the KG adjacency
_SQL_ADJ_CTE = """
, adj AS (
  SELECT ss.canonical_id AS src, so.canonical_id AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM facts f
  JOIN surf ss ON ss.surface = f.subj
  JOIN surf so ON so.surface = f.obj
  GROUP BY 1, 2)
"""


def q_kg_degree(sf_dir: str):
    """Degree centrality over the entity adjacency graph (distinct
    neighbours + weighted totals; `functions/graph.py`)."""
    from cosmos_ray.functions.graph import degree_centrality

    return degree_centrality(_built_kg(sf_dir).adjacency)


SQL_KG_DEGREE = with_goldens(_SQL_ADJ_CTE + """
, s AS (SELECT src AS entity, count(*) AS out_degree, sum(w) AS out_weight
        FROM adj GROUP BY src)
, t AS (SELECT dst AS entity, count(*) AS in_degree, sum(w) AS in_weight
        FROM adj GROUP BY dst)
SELECT COALESCE(s.entity, t.entity) AS entity,
       COALESCE(s.out_degree, 0) AS out_degree,
       COALESCE(t.in_degree, 0) AS in_degree,
       COALESCE(s.out_weight, 0.0) AS out_weight,
       COALESCE(t.in_weight, 0.0) AS in_weight
FROM s FULL OUTER JOIN t ON t.entity = s.entity
""")


def q_kg_shortest(sf_dir: str):
    """Hop-bounded weighted shortest paths from the lexicographic-min
    entity (`graph.weighted_distances`, 4 Bellman-Ford rounds, no
    driver pull): minimum total edge weight (the adjacency's integer
    counts — exact in float64) over paths of <= 4 edges, undirected."""
    from cosmos_ray.functions.graph import weighted_distances

    adj = _built_kg(sf_dir).adjacency
    seed = min(adj.min("src_entity"), adj.min("dst_entity"))
    return weighted_distances(adj, [seed], hops=4)


def _sql_kg_shortest(hops: int = 4) -> str:
    """Bellman-Ford replay: hops unrolled materialized relax rounds
    (min over current table union edge-relaxed candidates)."""
    parts = [_SQL_ADJ_CTE.replace("adj AS (", "adj AS MATERIALIZED ("), """
, und AS MATERIALIZED (
    SELECT src, dst, w FROM adj
    UNION ALL SELECT dst, src, w FROM adj)
, d0 AS MATERIALIZED (
    SELECT min(e) AS entity, 0.0 AS d FROM (
      SELECT src AS e FROM adj UNION ALL SELECT dst FROM adj))
"""]
    for i in range(hops):
        parts.append(f"""
, c{i} AS MATERIALIZED (
    SELECT u.dst AS entity, min(r.d + u.w) AS d
    FROM d{i} r JOIN und u ON u.src = r.entity GROUP BY 1)
, d{i + 1} AS MATERIALIZED (
    SELECT entity, min(d) AS d FROM (
      SELECT entity, d FROM d{i} UNION ALL SELECT entity, d FROM c{i})
    GROUP BY 1)
""")
    parts.append(f"""
SELECT entity, d FROM d{hops}
""")
    return with_goldens("".join(parts))


SQL_KG_SHORTEST = _sql_kg_shortest()


def q_kg_linkpred(sf_dir: str):
    """Link prediction on the entity graph: top-20 NON-edge pairs by
    Adamic-Adar score over shared neighbors (`graph.link_prediction`;
    wedge fan-out + pair aggregate + tiered anti-join)."""
    from cosmos_ray.functions.graph import link_prediction

    return link_prediction(_built_kg(sf_dir).adjacency, k=20)


SQL_KG_LINKPRED = with_goldens(_SQL_ADJ_CTE + """
, e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM adj WHERE src <> dst)
, und AS (SELECT a AS ctr, b AS nb FROM e UNION ALL SELECT b, a FROM e)
, deg AS (SELECT ctr, count(*) AS d FROM und GROUP BY ctr)
, s AS (
  SELECT u1.nb AS node_a, u2.nb AS node_b,
         CAST(count(*) AS BIGINT) AS cn,
         round(sum(1.0 / ln(deg.d)), 6) AS aa
  FROM und u1
  JOIN und u2 ON u1.ctr = u2.ctr AND u1.nb < u2.nb
  JOIN deg ON deg.ctr = u1.ctr
  GROUP BY 1, 2)
SELECT s.node_a, s.node_b, s.cn, s.aa
FROM s LEFT JOIN e ON e.a = s.node_a AND e.b = s.node_b
WHERE e.a IS NULL
ORDER BY s.aa DESC, s.cn DESC, s.node_a, s.node_b
LIMIT 20
""")


def q_kg_kcore(sf_dir: str):
    """k-core membership of the undirected entity graph
    (`graph.k_core`, distributed peeling to a certified fixed point;
    k=20 trims the KB graph's low-degree fringe)."""
    from cosmos_ray.functions.graph import k_core

    return k_core(_built_kg(sf_dir).adjacency, k=20)


def _sql_kg_kcore(k: int = 20, rounds: int = 8) -> str:
    """Peel-round unroll (the Bellman-Ford-oracle pattern): each round
    keeps edges whose BOTH endpoints have current degree >= k. The
    engine iterates to a certified fixed point; the unroll is exact as
    long as convergence takes <= ``rounds`` rounds (the synthetic KB
    graph peels in <= 2; multi-round convergence itself is gated by the
    chain-graph pytest in test_graph_sketch.py)."""
    parts = [_SQL_ADJ_CTE.replace("adj AS (", "adj AS MATERIALIZED ("), """
, e0 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM adj WHERE src <> dst)
"""]
    for i in range(rounds):
        parts.append(f"""
, d{i} AS MATERIALIZED (
    SELECT node, count(*) AS deg FROM (
      SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i})
    GROUP BY 1)
, e{i + 1} AS MATERIALIZED (
    SELECT a, b FROM e{i}
    WHERE a IN (SELECT node FROM d{i} WHERE deg >= {k})
      AND b IN (SELECT node FROM d{i} WHERE deg >= {k}))
""")
    parts.append(f"""
SELECT node AS entity, CAST(count(*) AS BIGINT) AS degree FROM (
  SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
GROUP BY 1 HAVING count(*) >= {k}
""")
    return with_goldens("".join(parts))


SQL_KG_KCORE = _sql_kg_kcore()


def q_kg_triangles(sf_dir: str):
    """Global triangle count of the undirected entity graph
    (`graph.triangle_count`, compact-forward wedge generation + edge
    semi-join)."""
    from cosmos_ray.functions.graph import triangle_count

    return triangle_count(_built_kg(sf_dir).adjacency)


SQL_KG_TRIANGLES = with_goldens(_SQL_ADJ_CTE + """
, e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM adj WHERE src <> dst)
SELECT count(*) AS triangles
FROM e xy JOIN e yz ON xy.b = yz.a
JOIN e xz ON xz.a = xy.a AND xz.b = yz.b
""")


def q_kg_pagerank(sf_dir: str):
    """Weighted PageRank over the entity graph (20 power iterations,
    damping 0.85, uniform dangling redistribution) — the 'which
    entities matter' materialization a KG build feeds downstream."""
    from cosmos_ray.functions.graph import pagerank

    return pagerank(_built_kg(sf_dir).adjacency, iters=10)


def _sql_kg_pagerank(iters: int = 10, damping: float = 0.85,
                     adj_cte: str | None = None, out: str = "entity") -> str:
    """PageRank replay: the fixed iteration count unrolled as chained
    MATERIALIZED CTEs (r0..r{iters}) — each r{i} is referenced twice, so
    without materialization DuckDB's CTE inlining makes the plan grow
    2^iters. Float partial-sum order differs from the engine's combiner
    tree only below the 6dp round. ``adj_cte`` swaps the edge source
    (host_pagerank reuses the unroll over the host link graph); ``out``
    names the output node column."""
    parts = [(adj_cte or _SQL_ADJ_CTE).replace(
        "adj AS (", "adj AS MATERIALIZED ("), """
, nodes AS MATERIALIZED (SELECT DISTINCT e FROM
            (SELECT src AS e FROM adj UNION ALL SELECT dst FROM adj))
, nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)
, outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM adj GROUP BY src)
, r0 AS MATERIALIZED (SELECT e AS entity, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)
"""]
    for i in range(iters):
        parts.append(f"""
, d{i} AS MATERIALIZED (SELECT COALESCE(sum(r.pr), 0.0) AS dang
           FROM r{i} r LEFT JOIN outw o ON o.src = r.entity
           WHERE o.src IS NULL)
, c{i} AS MATERIALIZED (SELECT a.dst AS entity, sum(r.pr / o.ow * a.w) AS inc
           FROM adj a
           JOIN r{i} r ON r.entity = a.src
           JOIN outw o ON o.src = a.src
           GROUP BY a.dst)
, r{i + 1} AS MATERIALIZED (SELECT n.e AS entity,
               (1.0 - {damping}) / (SELECT n FROM nn)
               + {damping} * (COALESCE(c.inc, 0.0)
                              + (SELECT dang FROM d{i}) / (SELECT n FROM nn)) AS pr
               FROM nodes n LEFT JOIN c{i} c ON c.entity = n.e)
""")
    parts.append(f"""
SELECT entity AS {out}, round(pr, 6) AS "rank" FROM r{iters}
""")
    return with_goldens("".join(parts))


SQL_KG_PAGERANK = _sql_kg_pagerank()


def q_kg_ppr(sf_dir: str):
    """Personalized PageRank (random-walk-with-restart) from the
    lexicographic-min entity — the 'entities related to X' retrieval
    primitive (`graph.pagerank(seeds=...)`: teleport AND dangling mass
    restart at the seed)."""
    from cosmos_ray.functions.graph import pagerank

    adj = _built_kg(sf_dir).adjacency
    seed = min(adj.min("src_entity"), adj.min("dst_entity"))
    return pagerank(adj, iters=10, seeds=[seed])


def _sql_kg_ppr(iters: int = 10, damping: float = 0.85) -> str:
    """PPR replay: the pagerank unroll with the uniform teleport 1/n
    replaced by the seed indicator vector (min node), dangling mass
    restarting at the seed."""
    parts = [_SQL_ADJ_CTE.replace("adj AS (", "adj AS MATERIALIZED ("), """
, nodes AS MATERIALIZED (SELECT DISTINCT e FROM
            (SELECT src AS e FROM adj UNION ALL SELECT dst FROM adj))
, outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM adj GROUP BY src)
, tp AS MATERIALIZED (SELECT e AS entity,
            CASE WHEN e = (SELECT min(e) FROM nodes)
                 THEN 1.0 ELSE 0.0 END AS tv FROM nodes)
, r0 AS MATERIALIZED (SELECT entity, tv AS pr FROM tp)
"""]
    for i in range(iters):
        parts.append(f"""
, d{i} AS MATERIALIZED (SELECT COALESCE(sum(r.pr), 0.0) AS dang
           FROM r{i} r LEFT JOIN outw o ON o.src = r.entity
           WHERE o.src IS NULL)
, c{i} AS MATERIALIZED (SELECT a.dst AS entity, sum(r.pr / o.ow * a.w) AS inc
           FROM adj a
           JOIN r{i} r ON r.entity = a.src
           JOIN outw o ON o.src = a.src
           GROUP BY a.dst)
, r{i + 1} AS MATERIALIZED (SELECT t.entity,
               (1.0 - {damping}) * t.tv
               + {damping} * (COALESCE(c.inc, 0.0)
                              + (SELECT dang FROM d{i}) * t.tv) AS pr
               FROM tp t LEFT JOIN c{i} c ON c.entity = t.entity)
""")
    parts.append(f"""
SELECT entity, round(pr, 6) AS "rank" FROM r{iters}
""")
    return with_goldens("".join(parts))


SQL_KG_PPR = _sql_kg_ppr()


def q_kg_hits(sf_dir: str):
    """Kleinberg HITS hubs & authorities over the entity adjacency
    (10 alternating L2-normalized half-steps, `graph.hits`) — the
    'which entities aggregate facts vs anchor them' complement to
    PageRank on a directed KG."""
    from cosmos_ray.functions.graph import hits

    return hits(_built_kg(sf_dir).adjacency, iters=10)


def _sql_kg_hits(iters: int = 10) -> str:
    """HITS replay: the alternating half-steps unrolled as MATERIALIZED
    CTEs — authority{i} = L2-normalized in-weighted sum of hub{i-1},
    hub{i} = L2-normalized out-weighted sum of authority{i}; nodes
    outside a half-step's support COALESCE to 0 at the end."""
    parts = [_SQL_ADJ_CTE.replace("adj AS (", "adj AS MATERIALIZED ("), """
, nodes AS MATERIALIZED (SELECT DISTINCT e FROM
            (SELECT src AS e FROM adj UNION ALL SELECT dst FROM adj))
, h0 AS MATERIALIZED (SELECT e AS entity, 1.0 AS v FROM nodes)
"""]
    for i in range(iters):
        parts.append(f"""
, ar{i} AS MATERIALIZED (SELECT a.dst AS entity, sum(a.w * h.v) AS v
            FROM adj a JOIN h{i} h ON h.entity = a.src GROUP BY a.dst)
, a{i + 1} AS MATERIALIZED (SELECT entity,
            v / (SELECT sqrt(sum(v * v)) FROM ar{i}) AS v FROM ar{i})
, hr{i} AS MATERIALIZED (SELECT a.src AS entity, sum(a.w * t.v) AS v
            FROM adj a JOIN a{i + 1} t ON t.entity = a.dst GROUP BY a.src)
, h{i + 1} AS MATERIALIZED (SELECT entity,
            v / (SELECT sqrt(sum(v * v)) FROM hr{i}) AS v FROM hr{i})
""")
    parts.append(f"""
SELECT n.e AS entity,
       round(COALESCE(h.v, 0.0), 6) AS hub,
       round(COALESCE(a.v, 0.0), 6) AS authority
FROM nodes n
LEFT JOIN h{iters} h ON h.entity = n.e
LEFT JOIN a{iters} a ON a.entity = n.e
""")
    return with_goldens("".join(parts))


SQL_KG_HITS = _sql_kg_hits()


def q_kg_clustering(sf_dir: str):
    """Local clustering coefficient per entity
    (`graph.clustering_coefficient`: compact-forward wedges with
    retained members, per-node triangle explode, size-guarded join
    against distinct-neighbor degrees)."""
    from cosmos_ray.functions.graph import clustering_coefficient

    return clustering_coefficient(_built_kg(sf_dir).adjacency)


SQL_KG_CLUSTERING = with_goldens(_SQL_ADJ_CTE + """
, ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         FROM adj WHERE src <> dst)
, tri AS (SELECT ab.a AS x, ab.b AS y, bc.b AS z
          FROM ce ab JOIN ce bc ON bc.a = ab.b
          JOIN ce ac ON ac.a = ab.a AND ac.b = bc.b)
, tn AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
         UNION ALL SELECT z FROM tri)
, tc AS (SELECT v, count(*) AS t FROM tn GROUP BY v)
, dg AS (SELECT v, count(*) AS d FROM
           (SELECT a AS v FROM ce UNION ALL SELECT b FROM ce) u GROUP BY v)
SELECT dg.v AS entity, CAST(dg.d AS BIGINT) AS degree,
       CAST(COALESCE(tc.t, 0) AS BIGINT) AS triangles,
       round(CASE WHEN dg.d >= 2
             THEN 2.0 * COALESCE(tc.t, 0) / (dg.d * (dg.d - 1.0))
             ELSE 0.0 END, 6) AS cc
FROM dg LEFT JOIN tc ON tc.v = dg.v
""")


def q_kg_assortativity(sf_dir: str):
    """Degree assortativity of the entity graph
    (`graph.degree_assortativity`: node-sized degree broadcast onto
    both endpoints, integer-exact moment partials)."""
    from cosmos_ray.functions.graph import degree_assortativity

    return degree_assortativity(_built_kg(sf_dir).adjacency)


SQL_KG_ASSORTATIVITY = with_goldens(_SQL_ADJ_CTE + """
, ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         FROM adj WHERE src <> dst)
, und AS (SELECT a AS u, b AS v FROM ce UNION ALL SELECT b, a FROM ce)
, dg AS (SELECT u AS nd, count(*)::DOUBLE AS d FROM und GROUP BY u)
, e AS (SELECT d1.d AS x, d2.d AS y
        FROM und JOIN dg d1 ON d1.nd = und.u JOIN dg d2 ON d2.nd = und.v)
, m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM e)
SELECT CAST(n AS BIGINT) AS n_edges,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
             6) AS assortativity
FROM m
""")


def q_kg_reciprocity(sf_dir: str):
    """Reciprocity of the directed entity graph (`graph.reciprocity`:
    distinct-edge exchange + self semi-join on reversed keys)."""
    from cosmos_ray.functions.graph import reciprocity

    return reciprocity(_built_kg(sf_dir).adjacency)


SQL_KG_RECIPROCITY = with_goldens(_SQL_ADJ_CTE + """
, de AS (SELECT DISTINCT src AS s, dst AS d FROM adj WHERE src <> dst)
, r AS (SELECT count(*) AS nr FROM de a JOIN de b ON b.s = a.d AND b.d = a.s)
SELECT CAST((SELECT count(*) FROM de) AS BIGINT) AS n_edges,
       CAST((SELECT nr FROM r) AS BIGINT) AS n_reciprocal,
       round((SELECT nr FROM r)::DOUBLE / (SELECT count(*) FROM de),
             6) AS reciprocity
""")


def q_kg_components(sf_dir: str):
    """Connected components over the entity graph (undirected), component
    id = lexicographic-min member (`graph.connected_components`: driver
    union-find under the cap, distributed min-label fixpoint past it)."""
    from cosmos_ray.functions.graph import connected_components

    return connected_components(_built_kg(sf_dir).adjacency)


SQL_KG_COMPONENTS = with_goldens("""
, adj AS (SELECT ss.canonical_id AS src, so.canonical_id AS dst
          FROM facts f JOIN surf ss ON ss.surface = f.subj
                       JOIN surf so ON so.surface = f.obj),
und AS (SELECT src AS a, dst AS b FROM adj UNION SELECT dst, src FROM adj),
nodes AS (SELECT a FROM und UNION SELECT b FROM und),
reach(a, b) AS (
  SELECT a, a FROM nodes
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b)
SELECT a AS entity, min(b) AS component FROM reach GROUP BY a
""", recursive=True)


def q_kg_2hop(sf_dir: str):
    """2-hop neighborhood of the lexicographic-min entity (undirected;
    min hop count per reached entity) — the 'context subgraph around an
    entity' retrieval a KG consumer issues
    (`graph.k_hop_neighborhood`: one size-guarded frontier semi-join
    per hop)."""
    from cosmos_ray.functions.graph import k_hop_neighborhood
    from cosmos_ray.pipelines.kg import build_kg

    adj = _built_kg(sf_dir).adjacency
    seed = min(adj.min("src_entity"), adj.min("dst_entity"))
    return k_hop_neighborhood(adj, [seed], k=2)


SQL_KG_2HOP = with_goldens("""
, adj AS (SELECT ss.canonical_id AS src, so.canonical_id AS dst
          FROM facts f JOIN surf ss ON ss.surface = f.subj
                       JOIN surf so ON so.surface = f.obj),
und AS (SELECT src AS a, dst AS b FROM adj UNION SELECT dst, src FROM adj),
seed AS (SELECT min(a) AS s FROM und),
h1 AS (SELECT DISTINCT u.b AS entity FROM und u JOIN seed ON u.a = seed.s),
h2 AS (SELECT DISTINCT u.b AS entity FROM und u
       WHERE u.a IN (SELECT entity FROM h1)),
lvl AS (SELECT s AS entity, 0 AS hops FROM seed
        UNION ALL SELECT entity, 1 FROM h1
        UNION ALL SELECT entity, 2 FROM h2)
SELECT entity, min(hops)::BIGINT AS hops FROM lvl GROUP BY entity
""")


def q_kg_crawl_diff(sf_dir: str):
    """Crawl-over-crawl KG diff: triples added/removed between crawl A
    (docs with doc_id % 2 = 0) and crawl B (doc_id % 3 != 0) — the
    what-changed report of an incremental refresh
    (`pipelines/incremental.py:kg_diff`, tagged-union + one groupby)."""
    from cosmos_ray.pipelines.incremental import kg_diff
    from cosmos_ray.pipelines.kg import build_kg

    old = build_kg(_pages_subset(sf_dir, 2, 0)).triples
    new = build_kg(_pages_subset(sf_dir, 3, 0, invert=True)).triples
    return kg_diff(old, new)


SQL_KG_CRAWL_DIFF = with_goldens("""
, oldt AS (SELECT DISTINCT subj, pred, obj FROM facts WHERE did % 2 = 0),
newt AS (SELECT DISTINCT subj, pred, obj FROM facts WHERE did % 3 != 0),
u AS (SELECT subj, pred, obj, 0 AS side FROM oldt
      UNION ALL SELECT subj, pred, obj, 1 FROM newt),
a AS (SELECT subj, pred, obj, min(side) AS lo, max(side) AS hi
      FROM u GROUP BY subj, pred, obj)
SELECT subj, pred, obj,
       CASE WHEN lo = 0 AND hi = 0 THEN 'removed' ELSE 'added' END AS status
FROM a WHERE lo = hi
""")


def _pages_subset(sf_dir: str, mod: int, rem: int, invert: bool = False):
    """Pages dataset over the doc subset doc_id % mod == rem (or != rem
    when invert) — deterministic 'crawl snapshot' carving."""
    import numpy as np
    import pyarrow.parquet as pq

    from cosmos_ray.sources.pages import generate_pages_table

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = docs.column("doc_id").to_numpy()
    mask = (ids % mod != rem) if invert else (ids % mod == rem)
    return rd.from_arrow(generate_pages_table(docs.filter(pa.array(mask))))


def q_entity_pmi(sf_dir: str):
    """Document-level entity co-occurrence PMI over the linked KG (the
    'which entities go together' analytics a KG feeds downstream):
    pmi(a,b) = ln(n_ab * N / (n_a * n_b)) over distinct (url, entity)
    incidence, unordered pairs, 6dp.

    Scale shape: incidence dedups via one groupby-distinct (rows =
    url x entities-in-url); per-entity counts are entity-vocab-sized and
    broadcast; the per-url pair fan-out is bounded by entities-per-doc
    squared (small by construction) and flows through one bucketed
    group apply + one pair groupby."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import bucketed_group_apply, collect_small

    linked = _built_kg(sf_dir).linked

    def ue_batch(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays([t.column("url").combine_chunks()] * 2)
        e = pa.concat_arrays([t.column("subj_id").combine_chunks(),
                              t.column("obj_id").combine_chunks()])
        tt = pa.table({"url": u, "e": e}).filter(
            pc.not_equal(e, pa.scalar("")))
        return (tt.group_by(["url", "e"]).aggregate([([], "count_all")])
                .drop_columns(["count_all"]))

    ue = (linked.select_columns(["url", "subj_id", "obj_id"])
          .map_batches(ue_batch, batch_format="pyarrow")
          .groupby(["url", "e"]).aggregate(Count(alias_name="__n"))
          .drop_columns(["__n"]).materialize())

    ne_tbl = collect_small(
        ue.groupby("e").aggregate(Count(alias_name="n")), cap_rows=2_000_000)
    ne = dict(zip(ne_tbl.column("e").to_pylist(),
                  ne_tbl.column("n").to_pylist()))
    n_urls = (ue.groupby("url").aggregate(Count(alias_name="__n")).count())

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["e"].to_numpy())
        if len(v) < 2:
            return pd.DataFrame({"ea": pd.Series([], dtype=str),
                                 "eb": pd.Series([], dtype=str)})
        i, j = np.triu_indices(len(v), k=1)
        return pd.DataFrame({"ea": v[i], "eb": v[j]})

    nab = (bucketed_group_apply(ue, ["url"], pairs)
           .groupby(["ea", "eb"]).aggregate(Count(alias_name="n_ab")))

    def finish(t: pa.Table) -> pa.Table:
        ea = t.column("ea").to_numpy(zero_copy_only=False)
        eb = t.column("eb").to_numpy(zero_copy_only=False)
        n_ab = t.column("n_ab").to_numpy().astype(np.float64)
        na = np.empty(len(ea))
        nb = np.empty(len(eb))
        for ent, c in ne.items():  # loop over the entity VOCAB, not rows
            na[ea == ent] = c
            nb[eb == ent] = c
        x = np.log(n_ab * float(n_urls) / (na * nb))
        pmi = np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
        return pa.table({"ea": t.column("ea"), "eb": t.column("eb"),
                         "n_ab": t.column("n_ab"),
                         "pmi": pa.array(pmi, pa.float64())})

    return nab.map_batches(finish, batch_format="pyarrow")


SQL_ENTITY_PMI = with_goldens("""
, ue AS (SELECT DISTINCT f.url, s.canonical_id AS e
         FROM facts f JOIN surf s ON s.surface = f.subj
         UNION
         SELECT DISTINCT f.url, s.canonical_id
         FROM facts f JOIN surf s ON s.surface = f.obj)
, ne AS (SELECT e, count(*) AS n FROM ue GROUP BY e)
, nn AS (SELECT CAST(count(DISTINCT url) AS DOUBLE) AS N FROM ue)
, nab AS (SELECT a.e AS ea, b.e AS eb, count(*) AS n_ab
          FROM ue a JOIN ue b ON a.url = b.url AND a.e < b.e
          GROUP BY 1, 2)
SELECT nab.ea, nab.eb, nab.n_ab,
       round(ln(CAST(nab.n_ab AS DOUBLE) * nn.N / (na.n * nb.n)), 6) AS pmi
FROM nab, nn
JOIN ne na ON na.e = nab.ea
JOIN ne nb ON nb.e = nab.eb
""")


def q_kg_dead_letter(sf_dir: str):
    """Dead-letter audit: the malformed pages the extractor side-wrote
    instead of crashing (planted invalid-UTF8 docs at doc_id %% 97 == 13
    — the oracle reconstructs exactly which urls must be quarantined)."""

    return _built_kg(sf_dir).dead_letter.select_columns(
        ["url", "stage"])


SQL_KG_DEAD_LETTER = """
WITH bad AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 13),
pages AS (SELECT doc_id FROM bad
          UNION ALL  -- the stale-duplicate page planted for dup docs
          SELECT doc_id FROM bad WHERE doc_id % 50 = 7)
SELECT 'https://web' || CAST(doc_id % 20 AS VARCHAR)
       || '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
       'extract' AS stage
FROM pages
"""


def q_host_stats(sf_dir: str):
    """Per-host crawl rollup over the EXTRACTED corpus: host parsed from
    the url STRING with one vectorized regex (the real operator), then
    distinct docs / segment counts / total extracted chars per host —
    the per-site shard statistics any crawl pipeline keeps. Two bounded
    groupbys: (host, url) first, then host."""
    from ray.data.aggregate import Count, Sum

    from cosmos_ray.pipelines.kg import build_kg

    segs = _built_kg(sf_dir).segments

    def prep(t: pa.Table) -> pa.Table:
        host = pc.extract_regex(t.column("url"), r"https?://(?P<host>[^/]+)/")
        return pa.table({
            "host": pc.struct_field(host, "host"),
            "url": t.column("url"),
            "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
        })

    per_url = (segs.map_batches(prep, batch_format="pyarrow")
               .groupby(["host", "url"])
               .aggregate(Count(alias_name="n_blocks"),
                          Sum("n_chars", alias_name="chars")))
    return (per_url.groupby("host")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_blocks", alias_name="n_blocks"),
                       Sum("chars", alias_name="total_chars")))


SQL_HOST_STATS = with_goldens("""
, per AS (SELECT regexp_extract(url, 'https?://([^/]+)/', 1) AS host,
                 url, count(*) AS n_blocks, CAST(sum(length(text)) AS BIGINT) AS chars
          FROM blocks GROUP BY 1, 2)
SELECT host, count(*) AS n_docs, CAST(sum(n_blocks) AS BIGINT) AS n_blocks,
       CAST(sum(chars) AS BIGINT) AS total_chars
FROM per GROUP BY host
""")


def q_kg_evidence(sf_dir: str):
    """Per-fact EVIDENCE aggregation — the acceptance signal a KG build
    computes before trusting a triple: total mentions, distinct source
    pages and distinct source HOSTS per (subj, pred, obj) (cross-site
    corroboration is the standard spam/mirror defense). Shape: host
    parsed with one vectorized regex, per-batch (fact, host) partial
    combine, then ONE single-key bucket exchange (a fact's rows all
    land in one bucket) finished by a vectorized two-level pandas
    rollup — never a multi-key Ray aggregate (each of those costs ~5 s
    of fixed per-execution overhead, see `bucketed_bulk_apply`)."""
    from cosmos_ray.queries.relational import bucketed_bulk_apply

    tr = _built_kg(sf_dir).triples

    return bucketed_bulk_apply(
        tr.map_batches(_evidence_partial, batch_format="pyarrow"),
        ["subj", "pred", "obj"], _evidence_finish)


def _evidence_partial(t: pa.Table) -> pa.Table:
    """Per-batch (subj, pred, obj, host) combine: m = mention sum,
    u = url count (triples are per-(url, fact) unique upstream, so row
    count = distinct-url count; partials merge by summing both).
    Arrow-native end to end — `Table.group_by` keeps the hottest
    rollup in kb_release/kg_evidence off the pandas round-trip
    (single-threaded: the Ray task is the parallelism unit)."""
    host = pc.extract_regex(t.column("url"), r"https?://(?P<host>[^/]+)/")
    tt = pa.table({
        "subj": t.column("subj"),
        "pred": t.column("pred"),
        "obj": t.column("obj"),
        "host": pc.struct_field(host, "host"),
        "m": t.column("n_mentions").cast(pa.int64())})
    g = tt.group_by(["subj", "pred", "obj", "host"],
                    use_threads=False).aggregate(
        [("m", "sum"), ("m", "count")])
    return g.rename_columns(
        ["m" if c == "m_sum" else "u" if c == "m_count" else c
         for c in g.column_names])


def _evidence_finish(b: pd.DataFrame) -> pd.DataFrame:
    """Whole-bucket finish: merge (fact, host) partials, then roll up
    to per-fact (n_mentions, n_urls, n_hosts)."""
    ph = (b.groupby(["subj", "pred", "obj", "host"], sort=False,
                    as_index=False).agg(m=("m", "sum"),
                                        n_urls=("u", "sum")))
    return (ph.groupby(["subj", "pred", "obj"], sort=False,
                       as_index=False)
            .agg(n_mentions=("m", "sum"), n_urls=("n_urls", "sum"),
                 n_hosts=("m", "size")))


SQL_KG_EVIDENCE = with_goldens("""
, tr AS (SELECT url, subj, pred, obj, count(*) AS m
         FROM facts GROUP BY 1, 2, 3, 4)
, ph AS (SELECT subj, pred, obj,
                regexp_extract(url, 'https?://([^/]+)/', 1) AS host,
                sum(m) AS m, count(*) AS n_urls
         FROM tr GROUP BY 1, 2, 3, 4)
SELECT subj, pred, obj,
       CAST(sum(m) AS BIGINT) AS n_mentions,
       CAST(sum(n_urls) AS BIGINT) AS n_urls,
       CAST(count(*) AS BIGINT) AS n_hosts
FROM ph GROUP BY 1, 2, 3
""")


def q_kg_2hop_store(sf_dir: str):
    """K-hop neighborhood served from the AT-REST adjacency store
    (`state/graph_store.py`): the adjacency is written once
    hive-partitioned by src-hash bucket, then a joint directed BFS from
    the 4 smallest source entities expands two hops reading ONLY the
    frontier's buckets — partition-pruned graph lookups (the disk
    analog of a graph service's vertex index). Oracle: the same BFS
    levels unrolled over the adjacency CTE."""
    import os
    import tempfile

    from cosmos_ray.state.graph_store import khop, write_adjacency_store

    adj = _built_kg(sf_dir).adjacency.select_columns(
        ["src_entity", "pred", "dst_entity"])
    seeds = [r["src_entity"] for r in
             adj.groupby("src_entity").count()
             .sort("src_entity").limit(4).take_all()]
    store = os.path.join(tempfile.mkdtemp(prefix="gstore_", dir="/tmp"),
                         "adj")
    write_adjacency_store(adj, store)
    return rd.from_arrow(khop(store, seeds, hops=2))


SQL_KG_2HOP_STORE = with_goldens(_SQL_ADJ_CTE + """
, e AS (SELECT DISTINCT src, dst FROM adj)
, sd AS (SELECT DISTINCT src AS seed FROM e ORDER BY seed LIMIT 4)
, l0 AS (SELECT seed AS entity FROM sd)
, l1 AS (SELECT DISTINCT e.dst AS entity FROM l0 JOIN e ON e.src = l0.entity
         WHERE e.dst NOT IN (SELECT entity FROM l0))
, l2 AS (SELECT DISTINCT e.dst AS entity FROM l1 JOIN e ON e.src = l1.entity
         WHERE e.dst NOT IN (SELECT entity FROM l0)
           AND e.dst NOT IN (SELECT entity FROM l1))
SELECT entity, CAST(0 AS BIGINT) AS hop FROM l0
UNION ALL SELECT entity, CAST(1 AS BIGINT) FROM l1
UNION ALL SELECT entity, CAST(2 AS BIGINT) FROM l2
""")


def q_kg_fact_sources(sf_dir: str):
    """Per-fact PROVENANCE list — the citation set a KB serves beside
    each triple: total distinct source pages plus a deterministic
    3-url sample (lexicographically smallest, so re-runs cite
    identically). Complements kg_evidence's counts with the actual
    links.

    Shape: the triple table is already distinct per (url, fact), so
    the only exchange is the (fact)-bucketed assembly; the in-bucket
    finish sorts each fact's url set once and truncates to the
    sample."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    tr = _built_kg(sf_dir).triples.select_columns(
        ["url", "subj", "pred", "obj"])

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        urls = np.sort(g["url"].to_numpy())
        return pd.DataFrame({
            "subj": [g["subj"].iloc[0]], "pred": [g["pred"].iloc[0]],
            "obj": [g["obj"].iloc[0]],
            "n_urls": [np.int64(len(urls))],
            "sample_urls": [",".join(urls[:3])]})

    return bucketed_group_apply(tr, ["subj", "pred", "obj"], finish)


SQL_KG_FACT_SOURCES = with_goldens("""
, tr AS (SELECT DISTINCT url, subj, pred, obj FROM facts)
, r AS (SELECT *, row_number() OVER (PARTITION BY subj, pred, obj
                                     ORDER BY url) AS rn,
               count(*) OVER (PARTITION BY subj, pred, obj) AS nu
        FROM tr)
SELECT subj, pred, obj, CAST(max(nu) AS BIGINT) AS n_urls,
       string_agg(url, ',' ORDER BY url) AS sample_urls
FROM r WHERE rn <= 3 GROUP BY subj, pred, obj
""")


def q_kg_fact_intervals(sf_dir: str):
    """Temporal fact provenance: per (subj, pred, obj) the first/last
    crawl timestamp among the pages asserting it plus the page count —
    the validity-interval signal a temporal KG keeps alongside each fact
    (first_seen/last_seen is how crawl-to-crawl fact churn is detected).

    Shape: page timestamps come from a (url, ts) metadata pass over the
    INPUT pages (html never read; keep-latest = max ts per url, one
    url-bounded groupby); the triple table joins that narrow map via
    `join_or_broadcast` (distributed hash join once the url count
    exceeds the broadcast cap), then one fact-keyed groupby of
    (count, min, max) — rows crossing the exchange are per-batch
    combiner partials bounded by distinct facts."""
    from ray.data.aggregate import Count, Max, Min

    from cosmos_ray.queries.relational import join_or_broadcast

    tr = _built_kg(sf_dir).triples.select_columns(
        ["url", "subj", "pred", "obj"])
    meta = (_pages_ds(sf_dir)
            .map_batches(lambda t: pa.table({
                "url": t.column("url"),
                "ts_us": t.column("warc_ts").cast(pa.int64())}),
                batch_format="pyarrow")
            .groupby("url").aggregate(Max("ts_us", alias_name="ts_us")))
    j = join_or_broadcast(tr, meta, key="url", add_cols=["ts_us"])
    return (j.groupby(["subj", "pred", "obj"])
            .aggregate(Count(alias_name="n_pages"),
                       Min("ts_us", alias_name="first_seen_us"),
                       Max("ts_us", alias_name="last_seen_us")))


SQL_KG_FACT_INTERVALS = with_goldens("""
SELECT subj, pred, obj,
       CAST(count(DISTINCT url) AS BIGINT) AS n_pages,
       CAST(min(1700000000000000 + did * 1000000) AS BIGINT)
         AS first_seen_us,
       CAST(max(1700000000000000 + did * 1000000) AS BIGINT)
         AS last_seen_us
FROM facts GROUP BY 1, 2, 3
""")


def q_kg_pred_functionality(sf_dir: str):
    """Per-predicate functionality statistics (Galarraga et al. 2013,
    AMIE): over the distinct canonical (src, dst) pairs of each
    predicate, fun(p) = |distinct subjects| / |pairs| and
    ifun(p) = |distinct objects| / |pairs| — the KG-quality signal that
    separates near-functional predicates (is located in) from
    many-to-many ones (partnered with), and the weighting AMIE-style
    rule confidence uses.

    Shape: adjacency rows are already unique per (src, dst, pred), so
    n_pairs is a plain pred groupby count; the two distinct-endpoint
    counts are two-stage distincts ((pred, endpoint) exchange first,
    entity-vocabulary-bounded); the three pred-vocabulary-sized tables
    meet via broadcast joins. Ratios are single IEEE divisions of exact
    int64 counts (identical in the oracle)."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import join_or_broadcast

    adj = _built_kg(sf_dir).adjacency
    pairs = adj.groupby("pred").aggregate(Count(alias_name="n_pairs"))
    n_subj = (adj.select_columns(["pred", "src_entity"])
              .groupby(["pred", "src_entity"])
              .aggregate(Count(alias_name="__c"))
              .groupby("pred").aggregate(Count(alias_name="n_subj")))
    n_obj = (adj.select_columns(["pred", "dst_entity"])
             .groupby(["pred", "dst_entity"])
             .aggregate(Count(alias_name="__c"))
             .groupby("pred").aggregate(Count(alias_name="n_obj")))
    j = join_or_broadcast(
        join_or_broadcast(pairs, n_subj, key="pred", add_cols=["n_subj"]),
        n_obj, key="pred", add_cols=["n_obj"])

    def score(t: pa.Table) -> pa.Table:
        np_ = t.column("n_pairs").to_numpy(zero_copy_only=False).astype(np.float64)
        ns = t.column("n_subj").to_numpy(zero_copy_only=False).astype(np.float64)
        no = t.column("n_obj").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "pred": t.column("pred"),
            "n_pairs": t.column("n_pairs").cast(pa.int64()),
            "n_subj": t.column("n_subj").cast(pa.int64()),
            "n_obj": t.column("n_obj").cast(pa.int64()),
            "functionality": pa.array(ns / np_, pa.float64()),
            "inv_functionality": pa.array(no / np_, pa.float64())})

    return j.map_batches(score, batch_format="pyarrow")


SQL_KG_PRED_FUNCTIONALITY = with_goldens("""
, pairs AS (
  SELECT f.pred, ss.canonical_id AS src, so.canonical_id AS dst
  FROM facts f
  JOIN surf ss ON ss.surface = f.subj
  JOIN surf so ON so.surface = f.obj
  GROUP BY 1, 2, 3)
SELECT pred,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT src) AS BIGINT) AS n_subj,
       CAST(count(DISTINCT dst) AS BIGINT) AS n_obj,
       count(DISTINCT src) / CAST(count(*) AS DOUBLE) AS functionality,
       count(DISTINCT dst) / CAST(count(*) AS DOUBLE) AS inv_functionality
FROM pairs GROUP BY pred
""")


def q_kg_ntriples(sf_dir: str):
    """RDF N-Triples export of the canonical graph — the W3C interchange
    serialization a KG build hands to triple stores (the reference's ES
    bulk index is its substrate-specific analog of this handoff). One
    line per distinct (src, pred, dst): entity/predicate ids templated
    into IRIs. Canonical ids are ``E\\d{4}`` and predicates lowercase
    words by construction, so the only escaping needed is predicate
    spaces -> '_' (full N-Triples string escaping is out of scope for
    these id vocabularies and documented as such).

    Shape: embarrassingly parallel — one vectorized arrow string-concat
    pass over the adjacency, no exchange."""
    adj = _built_kg(sf_dir).adjacency

    def ser(t: pa.Table) -> pa.Table:
        pred = pc.replace_substring(t.column("pred"), " ", "_")
        line = pc.binary_join_element_wise(
            "<http://kg.example/e/", t.column("src_entity"),
            "> <http://kg.example/p/", pred,
            "> <http://kg.example/e/", t.column("dst_entity"),
            "> .", "")
        return pa.table({"ntriple": line})

    return adj.map_batches(ser, batch_format="pyarrow")


SQL_KG_NTRIPLES = with_goldens("""
, pairs AS (
  SELECT ss.canonical_id AS src, so.canonical_id AS dst,
         replace(f.pred, ' ', '_') AS pred
  FROM facts f
  JOIN surf ss ON ss.surface = f.subj
  JOIN surf so ON so.surface = f.obj
  GROUP BY 1, 2, 3)
SELECT '<http://kg.example/e/' || src || '> <http://kg.example/p/' ||
       pred || '> <http://kg.example/e/' || dst || '> .' AS ntriple
FROM pairs
""")


def _kb_types_ds():
    """KB (canonical_id, type) as a Dataset — each synthetic entity
    carries exactly one type (types[0]); entity-vocabulary-sized."""
    from cosmos_ray.sources.entity_dict import build_entity_dict

    kb = build_entity_dict()
    return rd.from_arrow(pa.table({
        "canonical_id": kb.column("canonical_id"),
        "typ": pa.array([r[0].as_py() for r in kb.column("types")],
                        pa.string())}))


def q_kg_type_violations(sf_dir: str):
    """Ontology-constraint validation: induce each predicate's domain
    and range as the MODAL subject/object entity type over its distinct
    canonical pairs (ties to the lexically smallest type), then emit the
    facts whose endpoint types violate either — the knowledge-fusion
    cleaning pass that catches linker errors (a COMPANY 'is located in'
    a PERSON) before facts are trusted.

    Shape: the KB type map is entity-vocabulary-sized, so both endpoint
    typings are size-guarded broadcasts; modal induction is a
    (pred, type) groupby — vocabulary x vocabulary bounded — finished by
    a per-pred argmax inside `bucketed_group_apply`; the induced
    domain/range table (pred-sized) broadcasts back onto the typed
    pairs. No corpus-sized exchange anywhere."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import (bucketed_group_apply,
                                               join_or_broadcast)

    adj = _built_kg(sf_dir).adjacency.select_columns(
        ["pred", "src_entity", "dst_entity"])
    kt = _kb_types_ds()
    typed = join_or_broadcast(
        join_or_broadcast(
            adj,
            kt.map_batches(lambda t: pa.table({
                "canonical_id": t.column("canonical_id"),
                "subj_type": t.column("typ")}), batch_format="pyarrow"),
            key="canonical_id", add_cols=["subj_type"],
            big_key="src_entity"),
        kt.map_batches(lambda t: pa.table({
            "canonical_id": t.column("canonical_id"),
            "obj_type": t.column("typ")}), batch_format="pyarrow"),
        key="canonical_id", add_cols=["obj_type"],
        big_key="dst_entity").materialize()

    def modal(col: str, out: str):
        counts = (typed.groupby(["pred", col])
                  .aggregate(Count(alias_name="__n")))

        def finish(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["__n", col], ascending=[False, True],
                              kind="stable")
            top = g.drop_duplicates(subset=["pred"], keep="first")
            return pd.DataFrame({"pred": top["pred"].to_numpy(),
                                 out: top[col].to_numpy()})

        return bucketed_group_apply(counts, ["pred"], finish)

    j = join_or_broadcast(
        join_or_broadcast(typed, modal("subj_type", "domain_type"),
                          key="pred", add_cols=["domain_type"]),
        modal("obj_type", "range_type"), key="pred",
        add_cols=["range_type"])

    def violations(t: pa.Table) -> pa.Table:
        bad = pc.or_(pc.not_equal(t.column("subj_type"),
                                  t.column("domain_type")),
                     pc.not_equal(t.column("obj_type"),
                                  t.column("range_type")))
        return t.select(["pred", "src_entity", "dst_entity", "subj_type",
                         "obj_type", "domain_type", "range_type"]).filter(bad)

    return j.map_batches(violations, batch_format="pyarrow")


def _sql_kg_type_violations() -> str:
    from cosmos_ray.queries.oracle_gen import kb_types_values

    return with_goldens(f"""
, ktypes(canonical_id, typ) AS (VALUES {kb_types_values()})
, pairs AS (
  SELECT f.pred, ss.canonical_id AS src, so.canonical_id AS dst
  FROM facts f
  JOIN surf ss ON ss.surface = f.subj
  JOIN surf so ON so.surface = f.obj
  GROUP BY 1, 2, 3)
, typed AS (
  SELECT p.pred, p.src, p.dst, ts.typ AS subj_type, tt.typ AS obj_type
  FROM pairs p
  JOIN ktypes ts ON ts.canonical_id = p.src
  JOIN ktypes tt ON tt.canonical_id = p.dst)
, dom AS (
  SELECT pred, subj_type AS domain_type FROM (
    SELECT pred, subj_type, count(*) AS n,
           row_number() OVER (PARTITION BY pred
                              ORDER BY count(*) DESC, subj_type) AS rn
    FROM typed GROUP BY pred, subj_type) WHERE rn = 1)
, rng AS (
  SELECT pred, obj_type AS range_type FROM (
    SELECT pred, obj_type, count(*) AS n,
           row_number() OVER (PARTITION BY pred
                              ORDER BY count(*) DESC, obj_type) AS rn
    FROM typed GROUP BY pred, obj_type) WHERE rn = 1)
SELECT t.pred, t.src AS src_entity, t.dst AS dst_entity,
       t.subj_type, t.obj_type, d.domain_type, r.range_type
FROM typed t
JOIN dom d ON d.pred = t.pred
JOIN rng r ON r.pred = t.pred
WHERE t.subj_type <> d.domain_type OR t.obj_type <> r.range_type
""")


SQL_KG_TYPE_VIOLATIONS = _sql_kg_type_violations()


def q_kg_conflicts(sf_dir: str):
    """Functional-predicate conflict sets — the knowledge-fusion input:
    for every (subject, predicate) asserting MORE THAN ONE distinct
    canonical object, the sorted object set (canonical comma-join) and
    its size. Downstream fusion (voting, source-reliability weighting)
    consumes exactly these sets; for near-functional predicates they are
    the contradiction candidates.

    Shape: adjacency rows are already distinct (src, dst, pred), so the
    only exchange is the (pred, src)-bucketed assembly
    (`bucketed_group_apply`); output is bounded by conflicted
    (subject, pred) groups."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    adj = _built_kg(sf_dir).adjacency.select_columns(
        ["pred", "src_entity", "dst_entity"])

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("dst_entity", kind="stable")
        s = g.groupby(["pred", "src_entity"], sort=False)["dst_entity"]
        n = s.size()
        out = pd.DataFrame({
            "pred": n.index.get_level_values(0).to_numpy(),
            "src_entity": n.index.get_level_values(1).to_numpy(),
            "n_objs": n.to_numpy().astype(np.int64),
            "objs": s.agg(",".join).to_numpy()})
        return out[out["n_objs"] > 1]

    return bucketed_group_apply(adj, ["pred", "src_entity"], assemble)


SQL_KG_CONFLICTS = with_goldens("""
, pairs AS (
  SELECT f.pred, ss.canonical_id AS src, so.canonical_id AS dst
  FROM facts f
  JOIN surf ss ON ss.surface = f.subj
  JOIN surf so ON so.surface = f.obj
  GROUP BY 1, 2, 3)
SELECT pred, src AS src_entity,
       CAST(count(*) AS BIGINT) AS n_objs,
       string_agg(dst, ',' ORDER BY dst) AS objs
FROM pairs GROUP BY pred, src HAVING count(*) > 1
""")


def q_kg_fused_facts(sf_dir: str):
    """Evidence-weighted fact fusion (the resolution step downstream of
    `kg_conflicts`): for every (subj, pred), keep the single object with
    the strongest corroboration — most distinct source HOSTS first
    (cross-site agreement, the mirror/spam defense), then most mentions,
    then the lexically smallest object (deterministic tiebreak). The
    one-iteration, host-vote special case of TruthFinder-style fusion
    (Yin et al. 2008) that stays SQL-replayable.

    Shape: the SAME per-batch (fact, host) partial combine as
    kg_evidence, but bucketed on (subj, pred) — a (subj, pred) group's
    every (obj, host) partial lands in one bucket, so the whole
    evidence rollup AND the argmax finish happen vectorized inside ONE
    single-key exchange (vs the former evidence-then-argmax chain of
    three all-to-alls)."""
    from cosmos_ray.queries.relational import bucketed_bulk_apply

    tr = _built_kg(sf_dir).triples

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        ev = _evidence_finish(b)
        ev = ev.sort_values(["n_hosts", "n_mentions", "obj"],
                            ascending=[False, False, True], kind="stable")
        top = ev.drop_duplicates(subset=["subj", "pred"], keep="first")
        return top[["subj", "pred", "obj", "n_mentions", "n_hosts"]]

    return bucketed_bulk_apply(
        tr.map_batches(_evidence_partial, batch_format="pyarrow"),
        ["subj", "pred"], finish)


SQL_KG_FUSED_FACTS = with_goldens("""
, tr AS (SELECT url, subj, pred, obj, count(*) AS m
         FROM facts GROUP BY 1, 2, 3, 4)
, ph AS (SELECT subj, pred, obj,
                regexp_extract(url, 'https?://([^/]+)/', 1) AS host,
                sum(m) AS m
         FROM tr GROUP BY 1, 2, 3, 4)
, ev AS (SELECT subj, pred, obj,
                CAST(sum(m) AS BIGINT) AS n_mentions,
                CAST(count(*) AS BIGINT) AS n_hosts
         FROM ph GROUP BY 1, 2, 3)
SELECT subj, pred, obj, n_mentions, n_hosts FROM (
  SELECT *, row_number() OVER (
      PARTITION BY subj, pred
      ORDER BY n_hosts DESC, n_mentions DESC, obj) AS rn
  FROM ev) WHERE rn = 1
""")


def q_kb_release(sf_dir: str):
    """The end-to-end KB RELEASE fact table (composed production build:
    fuse -> canonical link -> ontology validate -> publish; see
    `pipelines/kb_release.py`). The DuckDB oracle replays the ENTIRE
    composition in one query — the strongest correctness statement in
    the repo: the stages compose value-exactly, not just pass
    piecewise."""
    from cosmos_ray.pipelines.kb_release import release_facts

    return release_facts(sf_dir)


def _kb_release_ctes() -> str:
    """Shared CTE chain rebuilding the released fact table in SQL
    (fuse -> link -> validate); `rel` is the released table. Reused by
    the kb_release and kg_entity_abstract oracles."""
    from cosmos_ray.queries.oracle_gen import kb_types_values

    return f"""
, tr AS (SELECT url, subj, pred, obj, count(*) AS m
         FROM facts GROUP BY 1, 2, 3, 4)
, ph AS (SELECT subj, pred, obj,
                regexp_extract(url, 'https?://([^/]+)/', 1) AS host,
                sum(m) AS m
         FROM tr GROUP BY 1, 2, 3, 4)
, ev AS (SELECT subj, pred, obj,
                CAST(sum(m) AS BIGINT) AS n_mentions,
                CAST(count(*) AS BIGINT) AS n_hosts
         FROM ph GROUP BY 1, 2, 3)
, fused AS (SELECT subj, pred, obj, n_mentions, n_hosts FROM (
    SELECT *, row_number() OVER (
        PARTITION BY subj, pred
        ORDER BY n_hosts DESC, n_mentions DESC, obj) AS rn
    FROM ev) WHERE rn = 1)
, ktypes(canonical_id, typ) AS (VALUES {kb_types_values()})
, pairs AS (SELECT f.pred, ss.canonical_id AS src, so.canonical_id AS dst
            FROM facts f JOIN surf ss ON ss.surface = f.subj
            JOIN surf so ON so.surface = f.obj GROUP BY 1, 2, 3)
, typed AS (SELECT p.pred, p.src, p.dst,
                   ts.typ AS subj_type, tt.typ AS obj_type
            FROM pairs p JOIN ktypes ts ON ts.canonical_id = p.src
            JOIN ktypes tt ON tt.canonical_id = p.dst)
, dom AS (SELECT pred, subj_type AS domain_type FROM (
    SELECT pred, subj_type, count(*) AS n,
           row_number() OVER (PARTITION BY pred
                              ORDER BY count(*) DESC, subj_type) AS rn
    FROM typed GROUP BY pred, subj_type) WHERE rn = 1)
, rng AS (SELECT pred, obj_type AS range_type FROM (
    SELECT pred, obj_type, count(*) AS n,
           row_number() OVER (PARTITION BY pred
                              ORDER BY count(*) DESC, obj_type) AS rn
    FROM typed GROUP BY pred, obj_type) WHERE rn = 1)
, viol AS (SELECT t.pred, t.src, t.dst FROM typed t
           JOIN dom d ON d.pred = t.pred JOIN rng r ON r.pred = t.pred
           WHERE t.subj_type <> d.domain_type
              OR t.obj_type <> r.range_type)
, rel AS (
  SELECT f.subj, f.pred, f.obj, ss.canonical_id AS subj_id,
         so.canonical_id AS obj_id, f.n_mentions, f.n_hosts
  FROM fused f JOIN surf ss ON ss.surface = f.subj
  JOIN surf so ON so.surface = f.obj
  LEFT JOIN viol v ON v.pred = f.pred AND v.src = ss.canonical_id
                  AND v.dst = so.canonical_id
  WHERE v.pred IS NULL)"""


SQL_KB_RELEASE = with_goldens(_kb_release_ctes() + """
SELECT subj, pred, obj, subj_id, obj_id, n_mentions, n_hosts FROM rel
""")


def q_kg_entity_abstract(sf_dir: str):
    """Entity ABSTRACT generation — the one-line textual card a KB
    service renders per entity: canonical name plus its top-3 RELEASED
    facts (strongest corroboration first: n_hosts, n_mentions, then
    lexical) joined as 'pred obj' clauses. Consumes the validated
    release table, so the abstract never cites a fused-away or
    type-violating fact.

    Shape: one (entity)-bucketed assembly over the release table
    (entity-vocab bounded); the name map is a vocabulary-sized
    closure."""
    from cosmos_ray.pipelines.kb_release import release_facts
    from cosmos_ray.queries.relational import bucketed_group_apply
    from cosmos_ray.sources.entity_dict import build_entity_dict

    names = {r["canonical_id"]: r["name"]
             for r in build_entity_dict().to_pylist()}
    rel = release_facts(sf_dir).select_columns(
        ["subj_id", "pred", "obj", "n_mentions", "n_hosts"])

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_hosts", "n_mentions", "pred", "obj"],
                          ascending=[False, False, True, True],
                          kind="stable").head(3)
        sid = g["subj_id"].iloc[0]
        clauses = "; ".join(p + " " + o
                            for p, o in zip(g["pred"], g["obj"]))
        return pd.DataFrame({
            "entity_id": [sid],
            "abstract": [names.get(sid, sid) + " — " + clauses],
            "n_facts": [np.int64(len(g))]})

    return bucketed_group_apply(rel, ["subj_id"], assemble)


SQL_KG_ENTITY_ABSTRACT = with_goldens(_kb_release_ctes() + """
, ranked AS (SELECT subj_id, pred, obj,
       row_number() OVER (PARTITION BY subj_id
                          ORDER BY n_hosts DESC, n_mentions DESC,
                                   pred, obj) AS rn
  FROM rel)
SELECT r.subj_id AS entity_id,
       k.name || ' — ' ||
         string_agg(r.pred || ' ' || r.obj, '; ' ORDER BY r.rn)
         AS abstract,
       CAST(count(*) AS BIGINT) AS n_facts
FROM ranked r JOIN kbname k ON k.canonical_id = r.subj_id
WHERE r.rn <= 3
GROUP BY r.subj_id, k.name
""")


def q_release_validation(sf_dir: str):
    """dbt-style CONTRACT TESTS over the published KB release: per rule
    the violation count (must be 0 in a healthy release) — uniqueness
    of (subj, pred), canonical-id well-formedness on both endpoints,
    evidence sanity (n_hosts >= 1, n_mentions >= n_hosts). The
    validation suite a release pipeline runs before promoting the
    artifact (the data-quality analog of `functions/validate.py` on the
    relational side).

    Shape: one vectorized check pass over the release stream emitting
    int indicator partials; (subj, pred) uniqueness is a two-stage
    groupby; output is rule-vocabulary sized."""
    from ray.data.aggregate import Count, Sum

    from cosmos_ray.pipelines.kb_release import release_facts

    rel = release_facts(sf_dir).materialize()

    def checks(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        bad_subj = pc.invert(pc.match_substring_regex(
            t.column("subj_id"), r"^E[0-9]{4}$"))
        bad_obj = pc.invert(pc.match_substring_regex(
            t.column("obj_id"), r"^E[0-9]{4}$"))
        nh = t.column("n_hosts").cast(pa.int64())
        nm = t.column("n_mentions").cast(pa.int64())
        return pa.table({
            "bad_subj_id": bad_subj.cast(pa.int64()),
            "bad_obj_id": bad_obj.cast(pa.int64()),
            "bad_hosts": pc.less(nh, 1).cast(pa.int64()),
            "bad_evidence": pc.less(nm, nh).cast(pa.int64())})

    sums = (rel.map_batches(checks, batch_format="pyarrow")
            .sum(["bad_subj_id", "bad_obj_id", "bad_hosts",
                  "bad_evidence"]))
    dup_sp = (rel.groupby(["subj", "pred"])
              .aggregate(Count(alias_name="__n"))
              .map_batches(lambda t: pa.table({
                  "d": pc.greater(t.column("__n"), 1).cast(pa.int64())}),
                  batch_format="pyarrow")
              .sum("d"))
    rules = ["duplicate_subj_pred", "bad_subj_id", "bad_obj_id",
             "bad_hosts", "bad_evidence"]
    # Dataset.sum() is None on an empty release — an empty (but valid)
    # release reports zero violations, not a TypeError.
    sums = sums or {}
    viol = [int(dup_sp or 0),
            int(sums.get("sum(bad_subj_id)") or 0),
            int(sums.get("sum(bad_obj_id)") or 0),
            int(sums.get("sum(bad_hosts)") or 0),
            int(sums.get("sum(bad_evidence)") or 0)]
    return rd.from_arrow(pa.table({
        "rule": pa.array(rules, pa.string()),
        "violations": pa.array(viol, pa.int64())}))


SQL_RELEASE_VALIDATION = with_goldens(_kb_release_ctes() + """
, dup AS (SELECT CAST(coalesce(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END), 0)
                      AS BIGINT) AS v
          FROM (SELECT subj, pred, count(*) AS n FROM rel GROUP BY 1, 2))
, flags AS (SELECT
    CAST(sum(CASE WHEN NOT regexp_matches(subj_id, '^E[0-9]{4}$')
             THEN 1 ELSE 0 END) AS BIGINT) AS bs,
    CAST(sum(CASE WHEN NOT regexp_matches(obj_id, '^E[0-9]{4}$')
             THEN 1 ELSE 0 END) AS BIGINT) AS bo,
    CAST(sum(CASE WHEN n_hosts < 1 THEN 1 ELSE 0 END) AS BIGINT) AS bh,
    CAST(sum(CASE WHEN n_mentions < n_hosts THEN 1 ELSE 0 END) AS BIGINT)
      AS be
  FROM rel)
SELECT 'duplicate_subj_pred' AS rule, dup.v AS violations FROM dup
UNION ALL SELECT 'bad_subj_id', coalesce(bs, 0) FROM flags
UNION ALL SELECT 'bad_obj_id', coalesce(bo, 0) FROM flags
UNION ALL SELECT 'bad_hosts', coalesce(bh, 0) FROM flags
UNION ALL SELECT 'bad_evidence', coalesce(be, 0) FROM flags
""")


def q_kg_nil_entities(sf_dir: str):
    """NIL clustering — the entity-linking step for UNLINKABLE mentions
    (reference analog: surfaces below the linker's 0.8 threshold,
    `link.EntityLinker`): endpoint surfaces absent from the KB surface
    index are normalized (lowercase, non-alphanumeric runs -> single
    space, trim) and clustered by normalized key; each cluster mints a
    provisional entity id ``NIL:<min surface>`` — how cross-document
    coreference of out-of-KB entities enters a KG build.

    Shape: the KB surface set is vocabulary-bounded and ships in the
    task closure (J4 broadcast pattern); mention counting is a per-batch
    weighted combiner then one surface groupby (distinct unknown
    surfaces — open-world, so it STAYS distributed); the nil-id map is a
    key groupby + size-guarded join back. -> (nil_id, surface,
    n_mentions)."""
    from ray.data.aggregate import Min, Sum

    from cosmos_ray.queries.relational import join_or_broadcast
    from cosmos_ray.sources.entity_dict import (build_entity_dict,
                                                surface_index)

    known = frozenset(surface_index(build_entity_dict()))
    tr = _built_kg(sf_dir).triples.select_columns(
        ["subj", "obj", "n_mentions"])

    def ends(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df["n_mentions"].to_numpy()
        s = pd.DataFrame({
            "surface": pd.concat([df["subj"], df["obj"]],
                                 ignore_index=True),
            "n": np.concatenate([m, m])})
        s = s[~s["surface"].isin(known)]
        g = s.groupby("surface", sort=False)["n"].sum()
        return pa.table({"surface": pa.array(g.index, pa.string()),
                         "n": pa.array(g.to_numpy(), pa.int64())})

    per_surface = (tr.map_batches(ends, batch_format="pyarrow")
                   .groupby("surface")
                   .aggregate(Sum("n", alias_name="n_mentions")))

    def keyed(t: pa.Table) -> pa.Table:
        k = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(t.column("surface")), "[^a-z0-9]+", " "))
        return pa.table({"surface": t.column("surface"),
                         "n_mentions": t.column("n_mentions").cast(pa.int64()),
                         "k": k})

    # consumed twice (nil-id groupby + join back): materialize once
    ks = (per_surface.map_batches(keyed, batch_format="pyarrow")
          .materialize())
    nil = ks.groupby("k").aggregate(Min("surface", alias_name="nil_min"))
    j = join_or_broadcast(ks, nil, key="k", add_cols=["nil_min"])
    return j.map_batches(
        lambda t: pa.table({
            "nil_id": pc.binary_join_element_wise(
                "NIL:", t.column("nil_min"), ""),
            "surface": t.column("surface"),
            "n_mentions": t.column("n_mentions")}),
        batch_format="pyarrow")


SQL_KG_NIL_ENTITIES = with_goldens("""
, ends AS (
  SELECT subj AS surface FROM facts
  UNION ALL SELECT obj FROM facts)
, unk AS (
  SELECT surface, CAST(count(*) AS BIGINT) AS n_mentions
  FROM ends WHERE surface NOT IN (SELECT surface FROM surf)
  GROUP BY surface)
, keyed AS (
  SELECT surface, n_mentions,
         trim(regexp_replace(lower(surface), '[^a-z0-9]+', ' ', 'g')) AS k
  FROM unk)
SELECT 'NIL:' || min(surface) OVER (PARTITION BY k) AS nil_id,
       surface, n_mentions
FROM keyed
""")


def q_kg_links(sf_dir: str):
    """Hyperlink extraction — the web link graph's edge list
    (url, link_idx, href, anchor): every <a href> outside skip regions,
    with normalized anchor text, in document order
    (`stages/extract.parse_html_links`; the web substrate's analog of
    the reference's cross-document reference index). Stale same-url
    crawl duplicates collapse via a distinct groupby (link tuples are
    identical by construction)."""
    from ray.data.aggregate import Count

    from cosmos_ray.stages.extract import extract_links

    links = extract_links(_pages_ds(sf_dir))
    return (links.groupby(["url", "link_idx", "href", "anchor"])
            .aggregate(Count(alias_name="__n")).drop_columns(["__n"]))


def _sql_kg_links() -> str:
    from cosmos_ray.queries.oracle_gen import _H

    h = _H("60 + f")
    return with_goldens(f"""
SELECT url, CAST(f AS INT) AS link_idx,
       'https://web' || ({h} % 20) || '.example.org/p/' || ({h} % 9973)
         AS href,
       subj || ' ' || pred || ' ' || obj || '.' AS anchor
FROM facts
""")


SQL_KG_LINKS = _sql_kg_links()


def q_anchor_entity_links(sf_dir: str):
    """Anchor-text entity harvesting — the anchor-dictionary operator KB
    population pipelines run over a crawl (Wikipedia-style: anchors
    pointing at a target page vote on which entities the target is
    about; reference analog: Cosmos's cross-document entity evidence in
    the ES join index, `retrieval/elastic_retriever.py:74-90`). Each
    inbound anchor is parsed with the SVO extraction contract, its
    surfaces resolved against the KB, and evidence rolled up per
    (dst_host, entity): inbound anchor mentions + distinct source
    hosts.

    Shape: anchors parse with ONE vectorized extract_regex (the shared
    SVO pattern — no per-row finditer); surface->id resolution is a
    vectorized `index_in`/`take` against the vocabulary-sized KB arrays
    captured in the task closure; the exchange carries
    (dst_host, entity, src_host) partials — host-vocab x entity-vocab
    bounded — then one rollup groupby."""
    from ray.data.aggregate import Count, Sum

    from cosmos_ray.sources.entity_dict import build_entity_dict, surface_index
    from cosmos_ray.stages.triples import SVO_RE

    sidx = surface_index(build_entity_dict())
    kb_surfaces = pa.array(list(sidx.keys()), pa.string())
    kb_ids = pa.array([cid for cid, _sc in sidx.values()], pa.string())
    host_re = r"https?://(?P<h>[^/]+)/"

    def men(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = pc.extract_regex(t.column("anchor").combine_chunks(),
                             SVO_RE.pattern)
        ok = pc.is_valid(m)
        dst = pc.struct_field(
            pc.extract_regex(t.column("href").combine_chunks(), host_re),
            "h").filter(ok)
        src = pc.struct_field(
            pc.extract_regex(t.column("url").combine_chunks(), host_re),
            "h").filter(ok)
        parts = []
        for fld in ("subj", "obj"):
            surf = pc.struct_field(m, fld).filter(ok)
            idx = pc.index_in(surf, kb_surfaces)
            keep = pc.is_valid(idx)
            parts.append(pa.table({
                "dst_host": dst.filter(keep),
                "entity_id": pc.take(kb_ids, idx.filter(keep)),
                "src_host": src.filter(keep)}))
        return pa.concat_tables(parts)

    per = (q_kg_links(sf_dir).map_batches(men, batch_format="pyarrow")
           .groupby(["dst_host", "entity_id", "src_host"])
           .aggregate(Count(alias_name="m")))
    return (per.groupby(["dst_host", "entity_id"])
            .aggregate(Sum("m", alias_name="n_anchors"),
                       Count(alias_name="n_src_hosts")))


def q_entity_trend(sf_dir: str):
    """Entity mention TREND — per (entity, UTC day) mention counts over
    the crawl timeline: the trending-entities signal a KG-backed search
    surface maintains (and the temporal slice of the kg_fact_intervals
    provenance).

    Shape: page timestamps come from a (url, max ts) metadata pass over
    the INPUT pages (html never read); the pruned linked-mention stream
    joins that narrow map via `join_or_broadcast` (distributed hash
    join past the cap); one (entity, day) groupby — entity-vocab x days
    bounded."""
    from ray.data.aggregate import Count, Max

    from cosmos_ray.queries.relational import join_or_broadcast

    lk = _built_kg(sf_dir).linked
    meta = (_pages_ds(sf_dir)
            .map_batches(lambda t: pa.table({
                "url": t.column("url"),
                "ts_us": t.column("warc_ts").cast(pa.int64())}),
                batch_format="pyarrow")
            .groupby("url").aggregate(Max("ts_us", alias_name="ts_us")))

    j = join_or_broadcast(
        lk.map_batches(_mentions_batch, batch_format="pyarrow"),
        meta, key="url", add_cols=["ts_us"])

    def day(t: pa.Table) -> pa.Table:
        d = pc.divide(t.column("ts_us").cast(pa.int64()), 86_400_000_000)
        return pa.table({
            "entity_id": t.column("entity_id"),
            "day_us": pc.multiply(d, 86_400_000_000)})

    return (j.map_batches(day, batch_format="pyarrow")
            .groupby(["entity_id", "day_us"])
            .aggregate(Count(alias_name="n_mentions")))


def q_kg_inverse_preds(sf_dir: str):
    """Inverse/symmetric predicate detection (the AMIE inverse-rule
    family `p1(x,y) => p2(y,x)`, incl. p1 = p2 = symmetry): for every
    ordered predicate pair, the number of distinct canonical pairs
    whose REVERSED edge carries the other predicate, with CWA
    confidence n_inv / n_pairs(p1) — the schema-alignment signal that
    finds 'partnered with' symmetric and owner/owned-by inverses.

    Shape: the adjacency edge set (KB-bounded, never corpus-bounded)
    self-joins against its reversal on a packed entity-pair key via the
    native distributed hash join (one-to-many safe — several predicates
    can share a reversed pair, which rules the first-match broadcast
    lookup out); pred totals broadcast back onto the |preds|^2-bounded
    result."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import (_join_partitions,
                                               join_or_broadcast)

    adj = _built_kg(sf_dir).adjacency.select_columns(
        ["src_entity", "pred", "dst_entity"])

    def fwd(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.table({
            "k": pc.binary_join_element_wise(
                t.column("src_entity").combine_chunks(),
                t.column("dst_entity").combine_chunks(), "|"),
            "pred": t.column("pred")})

    def rev(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.table({
            "k": pc.binary_join_element_wise(
                t.column("dst_entity").combine_chunks(),
                t.column("src_entity").combine_chunks(), "|"),
            "pred_inv": t.column("pred")})

    f = adj.map_batches(fwd, batch_format="pyarrow")
    r = adj.map_batches(rev, batch_format="pyarrow")
    inv = (f.join(r, join_type="inner",
                  num_partitions=_join_partitions(), on=("k",))
           .groupby(["pred", "pred_inv"])
           .aggregate(Count(alias_name="n_inv")))
    tot = adj.groupby("pred").aggregate(Count(alias_name="n_pairs"))
    j = join_or_broadcast(inv, tot, key="pred", add_cols=["n_pairs"])

    def fin(t: pa.Table) -> pa.Table:
        ni = t.column("n_inv").cast(pa.int64())
        npr = t.column("n_pairs").cast(pa.int64())
        conf = pc.round(pc.divide(ni.cast(pa.float64()),
                                  npr.cast(pa.float64())), ndigits=6)
        return pa.table({
            "pred": t.column("pred"), "pred_inv": t.column("pred_inv"),
            "n_inv": ni, "n_pairs": npr, "confidence": conf})

    return j.map_batches(fin, batch_format="pyarrow")


SQL_KG_INVERSE_PREDS = with_goldens("""
, ep AS (SELECT DISTINCT ss.canonical_id AS src, so.canonical_id AS dst,
                f.pred
         FROM facts f JOIN surf ss ON ss.surface = f.subj
         JOIN surf so ON so.surface = f.obj)
, inv AS (SELECT a.pred AS pred, b.pred AS pred_inv,
                 CAST(count(*) AS BIGINT) AS n_inv
          FROM ep a JOIN ep b ON b.src = a.dst AND b.dst = a.src
          GROUP BY 1, 2)
, tot AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_pairs
          FROM ep GROUP BY 1)
SELECT i.pred, i.pred_inv, i.n_inv, t.n_pairs,
       round(CAST(i.n_inv AS DOUBLE) / t.n_pairs, 6) AS confidence
FROM inv i JOIN tot t ON t.pred = i.pred
""")


def q_entity_salience(sf_dir: str):
    """Per-document entity SALIENCE — tf x idf over linked mentions
    (the entity-centric ranking feature an entity-aware search index
    stores per (page, entity); tf-idf transplanted from terms to KB
    ids). salience = tf * ln(N / df) with N = documents carrying any
    linked mention.

    Shape: tf is one (url, entity) groupby of the pruned mention
    stream; df is a second entity-vocab-bounded groupby OVER the tf
    table (two-stage distinct); N is a single scalar count; df
    broadcasts back onto tf via `join_or_broadcast`."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import join_or_broadcast

    lk = _built_kg(sf_dir).linked

    m = lk.map_batches(_mentions_batch, batch_format="pyarrow")
    tf = (m.groupby(["url", "entity_id"])
          .aggregate(Count(alias_name="tf")).materialize())
    df_t = (tf.groupby("entity_id").aggregate(Count(alias_name="df")))
    n_docs = (tf.groupby("url").aggregate(Count(alias_name="__c"))
              .count())

    j = join_or_broadcast(tf, df_t, key="entity_id", add_cols=["df"])

    def fin(t: pa.Table) -> pa.Table:
        tfv = t.column("tf").to_numpy(zero_copy_only=False).astype(
            np.float64)
        dfv = t.column("df").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sal = np.round(tfv * np.log(float(n_docs) / dfv), 6)
        return pa.table({
            "url": t.column("url"), "entity_id": t.column("entity_id"),
            "tf": t.column("tf").cast(pa.int64()),
            "df": t.column("df").cast(pa.int64()),
            "salience": pa.array(sal, pa.float64())})

    return j.map_batches(fin, batch_format="pyarrow")


SQL_ENTITY_SALIENCE = with_goldens("""
, men AS (
  SELECT f.url, s.canonical_id AS e
  FROM facts f JOIN surf s ON s.surface = f.subj
  UNION ALL
  SELECT f.url, so.canonical_id
  FROM facts f JOIN surf so ON so.surface = f.obj)
, tf AS (SELECT url, e, count(*) AS tf FROM men GROUP BY 1, 2)
, dfx AS (SELECT e, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY e)
, nn AS (SELECT CAST(count(DISTINCT url) AS BIGINT) AS n FROM men)
SELECT t.url, t.e AS entity_id, CAST(t.tf AS BIGINT) AS tf, d.df,
       round(t.tf * ln(CAST(nn.n AS DOUBLE) / d.df), 6) AS salience
FROM tf t JOIN dfx d ON d.e = t.e CROSS JOIN nn
""")


SQL_ENTITY_TREND = with_goldens("""
, men AS (
  SELECT did, s.canonical_id AS e
  FROM facts f JOIN surf s ON s.surface = f.subj
  UNION ALL
  SELECT did, so.canonical_id
  FROM facts f JOIN surf so ON so.surface = f.obj)
SELECT e AS entity_id,
       CAST(((1700000000000000 + did * 1000000) // 86400000000)
            * 86400000000 AS BIGINT) AS day_us,
       CAST(count(*) AS BIGINT) AS n_mentions
FROM men GROUP BY 1, 2
""")


def q_image_phash_dups(sf_dir: str):
    """Perceptual-hash image near-duplicates — the multimodal mirror of
    the SimHash text family: a media table is synthesized from
    documents (one REAL gradient BMP per doc, per-seed slopes so
    structures differ); docs with doc_id % 50 == 7 carry the doc_id-7
    pattern shifted +3 in brightness — the classic re-encoded-thumbnail
    duplicate. aHash is brightness-shift invariant, so exactly those
    (base, shifted) pairs verify at hamming 0.

    ORACLE-EXACT since round 5 (was rows-only): BMP decode is lossless
    and the planted pattern is integer arithmetic, so the whole chain —
    pixels, aHash cell sums (dims are multiples of 8, so cells bin by
    plain integer division and share one pixel count; bit = cell >
    grid-mean replayed EXACTLY as 64*cell_sum > total_sum in BIGINT),
    MSB-first bit packing into 4x16-bit LSH bands, the band self-join
    with its 64-member deterministic truncation, and XOR-popcount
    verification — replays in SQL. The operator's pair semantics are
    additionally pytest-gated on planted images
    (`tests/test_imagehash.py`)."""
    from cosmos_ray.functions.imagecodec import encode_bmp
    from cosmos_ray.functions.imagehash import phash_near_dups

    docs = read(sf_dir, "documents", ["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        mids, payloads = [], []
        for d in ids:
            seed = d - 7 if d % 50 == 7 else d
            w = 8 * (3 + seed % 3)
            h = 8 * (3 + (seed // 5) % 3)
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            img = ((i * (3 + seed % 7) + j * (5 + (seed // 7) % 11)
                    + seed) % 200).astype(np.uint8)
            if d % 50 == 7:
                img = (img + 3).astype(np.uint8)
            mids.append(f"m{d}")
            payloads.append(encode_bmp(np.repeat(img[:, :, None], 3,
                                                 axis=2)))
        return pa.table({
            "media_id": pa.array(mids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    media = docs.map_batches(to_media, batch_format="pyarrow",
                             batch_size=64)
    return phash_near_dups(media, max_hamming=6)


SQL_IMAGE_PHASH_DUPS = """
WITH dims AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 7 THEN doc_id - 7 ELSE doc_id END AS seed,
         CASE WHEN doc_id % 50 = 7 THEN 3 ELSE 0 END AS shift
  FROM documents),
geo AS (
  SELECT doc_id, seed, shift,
         8 * (3 + seed % 3) AS w, 8 * (3 + (seed // 5) % 3) AS h,
         3 + seed % 7 AS ai, 5 + (seed // 7) % 11 AS aj
  FROM dims),
px AS (
  SELECT g.doc_id,
         ((i.i * g.ai + j.j * g.aj + g.seed) % 200 + g.shift) AS v,
         (i.i // (g.h // 8)) * 8 + (j.j // (g.w // 8)) AS k
  FROM geo g
  JOIN (SELECT unnest(range(0, 40)) AS i) i ON i.i < g.h
  JOIN (SELECT unnest(range(0, 40)) AS j) j ON j.j < g.w),
cells AS (SELECT doc_id, k, sum(v) AS s FROM px GROUP BY 1, 2),
tot AS (SELECT doc_id, sum(s) AS ts FROM cells GROUP BY 1),
bits AS (
  -- dims are multiples of 8 => every cell has the same pixel count, so
  -- cell_mean > grid_mean  <=>  64 * cell_sum > total_sum  (exact ints)
  SELECT c.doc_id, c.k,
         CASE WHEN 64 * c.s > t.ts THEN 1 ELSE 0 END AS b
  FROM cells c JOIN tot t USING (doc_id)),
bands AS (
  -- MSB-first packing puts cell k at uint64 bit 63-k; engine band B is
  -- bits [16B, 16B+16) => band_id = 3 - k//16, weight 2^(15 - k%16)
  SELECT doc_id, 3 - (k // 16) AS band_id,
         CAST(sum(b * (CAST(1 AS BIGINT) << CAST(15 - (k % 16) AS INT)))
              AS BIGINT) AS band_val
  FROM bits GROUP BY 1, 2),
members AS (
  -- the engine's deterministic degenerate-bucket truncation: keep the
  -- 64 lexicographically-smallest media ids per (band, value) bucket
  SELECT band_id, band_val, doc_id, 'm' || doc_id AS mid
  FROM bands
  QUALIFY row_number() OVER (PARTITION BY band_id, band_val
                             ORDER BY 'm' || doc_id) <= 64),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM members a JOIN members b
    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.mid < b.mid),
ham AS (
  SELECT c.da, c.db,
         CAST(sum(CASE WHEN x.b <> y.b THEN 1 ELSE 0 END) AS BIGINT)
           AS hamming
  FROM cand c
  JOIN bits x ON x.doc_id = c.da
  JOIN bits y ON y.doc_id = c.db AND y.k = x.k
  GROUP BY 1, 2)
SELECT 'm' || da AS media_id_a, 'm' || db AS media_id_b, hamming
FROM ham WHERE hamming <= 6
"""


def q_kg_mention_offsets(sf_dir: str):
    """Span provenance for every extracted fact: the character offsets
    of the subject and object surfaces within their source segment —
    the provenance a production KG keeps so each triple links back to
    its exact evidence span (reference analog: Cosmos threads
    per-extraction bbox/page provenance through its parquet outputs,
    `htcosmos/make_parquet.py`; this is the text-substrate equivalent).

    Shape: stateless map_batches fan-out with the SAME vectorized RE2
    predicate prefilter as the triple extractor (prose segments never
    reach the per-match span walk); no exchange at all — provenance is
    url-local by construction."""
    from cosmos_ray.stages.triples import _PRED_ALT, _SENT_SPLIT, SVO_RE

    segs = _built_kg(sf_dir).segments

    def spans(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.match_substring_regex(batch.column("text"), _PRED_ALT))
        urls = batch.column("url").to_pylist()
        seg_ids = batch.column("seg_id").to_pylist()
        texts = batch.column("text").to_pylist()
        cols: dict[str, list] = {k: [] for k in (
            "url", "seg_id", "sent_id", "subj", "pred", "obj",
            "subj_start", "subj_end", "obj_start", "obj_end")}
        for u, sid, t in zip(urls, seg_ids, texts):
            if not t:
                continue
            pos = 0
            for si, sent in enumerate(_SENT_SPLIT.split(t)):
                start = t.find(sent, pos)
                pos = start + len(sent)
                for m in SVO_RE.finditer(sent):
                    cols["url"].append(u)
                    cols["seg_id"].append(sid)
                    cols["sent_id"].append(si)
                    cols["subj"].append(m.group("subj"))
                    cols["pred"].append(m.group("pred"))
                    cols["obj"].append(m.group("obj"))
                    cols["subj_start"].append(start + m.start("subj"))
                    cols["subj_end"].append(start + m.end("subj"))
                    cols["obj_start"].append(start + m.start("obj"))
                    cols["obj_end"].append(start + m.end("obj"))
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "seg_id": pa.array(cols["seg_id"], pa.int32()),
            "sent_id": pa.array(cols["sent_id"], pa.int32()),
            "subj": pa.array(cols["subj"], pa.string()),
            "pred": pa.array(cols["pred"], pa.string()),
            "obj": pa.array(cols["obj"], pa.string()),
            "subj_start": pa.array(cols["subj_start"], pa.int32()),
            "subj_end": pa.array(cols["subj_end"], pa.int32()),
            "obj_start": pa.array(cols["obj_start"], pa.int32()),
            "obj_end": pa.array(cols["obj_end"], pa.int32()),
        })

    return segs.map_batches(spans, batch_format="pyarrow")


SQL_KG_MENTION_OFFSETS = with_goldens("""
SELECT f.url,
       CAST(4 + b.npar + CASE WHEN b.ht THEN 7 ELSE 0 END + f.f AS INT)
         AS seg_id,
       CAST(0 AS INT) AS sent_id, f.subj, f.pred, f.obj,
       CAST(0 AS INT) AS subj_start,
       CAST(length(f.subj) AS INT) AS subj_end,
       CAST(length(f.subj) + length(f.pred) + 2 AS INT) AS obj_start,
       CAST(length(f.subj) + length(f.pred) + 2 + length(f.obj) AS INT)
         AS obj_end
FROM facts f JOIN bsrc b USING (did)
""")


def q_kg_measurement_outliers(sf_dir: str):
    """Robust validation of EXTRACTED measurements — the data-cleaning
    pass a Cosmos-style system runs over the quantities it parsed out
    of tables before trusting them (flag per-metric readings more than
    2 MADs from the median; the extraction-error detector for OCR/parse
    glitches).

    Shape: cells parse exactly as kg_numeric_facts; the ONLY exchange
    is the (metric, value) COUNT table (metric vocab x distinct
    readings, never corpus-sized); the holistic median/MAD finish is
    model-sized driver work on counts (the mad_outlier_days
    convention), exact via weighted order statistics."""
    from ray.data.aggregate import Count as _Count

    from cosmos_ray.queries.relational import collect_small
    from cosmos_ray.stages import extract
    from cosmos_ray.stages.tables import extract_table_cells

    pages = _pages_ds(sf_dir)
    dup_ref = extract.discover_dup_urls(pages)
    if dup_ref is not None:
        pages = extract.dedup_latest_pages(pages, dup_ref)

    def parse(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("cell_text"),
                             r"^(?P<metric>[a-z]+) score (?P<val>[0-9]+)$")
        ok = pc.is_valid(m)
        return pa.table({
            "metric": pc.struct_field(m, "metric").filter(ok),
            "v": pc.struct_field(m, "val").filter(ok).cast(pa.int64())})

    counts = (extract_table_cells(pages)
              .map_batches(parse, batch_format="pyarrow")
              .groupby(["metric", "v"]).aggregate(_Count(alias_name="c")))
    tbl = collect_small(counts, cap_rows=2_000_000)
    if tbl is None:
        raise ValueError("(metric, value) count table exceeded the cap")

    def wmedian(v: np.ndarray, c: np.ndarray) -> float:
        order = np.argsort(v, kind="stable")
        v, c = np.asarray(v, np.float64)[order], np.asarray(c)[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        if n % 2 == 1:
            return float(v[np.searchsorted(cum, n // 2 + 1)])
        lo = float(v[np.searchsorted(cum, n // 2)])
        hi = float(v[np.searchsorted(cum, n // 2 + 1)])
        return (lo + hi) / 2.0

    df = tbl.to_pandas()
    rows = []
    for metric, g in df.groupby("metric", sort=True):
        v = g["v"].to_numpy()
        c = g["c"].to_numpy()
        med = wmedian(v, c)
        dev = np.abs(v.astype(np.float64) - med)
        mad = wmedian(dev, c)
        rows.append({
            "metric": metric, "n": int(c.sum()), "med": med, "mad": mad,
            "n_outliers": int(c[dev > 2 * mad].sum())})
    out = pd.DataFrame(rows)
    return rd.from_arrow(pa.table({
        "metric": pa.array(out["metric"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "med": pa.array(out["med"], pa.float64()),
        "mad": pa.array(out["mad"], pa.float64()),
        "n_outliers": pa.array(out["n_outliers"], pa.int64())}))


SQL_KG_MEASUREMENT_OUTLIERS = with_goldens("""
, mf(metric, which) AS (VALUES ('alpha', 1), ('beta', 2))
, vals AS (SELECT m.metric,
                  CASE m.which WHEN 1 THEN b.m1 ELSE b.m2 END AS v
           FROM bsrc b, mf m WHERE b.ht)
, stats AS (SELECT metric, CAST(count(*) AS BIGINT) AS n,
                   median(v) AS med
            FROM vals GROUP BY metric)
, madt AS (SELECT v.metric, median(abs(v.v - s.med)) AS mad
           FROM vals v JOIN stats s USING (metric) GROUP BY v.metric)
SELECT s.metric, s.n, CAST(s.med AS DOUBLE) AS med,
       CAST(m.mad AS DOUBLE) AS mad,
       CAST((SELECT count(*) FROM vals v2
             WHERE v2.metric = s.metric
               AND abs(v2.v - s.med) > 2 * m.mad) AS BIGINT) AS n_outliers
FROM stats s JOIN madt m ON m.metric = s.metric
""")


def q_autocomplete(sf_dir: str):
    """Search-autocomplete prefix index: for every query prefix (lengths
    1..4) the top-k completions ranked by corpus frequency (ties to the
    lexically smallest) — the type-ahead index a search surface builds
    beside its inverted index (reference analog: the ES retrieval layer,
    `retrieval/elastic_retriever.py:228-342`).

    Shape: the index is built over the VOCABULARY (already
    combiner-reduced by `corpus_vocab`, ≪ corpus), exploded x4 with
    vectorized codepoint slices; the per-prefix top-k finish is a
    `bucketed_group_apply` (prefix groups are vocab-bounded)."""
    from cosmos_ray.functions.embed import corpus_vocab
    from cosmos_ray.queries.relational import bucketed_group_apply

    K, PMAX = 5, 4
    vocab = corpus_vocab(read(sf_dir, "documents", ["doc_id", "text"]),
                         min_count=2)

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = t.column("token").combine_chunks()
        cnts = t.column("count").combine_chunks().cast(pa.int64())
        parts = []
        for L in range(1, PMAX + 1):
            ok = pc.greater_equal(pc.utf8_length(toks), L)
            parts.append(pa.table({
                "prefix": pc.utf8_slice_codeunits(toks.filter(ok), 0, L),
                "term": toks.filter(ok),
                "n": cnts.filter(ok)}))
        return pa.concat_tables(parts)

    ex = vocab.map_batches(explode, batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "term"], ascending=[False, True],
                          kind="stable").head(K).copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["prefix", "term", "n", "rnk"]]

    return bucketed_group_apply(ex, ["prefix"], finish)


SQL_AUTOCOMPLETE = """
WITH v AS (SELECT token, CAST(count(*) AS BIGINT) AS n
           FROM (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents)
           GROUP BY token HAVING count(*) >= 2)
, ex AS (SELECT substring(token, 1, L) AS prefix, token AS term, n
         FROM v, (VALUES (1), (2), (3), (4)) AS ls(L)
         WHERE length(token) >= L)
, r AS (SELECT prefix, term, n,
               row_number() OVER (PARTITION BY prefix
                                  ORDER BY n DESC, term) AS rnk
        FROM ex)
SELECT prefix, term, n, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 5
"""


def q_template_clusters(sf_dir: str):
    """DOM TEMPLATE clustering — pages grouped by the md5 of their tag
    SEQUENCE (structure-level fingerprint, complementing the text-level
    `kg_boilerplate`): the template-detection signal a crawler uses to
    recognize sites generated from one CMS layout. -> (template_hash,
    n_pages, n_hosts) for templates shared by >= 2 pages.

    Shape: per-url tag-string assembly is one url-bucketed pass
    (segments per url are page-bounded); afterwards only (hash, host)
    rows exchange — template-vocab bounded."""
    import hashlib

    from ray.data.aggregate import Count, Sum

    from cosmos_ray.queries.relational import bucketed_group_apply

    segs = _built_kg(sf_dir).segments.select_columns(
        ["url", "seg_id", "tag"])

    def fp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seg_id", kind="stable")
        sig = ",".join(g["tag"])
        return pd.DataFrame({
            "template_hash": [hashlib.md5(sig.encode()).hexdigest()],
            "host": [g["url"].iloc[0].split("/")[2]]})

    per_url = bucketed_group_apply(segs, ["url"], fp)
    per_host = (per_url.groupby(["template_hash", "host"])
                .aggregate(Count(alias_name="n")))
    out = (per_host.groupby("template_hash")
           .aggregate(Sum("n", alias_name="n_pages"),
                      Count(alias_name="n_hosts")))
    return out.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_pages"), 2)),
        batch_format="pyarrow")


SQL_TEMPLATE_CLUSTERS = with_goldens("""
, sig AS (SELECT url, split_part(url, '/', 3) AS host,
                 md5(string_agg(tag, ',' ORDER BY seg_id))
                   AS template_hash
          FROM blocks GROUP BY url)
, ph AS (SELECT template_hash, host, count(*) AS n
         FROM sig GROUP BY 1, 2)
SELECT template_hash, CAST(sum(n) AS BIGINT) AS n_pages,
       CAST(count(*) AS BIGINT) AS n_hosts
FROM ph GROUP BY 1 HAVING sum(n) >= 2
""")


def q_compression_quality(sf_dir: str):
    """Gopher-style zlib compression-ratio quality signal per document
    (`textops.compression_ratios`) — rows-only by design (no SQL
    compress scalar); the exact values are pytest-golden-gated
    (`test_textops`)."""
    from cosmos_ray.functions.textops import compression_ratios

    return compression_ratios(read(sf_dir, "documents",
                                   ["doc_id", "text"]))


def q_host_politeness(sf_dir: str):
    """Crawl POLITENESS audit — per host the fetch count, the minimum
    inter-fetch gap and the median gap (seconds can be negative-free
    since gaps are sorted-ts diffs): the compliance report a crawl
    operator keeps to prove rate limits were honored.

    Shape: a (host, ts) metadata pass (html never read), then one
    host-bucketed finish (`bucketed_group_apply`) with a vectorized
    sort+diff — the sessionize posture."""
    pages = _pages_ds(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        host = pc.extract_regex(t.column("url"), r"https?://(?P<h>[^/]+)/")
        return pa.table({
            "host": pc.struct_field(host, "h"),
            "ts_us": t.column("warc_ts").cast(pa.int64())})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts_us"].to_numpy())
        d = np.diff(ts)
        return pd.DataFrame({
            "host": [g["host"].iloc[0]],
            "n_fetches": [np.int64(len(ts))],
            "min_gap_us": [np.int64(d.min()) if len(d) else None],
            "p50_gap_us": [float(np.median(d)) if len(d) else None]})

    from cosmos_ray.queries.relational import bucketed_group_apply

    return bucketed_group_apply(
        pages.map_batches(prep, batch_format="pyarrow"),
        ["host"], finish)


SQL_HOST_POLITENESS = """
WITH p AS (
  SELECT 'web' || (doc_id % 20) || '.example.org' AS host,
         CAST(1700000000000000 + doc_id * 1000000 AS BIGINT) AS ts
  FROM documents
  UNION ALL
  SELECT 'web' || (doc_id % 20) || '.example.org',
         CAST(1700000000000000 + doc_id * 1000000 - 3600000000 AS BIGINT)
  FROM documents WHERE doc_id % 50 = 7)
, g AS (SELECT host,
               ts - lag(ts) OVER (PARTITION BY host ORDER BY ts) AS d
        FROM p)
SELECT host, CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(min(d) AS BIGINT) AS min_gap_us,
       CAST(median(d) AS DOUBLE) AS p50_gap_us
FROM g GROUP BY host
"""


def q_host_url_sample(sf_dir: str):
    """Consistent per-host URL sampling: the k urls with the smallest
    md5 digests per host — hash-rank sampling, so re-crawls sample the
    SAME urls without any RNG state (the crawl-QA audit sample every
    large crawl pipeline keeps; deterministic analog of per-group
    reservoir sampling).

    Shape: a per-batch combiner keeps only the k smallest digests per
    host within each batch (the md5 per distinct url is the one
    unavoidable per-string hash), so the exchange carries k x hosts
    partials per batch, never the url list; the per-host finish is a
    `bucketed_group_apply` merge of partials."""
    import hashlib

    from cosmos_ray.queries.relational import bucketed_group_apply

    K = 3
    pages = _pages_ds(sf_dir).select_columns(["url"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["url"]).copy()
        df["digest"] = [hashlib.md5(u.encode()).hexdigest()
                        for u in df["url"]]
        df["host"] = df["url"].str.extract(r"https?://([^/]+)/",
                                           expand=False)
        df = df.sort_values("digest", kind="stable")
        df = df[df.groupby("host", sort=False).cumcount() < K]
        return df[["host", "url", "digest"]]

    partials = pages.map_batches(part, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(subset=["url"])
             .sort_values("digest", kind="stable").head(K).copy())
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["host", "url", "digest", "rnk"]]

    return bucketed_group_apply(partials, ["host"], finish)


SQL_HOST_URL_SAMPLE = """
WITH u AS (SELECT DISTINCT
             'web' || (doc_id % 20) || '.example.org' AS host,
             'https://web' || (doc_id % 20) || '.example.org/p/' || doc_id
               AS url
           FROM documents)
, r AS (SELECT host, url, md5(url) AS digest,
               row_number() OVER (PARTITION BY host ORDER BY md5(url))
                 AS rnk
        FROM u)
SELECT host, url, digest, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
"""


def q_kg_pred_cooccurrence(sf_dir: str):
    """Relation-paraphrase signal (PATTY/AMIE-style): for every unordered
    predicate pair, how many distinct canonical (subj, obj) entity pairs
    assert BOTH predicates, with the Jaccard overlap of their pair sets
    — high overlap flags predicate synonyms for KG schema alignment.

    Shape: the per-entity-pair predicate co-occurrence is a
    `self_join_pairs` bucket self-join (vectorized pandas merge per
    coarse hash bucket; group size = predicates per entity pair,
    lexicon-bounded); totals are one pred-vocab groupby broadcast back
    onto the pair counts; Jaccard is integer-exact arithmetic divided
    once in float64 (bit-equal to the SQL DOUBLE expression)."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import (join_or_broadcast,
                                               self_join_pairs)

    adj = _built_kg(sf_dir).adjacency.select_columns(
        ["src_entity", "dst_entity", "pred"])
    pairs = self_join_pairs(adj, ["src_entity", "dst_entity"],
                            id_col="pred", max_group=64)
    both = (pairs.groupby(["pred_a", "pred_b"])
            .aggregate(Count(alias_name="n_both")))
    totals = adj.groupby("pred").aggregate(Count(alias_name="n"))

    def rename(col_key: str, col_n: str):
        return totals.map_batches(
            lambda t, ck=col_key, cn=col_n: pa.table({
                ck: t.column("pred"), cn: t.column("n")}),
            batch_format="pyarrow")

    j = join_or_broadcast(both, rename("pred_a", "n_a"),
                          key="pred_a", add_cols=["n_a"])
    j = join_or_broadcast(j, rename("pred_b", "n_b"),
                          key="pred_b", add_cols=["n_b"])

    def fin(t: pa.Table) -> pa.Table:
        nb = t.column("n_both").cast(pa.int64())
        denom = pc.subtract(
            pc.add(t.column("n_a").cast(pa.int64()),
                   t.column("n_b").cast(pa.int64())), nb)
        jac = pc.round(pc.divide(nb.cast(pa.float64()),
                                 denom.cast(pa.float64())), ndigits=6)
        return pa.table({
            "pred_a": t.column("pred_a"), "pred_b": t.column("pred_b"),
            "n_both": nb, "n_a": t.column("n_a").cast(pa.int64()),
            "n_b": t.column("n_b").cast(pa.int64()), "jaccard": jac})

    return j.map_batches(fin, batch_format="pyarrow")


SQL_KG_PRED_COOCCURRENCE = with_goldens("""
, ep AS (SELECT DISTINCT ss.canonical_id AS src, so.canonical_id AS dst,
                f.pred
         FROM facts f JOIN surf ss ON ss.surface = f.subj
         JOIN surf so ON so.surface = f.obj)
, pr AS (SELECT a.pred AS pred_a, b.pred AS pred_b
         FROM ep a JOIN ep b
           ON a.src = b.src AND a.dst = b.dst AND a.pred < b.pred)
, nb AS (SELECT pred_a, pred_b, CAST(count(*) AS BIGINT) AS n_both
         FROM pr GROUP BY 1, 2)
, tot AS (SELECT pred, CAST(count(*) AS BIGINT) AS n FROM ep GROUP BY 1)
SELECT nb.pred_a, nb.pred_b, nb.n_both, ta.n AS n_a, tb.n AS n_b,
       round(CAST(nb.n_both AS DOUBLE) / (ta.n + tb.n - nb.n_both), 6)
         AS jaccard
FROM nb JOIN tot ta ON ta.pred = nb.pred_a
JOIN tot tb ON tb.pred = nb.pred_b
""")


def q_kg_entity_profile(sf_dir: str):
    """Per-entity PROFILE card — the star rollup a KB service keeps per
    canonical entity (the 'entity card' behind Cosmos's per-entity
    retrieval view, `retrieval/elastic_retriever.py:74-90`): mention
    counts by role, distinct predicates asserted, distinct linked
    partner entities, and the modal predicate (ties to the lexically
    smallest).

    Shape: one pruned (entity, role, pred, partner) mention stream off
    the linked table (materialized once, consumed by four bounded
    rollups); every distinct count is a two-stage groupby so nothing
    driver-side holds a set; the modal predicate is a
    `bucketed_group_apply` argmax over (entity, pred) counts; the four
    entity-vocabulary-sized side tables meet the base via
    `left_join_or_broadcast` (distributed left join past the cap)."""
    from ray.data.aggregate import Count, Sum

    from cosmos_ray.queries.relational import (bucketed_group_apply,
                                               left_join_or_broadcast)

    lk = _built_kg(sf_dir).linked

    def men(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        parts = []
        for role, idc, pidc in (("s", "subj_id", "obj_id"),
                                ("o", "obj_id", "subj_id")):
            eid = t.column(idc).combine_chunks()
            ok = pc.not_equal(eid, "")
            partner = t.column(pidc).combine_chunks().filter(ok)
            parts.append(pa.table({
                "e": eid.filter(ok),
                "role": pa.array([role] * len(partner), pa.string()),
                "pred": t.column("pred").combine_chunks().filter(ok),
                "partner": pc.if_else(pc.equal(partner, ""),
                                      pa.nulls(len(partner), pa.string()),
                                      partner)}))
        return pa.concat_tables(parts)

    m = lk.map_batches(men, batch_format="pyarrow").materialize()

    def cnt_prep(t: pa.Table) -> pa.Table:
        is_s = pc.equal(t.column("role"), "s")
        return pa.table({
            "e": t.column("e"),
            "s1": is_s.cast(pa.int64()),
            "o1": pc.invert(is_s).cast(pa.int64())})

    base = (m.map_batches(cnt_prep, batch_format="pyarrow")
            .groupby("e")
            .aggregate(Sum("s1", alias_name="n_subj_facts"),
                       Sum("o1", alias_name="n_obj_facts")))

    subj = m.map_batches(
        lambda t: t.filter(pc.equal(t.column("role"), "s")),
        batch_format="pyarrow")
    n_preds = (subj.groupby(["e", "pred"]).aggregate(Count(alias_name="__c"))
               .groupby("e").aggregate(Count(alias_name="n_preds")))
    n_partners = (m.map_batches(
                      lambda t: t.filter(pc.is_valid(t.column("partner"))),
                      batch_format="pyarrow")
                  .groupby(["e", "partner"])
                  .aggregate(Count(alias_name="__c"))
                  .groupby("e").aggregate(Count(alias_name="n_partners")))
    pm = subj.groupby(["e", "pred"]).aggregate(Count(alias_name="__n"))

    def top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__n", "pred"], ascending=[False, True],
                          kind="stable")
        t = g.drop_duplicates(subset=["e"], keep="first")
        return pd.DataFrame({"e": t["e"].to_numpy(),
                             "top_pred": t["pred"].to_numpy()})

    tp = bucketed_group_apply(pm, ["e"], top)

    out = left_join_or_broadcast(base, n_preds, key="e",
                                 add_cols=["n_preds"], fill=0)
    out = left_join_or_broadcast(out, n_partners, key="e",
                                 add_cols=["n_partners"], fill=0)
    return left_join_or_broadcast(out, tp, key="e", add_cols=["top_pred"])


SQL_KG_ENTITY_PROFILE = with_goldens("""
, men AS (
  SELECT s.canonical_id AS e, 's' AS role, f.pred,
         so.canonical_id AS partner
  FROM facts f JOIN surf s ON s.surface = f.subj
  LEFT JOIN surf so ON so.surface = f.obj
  UNION ALL
  SELECT so.canonical_id, 'o', f.pred, s.canonical_id
  FROM facts f JOIN surf so ON so.surface = f.obj
  JOIN surf s ON s.surface = f.subj)
, cnts AS (SELECT e,
         CAST(sum(CASE WHEN role = 's' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_subj_facts,
         CAST(sum(CASE WHEN role = 'o' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_obj_facts
       FROM men GROUP BY e)
, pd_ AS (SELECT e, CAST(count(DISTINCT pred) AS BIGINT) AS n_preds
          FROM men WHERE role = 's' GROUP BY e)
, pt AS (SELECT e, CAST(count(DISTINCT partner) AS BIGINT) AS n_partners
         FROM men WHERE partner IS NOT NULL GROUP BY e)
, pm AS (SELECT e, pred, count(*) AS c FROM men WHERE role = 's'
         GROUP BY 1, 2)
, tp AS (SELECT e, min(pred) AS top_pred FROM pm p
         WHERE c = (SELECT max(c) FROM pm p2 WHERE p2.e = p.e)
         GROUP BY e)
SELECT c.e, c.n_subj_facts, c.n_obj_facts,
       coalesce(pd_.n_preds, 0) AS n_preds,
       coalesce(pt.n_partners, 0) AS n_partners,
       tp.top_pred
FROM cnts c LEFT JOIN pd_ USING (e) LEFT JOIN pt USING (e)
LEFT JOIN tp USING (e)
""")


def _sql_anchor_entity_links() -> str:
    from cosmos_ray.queries.oracle_gen import _H

    h = _H("60 + f")
    return with_goldens(f"""
, lk AS (
  SELECT 'web' || ({h} % 20) || '.example.org' AS dst_host,
         regexp_extract(url, 'https?://([^/]+)/', 1) AS src_host,
         subj, obj
  FROM facts)
, men AS (
  SELECT dst_host, s.canonical_id AS entity_id, src_host
  FROM lk JOIN surf s ON s.surface = lk.subj
  UNION ALL
  SELECT dst_host, s.canonical_id, src_host
  FROM lk JOIN surf s ON s.surface = lk.obj)
, ph AS (SELECT dst_host, entity_id, src_host, count(*) AS m
         FROM men GROUP BY 1, 2, 3)
SELECT dst_host, entity_id, CAST(sum(m) AS BIGINT) AS n_anchors,
       CAST(count(*) AS BIGINT) AS n_src_hosts
FROM ph GROUP BY 1, 2
""")


SQL_ANCHOR_ENTITY_LINKS = _sql_anchor_entity_links()


def q_host_link_graph(sf_dir: str):
    """Host-level web link graph: (src_host, dst_host, n_links) from the
    extracted outlinks — the aggregation commercial crawls publish (the
    Common Crawl host graph) and the substrate host-level PageRank /
    spam analysis runs on. Shape: host parsing is one vectorized regex
    pass; the exchange carries (host, host) pairs — host-vocabulary
    bounded, not link bounded, after the per-batch combiner groupby."""
    from ray.data.aggregate import Sum

    links = q_kg_links(sf_dir)

    def hosts(t: pa.Table) -> pa.Table:
        src = pc.struct_field(
            pc.extract_regex(t.column("url"), r"https?://(?P<h>[^/]+)/"), "h")
        dst = pc.struct_field(
            pc.extract_regex(t.column("href"), r"https?://(?P<h>[^/]+)/"), "h")
        pre = pa.table({"src_host": src, "dst_host": dst}) \
            .group_by(["src_host", "dst_host"]).aggregate([([], "count_all")])
        return pa.table({"src_host": pre.column("src_host"),
                         "dst_host": pre.column("dst_host"),
                         "n": pre.column("count_all").cast(pa.int64())})

    return (links.map_batches(hosts, batch_format="pyarrow")
            .groupby(["src_host", "dst_host"])
            .aggregate(Sum("n", alias_name="n_links")))


def _sql_host_link_graph() -> str:
    from cosmos_ray.queries.oracle_gen import _H

    h = _H("60 + f")
    return with_goldens(f"""
SELECT 'web' || (did % 20) || '.example.org' AS src_host,
       'web' || ({h} % 20) || '.example.org' AS dst_host,
       CAST(count(*) AS BIGINT) AS n_links
FROM facts GROUP BY 1, 2
""")


SQL_HOST_LINK_GRAPH = _sql_host_link_graph()


def q_host_pagerank(sf_dir: str):
    """PageRank over the HOST link graph (10 power iterations, damping
    0.85, uniform dangling redistribution) — the crawl-prioritization /
    spam-weighting score engines compute on exactly the host-graph
    rollup `host_link_graph` publishes. Same scale shape as
    kg_pagerank: edges stream; the node (host) table is broadcast under
    a cap with the distributed-join fallback inside `graph.pagerank`."""
    from cosmos_ray.functions.graph import pagerank

    pr = pagerank(q_host_link_graph(sf_dir), src="src_host",
                  dst="dst_host", weight="n_links", iters=10)
    return pr.map_batches(
        lambda t: pa.table({"host": t.column("entity"),
                            "rank": t.column("rank")}),
        batch_format="pyarrow")


def _sql_host_pagerank() -> str:
    from cosmos_ray.queries.oracle_gen import _H

    h = _H("60 + f")
    host_adj = f"""
, adj AS (
  SELECT 'web' || (did % 20) || '.example.org' AS src,
         'web' || ({h} % 20) || '.example.org' AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM facts GROUP BY 1, 2)
"""
    return _sql_kg_pagerank(adj_cte=host_adj, out="host")


SQL_HOST_PAGERANK = _sql_host_pagerank()


def q_inlink_anchors(sf_dir: str):
    """Inlink anchor profile per target page — the signal search engines
    aggregate for ranking and entity naming: for every link target,
    total inlinks, distinct linking hosts (cross-site popularity) and
    distinct anchor phrasings. Shape: one exchange of the distinct
    (href, src_host, anchor) link rows keyed by href (link-bounded, the
    same cost class as any link groupby), vectorized pandas nunique
    in-bucket."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    links = q_kg_links(sf_dir)

    def add_host(t: pa.Table) -> pa.Table:
        src = pc.struct_field(
            pc.extract_regex(t.column("url"), r"https?://(?P<h>[^/]+)/"), "h")
        return pa.table({"href": t.column("href"), "src_host": src,
                         "anchor": t.column("anchor")})

    def profile(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("href", sort=False)
        return pd.DataFrame({
            "href": gb.size().index.to_numpy(),
            "n_inlinks": gb.size().to_numpy().astype(np.int64),
            "n_src_hosts": gb["src_host"].nunique().to_numpy().astype(np.int64),
            "n_anchors": gb["anchor"].nunique().to_numpy().astype(np.int64)})

    return bucketed_group_apply(
        links.map_batches(add_host, batch_format="pyarrow"),
        ["href"], profile)


def _sql_inlink_anchors() -> str:
    from cosmos_ray.queries.oracle_gen import _H

    h = _H("60 + f")
    return with_goldens(f"""
, lk AS (
  SELECT 'web' || (did % 20) || '.example.org' AS src_host,
         'https://web' || ({h} % 20) || '.example.org/p/' || ({h} % 9973)
           AS href,
         subj || ' ' || pred || ' ' || obj || '.' AS anchor
  FROM facts)
SELECT href,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts,
       CAST(count(DISTINCT anchor) AS BIGINT) AS n_anchors
FROM lk GROUP BY href
""")


SQL_INLINK_ANCHORS = _sql_inlink_anchors()


def q_crawl_frontier(sf_dir: str):
    """Crawl-frontier discovery: outlink targets NOT in the crawled url
    set, ranked by inbound evidence (inlinks, distinct linking hosts) —
    the queue a crawler feeds from next. Shape: the inlink profile
    (href-keyed, link-bounded) anti-semi-joined against the crawled url
    key set (`semi_join_ds`, broadcast key set under the cap with the
    distributed fallback). Malformed pages never extracted still COUNT
    as crawled (their url was fetched), so the key set comes from the
    raw page listing, not the extraction survivors."""
    from ray.data.aggregate import Count, Sum

    from cosmos_ray.queries.relational import bucketed_group_apply, semi_join_ds

    links = q_kg_links(sf_dir)

    def add_host(t: pa.Table) -> pa.Table:
        src = pc.struct_field(
            pc.extract_regex(t.column("url"), r"https?://(?P<h>[^/]+)/"), "h")
        return pa.table({"href": t.column("href"), "src_host": src})

    def profile(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("href", sort=False)
        return pd.DataFrame({
            "href": gb.size().index.to_numpy(),
            "n_inlinks": gb.size().to_numpy().astype(np.int64),
            "n_src_hosts": gb["src_host"].nunique().to_numpy().astype(np.int64)})

    prof = bucketed_group_apply(
        links.map_batches(add_host, batch_format="pyarrow"),
        ["href"], profile)
    crawled = (_pages_ds(sf_dir)
               .map_batches(lambda t: pa.table({"url": t.column("url")}),
                            batch_format="pyarrow"))
    return semi_join_ds(prof, crawled, key_col="url", big_key="href",
                        keep=False)


def _sql_crawl_frontier() -> str:
    from cosmos_ray.queries.oracle_gen import _H

    h = _H("60 + f")
    return with_goldens(f"""
, lk AS (
  SELECT 'web' || (did % 20) || '.example.org' AS src_host,
         'https://web' || ({h} % 20) || '.example.org/p/' || ({h} % 9973)
           AS href
  FROM facts)
, crawled AS (
  SELECT 'https://web' || (doc_id % 20) || '.example.org/p/' || doc_id
           AS url
  FROM documents)
SELECT href,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
FROM lk WHERE href NOT IN (SELECT url FROM crawled)
GROUP BY href
""")


SQL_CRAWL_FRONTIER = _sql_crawl_frontier()


def q_kg_layout_pages(sf_dir: str):
    """Layout census over the CLASSIFIED segments: per url, page count
    and how many pages the engine detects as two-column — detected from
    GEOMETRY (any segment whose x1 sits past the 960-px column split),
    not from the generator's draw; the oracle replays the draw + veto
    arithmetic independently, so a layout bug on either side breaks the
    hash. One vectorized pass + a url-keyed combiner reduce."""
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    segs = _built_kg(sf_dir).segments

    def per_page(t: pa.Table) -> pa.Table:
        import numpy as np

        bb = t.column("bbox")
        flat = bb.combine_chunks() if isinstance(bb, pa.ChunkedArray) else bb
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.chunk(0)
        x1 = flat.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)[:, 0]
        urls = np.asarray(t.column("url").to_pylist(), dtype=object)
        page = t.column("page_num").to_numpy(zero_copy_only=False).astype(np.int64)
        # block-local combiner, fully vectorized: one row per
        # (url, page) with the right-column-block flag
        ucodes, uinv = np.unique(urls, return_inverse=True)
        key = uinv.astype(np.int64) * (1 << 22) + page
        uk, kinv = np.unique(key, return_inverse=True)
        twocol = np.zeros(len(uk), dtype=bool)
        np.logical_or.at(twocol, kinv[x1 >= 960.0], True)
        return pa.table({
            "url": pa.array(ucodes[(uk >> 22)], pa.string()),
            "page": pa.array(uk & ((1 << 22) - 1), pa.int64()),
            "twocol": pa.array(twocol.astype(np.int64), pa.int64()),
        })

    pages = segs.select_columns(["url", "page_num", "bbox"]).map_batches(
        per_page, batch_format="pyarrow")
    # pages of one url stay within one block (explode invariant), so the
    # groupby moves one row per page, already combined
    g = pages.groupby("url").aggregate(
        _Max("page", alias_name="maxp"), _Sum("twocol", alias_name="n_twocol"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("url"),
            "n_pages": pc.add(t.column("maxp"), pa.scalar(1)).cast(pa.int64()),
            "n_twocol": t.column("n_twocol").cast(pa.int64()),
        })

    return g.map_batches(fin, batch_format="pyarrow")


SQL_KG_LAYOUT_PAGES = with_goldens(f"""
, {layout_ctes()},
 pg AS (SELECT url, page,
               -- observable form: a RIGHT-column block exists (a drawn
               -- two-col page whose blocks all fit the left column is
               -- geometrically indistinguishable from single-column)
               max(CASE WHEN twocol AND pos >= 6 THEN 1 ELSE 0 END) AS tc
        FROM lay GROUP BY url, page)
SELECT url, CAST(max(page) + 1 AS BIGINT) AS n_pages,
       CAST(sum(tc) AS BIGINT) AS n_twocol
FROM pg GROUP BY url
""")


def q_kg_sections(sf_dir: str):
    """Sections aggregation over classified segments (reference
    `aggregate_sections`, G1)."""
    from cosmos_ray.stages.aggregate import aggregate_sections

    return aggregate_sections(_built_kg(sf_dir).segments).select_columns(
        ["url", "section_id", "section_header", "section_header_page", "content"]
    )


SQL_KG_SECTIONS = with_goldens("""
, b2 AS (SELECT url, seg_id, text,
                CASE WHEN cls IN ('Title', 'Section Header') THEN 1 ELSE 0 END AS is_hdr
         FROM blocks),
 b3 AS (SELECT *, SUM(is_hdr) OVER (PARTITION BY url ORDER BY seg_id
                                    ROWS UNBOUNDED PRECEDING) - 1 AS sid FROM b2)
SELECT url, CAST(sid AS INT) AS section_id,
       max(CASE WHEN is_hdr = 1 THEN text END) AS section_header,
       CAST(max(CASE WHEN is_hdr = 1 THEN seg_id // 12 END) AS INT) AS section_header_page,
       coalesce(string_agg(CASE WHEN is_hdr = 0 THEN text END, chr(10) ORDER BY seg_id),
                '') AS content
FROM b3 GROUP BY url, sid
""")


def q_kg_captions(sf_dir: str):
    """Caption↔object association over classified segments (J2) plus the
    J1 feathered text pooling: one row per Table Caption with its
    greedily matched Table segment and the 150-px-feathered
    nearby-line text (2-D — the pooling window respects the two-column
    layout on two-column pages)."""
    from cosmos_ray.stages.aggregate import associate_captions

    return associate_captions(_built_kg(sf_dir).segments).select_columns(
        ["url", "page_num", "caption_seg_id", "caption_text",
         "object_seg_id", "object_text", "nearby_text"]
    )


# greedy nearest-centroid claiming, reproduced as a recursive CTE over
# caption rank r per (url, page): rank r claims the nearest object not in
# the claimed list; geometry from the layout replay (oracle_gen.layout_ctes
# — two-column pages included). All coordinates are integer-valued
# (layout parity note in oracle_gen.py), so the DOUBLE distances equal the
# engine's. nearby_text replays `geometry.spatial_join_text`: page lines
# whose boxes intersect the caption box expanded by 150 px, in
# (y2, x1, seg) order.
SQL_KG_CAPTIONS = with_goldens(f"""
, {layout_ctes()},
 caps AS (SELECT *, CAST(row_number() OVER (PARTITION BY url, page ORDER BY seg_id)
                         AS INT) - 1 AS r
          FROM lay WHERE cls = 'Table Caption'),
 nearby AS (
   SELECT c.url, c.seg_id AS cseg,
          string_agg(l.text, ' ' ORDER BY l.y2, l.x1, l.seg_id) AS nearby_text
   FROM caps c JOIN lay l ON l.url = c.url AND l.page = c.page
     AND c.x1 - 150.0 < l.x2 AND l.x1 < c.x2 + 150.0
     AND c.y1 - 150.0 < l.y2 AND l.y1 < c.y2 + 150.0
   GROUP BY c.url, c.seg_id),
 objs AS (SELECT url, page, seg_id, text, cx, cy FROM lay WHERE cls = 'Table'),
 assoc AS (
   SELECT c.url, c.page, c.r, c.seg_id AS caption_seg_id, c.text AS caption_text,
          o.seg_id AS object_seg_id, o.text AS object_text,
          CASE WHEN o.seg_id IS NULL THEN CAST([] AS INT[])
               ELSE [CAST(o.seg_id AS INT)] END AS claimed
   FROM caps c LEFT JOIN LATERAL (
      SELECT seg_id, text FROM objs o
      WHERE o.url = c.url AND o.page = c.page
      ORDER BY (o.cx - c.cx) * (o.cx - c.cx) + (o.cy - c.cy) * (o.cy - c.cy), o.seg_id
      LIMIT 1) o ON TRUE
   WHERE c.r = 0
   UNION ALL
   SELECT c.url, c.page, c.r, c.seg_id, c.text, o.seg_id, o.text,
          CASE WHEN o.seg_id IS NULL THEN a.claimed
               ELSE list_append(a.claimed, CAST(o.seg_id AS INT)) END
   FROM assoc a JOIN caps c ON c.url = a.url AND c.page = a.page AND c.r = a.r + 1
   LEFT JOIN LATERAL (
      SELECT seg_id, text FROM objs o
      WHERE o.url = c.url AND o.page = c.page
        AND NOT list_contains(a.claimed, CAST(o.seg_id AS INT))
      ORDER BY (o.cx - c.cx) * (o.cx - c.cx) + (o.cy - c.cy) * (o.cy - c.cy), o.seg_id
      LIMIT 1) o ON TRUE
 )
SELECT a.url, a.page AS page_num, a.caption_seg_id, a.caption_text,
       CAST(a.object_seg_id AS INT) AS object_seg_id, a.object_text,
       coalesce(n.nearby_text, '') AS nearby_text
FROM assoc a LEFT JOIN nearby n ON n.url = a.url AND n.cseg = a.caption_seg_id
""", recursive=True)


def q_dehyphenate(sf_dir: str):
    """Dehyphenation enrichment (M7, `context_enrichment.py:162-179`) as
    a column transform over documents — SQL-expressible (RE2 on both
    sides), byte-level goldens live in tests/test_enrich.py."""
    from cosmos_ray.stages.enrich import dehyphenate

    return dehyphenate(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_DEHYPHENATE = r"""
SELECT doc_id,
       regexp_replace(text, '([A-Za-z0-9])-\n([A-Za-z0-9])', '\1\2', 'g') AS text
FROM documents
"""


def q_kg_table_context(sf_dir: str):
    """Table-context enrichment over the classified segments
    (`context_enrichment.py:180-238`): per Table Caption label, the body
    sentences mentioning it."""
    from cosmos_ray.stages.enrich import table_context

    return table_context(_built_kg(sf_dir).segments)


# the (?<=[.!?])\s+ sentence split is lookbehind, which RE2 lacks —
# equivalently: mark each punct+whitespace gap with \x01 and split on it
SQL_KG_TABLE_CONTEXT = with_goldens(r"""
, capsl AS (
   SELECT url, seg_id,
          'table ' || rtrim(regexp_extract(text,
              '(?i)\b(table|tbl|tab)\.? {1,2}([0-9.ivxlcdm-]+)', 2), '.') AS table_label
   FROM blocks WHERE cls = 'Table Caption'
     AND regexp_matches(text, '(?i)\b(table|tbl|tab)\.? {1,2}[0-9.ivxlcdm-]+')),
 sent AS (
   SELECT url, seg_id,
          unnest(string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'),
                              chr(1))) AS s,
          unnest(range(1, len(string_split(regexp_replace(text, '([.!?])\s+',
                              '\1' || chr(1), 'g'), chr(1))) + 1)) AS sidx
   FROM blocks WHERE cls IN ('Body Text', 'List Item')),
 ctx AS (
   SELECT c.url, c.seg_id, c.table_label,
          coalesce(string_agg(CASE WHEN t.s != '' AND contains(lower(t.s), c.table_label)
                                   THEN t.s END, ' ' ORDER BY t.seg_id, t.sidx),
                   '') AS context_from_text
   FROM capsl c LEFT JOIN sent t ON t.url = c.url
   GROUP BY c.url, c.seg_id, c.table_label)
SELECT url, table_label, context_from_text FROM ctx
""")


def q_kg_table_qa(sf_dir: str):
    """QA-enriched table contexts (the reference's use_qa_table_enrichment
    composition): extractive QA over each caption's context_from_text."""
    from cosmos_ray.stages.enrich import qa_table_enrichment

    out = qa_table_enrichment(_built_kg(sf_dir).segments,
                              question="what scans?")
    return out.select_columns(["url", "table_label", "answer"])


# same context reconstruction as SQL_KG_TABLE_CONTEXT, then the QA
# extractor's span pattern as a regexp_extract (NULLIF: no match -> NULL,
# matching the engine's null answer)
SQL_KG_TABLE_QA = with_goldens(r"""
, capsl AS (
   SELECT url, seg_id,
          'table ' || rtrim(regexp_extract(text,
              '(?i)\b(table|tbl|tab)\.? {1,2}([0-9.ivxlcdm-]+)', 2), '.') AS table_label
   FROM blocks WHERE cls = 'Table Caption'
     AND regexp_matches(text, '(?i)\b(table|tbl|tab)\.? {1,2}[0-9.ivxlcdm-]+')),
 sent AS (
   SELECT url, seg_id,
          unnest(string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'),
                              chr(1))) AS s,
          unnest(range(1, len(string_split(regexp_replace(text, '([.!?])\s+',
                              '\1' || chr(1), 'g'), chr(1))) + 1)) AS sidx
   FROM blocks WHERE cls IN ('Body Text', 'List Item')),
 ctx AS (
   SELECT c.url, c.seg_id, c.table_label,
          coalesce(string_agg(CASE WHEN t.s != '' AND contains(lower(t.s), c.table_label)
                                   THEN t.s END, ' ' ORDER BY t.seg_id, t.sidx),
                   '') AS context_from_text
   FROM capsl c LEFT JOIN sent t ON t.url = c.url
   GROUP BY c.url, c.seg_id, c.table_label)
SELECT url, table_label,
       NULLIF(regexp_extract(context_from_text, '([a-z]+) scan [a-z]+', 1), '') AS answer
FROM ctx
""")


def q_kg_boilerplate(sf_dir: str):
    """Site-level boilerplate blocks (M14 web analog)."""
    from cosmos_ray.stages.enrich import detect_boilerplate

    return detect_boilerplate(_built_kg(sf_dir).segments)


SQL_KG_BOILERPLATE = with_goldens("""
, bsite AS (SELECT split_part(url, '/', 3) AS site, url, text FROM blocks),
 bp1 AS (SELECT site, text, count(DISTINCT url) AS n_pages FROM bsite GROUP BY site, text),
 sp AS (SELECT site, count(DISTINCT url) AS site_pages FROM bsite GROUP BY site)
SELECT b.site, b.text, b.n_pages, s.site_pages,
       round(CAST(b.n_pages AS DOUBLE) / s.site_pages, 6) AS frac
FROM bp1 b JOIN sp s USING (site)
WHERE s.site_pages >= 5 AND CAST(b.n_pages AS DOUBLE) / s.site_pages >= 0.6
""")


def q_kg_tables_cells(sf_dir: str):
    """Structured table-content extraction (web analog of the reference's
    camelot/pdfplumber table parse, `htcosmos/make_parquet.py:786-815`):
    one row per <td>/<th> cell with (table_idx, row_idx, col_idx).
    Stale duplicate crawls are dropped first via the metadata-only dup
    plan (same pre-extraction dedup as the streaming KG pipeline)."""
    from cosmos_ray.stages import extract
    from cosmos_ray.stages.tables import extract_table_cells

    pages = _pages_ds(sf_dir)
    dup_ref = extract.discover_dup_urls(pages)
    if dup_ref is not None:
        pages = extract.dedup_latest_pages(pages, dup_ref)
    return extract_table_cells(pages)


SQL_KG_TABLES_CELLS = with_goldens("""
, cellgrid(row_idx, col_idx, kind) AS (VALUES
    (0, 0, 'm'), (0, 1, 'v'), (1, 0, 'a'), (1, 1, 'b'))
SELECT b.url, CAST(0 AS INT) AS table_idx,
       CAST(c.row_idx AS INT) AS row_idx, CAST(c.col_idx AS INT) AS col_idx,
       CASE c.kind WHEN 'm' THEN 'metric' WHEN 'v' THEN 'value'
            WHEN 'a' THEN 'alpha score ' || b.m1
            ELSE 'beta score ' || b.m2 END AS cell_text
FROM bsrc b, cellgrid c WHERE b.ht
""")


def q_kg_numeric_facts(sf_dir: str):
    """Measurement extraction — the reference's headline downstream use
    (turning parsed table cells into typed quantities,
    `htcosmos/make_parquet.py:786-815` feeding the Cosmos QA surface):
    every cell matching '<metric> score <int>' becomes a numeric fact
    (url, table_idx, metric, value BIGINT) tagged with its table's
    caption label.

    Shape: cells parse with one vectorized `extract_regex` (non-matching
    header cells drop batch-side, so only real measurements move);
    captions are a narrow (url, table_label) stream off the classified
    segments; the two meet via `join_or_broadcast` — broadcast at test
    scale, distributed hash join once the caption count exceeds the
    cap."""
    from cosmos_ray.queries.relational import join_or_broadcast
    from cosmos_ray.stages import extract
    from cosmos_ray.stages.tables import extract_table_cells

    pages = _pages_ds(sf_dir)
    dup_ref = extract.discover_dup_urls(pages)
    if dup_ref is not None:
        pages = extract.dedup_latest_pages(pages, dup_ref)

    def parse(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("cell_text"),
                             r"^(?P<metric>[a-z]+) score (?P<val>[0-9]+)$")
        ok = pc.is_valid(m)
        return pa.table({
            "url": t.column("url").filter(ok),
            "table_idx": t.column("table_idx").filter(ok),
            "metric": pc.struct_field(m, "metric").filter(ok),
            "value": pc.struct_field(m, "val").filter(ok).cast(pa.int64()),
        })

    facts = extract_table_cells(pages).map_batches(
        parse, batch_format="pyarrow")

    def caps(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        keep = pc.equal(t.column("cls").combine_chunks(), "Table Caption")
        txt = t.column("text").combine_chunks().filter(keep)
        lab = pc.extract_regex(
            txt, r"(?i)\b(?:table|tbl|tab)\.? {1,2}(?P<n>[0-9]+)")
        good = pc.is_valid(lab)
        return pa.table({
            "url": t.column("url").combine_chunks().filter(keep).filter(good),
            "table_label": pc.binary_join_element_wise(
                pa.array(["table"] * len(txt)).filter(good),
                pc.struct_field(lab, "n").filter(good), " "),
        })

    captions = _built_kg(sf_dir).segments.map_batches(
        caps, batch_format="pyarrow")
    return join_or_broadcast(facts, captions, key="url",
                             add_cols=["table_label"])


SQL_KG_NUMERIC_FACTS = with_goldens("""
, mf(metric, which) AS (VALUES ('alpha', 1), ('beta', 2))
SELECT b.url, CAST(0 AS INT) AS table_idx, m.metric,
       CAST(CASE m.which WHEN 1 THEN b.m1 ELSE b.m2 END AS BIGINT) AS value,
       'table ' || (1 + b.did % 3) AS table_label
FROM bsrc b, mf m WHERE b.ht
""")


def q_qa_spans(sf_dir: str):
    """Extractive QA over documents (D4 analog, `qa_extractor.py:15-61`):
    answer spans for 'what scans?' — subjects of '<w> scan <w>' SVO
    occurrences. SQL-expressible (same RE2 pattern both sides)."""
    from cosmos_ray.stages.qa import answer_questions

    spans = answer_questions(read(sf_dir, "documents", ["doc_id", "text"]),
                             question="what scans?")
    return spans.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("answer"))).select(["doc_id", "answer"]),
        batch_format="pyarrow",
    )


SQL_QA_SPANS = """
SELECT doc_id, regexp_extract(text, '([a-z]+) scan [a-z]+', 1) AS answer
FROM documents WHERE regexp_matches(text, '[a-z]+ scan [a-z]+')
"""


def q_rerank_windows(sf_dir: str):
    """Cross-encoder-style rerank of the sliding-window corpus (D5/O6
    analog): global top-10 windows for a fixed query, deterministic via
    (doc_id, window_id) tiebreak — fully SQL-replayable."""
    from cosmos_ray.stages.export import sliding_windows
    from cosmos_ray.stages.qa import rerank_topk

    wins = sliding_windows(read(sf_dir, "documents", ["doc_id", "text"]),
                           window=64, stride=16)
    return rerank_topk(wins, query="spark join optimization strategies",
                       k=10, text_col="window_text",
                       tiebreak_cols=["doc_id", "window_id"])


def _sql_rerank_windows() -> str:
    """DuckDB replay of the rerank pipeline: the doc_windows grid (the
    proven SQL_DOC_WINDOWS shape) scored with the OverlapReranker
    formula |tokens-in-query-set| / sqrt(|tokens|) rounded to 6dp, then
    the same (score DESC, doc_id, window_id) total order, top 10."""
    q_tokens = sorted(set("spark join optimization strategies".lower().split()))
    qlist = ", ".join(f"'{t}'" for t in q_tokens)
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
           WHERE length(trim(text)) > 0),
win AS (SELECT doc_id,
               CAST(st // 16 AS INT) AS window_id,
               array_to_string(list_slice(ws, st + 1, st + 64), ' ') AS window_text
        FROM (SELECT doc_id, ws,
                     unnest(range(0, greatest(len(ws) - 48, 1), 16)) AS st
              FROM w)),
s AS (SELECT doc_id, window_id, window_text,
             round(CAST(len(list_filter(string_split(lower(window_text), ' '),
                                        t -> t IN ({qlist}))) AS DOUBLE)
                   / sqrt(len(string_split(window_text, ' '))), 6) AS rerank_score
      FROM win)
SELECT * FROM s ORDER BY rerank_score DESC, doc_id, window_id LIMIT 10
"""


SQL_RERANK_WINDOWS = _sql_rerank_windows()


def q_kg_equations(sf_dir: str):
    """Equation rows with nearest-midline (X.Y) label association
    (J3/G4, `reaggregate_equations.py:61-120`)."""
    from cosmos_ray.stages.aggregate import aggregate_equations

    return aggregate_equations(_built_kg(sf_dir).segments).select_columns(
        ["url", "equation_page", "label", "content"]
    )


SQL_KG_EQUATIONS = with_goldens(f"""
, {layout_ctes()},
 geomq AS (SELECT url, seg_id, text, cls, page,
            page * 1920.0 + cy AS mid
     FROM lay),
 eqs AS (SELECT * FROM geomq WHERE cls = 'Equation'),
 labs AS (SELECT * FROM geomq WHERE cls != 'Equation'
          AND regexp_full_match(trim(text), '[\\(ð][1-9A-Z]+\\.?[0-9A-Za-z]*[\\)Þ]'))
SELECT e.url, e.page AS equation_page, l.text AS label, e.text AS content
FROM eqs e LEFT JOIN LATERAL (
   SELECT text FROM labs l WHERE l.url = e.url AND abs(l.mid - e.mid) <= 300.0
   ORDER BY abs(l.mid - e.mid), l.seg_id LIMIT 1) l ON TRUE
""")


def _golden_annotations(sf_dir: str):
    import pyarrow.parquet as pq

    from cosmos_ray.sources.pages import golden_corpus
    from cosmos_ray.stages.metrics import golden_annotations

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    return golden_annotations(golden_corpus(docs)["segments"])


def q_kg_eval_ap(sf_dir: str):
    """Detection AP@[.5:.95]/AP50/AP75 per class vs golden annotations
    (G10, `page_metrics.py:63-123`). The oracle encodes the corpus
    invariant the pytest gates also assert: the deterministic classifier
    reproduces every golden class, so AP == 1.0 per class and
    n_pred == n_gold == that class's block count — any engine
    misclassification breaks the value hash."""
    from cosmos_ray.stages.metrics import detection_ap

    return detection_ap(_built_kg(sf_dir).segments, _golden_annotations(sf_dir))


SQL_KG_EVAL_AP = with_goldens("""
SELECT cls, 1.0 AS ap, 1.0 AS ap50, 1.0 AS ap75,
       count(*) AS n_pred, count(*) AS n_gold
FROM blocks GROUP BY cls
""")


def q_kg_eval_prf(sf_dir: str):
    """Per-document P/R/F1 self-evaluation vs golden classes (G9,
    `context_enrichment.py:246-319`). Oracle = the perfect-classifier
    invariant per url (see q_kg_eval_ap)."""
    from cosmos_ray.stages.metrics import detection_prf

    return detection_prf(_built_kg(sf_dir).segments, _golden_annotations(sf_dir))


SQL_KG_EVAL_PRF = with_goldens("""
SELECT url, 1.0 AS precision, 1.0 AS recall, 1.0 AS f1,
       count(*) AS n_pred, count(*) AS n_gold
FROM blocks GROUP BY url
""")


def q_langid(sf_dir: str):
    from cosmos_ray.functions.textops import language_id

    return language_id(read(sf_dir, "documents", ["doc_id", "text"]))


def _sql_langid() -> str:
    """Replicates textops.LanguageId in SQL: per-language cue-substring
    counts (non-overlapping, = replace-based counting) normalized by text
    length; argmax with first-lang-wins ties; 'und' when all zero."""
    from cosmos_ray.functions.textops import _LANG_CUES

    def count_expr(cue: str) -> str:
        c = cue.replace("'", "''")
        return f"(length(t) - length(replace(t, '{c}', ''))) // {len(cue)}"

    score_cols = ",\n       ".join(
        f"CAST({' + '.join(count_expr(c) for c in cues)} AS DOUBLE) / l AS s_{lang}"
        for lang, cues in _LANG_CUES.items()
    )
    langs = list(_LANG_CUES)
    mx = "greatest(" + ", ".join(f"s_{x}" for x in langs) + ")"
    pick = " ".join(f"WHEN s_{x} = mx THEN '{x}'" for x in langs[:-1])
    return f"""
WITH lo AS (SELECT doc_id, lower(text) AS t,
                   greatest(length(lower(text)), 1) AS l FROM documents),
sc AS (SELECT doc_id,
       {score_cols}
       FROM lo),
mxd AS (SELECT *, {mx} AS mx FROM sc)
SELECT doc_id,
       CASE WHEN mx <= 0 THEN 'und' {pick} ELSE '{langs[-1]}' END AS lang_pred,
       round(CASE WHEN mx <= 0 THEN 0.0 ELSE mx END, 6) AS lang_score
FROM mxd
"""


SQL_LANGID = _sql_langid()


def q_lang_confusion(sf_dir: str):
    """Classifier CONFUSION MATRIX — the labeled ``lang`` column vs the
    langid prediction per document: the per-class error breakdown that
    completes the eval family beside P/R/F1 (kg_eval_prf) and AP
    (kg_eval_ap); what a model owner reads before adjusting cue
    profiles.

    Shape: scoring is the langid actor-pool pass; labels join via
    `join_or_broadcast` on the pruned (doc_id, lang) stream; one
    (label, pred) groupby — |langs|^2 bounded."""
    from ray.data.aggregate import Count

    from cosmos_ray.functions.textops import language_id

    preds = language_id(read(sf_dir, "documents", ["doc_id", "text"]))
    labels = read(sf_dir, "documents", ["doc_id", "lang"])
    j = join_or_broadcast(preds.select_columns(["doc_id", "lang_pred"]),
                          labels, key="doc_id", add_cols=["lang"])
    return (j.groupby(["lang", "lang_pred"])
            .aggregate(Count(alias_name="n")))


SQL_LANG_CONFUSION = f"""
WITH pred AS ({SQL_LANGID})
SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
FROM pred p JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


def q_lang_kappa(sf_dir: str):
    """Cohen's KAPPA between the labeled ``lang`` column and the langid
    prediction — chance-corrected agreement over the confusion matrix
    (po - pe) / (1 - pe), the standard scalar beside the matrix itself.

    Shape: the langs^2-bounded confusion counts collect under the
    driver guard (`collect_small`); kappa is integer-exact arithmetic
    divided once in float64."""
    from cosmos_ray.queries.relational import collect_small

    counts = collect_small(q_lang_confusion(sf_dir), cap_rows=100_000)
    if counts is None:
        raise ValueError("confusion matrix exceeded the driver cap")
    df = counts.to_pandas()
    n = int(df["n"].sum())
    po = int(df.loc[df["lang"] == df["lang_pred"], "n"].sum())
    row = df.groupby("lang")["n"].sum()
    col = df.groupby("lang_pred")["n"].sum()
    classes = sorted(set(row.index) | set(col.index))
    pe_num = sum(int(row.get(c, 0)) * int(col.get(c, 0)) for c in classes)
    kappa = round((po * n - pe_num) / float(n * n - pe_num), 6)
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "po": pa.array([round(po / n, 6)], pa.float64()),
        "pe": pa.array([round(pe_num / (n * n), 6)], pa.float64()),
        "kappa": pa.array([kappa], pa.float64())}))


SQL_LANG_KAPPA = f"""
WITH pred AS ({SQL_LANGID})
, cm AS (SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
         FROM pred p JOIN documents d USING (doc_id) GROUP BY 1, 2)
, tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cm)
, po AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS po FROM cm
         WHERE lang = lang_pred)
, pe AS (SELECT CAST(coalesce(sum(r.rn * c.cn), 0) AS BIGINT) AS pe_num
         FROM (SELECT lang AS cls, sum(n) AS rn FROM cm GROUP BY 1) r
         JOIN (SELECT lang_pred AS cls, sum(n) AS cn FROM cm
               GROUP BY 1) c USING (cls))
SELECT tot.n, round(CAST(po.po AS DOUBLE) / tot.n, 6) AS po,
       round(CAST(pe.pe_num AS DOUBLE) / (tot.n * tot.n), 6) AS pe,
       round((po.po * tot.n - pe.pe_num)
             / CAST(tot.n * tot.n - pe.pe_num AS DOUBLE), 6) AS kappa
FROM tot, po, pe
"""


def q_minhash_clusters(sf_dir: str):
    from cosmos_ray.functions.dedup import minhash_dedup

    return minhash_dedup(read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.8)


def _sql_minhash_prefix() -> str:
    """Shared CTE prefix replaying the MinHash sketch (token md5s via
    md5_number_upper, positional mod-2^64 shingle combine, the 128
    seeded permutation constants inlined, band keys as md5 of the
    '|'-joined signature rows) up through the ``sig`` and ``bands``
    tables — reused by the clustering and the cross-crawl oracles."""
    from cosmos_ray.functions.dedup import _SH_COEF, MinHasher

    mh = MinHasher()  # seed=7: the same constants the engine signs with
    M61 = (1 << 61) - 1
    TWO64 = 1 << 64

    def mul64(x: str, c: int) -> str:
        c = int(c)
        chi, clo = c >> 32, c & 0xFFFFFFFF
        return (f"(CAST({x} AS HUGEINT)*{clo} + "
                f"((CAST({x} AS HUGEINT)*{chi}) % 4294967296)*4294967296)")

    c0, c1, c2 = (int(c) for c in _SH_COEF)
    perm_rows = ",".join(
        f"({p},{int(a)}::UBIGINT,{int(b)}::UBIGINT)"
        for p, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    return f"""perms(perm, a, b) AS (VALUES {perm_rows}),
d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id,
               unnest(range(1, len(toks)+1)) AS pos,
               md5_number_upper(unnest(toks)) AS h
        FROM d),
shin AS (SELECT DISTINCT t0.doc_id,
           CAST(({mul64('t0.h', c0)} + {mul64('t1.h', c1)} + {mul64('t2.h', c2)})
                % {TWO64} AS UBIGINT) AS sh
         FROM tok t0
         JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
         JOIN tok t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
sig AS (SELECT s.doc_id, p.perm,
               min(CAST(((CAST(p.a AS HUGEINT) * s.sh + p.b) % {TWO64})
                        % {M61} AS UBIGINT)) AS m
        FROM shin s CROSS JOIN perms p
        GROUP BY s.doc_id, p.perm),
bands AS (SELECT doc_id, perm // 8 AS band,
                 substr(md5(string_agg(CAST(m AS VARCHAR), '|' ORDER BY perm)), 1, 16) AS bh
          FROM sig GROUP BY doc_id, perm // 8)"""


def _sql_minhash_clusters() -> str:
    """DuckDB replay of the ENTIRE minhash near-dup pipeline
    (num_perm=128, 16 bands x 8 rows, signature verification at 0.8,
    transitive clustering): the shared sketch prefix, pigeonhole band
    self-join, mean(sig_a==sig_b) >= 0.8 verification, and connected
    components via a recursive reachability CTE with cluster_id = min
    doc_id. Exact for corpora whose docs have >= 3 tokens and whose band
    buckets stay under the engine's max_group truncation (both hold for
    the synthetic corpus)."""
    return f"""
WITH RECURSIVE
{_sql_minhash_clu_prefix()}
SELECT doc_id, cluster_id FROM clu
"""


def _sql_minhash_clu_prefix() -> str:
    """CTE chain (recursive — embed under ``WITH RECURSIVE``) replaying
    minhash candidate gen + verification + transitive clustering up
    through ``clu(doc_id, cluster_id)`` — shared by the clustering and
    the keep-best-representative oracles."""
    return f"""{_sql_minhash_prefix()},
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
ver AS (SELECT c.doc_a, c.doc_b
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b AND sb.perm = sa.perm
        GROUP BY c.doc_a, c.doc_b
        HAVING avg(CASE WHEN sa.m = sb.m THEN 1.0 ELSE 0.0 END) >= 0.8),
edges AS (SELECT doc_a AS a, doc_b AS b FROM ver
          UNION ALL SELECT doc_b, doc_a FROM ver),
reach(src, node) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node),
clu AS (SELECT node AS doc_id, CAST(min(src) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node)"""


SQL_MINHASH_CLUSTERS = _sql_minhash_clusters()

_CRAWL_MID = 250  # doc_id split: < mid plays the at-rest corpus, >= mid the new crawl


def q_crawl_dedup_index(sf_dir: str):
    """Cross-crawl near-dup against a persisted LSH index: docs below
    the id split are signed and written as the at-rest index (hive
    band/bucket partitions under scratch), the rest play the incoming
    crawl and dedup against it reading ONLY the partitions their own
    sketches hit (`dedup.build_minhash_index` /
    `minhash_dedup_against_index`)."""
    import tempfile

    from cosmos_ray.functions.dedup import (
        build_minhash_index,
        minhash_dedup_against_index,
    )

    def keep(lo, hi):
        def f(t: pa.Table) -> pa.Table:
            d = t.column("doc_id")
            return t.filter(pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                                    pc.less(d, pa.scalar(hi))))
        return f

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    idx = tempfile.mkdtemp(prefix="mhidx_", dir="/tmp")
    build_minhash_index(
        docs.map_batches(keep(0, _CRAWL_MID), batch_format="pyarrow"), idx)
    new = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        keep(_CRAWL_MID, 1 << 60), batch_format="pyarrow")
    return minhash_dedup_against_index(new, idx, threshold=0.8)


SQL_CRAWL_DEDUP_INDEX = f"""
WITH
{_sql_minhash_prefix()},
cand AS (SELECT DISTINCT o.doc_id AS old_id, n.doc_id AS new_id
         FROM bands o JOIN bands n ON o.band = n.band AND o.bh = n.bh
         WHERE o.doc_id < {_CRAWL_MID} AND n.doc_id >= {_CRAWL_MID})
SELECT c.new_id, c.old_id,
       round(avg(CASE WHEN sa.m = sb.m THEN 1.0 ELSE 0.0 END), 6) AS est
FROM cand c
JOIN sig sa ON sa.doc_id = c.old_id
JOIN sig sb ON sb.doc_id = c.new_id AND sb.perm = sa.perm
GROUP BY c.new_id, c.old_id
HAVING avg(CASE WHEN sa.m = sb.m THEN 1.0 ELSE 0.0 END) >= 0.8
"""


def q_simhash_pairs(sf_dir: str):
    from cosmos_ray.functions.dedup import simhash_near_dups

    return simhash_near_dups(read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3)


def _sql_simhash_pairs() -> str:
    """Replicates the full simhash near-dup pipeline in SQL: per-token
    md5 (DuckDB's md5_number_upper == our first-8-bytes-little-endian
    token hash), +-1 bit votes per doc, 4x16-bit band keys, pigeonhole
    band join, hamming via bit_count of per-band xor. Exact for corpora
    whose band buckets stay under the engine's max_group truncation."""
    v_cols = ",\n       ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(64)
    )
    band_cols = ",\n       ".join(
        "("
        + " + ".join(
            f"CASE WHEN v_{16 * b + j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16)
        )
        + f") AS band_{b}"
        for b in range(4)
    )
    ham = " + ".join(f"bit_count(xor(a.band_{b}, b.band_{b}))" for b in range(4))
    bandor = " OR ".join(f"a.band_{b} = b.band_{b}" for b in range(4))
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
th AS (SELECT doc_id, md5_number_upper(tk) AS h FROM tok),
vs AS (SELECT doc_id,
       {v_cols}
       FROM th GROUP BY doc_id),
bands AS (SELECT doc_id,
       {band_cols}
       FROM vs),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         {ham} AS hamming
  FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND ({bandor}))
SELECT doc_a, doc_b, CAST(min(hamming) AS BIGINT) AS hamming
FROM cand WHERE hamming <= 3 GROUP BY doc_a, doc_b
"""


SQL_SIMHASH_PAIRS = _sql_simhash_pairs()


def q_ivf_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from cosmos_ray.functions.similarity import ivf_topk

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qvec = np.asarray(
        tbl.filter(pc.equal(tbl.column("vec_id"), 0)).column("embedding").to_pylist(),
        dtype=np.float64,
    )
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivf_topk(ds, qvec, k=10)


def q_dsir_weights(sf_dir: str):
    """DSIR hashed-bigram importance weights (Xie et al. 2023,
    arXiv:2302.03169) toward the lang='en' target slice — the data-
    selection operator; value-exact vs the DuckDB md5-bucket replay."""
    from cosmos_ray.functions.selection import dsir_weights

    return dsir_weights(read(sf_dir, "documents", ["doc_id", "text", "lang"]))


SQL_DSIR_WEIGHTS = """
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, lang,
               unnest(toks) AS tok,
               unnest(range(1, len(toks)+1)) AS pos
        FROM d),
bg AS (SELECT t0.doc_id, t0.lang,
              CAST(md5_number_upper(t0.tok || ' ' || t1.tok) % 1024 AS BIGINT) AS bucket
       FROM tok t0 JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1),
cnt AS (SELECT bucket, count(*) AS n_raw,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt
        FROM bg GROUP BY bucket),
tot AS (SELECT sum(n_raw) AS sr, sum(n_tgt) AS st FROM cnt),
lw AS (SELECT bucket,
              (ln(n_tgt + 1.0) - ln(st + 1024.0))
              - (ln(n_raw + 1.0) - ln(sr + 1024.0)) AS w
       FROM cnt CROSS JOIN tot)
SELECT doc.doc_id,
       round(coalesce(sum(lw.w), 0.0), 6) AS dsir_weight
FROM documents doc
LEFT JOIN bg ON bg.doc_id = doc.doc_id
LEFT JOIN lw ON lw.bucket = bg.bucket
GROUP BY doc.doc_id
"""


def q_canonical_urls(sf_dir: str):
    """URL canonicalization over a deterministically synthesized messy
    url per doc (mixed-case scheme/host, default ports, trailing
    slashes, tracking params, fragments — the shapes real crawl urls
    arrive in). The construction is pure doc_id arithmetic so the
    DuckDB oracle rebuilds the same inputs and replays the same spec."""
    from cosmos_ray.functions.urlops import canonical_urls

    def messy(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = ids.astype(str).astype(object)
        scheme = np.where(ids % 2 == 0, "HTTPS", "https").astype(object)
        host = "://Web" + (ids % 20).astype(str).astype(object) + ".Example.ORG"
        port = np.where(ids % 7 == 0, ":443", "").astype(object)
        path = "/P/" + s + np.where(ids % 5 == 0, "/", "").astype(object)
        q0 = "?utm_source=feed&utm_campaign=c" + (ids % 3).astype(str).astype(object) + "&id=" + s
        q1 = "?id=" + s + "&gclid=g" + s
        query = np.select([ids % 4 == 0, ids % 4 == 1, ids % 4 == 2],
                          [q0, q1, "?utm_medium=x&ref=rss"], "").astype(object)
        frag = np.where(ids % 3 == 0,
                        "#sec" + (ids % 6).astype(str).astype(object),
                        "").astype(object)
        url = scheme + host + port + path + query + frag
        return pa.table({
            "doc_id": t.column("doc_id"),
            "url": pa.array(list(url), pa.string()),
        })

    ds = read(sf_dir, "documents", ["doc_id"]).map_batches(
        messy, batch_format="pyarrow"
    )
    return canonical_urls(ds)


SQL_CANONICAL_URLS = """
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
         || '://Web' || CAST(doc_id % 20 AS VARCHAR) || '.Example.ORG'
         || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
         || '/P/' || CAST(doc_id AS VARCHAR)
         || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
         || (CASE doc_id % 4
              WHEN 0 THEN '?utm_source=feed&utm_campaign=c'
                          || CAST(doc_id % 3 AS VARCHAR)
                          || '&id=' || CAST(doc_id AS VARCHAR)
              WHEN 1 THEN '?id=' || CAST(doc_id AS VARCHAR)
                          || '&gclid=g' || CAST(doc_id AS VARCHAR)
              WHEN 2 THEN '?utm_medium=x&ref=rss'
              ELSE '' END)
         || (CASE WHEN doc_id % 3 = 0
              THEN '#sec' || CAST(doc_id % 6 AS VARCHAR) ELSE '' END) AS url
  FROM documents),
p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) AS pre,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM u),
c AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(pre, '^(https://[^:/]+):443$', '\\1'),
                        '^(http://[^:/]+):80$', '\\1') AS pre2,
         regexp_replace(path, '/+$', '') AS path2,
         coalesce(array_to_string(list_filter(string_split(q, '&'),
             x -> NOT regexp_matches(x, '^(utm_[a-z]+|fbclid|gclid|ref)=')
                  AND x <> ''), '&'), '') AS q2
  FROM p)
SELECT doc_id, url,
       pre2 || path2 || (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END)
       AS canonical_url
FROM c
"""


def q_dedup_best_rep(sf_dir: str):
    """MinHash near-dup dedup with quality-aware representative
    selection (keep the longest member per cluster, ties -> lowest
    doc_id) — the FineWeb-style keep-best policy, per-doc keep flags."""
    from cosmos_ray.functions.dedup import dedup_keep_best

    return dedup_keep_best(
        read(sf_dir, "documents", ["doc_id", "text", "n_chars"]),
        threshold=0.8,
    )


def _sql_dedup_best_rep() -> str:
    return f"""
WITH RECURSIVE
{_sql_minhash_clu_prefix()},
m AS (SELECT c.doc_id, c.cluster_id, dd.n_chars
      FROM clu c JOIN documents dd ON dd.doc_id = c.doc_id),
rep AS (SELECT cluster_id, min(doc_id) AS rep_id FROM m m1
        WHERE n_chars = (SELECT max(n_chars) FROM m m2
                         WHERE m2.cluster_id = m1.cluster_id)
        GROUP BY cluster_id)
SELECT d0.doc_id, (c.doc_id IS NULL OR d0.doc_id = r.rep_id) AS keep
FROM documents d0
LEFT JOIN clu c ON c.doc_id = d0.doc_id
LEFT JOIN rep r ON r.cluster_id = c.cluster_id
"""


SQL_DEDUP_BEST_REP = _sql_dedup_best_rep()



def q_pq_topk(sf_dir: str):
    """Product-quantization ADC top-10 for the query vector = embedding
    of vec_id 0 — the compressed-corpus ANN path (codes are m bytes per
    vector at rest; search is lookup-table sums, no decode). Recall vs
    `brute_force_topk` is gated in tests/test_similarity.py."""
    import pyarrow.parquet as pq

    from cosmos_ray.functions.similarity import pq_encode, pq_fit, pq_topk

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qvec = np.asarray(
        tbl.filter(pc.equal(tbl.column("vec_id"), 0)).column("embedding").to_pylist(),
        dtype=np.float64,
    )
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_fit(ds, m=16, ks=64, seed=31)
    return pq_topk(pq_encode(ds, books), books, qvec, k=10)


def q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT/melt: lineitem's three numeric measures to long form
    (l_orderkey, l_linenumber, measure, value) — the wide->long reshape
    feature stores ingest with. Pure per-batch stack (3 column slices
    concatenated), embarrassingly parallel, no exchange; oracle is
    DuckDB UNION ALL."""
    ds = read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
               "l_discount"])

    measures = ["l_discount", "l_extendedprice", "l_quantity"]

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for mname in measures:
            parts.append(pa.table({
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "measure": pa.array([mname] * n, pa.string()),
                "value": t.column(mname).cast(pa.float64()),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


SQL_LINEITEM_UNPIVOT = """
SELECT l_orderkey, l_linenumber, 'l_discount' AS measure,
       CAST(l_discount AS DOUBLE) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       CAST(l_extendedprice AS DOUBLE) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_quantity',
       CAST(l_quantity AS DOUBLE) FROM lineitem
"""



def q_jw_part_pairs(sf_dir: str):
    """Jaro-Winkler fuzzy linkage: pairs of distinct part names sharing
    a first character (the standard ER blocking key — part of the
    operator's stated semantics, mirrored in the oracle) with JW >= 0.85.
    The JW kernel is batch-vectorized numpy, fuzz-verified bit-exact
    against DuckDB's jaro_winkler_similarity (tests/test_linkage.py)."""
    from cosmos_ray.functions.linkage import jw_name_pairs

    return jw_name_pairs(read(sf_dir, "part", ["p_name"]), "p_name",
                         threshold=0.85, max_group=512)


SQL_JW_PART_PAIRS = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
b AS (SELECT name, substr(name, 1, 1) AS block,
             row_number() OVER (PARTITION BY substr(name, 1, 1)
                                ORDER BY name) AS rk
      FROM names),
k AS (SELECT * FROM b WHERE rk <= 512)
SELECT a.name AS name_a, c.name AS name_b,
       round(jaro_winkler_similarity(a.name, c.name), 9) AS jw
FROM k a JOIN k c ON a.block = c.block AND a.name < c.name
WHERE jaro_winkler_similarity(a.name, c.name) >= 0.85
"""



def q_orders_above_cust_avg(sf_dir: str):
    """Correlated-subquery decorrelation: orders whose o_totalprice
    exceeds 1.5x THEIR customer's average order price. The correlated
    `(SELECT avg(..) WHERE same customer)` rewrites to a per-customer
    aggregate (combiner-backed groupby — one row per customer crosses
    the exchange) joined back to orders (broadcast under the cap, hash
    join past it) + a vectorized filter; the classic decorrelation every
    planner performs, expressed Ray-Data-first."""
    from ray.data.aggregate import Mean

    from cosmos_ray.queries.relational import join_or_broadcast

    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    avg = (orders.groupby("o_custkey")
           .aggregate(Mean("o_totalprice", alias_name="avg_price")))
    joined = join_or_broadcast(orders, avg, key="o_custkey",
                               add_cols=["avg_price"])

    def keep(t: pa.Table) -> pa.Table:
        f = pc.greater(t.column("o_totalprice"),
                       pc.multiply(t.column("avg_price"), pa.scalar(1.5)))
        t = t.filter(f)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "o_totalprice": t.column("o_totalprice"),
            "avg_price": pc.round(t.column("avg_price"), 6,
                                  round_mode="half_towards_infinity"),
        })

    return joined.map_batches(keep, batch_format="pyarrow")


SQL_ORDERS_ABOVE_CUST_AVG = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       round(a.avg_price, 6) AS avg_price
FROM orders o
JOIN (SELECT o_custkey, avg(o_totalprice) AS avg_price
      FROM orders GROUP BY 1) a USING (o_custkey)
WHERE o.o_totalprice > 1.5 * a.avg_price
"""



def q_hash_embed_long(sf_dir: str):
    """The hashing embedder's core, oracle-checked: per-(doc, bucket)
    signed token counts (`embed.hash_embed_weights`) — integer-exact vs
    the DuckDB md5 replay. `embed_docs` (rows-only) is exactly this
    l2-normalized, so this query is its correctness evidence."""
    from cosmos_ray.functions.embed import hash_embed_weights

    return hash_embed_weights(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_HASH_EMBED_LONG = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
h AS (SELECT doc_id, md5_number_upper(token) AS th
      FROM tok WHERE token <> ''),
b AS (SELECT doc_id, CAST(th % 64 AS BIGINT) AS bucket,
             CASE WHEN th >= 9223372036854775808 THEN -1 ELSE 1 END AS sign
      FROM h)
SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS weight
FROM b GROUP BY doc_id, bucket
"""


def q_heavy_tokens(sf_dir: str):
    """phi-heavy-hitter tokens over the document corpus
    (`sketch.heavy_hitters`): Misra-Gries candidate pass + exact-count
    verify pass — output identical to a full-vocabulary count, exchange
    bounded at O(batches/phi) instead of O(distinct tokens)."""
    from cosmos_ray.functions.sketch import heavy_hitters

    return heavy_hitters(read(sf_dir, "documents", ["text"]), phi=0.005)


SQL_HEAVY_TOKENS = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tot AS (SELECT count(*) AS n FROM w),
c AS (SELECT token, count(*) AS cnt FROM w GROUP BY token)
SELECT c.token, CAST(c.cnt AS BIGINT) AS cnt,
       round(c.cnt::DOUBLE / tot.n, 6) AS frac
FROM c, tot
WHERE c.cnt >= 0.005 * tot.n
"""


def q_value_trend(sf_dir: str):
    """Per-event-type OLS trend of value over time (`stats.ols_trend`,
    moment-partial exchange; x in days for float64 parity with DuckDB's
    stable regr_* aggregates)."""
    from cosmos_ray.functions.stats import ols_trend

    return ols_trend(read(sf_dir, "events", ["event_type", "ts", "value"]))


SQL_VALUE_TREND = """
WITH x AS (SELECT event_type,
                  epoch_us(ts) / 86400000000.0 - 18262.0 AS d, value
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(value, d), 6) AS slope,
       round(regr_intercept(value, d), 6) AS intercept,
       round(regr_r2(value, d), 6) AS r2
FROM x GROUP BY event_type
"""


def q_order_zscores(sf_dir: str):
    """Per-priority z-score standardization of order totals
    (`stats.group_zscore`: one moment exchange + broadcast stat
    lookup — the standardize-features pass)."""
    from cosmos_ray.functions.stats import group_zscore

    return group_zscore(
        read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]),
        key="o_orderpriority", value_col="o_totalprice", id_col="o_orderkey")


SQL_ORDER_ZSCORES = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       round((o_totalprice - avg(o_totalprice) OVER w)
             / stddev_samp(o_totalprice) OVER w, 6) AS z
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority)
"""


def q_cume_dist_chars(sf_dir: str):
    """Per-language cumulative distribution of doc length (the SQL
    cume_dist window, replayed distributed: fraction of the group with
    value <= the row's — vectorized searchsorted per bucketed group)."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def cd(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_chars"].to_numpy()
        sv = np.sort(v)
        r = np.searchsorted(sv, v, side="right")  # peers count in
        out = g[["doc_id", "lang", "n_chars"]].copy()
        out["cume"] = np.round(r / len(v), 6)
        return out

    return bucketed_group_apply(docs, ["lang"], cd)


SQL_CUME_DIST_CHARS = """
SELECT doc_id, lang, n_chars,
       round(cume_dist() OVER (PARTITION BY lang ORDER BY n_chars),
             6) AS cume
FROM documents
"""


def q_readability(sf_dir: str):
    """Flesch reading-ease per doc (`textops.readability`: vectorized
    vowel-cluster syllable heuristic; single-sentence degenerate form
    — see the kernel docstring)."""
    from cosmos_ray.functions.textops import readability

    return readability(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_READABILITY = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents),
syl AS (SELECT doc_id, count(*) AS n_words,
               sum(greatest(1, len(regexp_extract_all(w, '[aeiou]+'))))
                 AS n_syl
        FROM tok WHERE w <> '' GROUP BY doc_id)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syl AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * n_words - 84.6 * (n_syl::DOUBLE / n_words),
             6) AS flesch
FROM syl WHERE n_words > 0
"""


def q_scd2_user_state(sf_dir: str):
    """SCD type-2 history of each user's event_type: consecutive
    unchanged runs collapse into version rows with validity intervals
    (`temporal.scd2_intervals`; open versions carry valid_to_us = -1)."""
    from cosmos_ray.functions.temporal import scd2_intervals

    return scd2_intervals(read(sf_dir, "events",
                               ["event_id", "user_id", "event_type", "ts"]))


SQL_SCD2_USER_STATE = """
WITH x AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (
  SELECT user_id, event_type, ts,
         sum(CASE WHEN prev IS NULL OR prev <> event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS version
  FROM x),
iv AS (
  SELECT user_id, version, min(event_type) AS event_type,
         min(epoch_us(ts)) AS valid_from_us
  FROM r GROUP BY user_id, version)
SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
       valid_from_us,
       COALESCE(lead(valid_from_us) OVER (
           PARTITION BY user_id ORDER BY version), -1) AS valid_to_us
FROM iv
"""


def q_len_quantiles_counted(sf_dir: str):
    """Skew-safe exact per-language length quantiles
    (`relational.group_quantiles_counted`): the hot-group exchange
    carries (lang, n_chars, count) combiner rows — bounded by distinct
    lengths, not corpus rows — and the weighted inverted CDF stays
    quantile_disc-identical."""
    from cosmos_ray.queries.relational import group_quantiles_counted

    return group_quantiles_counted(
        read(sf_dir, "documents", ["lang", "n_chars"]),
        ["lang"], "n_chars", qs=(0.5, 0.9, 0.99))


SQL_LEN_QUANTILES_COUNTED = """
SELECT lang,
       quantile_disc(n_chars, 0.5) AS q50,
       quantile_disc(n_chars, 0.9) AS q90,
       quantile_disc(n_chars, 0.99) AS q99
FROM documents GROUP BY lang
"""


def q_multi_ols(sf_dir: str):
    """Multivariate closed-form linear fit y ~ b0 + b1*day + b2*hour
    over all events (`stats.multi_ols_fit`): normal-equation moments by
    combiner partials, Cramer's-rule solve replayed literally in SQL."""
    from cosmos_ray.functions.stats import multi_ols_fit

    return multi_ols_fit(read(sf_dir, "events", ["ts", "value"]))


SQL_MULTI_OLS = """
WITH f AS (
  SELECT epoch_us(ts) / 86400000000.0 - 18262.0 AS x1,
         CAST(epoch_us(ts) // 3600000000 % 24 AS DOUBLE) AS x2,
         value AS y
  FROM events),
m AS (
  SELECT count(*)::DOUBLE AS n, sum(x1) AS sx1, sum(x2) AS sx2,
         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
         sum(y) AS sy, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
         sum(y*y) AS syy
  FROM f),
d AS (
  SELECT *,
    n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)
      + sx2*(sx1*s12 - s11*sx2) AS det,
    sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y)
      + sx2*(s1y*s12 - s11*s2y) AS d0,
    n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)
      + sx2*(sx1*s2y - s1y*sx2) AS d1,
    n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)
      + sy*(sx1*s12 - s11*sx2) AS d2
  FROM m)
SELECT CAST(n AS BIGINT) AS n,
       round(d0/det, 6) AS b0, round(d1/det, 6) AS b1,
       round(d2/det, 6) AS b2,
       round(1.0 - (syy - ((d0/det)*sy + (d1/det)*s1y + (d2/det)*s2y))
                 / (syy - sy*sy/n), 6) AS r2
FROM d
"""


def q_parts_skyline(sf_dir: str):
    """Pareto frontier over parts — maximize p_size, minimize
    p_retailprice (`relational.skyline`: exact per-batch combiner, one
    whole-block converge pass, no driver pull)."""
    from cosmos_ray.queries.relational import skyline

    parts = read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    return skyline(parts, max_cols=["p_size"], min_cols=["p_retailprice"])


SQL_PARTS_SKYLINE = """
SELECT p_partkey, p_size, p_retailprice FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
"""


def q_revenue_gini(sf_dir: str):
    """Gini inequality coefficient of order totals per priority class
    (`stats.group_gini`: counted skew-safe exchange, closed-form
    rank-weighted sum over value runs)."""
    from cosmos_ray.functions.stats import group_gini

    orders = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return group_gini(orders, key="o_orderpriority",
                      value_col="o_totalprice")


SQL_REVENUE_GINI = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice AS x,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS i,
         count(*) OVER (PARTITION BY o_orderpriority) AS n,
         sum(o_totalprice) OVER (PARTITION BY o_orderpriority) AS s
  FROM orders)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       round(sum((2.0 * i - n - 1) * x) / (n * s), 6) AS gini
FROM r GROUP BY o_orderpriority, n, s
"""


def q_ks_lang_lengths(sf_dir: str):
    """Two-sample KS statistic between en and de doc-length
    distributions (`stats.ks_two_sample`: counted exchange, one
    converge pass over the merged sorted support)."""
    from cosmos_ray.functions.stats import ks_two_sample

    docs = read(sf_dir, "documents", ["lang", "n_chars"])
    return ks_two_sample(docs, "lang", "n_chars", "en", "de")


SQL_KS_LANG_LENGTHS = """
WITH c AS (
  SELECT n_chars AS v,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS ca,
         sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::DOUBLE AS cb
  FROM documents WHERE lang IN ('en', 'de') GROUP BY n_chars),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
k AS (
  SELECT sum(ca) OVER (ORDER BY v) / (SELECT na FROM t) AS fa,
         sum(cb) OVER (ORDER BY v) / (SELECT nb FROM t) AS fb
  FROM c)
SELECT CAST((SELECT na FROM t) AS BIGINT) AS n_a,
       CAST((SELECT nb FROM t) AS BIGINT) AS n_b,
       round(max(abs(fa - fb)), 6) AS d_stat
FROM k
"""


def q_chi2_lang_source(sf_dir: str):
    """Chi-squared independence test of lang x source
    (`stats.chi2_independence`: contingency-count exchange bounded by
    the category product; absent cells contribute expected mass)."""
    from cosmos_ray.functions.stats import chi2_independence

    docs = read(sf_dir, "documents", ["lang", "source"])
    return chi2_independence(docs, "lang", "source")


SQL_CHI2_LANG_SOURCE = """
WITH c AS (SELECT lang AS a, source AS b, count(*)::DOUBLE AS o
           FROM documents GROUP BY 1, 2),
ra AS (SELECT a, sum(o) AS r FROM c GROUP BY a),
cb AS (SELECT b, sum(o) AS s FROM c GROUP BY b),
tot AS (SELECT sum(o) AS n FROM c),
grid AS (
  SELECT ra.a, cb.b, ra.r * cb.s / (SELECT n FROM tot) AS e,
         COALESCE(c.o, 0.0) AS o
  FROM ra CROSS JOIN cb LEFT JOIN c ON c.a = ra.a AND c.b = cb.b)
SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
       CAST(((SELECT count(*) FROM ra) - 1)
            * ((SELECT count(*) FROM cb) - 1) AS BIGINT) AS dof,
       round(sum((o - e) * (o - e) / e), 6) AS chi2
FROM grid
"""


def q_mi_lang_source(sf_dir: str):
    """Mutual information (and normalized MI) between lang and source
    (`stats.mutual_information`: the chi2 contingency exchange, MI over
    occupied cells, entropies from the marginals)."""
    from cosmos_ray.functions.stats import mutual_information

    docs = read(sf_dir, "documents", ["lang", "source"])
    return mutual_information(docs, "lang", "source")


SQL_MI_LANG_SOURCE = """
WITH c AS (SELECT lang AS a, source AS b, count(*)::DOUBLE AS o
           FROM documents GROUP BY 1, 2),
tot AS (SELECT sum(o) AS n FROM c),
ma AS (SELECT a, sum(o) / (SELECT n FROM tot) AS p FROM c GROUP BY a),
mb AS (SELECT b, sum(o) / (SELECT n FROM tot) AS p FROM c GROUP BY b),
mi AS (SELECT sum((c.o / (SELECT n FROM tot))
                  * ln((c.o / (SELECT n FROM tot)) / (ma.p * mb.p))) AS v
       FROM c JOIN ma ON c.a = ma.a JOIN mb ON c.b = mb.b),
ha AS (SELECT -sum(p * ln(p)) AS h FROM ma),
hb AS (SELECT -sum(p * ln(p)) AS h FROM mb)
SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
       round((SELECT v FROM mi), 6) AS mi,
       round((SELECT v FROM mi)
             / sqrt((SELECT h FROM ha) * (SELECT h FROM hb)), 6) AS nmi
"""


def q_drift_lang_lengths(sf_dir: str):
    """PSI + Jensen-Shannon drift between en and de doc-length
    distributions over 500-char bins (`stats.distribution_drift`:
    counted bin exchange, both-occupied PSI / 0ln0-free JSD)."""
    from cosmos_ray.functions.stats import distribution_drift

    docs = read(sf_dir, "documents", ["lang", "n_chars"])
    return distribution_drift(docs, "lang", "n_chars", "en", "de",
                              bin_width=500)


SQL_DRIFT_LANG_LENGTHS = """
WITH c AS (
  SELECT n_chars // 500 AS b,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS ca,
         sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::DOUBLE AS cb
  FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
p AS (SELECT ca / (SELECT na FROM t) AS pa_,
             cb / (SELECT nb FROM t) AS pb_ FROM c)
SELECT CAST((SELECT na FROM t) AS BIGINT) AS n_a,
       CAST((SELECT nb FROM t) AS BIGINT) AS n_b,
       round(sum(CASE WHEN pa_ > 0 AND pb_ > 0
                      THEN (pa_ - pb_) * ln(pa_ / pb_) ELSE 0 END), 6)
         AS psi,
       round(sum(CASE WHEN pa_ > 0
                      THEN 0.5 * pa_ * ln(pa_ / ((pa_ + pb_) / 2))
                      ELSE 0 END)
             + sum(CASE WHEN pb_ > 0
                        THEN 0.5 * pb_ * ln(pb_ / ((pa_ + pb_) / 2))
                        ELSE 0 END), 6) AS jsd
FROM p
"""


def q_locf_purchase(sf_dir: str):
    """LOCF imputation: each user's most recent purchase value carried
    forward onto every later event (`windows.locf_fill` — the SQL
    last_value(x IGNORE NULLS) window, one user-hash exchange)."""
    from cosmos_ray.functions.windows import locf_fill

    return locf_fill(read(sf_dir, "events",
                          ["user_id", "event_id", "ts", "event_type",
                           "value"]))


SQL_LOCF_PURCHASE = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       round(COALESCE(
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id), -1.0), 6)
       AS last_mark_value
FROM events
"""


def q_mannwhitney_lengths(sf_dir: str):
    """Mann-Whitney U between en and zh doc-length distributions
    (`stats.mannwhitney_u`: counted exchange, midrank ties, one
    converge pass)."""
    from cosmos_ray.functions.stats import mannwhitney_u

    docs = read(sf_dir, "documents", ["lang", "n_chars"])
    return mannwhitney_u(docs, "lang", "n_chars", "en", "zh")


SQL_MANNWHITNEY_LENGTHS = """
WITH c AS (
  SELECT n_chars AS v,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS ca,
         sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::DOUBLE AS cb
  FROM documents WHERE lang IN ('en', 'zh') GROUP BY n_chars),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
r AS (SELECT ca,
         sum(ca + cb) OVER (ORDER BY v) - (ca + cb)
           + (ca + cb + 1) / 2.0 AS avgrank
      FROM c)
SELECT CAST((SELECT na FROM t) AS BIGINT) AS n_a,
       CAST((SELECT nb FROM t) AS BIGINT) AS n_b,
       round((SELECT na FROM t) * (SELECT nb FROM t)
             + (SELECT na FROM t) * ((SELECT na FROM t) + 1) / 2.0
             - sum(ca * avgrank), 6) AS u_stat
FROM r
"""


def q_welch_lang_lengths(sf_dir: str):
    """Welch's unequal-variance t between en and de doc lengths
    (`stats.welch_ttest`: six int64 moment partials per batch —
    integer-exact, so the finish arithmetic replays the SQL's sum-based
    expression tree bit-for-bit)."""
    from cosmos_ray.functions.stats import welch_ttest

    docs = read(sf_dir, "documents", ["lang", "n_chars"])
    return welch_ttest(docs, "lang", "n_chars", "en", "de")


SQL_WELCH_LANG_LENGTHS = """
WITH s AS (SELECT
  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS na,
  sum(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END)::DOUBLE AS sa,
  sum(CASE WHEN lang = 'en' THEN n_chars * n_chars ELSE 0 END)::DOUBLE
    AS ssa,
  sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::DOUBLE AS nb,
  sum(CASE WHEN lang = 'de' THEN n_chars ELSE 0 END)::DOUBLE AS sb,
  sum(CASE WHEN lang = 'de' THEN n_chars * n_chars ELSE 0 END)::DOUBLE
    AS ssb
  FROM documents
  WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
v AS (SELECT na, nb, sa / na - sb / nb AS md,
             ((ssa - sa * sa / na) / (na - 1)) / na AS sea,
             ((ssb - sb * sb / nb) / (nb - 1)) / nb AS seb
      FROM s)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(md, 6) AS mean_diff,
       round(md / sqrt(sea + seb), 6) AS t_stat,
       round((sea + seb) * (sea + seb)
             / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 6) AS dof
FROM v
"""


def q_spearman_qty_discount(sf_dir: str):
    """Spearman rank correlation between lineitem quantity and discount
    (`stats.spearman_corr`: per-column counted midrank exchange —
    bounded by distinct ordinal values — guarded-broadcast rank-map
    joins, Pearson moment partials over half-integer midranks)."""
    from cosmos_ray.functions.stats import spearman_corr

    items = read(sf_dir, "lineitem", ["l_quantity", "l_discount"])
    return spearman_corr(items, "l_quantity", "l_discount")


SQL_SPEARMAN_QTY_DISCOUNT = """
WITH r AS (
  SELECT rank() OVER (ORDER BY l_quantity)
           + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx,
         rank() OVER (ORDER BY l_discount)
           + (count(*) OVER (PARTITION BY l_discount) - 1) / 2.0 AS ry
  FROM lineitem)
SELECT CAST(count(*) AS BIGINT) AS n, round(corr(rx, ry), 6) AS rho
FROM r
"""


def q_trailing_hour_value(sf_dir: str):
    """Time-RANGE window (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW): per-user trailing-hour sum/count of value
    (`windows.trailing_time_sum`: user-hash exchange, composite-key
    searchsorted frame edges, exact integer-cents prefix sums)."""
    from cosmos_ray.functions.windows import trailing_time_sum

    return trailing_time_sum(read(sf_dir, "events",
                                  ["user_id", "event_id", "ts", "value"]))


SQL_TRAILING_HOUR_VALUE = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       round(SUM(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0, 6)
         AS win_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS win_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_mann_kendall_hourly(sf_dir: str):
    """Mann-Kendall monotonic-trend test on the hourly total-value
    series (`stats.mann_kendall_hourly`: integer-cents tumbling-window
    exchange, Fenwick O(H log H) concordance count, tie-corrected z)."""
    from cosmos_ray.functions.stats import mann_kendall_hourly

    return mann_kendall_hourly(read(sf_dir, "events", ["ts", "value"]))


SQL_MANN_KENDALL_HOURLY = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour,
         sum(CAST(round(value * 100) AS BIGINT)) AS yc
  FROM events GROUP BY 1),
p AS (SELECT COALESCE(sum(sign(b.yc - a.yc)), 0) AS s
      FROM h a JOIN h b ON b.hour > a.hour),
c AS (SELECT count(*)::DOUBLE AS n FROM h),
t AS (SELECT COALESCE(sum(ties * (ties - 1) * (2 * ties + 5)), 0)::DOUBLE
        AS tt
      FROM (SELECT count(*)::DOUBLE AS ties FROM h
            GROUP BY yc HAVING count(*) > 1)),
v AS (SELECT (SELECT n FROM c) AS n, (SELECT s FROM p) AS s,
             ((SELECT n FROM c) * ((SELECT n FROM c) - 1)
              * (2 * (SELECT n FROM c) + 5) - (SELECT tt FROM t)) / 18.0
               AS var)
SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s_stat,
       round(CASE WHEN n >= 2 AND var > 0 AND s > 0
                    THEN (s - 1) / sqrt(var)
                  WHEN n >= 2 AND var > 0 AND s < 0
                    THEN (s + 1) / sqrt(var)
                  ELSE 0.0 END, 6) AS z
FROM v
"""


def q_cusum_hourly(sf_dir: str):
    """One-sided CUSUM changepoint scan over the hourly value series
    (`stats.cusum_hourly`: integer-cents tumbling exchange; drift =
    running cumsum minus its running min, maximized — the window
    closed form of the recursive CUSUM — in exact scaled integers)."""
    from cosmos_ray.functions.stats import cusum_hourly

    return cusum_hourly(read(sf_dir, "events", ["ts", "value"]))


SQL_CUSUM_HOURLY = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour,
         sum(CAST(round(value * 100) AS BIGINT)) AS yc
  FROM events GROUP BY 1),
s AS (SELECT hour,
             sum(yc) OVER (ORDER BY hour) AS cy,
             row_number() OVER (ORDER BY hour) AS i,
             (SELECT sum(yc) FROM h) AS tot,
             (SELECT count(*) FROM h) AS n
      FROM h),
d AS (SELECT hour, n * cy - i * tot AS scum, n FROM s),
e AS (SELECT hour, scum - min(scum) OVER (ORDER BY hour) AS sdrift, n
      FROM d)
SELECT CAST(n AS BIGINT) AS n,
       round(sdrift / (100.0 * n), 6) AS max_cusum,
       CAST(hour AS BIGINT) AS peak_hour
FROM e ORDER BY sdrift DESC, hour ASC LIMIT 1
"""


def q_rolling_median(sf_dir: str):
    """Frame-bounded rolling median (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW) of value per user — `windows.rolling_median`,
    vectorized NaN-padded nanmedian inside one user-hash exchange."""
    from cosmos_ray.functions.windows import rolling_median

    return rolling_median(read(sf_dir, "events",
                               ["user_id", "event_id", "ts", "value"]))


SQL_ROLLING_MEDIAN = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       round(median(value) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             6) AS roll_median
FROM events
"""


def q_ttr_docs(sf_dir: str):
    """Type-token ratio per document (`textops.type_token_ratio`:
    arrow-native count_distinct per batch, no exchange)."""
    from cosmos_ray.functions.textops import type_token_ratio

    return type_token_ratio(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TTR_DOCS = """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
       round(count(DISTINCT tok)::DOUBLE / count(*), 6) AS ttr
FROM t GROUP BY doc_id
"""


def q_zipf_slope(sf_dir: str):
    """Zipf rank-frequency OLS fit over the corpus vocabulary
    (`textops.zipf_slope`: distributed vocab counts, whole-block fit
    replayed literally in SQL)."""
    from cosmos_ray.functions.textops import zipf_slope

    return zipf_slope(read(sf_dir, "documents", ["doc_id", "text"]))


SQL_ZIPF_SLOPE = """
WITH v AS (
  SELECT token, count(*)::DOUBLE AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token HAVING count(*) >= 2),
r AS (SELECT ln(row_number() OVER (ORDER BY c DESC, token)) AS x,
             ln(c) AS y
      FROM v),
m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM r),
s AS (SELECT n, sx, sy,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
      FROM m)
SELECT CAST(n AS BIGINT) AS n_types,
       round(slope, 6) AS slope,
       round((sy - slope * sx) / n, 6) AS intercept
FROM s
"""


def q_kendall_qty_discount(sf_dir: str):
    """Kendall's tau-b between lineitem quantity and discount
    (`stats.kendall_tau`: contingency-cell exchange bounded by the
    50 x 11 distinct-pair grid, integer-exact concordance outer
    products, tie-corrected denominator). Discount is pre-scaled to
    integer cents so engine and SQL agree on tie equality."""
    from cosmos_ray.functions.stats import kendall_tau

    items = read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_discount"), pa.float64()),
            pa.scalar(100.0))), pa.int64())
        return pa.table({"l_quantity": t.column("l_quantity"),
                         "disc_c": d})

    return kendall_tau(items.map_batches(cents, batch_format="pyarrow"),
                       "l_quantity", "disc_c")


SQL_KENDALL_QTY_DISCOUNT = """
WITH c AS (
  SELECT l_quantity AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2),
nn AS (SELECT sum(cnt) AS n FROM c),
s AS (SELECT COALESCE(sum(a.cnt * b.cnt
                          * sign(b.x - a.x) * sign(b.y - a.y)), 0) // 2
         AS s
      FROM c a CROSS JOIN c b),
tx AS (SELECT COALESCE(sum(t * (t - 1) // 2), 0) AS n1
       FROM (SELECT sum(cnt) AS t FROM c GROUP BY x) gx),
ty AS (SELECT COALESCE(sum(t * (t - 1) // 2), 0) AS n2
       FROM (SELECT sum(cnt) AS t FROM c GROUP BY y) gy),
v AS (SELECT (SELECT n FROM nn) AS n, (SELECT s FROM s) AS s,
             (SELECT n FROM nn) * ((SELECT n FROM nn) - 1) // 2 AS n0,
             (SELECT n1 FROM tx) AS n1, (SELECT n2 FROM ty) AS n2)
SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s_stat,
       round(CASE WHEN n0 - n1 > 0 AND n0 - n2 > 0
                  THEN s / sqrt((n0 - n1)::DOUBLE * (n0 - n2)::DOUBLE)
                  ELSE 0.0 END, 6) AS tau_b
FROM v
"""


def q_theil_sen_hourly(sf_dir: str):
    """Theil-Sen robust slope of the hourly total-value series
    (`stats.theil_sen_hourly`: integer-cents tumbling exchange, median
    of all pairwise slopes — exact integer ratios both sides)."""
    from cosmos_ray.functions.stats import theil_sen_hourly

    return theil_sen_hourly(read(sf_dir, "events", ["ts", "value"]))


SQL_THEIL_SEN_HOURLY = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour,
         sum(CAST(round(value * 100) AS BIGINT)) AS yc
  FROM events GROUP BY 1),
p AS (SELECT (b.yc - a.yc)::DOUBLE / (b.hour - a.hour) AS sl
      FROM h a JOIN h b ON b.hour > a.hour)
SELECT CAST((SELECT count(*) FROM h) AS BIGINT) AS n_hours,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(median(sl) / 100.0, 6) AS slope
FROM p
"""


def q_hellinger_lang_lengths(sf_dir: str):
    """Hellinger + total-variation distance between en and zh doc-length
    distributions over 500-char bins (`stats.hellinger_tvd`: the
    bounded-metric drift companions to PSI/JSD, same counted binned
    exchange)."""
    from cosmos_ray.functions.stats import hellinger_tvd

    docs = read(sf_dir, "documents", ["lang", "n_chars"])
    return hellinger_tvd(docs, "lang", "n_chars", "en", "zh")


SQL_HELLINGER_LANG_LENGTHS = """
WITH c AS (
  SELECT n_chars // 500 AS b,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS ca,
         sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::DOUBLE AS cb
  FROM documents WHERE lang IN ('en', 'zh') GROUP BY 1),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
p AS (SELECT ca / (SELECT na FROM t) AS pa_,
             cb / (SELECT nb FROM t) AS pb_ FROM c)
SELECT CAST((SELECT na FROM t) AS BIGINT) AS n_a,
       CAST((SELECT nb FROM t) AS BIGINT) AS n_b,
       round(sqrt(greatest(0.0, 1.0 - sum(sqrt(pa_ * pb_)))), 6)
         AS hellinger,
       round(0.5 * sum(abs(pa_ - pb_)), 6) AS tvd
FROM p
"""


def q_markov_stationary(sf_dir: str):
    """Stationary distribution of the event-type Markov chain
    (`stats.markov_stationary`: user-hash transition exchange,
    vocabulary-sized chain solve, 20 power iterations)."""
    from cosmos_ray.functions.stats import markov_stationary

    return markov_stationary(read(sf_dir, "events",
                                  ["user_id", "event_id", "ts",
                                   "event_type"]))


def _sql_markov_stationary(iters: int = 20) -> str:
    parts = ["""
WITH s AS (
  SELECT event_type AS nxt,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
tc AS (SELECT prev, nxt, count(*)::DOUBLE AS c FROM s
       WHERE prev IS NOT NULL GROUP BY 1, 2),
states AS (SELECT DISTINCT event_type AS st FROM events),
p AS MATERIALIZED (
  SELECT tc.prev, tc.nxt, tc.c / rs.r AS p
  FROM tc JOIN (SELECT prev, sum(c) AS r FROM tc GROUP BY prev) rs
       USING (prev)
  UNION ALL
  SELECT st, st, 1.0 FROM states WHERE st NOT IN (SELECT prev FROM tc)),
r0 AS (SELECT st, 1.0 / (SELECT count(*) FROM states) AS v FROM states)
"""]
    for i in range(iters):
        parts.append(f"""
, r{i + 1} AS MATERIALIZED (
    SELECT p.nxt AS st, sum(r{i}.v * p.p) AS v
    FROM r{i} JOIN p ON p.prev = r{i}.st GROUP BY p.nxt)
""")
    parts.append(f"""
SELECT s.st AS event_type, round(COALESCE(r.v, 0.0), 6) AS stationary
FROM states s LEFT JOIN r{iters} r ON r.st = s.st
""")
    return "".join(parts)


SQL_MARKOV_STATIONARY = _sql_markov_stationary()


def q_acf_hourly(sf_dir: str):
    """Autocorrelation of the hourly total-value series at lags 1-3
    (`stats.acf_hourly`: tumbling-window exchange, whole-block lagged
    Pearson correlations)."""
    from cosmos_ray.functions.stats import acf_hourly

    return acf_hourly(read(sf_dir, "events", ["ts", "value"]))


SQL_ACF_HOURLY = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour, sum(value) AS y
  FROM events GROUP BY 1),
o AS (SELECT y,
             lag(y, 1) OVER (ORDER BY hour) AS y1,
             lag(y, 2) OVER (ORDER BY hour) AS y2,
             lag(y, 3) OVER (ORDER BY hour) AS y3
      FROM h)
SELECT 1 AS lag, CAST(count(y1) AS BIGINT) AS n_pairs,
       round(corr(y, y1), 6) AS acf FROM o WHERE y1 IS NOT NULL
UNION ALL
SELECT 2, CAST(count(y2) AS BIGINT), round(corr(y, y2), 6)
FROM o WHERE y2 IS NOT NULL
UNION ALL
SELECT 3, CAST(count(y3) AS BIGINT), round(corr(y, y3), 6)
FROM o WHERE y3 IS NOT NULL
"""


def q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, day): all four grouping sets — cells,
    per-type, per-day and grand total — derived from ONE finest-grain
    combiner exchange (sentinels 'ALL'/-1), the standard cube-from-
    finest optimization (coarser levels re-aggregate the cell table,
    which is bounded by the category product, never the fact rows)."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["event_type", "ts"])

    def partials(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()),
                        86_400_000_000)
        grp = (pa.table({"event_type": t.column("event_type"), "day": day})
               .group_by(["event_type", "day"])
               .aggregate([([], "count_all")]))
        return pa.table({"event_type": grp.column("event_type"),
                         "day": grp.column("day"),
                         "n": grp.column("count_all").cast(pa.int64())})

    cells = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby(["event_type", "day"])
             .aggregate(Sum("n", alias_name="n")).materialize())
    by_type = (cells.groupby("event_type").aggregate(Sum("n", alias_name="n"))
               .map_batches(lambda t: t.append_column(
                   "day", pa.array([-1] * t.num_rows, pa.int64())),
                   batch_format="pyarrow")
               .select_columns(["event_type", "day", "n"]))
    by_day = (cells.groupby("day").aggregate(Sum("n", alias_name="n"))
              .map_batches(lambda t: t.append_column(
                  "event_type", pa.array(["ALL"] * t.num_rows, pa.string())),
                  batch_format="pyarrow")
              .select_columns(["event_type", "day", "n"]))
    total = int(cells.sum("n") or 0)
    grand = rd.from_arrow(pa.table({
        "event_type": pa.array(["ALL"]),
        "day": pa.array([-1], pa.int64()),
        "n": pa.array([total], pa.int64())}))
    return (cells.select_columns(["event_type", "day", "n"])
            .union(by_type).union(by_day).union(grand))


SQL_EVENTS_CUBE = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, -1) AS day, n
FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             count(*) AS n
      FROM events GROUP BY CUBE (event_type, day))
"""


def q_benford_prices(sf_dir: str):
    """Benford first-significant-digit profile of order totals — the
    fabricated-data / corruption probe. Exact integer path: prices are
    2-decimal money, so cents = round(v*100) is an exact int64 and the
    leading digit comes from repeated integer division (no log10 float
    boundary risk); one 9-row counts exchange."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.round(v * 100.0).astype(np.int64)
        d = np.abs(cents)
        for _ in range(18):  # int64 has <= 19 digits
            d = np.where(d >= 10, d // 10, d)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"digit": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("digit").aggregate(Sum("n", alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        d = t.column("digit").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = n.sum()
        return pa.table({
            "digit": t.column("digit").cast(pa.int64()),
            "n": t.column("n").cast(pa.int64()),
            "frac": pa.array(np.round(n / tot, 6), pa.float64()),
            "benford": pa.array(np.round(np.log10(1.0 + 1.0 / d), 6),
                                pa.float64())})

    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


SQL_BENFORD_PRICES = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders),
c AS (SELECT digit, count(*)::DOUBLE AS n FROM d GROUP BY digit),
t AS (SELECT sum(n) AS tot FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(n / (SELECT tot FROM t), 6) AS frac,
       round(log10(1 + 1.0 / digit), 6) AS benford
FROM c
"""


def q_ab_conversion_ztest(sf_dir: str):
    """Two-proportion z-test of high-value purchase conversion
    (value > 200) between even/odd user-id arms (`stats.two_proportion_ztest`: per-user groupby-max
    exchange, pooled-variance closed form replayed literally)."""
    from cosmos_ray.functions.stats import two_proportion_ztest

    return two_proportion_ztest(read(sf_dir, "events",
                                     ["user_id", "event_type", "value"]))


SQL_AB_CONVERSION_ZTEST = """
WITH pu AS (SELECT user_id,
              max(CASE WHEN event_type = 'purchase' AND value > 200.0
                       THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id),
a AS (SELECT user_id % 2 AS arm, count(*)::DOUBLE AS n,
             sum(conv)::DOUBLE AS c
      FROM pu GROUP BY 1),
w AS (SELECT
        max(CASE WHEN arm = 0 THEN n END) AS n0,
        max(CASE WHEN arm = 0 THEN c END) AS c0,
        max(CASE WHEN arm = 1 THEN n END) AS n1,
        max(CASE WHEN arm = 1 THEN c END) AS c1
      FROM a)
SELECT CAST(n0 AS BIGINT) AS n_0, CAST(n1 AS BIGINT) AS n_1,
       round(c0 / n0, 6) AS conv_0, round(c1 / n1, 6) AS conv_1,
       round((c1 / n1 - c0 / n0)
             / sqrt(((c0 + c1) / (n0 + n1))
                    * (1 - (c0 + c1) / (n0 + n1))
                    * (1 / n0 + 1 / n1)), 6) AS z
FROM w
"""


def q_anova_chars_by_source(sf_dir: str):
    """One-way ANOVA F of document length across ALL 20 sources
    (`stats.anova_oneway`: integer-exact moment partials through two
    groupby levels, float only in the final mean-square ratio —
    mirrored expression-for-expression by the SQL replay)."""
    from cosmos_ray.functions.stats import anova_oneway

    docs = read(sf_dir, "documents", ["source", "n_chars"])
    return anova_oneway(docs, "source", "n_chars")


SQL_ANOVA_CHARS_BY_SOURCE = """
WITH m AS (
  SELECT source, sum(n_chars) AS s, sum(n_chars * n_chars) AS q,
         count(*) AS n
  FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
t AS (SELECT count(*) AS k, sum(n)::DOUBLE AS n,
             sum(s)::DOUBLE AS st, sum(q)::DOUBLE AS qt,
             sum((s::DOUBLE) * (s::DOUBLE) / n) AS w
      FROM m)
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       round(CASE WHEN k > 1 AND n > k AND (qt - w) / (n - k) > 0
                  THEN ((w - st * st / n) / (k - 1))
                       / ((qt - w) / (n - k))
                  ELSE NULL END, 6) AS f_stat
FROM t
"""


def q_kruskal_chars_by_source(sf_dir: str):
    """Kruskal-Wallis H of document length across ALL sources
    (`stats.kruskal_wallis`: counted (source, n_chars) cell exchange,
    global midranks from complete run totals, tie-corrected H —
    rank sums are exact half-integers on both sides)."""
    from cosmos_ray.functions.stats import kruskal_wallis

    docs = read(sf_dir, "documents", ["source", "n_chars"])
    return kruskal_wallis(docs, "source", "n_chars")


SQL_KRUSKAL_CHARS_BY_SOURCE = """
WITH c AS (
  SELECT source AS g, n_chars AS v, count(*)::DOUBLE AS cnt
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT v, sum(cnt) AS ct FROM c GROUP BY v),
r AS (SELECT v, ct, sum(ct) OVER (ORDER BY v) - ct AS prior FROM tot),
ar AS (SELECT v, ct, prior + (ct + 1.0) / 2.0 AS avgrank FROM r),
gs AS (SELECT g, sum(cnt * avgrank) AS rsum, sum(cnt) AS ng
       FROM c JOIN ar USING (v) GROUP BY g),
agg AS (SELECT count(*) AS k, sum(ng) AS n, sum(rsum * rsum / ng) AS w
        FROM gs),
tie AS (SELECT sum(ct * ct * ct - ct) AS tt FROM ar)
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       round(CASE WHEN k > 1 AND (n * n * n - n) > 0
                       AND (1.0 - tt / (n * n * n - n)) > 0
                  THEN (12.0 / (n * (n + 1.0)) * w - 3.0 * (n + 1.0))
                       / (1.0 - tt / (n * n * n - n))
                  ELSE NULL END, 6) AS h_stat
FROM agg, tie
"""


def q_auc_price_urgent(sf_dir: str):
    """ROC AUC of order total price as a predictor of 1-URGENT priority
    (`stats.roc_auc`: exact rank / Mann-Whitney form over the counted
    two-group exchange; price pre-scaled to integer cents so tie
    equality matches SQL; rank sums are exact half-integers, so both
    sides agree bit-for-bit before rounding)."""
    from cosmos_ray.functions.stats import roc_auc

    orders = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "is_urgent": pc.equal(t.column("o_orderpriority"),
                                  "1-URGENT"),
            "cents": pc.cast(pc.round(pc.multiply(
                pc.cast(t.column("o_totalprice"), pa.float64()),
                pa.scalar(100.0))), pa.int64())})

    return roc_auc(orders.map_batches(prep, batch_format="pyarrow"),
                   "is_urgent", "cents")


SQL_AUC_PRICE_URGENT = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         sum(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN 1 ELSE 0 END)::DOUBLE AS cp,
         sum(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN 0 ELSE 1 END)::DOUBLE AS cn
  FROM orders GROUP BY 1),
r AS (SELECT cp, cn, cp + cn AS ct,
             sum(cp + cn) OVER (ORDER BY v) - (cp + cn) AS prior
      FROM c),
a AS (SELECT sum(cp) AS n1, sum(cn) AS n0,
             sum(cp * (prior + (ct + 1.0) / 2.0)) AS rpos
      FROM r)
SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
       round(CASE WHEN n1 > 0 AND n0 > 0
                  THEN (rpos - n1 * (n1 + 1.0) / 2.0) / (n1 * n0)
                  ELSE NULL END, 6) AS auc
FROM a
"""


def q_km_user_survival(sf_dir: str):
    """Kaplan-Meier survival curve of per-user lifetimes (first to last
    event, whole hours; right-censored within 24 h of the corpus max
    timestamp) (`stats.kaplan_meier`: distributed max + per-user
    span groupby + counted duration cells; the ascending-t cumulative
    product multiplies in the same order as the SQL windowed
    product(), so survival agrees bit-for-bit before rounding)."""
    from cosmos_ray.functions.stats import kaplan_meier

    return kaplan_meier(read(sf_dir, "events", ["user_id", "ts"]))


SQL_KM_USER_SURVIVAL = """
WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
u AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
      FROM events GROUP BY 1),
d AS (SELECT (l - f) // 3600000000 AS t,
             CASE WHEN l <= (SELECT m FROM mx) - 86400000000
                  THEN 1 ELSE 0 END AS obs
      FROM u),
cells AS (SELECT t, sum(obs) AS di, count(*) AS ci FROM d GROUP BY t),
km AS (SELECT t, di, sum(ci) OVER (ORDER BY t DESC) AS ni FROM cells),
s AS (SELECT t, ni, di,
             product(1.0 - di::DOUBLE / ni) OVER (ORDER BY t) AS surv
      FROM km WHERE di > 0)
SELECT t AS t_hours, CAST(ni AS BIGINT) AS n_risk,
       CAST(di AS BIGINT) AS n_events, round(surv, 6) AS survival
FROM s
"""


def q_logrank_first_purchase(sf_dir: str):
    """Two-group log-rank test of user lifetimes split by whether the
    user's FIRST event is a purchase (`stats.logrank_test`: per-user
    span groupby with a zero-padded (epoch, type) min-key for
    deterministic first-event typing, counted (duration, group) cells,
    exact integer at-risk/death walks)."""
    from cosmos_ray.functions.stats import logrank_test

    return logrank_test(
        read(sf_dir, "events", ["user_id", "ts", "event_type"]))


SQL_LOGRANK_FIRST_PURCHASE = """
WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
u AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l,
             min(lpad(epoch_us(ts)::VARCHAR, 20, '0')
                 || chr(31) || event_type) AS k
      FROM events GROUP BY 1),
d AS (SELECT (l - f) // 3600000000 AS t,
             CASE WHEN l <= (SELECT m FROM mx) - 86400000000
                  THEN 1 ELSE 0 END AS obs,
             CASE WHEN split_part(k, chr(31), 2) = 'purchase'
                  THEN 1 ELSE 0 END AS g1
      FROM u),
cells AS (SELECT t, g1, sum(obs) AS dd, count(*) AS cc
          FROM d GROUP BY 1, 2),
pt AS (SELECT t,
              sum(CASE WHEN g1 = 1 THEN dd ELSE 0 END) AS d1,
              sum(CASE WHEN g1 = 0 THEN dd ELSE 0 END) AS d0,
              sum(CASE WHEN g1 = 1 THEN cc ELSE 0 END) AS c1,
              sum(CASE WHEN g1 = 0 THEN cc ELSE 0 END) AS c0
       FROM cells GROUP BY t),
km AS (SELECT t, d1, d0,
              sum(c1) OVER (ORDER BY t DESC) AS n1,
              sum(c0) OVER (ORDER BY t DESC) AS n0
       FROM pt),
terms AS (SELECT d1 - (d1 + d0) * n1::DOUBLE / (n1 + n0) AS oe,
                 CASE WHEN n1 + n0 > 1
                      THEN (d1 + d0) * (n1::DOUBLE / (n1 + n0))
                           * (1.0 - n1::DOUBLE / (n1 + n0))
                           * ((n1 + n0) - (d1 + d0))
                           / ((n1 + n0) - 1.0)
                      ELSE 0.0 END AS vv
          FROM km WHERE d1 + d0 > 0),
tot AS (SELECT sum(cc) FILTER (g1 = 1) AS t1,
               sum(cc) FILTER (g1 = 0) AS t0 FROM cells)
SELECT CAST(COALESCE((SELECT t1 FROM tot), 0) AS BIGINT) AS n_1,
       CAST(COALESCE((SELECT t0 FROM tot), 0) AS BIGINT) AS n_0,
       round(COALESCE(sum(oe), 0.0), 6) AS o_minus_e,
       round(CASE WHEN sum(vv) > 0
                  THEN sum(oe) * sum(oe) / sum(vv)
                  ELSE NULL END, 6) AS chi2
FROM terms
"""


def q_ap_price_urgent(sf_dir: str):
    """Average precision (step-wise PR-AUC) of order price as a
    predictor of 1-URGENT priority (`stats.average_precision`:
    counted two-group exchange, descending-threshold walk with exact
    integer TP/FP; recall increments are single cp/n_pos divisions on
    both sides)."""
    from cosmos_ray.functions.stats import average_precision

    orders = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "is_urgent": pc.equal(t.column("o_orderpriority"),
                                  "1-URGENT"),
            "cents": pc.cast(pc.round(pc.multiply(
                pc.cast(t.column("o_totalprice"), pa.float64()),
                pa.scalar(100.0))), pa.int64())})

    return average_precision(
        orders.map_batches(prep, batch_format="pyarrow"),
        "is_urgent", "cents")


SQL_AP_PRICE_URGENT = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         sum(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN 1 ELSE 0 END) AS cp,
         sum(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN 0 ELSE 1 END) AS cn
  FROM orders GROUP BY 1),
w AS (SELECT cp,
             sum(cp) OVER (ORDER BY v DESC) AS tp,
             sum(cn) OVER (ORDER BY v DESC) AS fp
      FROM c),
tot AS (SELECT sum(cp) AS n1, sum(cn) AS n0 FROM c)
SELECT CAST((SELECT n1 FROM tot) AS BIGINT) AS n_pos,
       CAST((SELECT n0 FROM tot) AS BIGINT) AS n_neg,
       round(CASE WHEN (SELECT n1 FROM tot) > 0
                  THEN sum((cp::DOUBLE / (SELECT n1 FROM tot))
                           * (tp::DOUBLE / (tp + fp)))
                  ELSE NULL END, 6) AS ap
FROM w
"""


def q_calibration_price_urgent(sf_dir: str):
    """Reliability table: $20k price bins vs empirical 1-URGENT rate
    (`stats.calibration_bins`: one integer-exact (bin, n, n_pos,
    score_sum) combiner exchange; means are single exact-integer
    divisions on both sides)."""
    from cosmos_ray.functions.stats import calibration_bins

    orders = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "is_urgent": pc.equal(t.column("o_orderpriority"),
                                  "1-URGENT"),
            "cents": pc.cast(pc.round(pc.multiply(
                pc.cast(t.column("o_totalprice"), pa.float64()),
                pa.scalar(100.0))), pa.int64())})

    return calibration_bins(
        orders.map_batches(prep, batch_format="pyarrow"),
        "is_urgent", "cents", bin_width=2_000_000)


SQL_CALIBRATION_PRICE_URGENT = """
WITH b AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 2000000 AS bin,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS p,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       round(sum(p)::DOUBLE / count(*), 6) AS pos_rate,
       round(sum(v)::DOUBLE / count(*), 6) AS mean_score
FROM b GROUP BY bin
"""


def q_keyness_en(sf_dir: str):
    """Top-50 tokens most distinctive of English vs the rest of the
    corpus by Dunning log-likelihood (`textops.llr_keyness`: vocab
    combiner exchange, distributed column-sum totals, rounded-score
    distributed top-k; direction is the exact integer cross product)."""
    from cosmos_ray.functions.textops import llr_keyness

    docs = read(sf_dir, "documents", ["lang", "text"])
    return llr_keyness(docs, "lang", "text", "en", k=50, min_count=5)


SQL_KEYNESS_EN = """
WITH tok AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ia,
         unnest(string_split(text, ' ')) AS token
  FROM documents),
c AS (SELECT token, sum(ia) AS a, sum(1 - ia) AS b
      FROM tok GROUP BY token),
tot AS (SELECT sum(a) AS nai, sum(b) AS nbi FROM c),
g AS (SELECT token, a, b,
             round(2.0 * (
               CASE WHEN a > 0 THEN a * ln(a / (
                 (SELECT nai FROM tot)::DOUBLE * (a + b)
                 / ((SELECT nai FROM tot)::DOUBLE
                    + (SELECT nbi FROM tot)::DOUBLE))) ELSE 0.0 END
             + CASE WHEN b > 0 THEN b * ln(b / (
                 (SELECT nbi FROM tot)::DOUBLE * (a + b)
                 / ((SELECT nai FROM tot)::DOUBLE
                    + (SELECT nbi FROM tot)::DOUBLE))) ELSE 0.0 END),
               6) AS g2,
             CAST(sign(a * (SELECT nbi FROM tot)
                       - b * (SELECT nai FROM tot)) AS BIGINT) AS dir
      FROM c WHERE a + b >= 5)
SELECT token, CAST(a AS BIGINT) AS count_a, CAST(b AS BIGINT) AS count_b,
       g2, dir
FROM g ORDER BY g2 DESC, token LIMIT 50
"""


def q_motif_view_purchase(sf_dir: str):
    """Per-user count of non-overlapping 'one-or-more views then a
    purchase' motifs in the event-type sequence
    (`windows.sequence_motif_count`: user-hash bucket exchange,
    vectorized encode + regex count; ordering ties broken by event_id
    on both sides)."""
    from cosmos_ray.functions.windows import sequence_motif_count

    return sequence_motif_count(
        read(sf_dir, "events",
             ["user_id", "ts", "event_id", "event_type"]),
        pattern="v+p")


SQL_MOTIF_VIEW_PURCHASE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
              WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
              WHEN 'error' THEN 'e' ELSE 'x' END AS code
  FROM events),
s AS (SELECT user_id,
             string_agg(code, '' ORDER BY ts, event_id) AS seq,
             count(*) AS n_events
      FROM e GROUP BY user_id)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, 'v+p')) AS BIGINT) AS motif_count
FROM s
"""


def q_isotonic_price_urgent(sf_dir: str):
    """Isotonic (PAVA) calibration of the 1-URGENT rate on order price
    in integer cents (`stats.isotonic_calibration`: counted per-score
    cells, exact integer-comparison pooling). Iterative pooling is not
    SQL-expressible, so this query is pytest-gated (exact PAVA
    reference) rather than oracle-checked."""
    from cosmos_ray.functions.stats import isotonic_calibration

    orders = read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "is_urgent": pc.equal(t.column("o_orderpriority"),
                                  "1-URGENT"),
            "cents": pc.cast(pc.round(pc.multiply(
                pc.cast(t.column("o_totalprice"), pa.float64()),
                pa.scalar(100.0))), pa.int64())})

    return isotonic_calibration(
        orders.map_batches(prep, batch_format="pyarrow"),
        "is_urgent", "cents")


def q_holt_hourly(sf_dir: str):
    """Holt double-exponential level/trend/one-step forecast of the
    hourly total-value series (`stats.holt_hourly`: integer-cents
    tumbling exchange; a = B = 0.5 exact binary fractions make the
    recursion bit-identical to the SQL recursive CTE)."""
    from cosmos_ray.functions.stats import holt_hourly

    return holt_hourly(read(sf_dir, "events", ["ts", "value"]))


SQL_HOLT_HOURLY = """
WITH RECURSIVE h AS (
  SELECT row_number() OVER (ORDER BY hour) AS rn, yc
  FROM (SELECT epoch_us(ts) // 3600000000 AS hour,
               sum(CAST(round(value * 100) AS BIGINT))::DOUBLE AS yc
        FROM events GROUP BY 1)),
nh AS (SELECT count(*) AS n FROM h),
rec AS (
  SELECT 1 AS rn,
         (SELECT yc FROM h WHERE rn = 1) AS l,
         (SELECT yc FROM h WHERE rn = 2)
           - (SELECT yc FROM h WHERE rn = 1) AS b
  WHERE (SELECT n FROM nh) >= 2
  UNION ALL
  SELECT r.rn + 1,
         0.5 * h.yc + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * h.yc + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
  FROM rec r JOIN h ON h.rn = r.rn + 1),
fin AS (SELECT l, b FROM rec WHERE rn = (SELECT n FROM nh))
SELECT CAST((SELECT n FROM nh) AS BIGINT) AS n_hours,
       round(CASE WHEN (SELECT n FROM nh) >= 2 THEN (SELECT l FROM fin)
                  ELSE (SELECT yc FROM h WHERE rn = 1) END / 100.0, 6)
         AS level,
       round((SELECT b FROM fin) / 100.0, 6) AS trend,
       round(((SELECT l FROM fin) + (SELECT b FROM fin)) / 100.0, 6)
         AS forecast_next
"""


def q_ntile_chars(sf_dir: str):
    """Per-language quartile assignment of doc length — SQL ntile(4)
    replayed distributed with SQL's exact uneven-bucket rule (the first
    n mod k buckets get the extra row). Ties are made deterministic on
    BOTH sides by ordering on (n_chars, doc_id)."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    k = 4

    def nt(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], kind="stable")
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        small, extra = divmod(n, k)
        cut = extra * (small + 1)
        tile = np.where(
            idx < cut,
            idx // (small + 1) + 1,
            extra + (np.maximum(idx - cut, 0)
                     // max(small, 1)) + 1).astype(np.int64)
        out = g[["doc_id", "lang", "n_chars"]].copy()
        out["tile"] = tile
        return out

    return bucketed_group_apply(docs, ["lang"], nt)


SQL_NTILE_CHARS = """
SELECT doc_id, lang, n_chars,
       CAST(ntile(4) OVER (PARTITION BY lang
                           ORDER BY n_chars, doc_id) AS BIGINT) AS tile
FROM documents
"""


def q_token_dense_rank(sf_dir: str):
    """Docs holding the top-2 DENSE ranks of token count per language —
    dense_rank with a COUNTED exchange: only DISTINCT (lang, n_tokens)
    values cross the shuffle and are ranked in-group (value-bounded
    traffic, the `group_quantiles_counted` shape — a hot language's
    billion rows contribute at most its distinct token counts), then the
    <=2-per-lang winning values broadcast back as a lookup; the doc rows
    themselves never shuffle."""
    from ray.data.aggregate import Count

    from cosmos_ray.queries.relational import (bucketed_group_apply,
                                               join_or_broadcast)

    docs = read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def toks(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(t.column("text"), " "))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "n_tokens": ntok.cast(pa.int64()),
        })

    tok = docs.map_batches(toks, batch_format="pyarrow")
    distinct = (tok.groupby(["lang", "n_tokens"])
                .aggregate(Count(alias_name="__n")).drop_columns(["__n"]))

    def rk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("n_tokens", ascending=False, kind="stable")
        g = g.assign(drank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[g["drank"] <= 2]

    def keyed(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("lang").cast(pa.string()),
            t.column("n_tokens").cast(pa.string()), "\x1f")
        return t.append_column("__k", k)

    winners = (bucketed_group_apply(distinct, ["lang"], rk)
               .map_batches(keyed, batch_format="pyarrow")
               .select_columns(["__k", "drank"]))
    out = join_or_broadcast(
        tok.map_batches(keyed, batch_format="pyarrow"),
        winners, key="__k", add_cols=["drank"])
    return out.select_columns(["doc_id", "lang", "n_tokens", "drank"])


SQL_TOKEN_DENSE_RANK = """
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents)
SELECT doc_id, lang, n_tokens,
       dense_rank() OVER (PARTITION BY lang
                          ORDER BY n_tokens DESC) AS drank
FROM t QUALIFY drank <= 2
"""


def q_docs_evolved_union(sf_dir: str):
    """Schema-evolution read (`sources/evolution.py`): documents are
    re-written as three crawl GENERATIONS with diverging physical
    schemas — gen0 (doc_id:int32, text), gen1 (+lang), gen2 (all columns
    + a new ``rev`` column) — then read back as ONE dataset via
    ``read_parquet_evolved`` (union-by-name + int widening + typed-null
    fill, per-schema-group distributed reads) and aggregated per
    language. The oracle replays the generation split in SQL, so a
    wrong cast, dropped column, or misfilled null changes the hash."""
    import os
    import tempfile

    from ray.data.aggregate import Sum

    from cosmos_ray.sources.evolution import read_parquet_evolved

    docs = read(sf_dir, "documents",
                ["doc_id", "text", "lang", "source", "n_chars"])
    base = tempfile.mkdtemp(prefix="evolved_", dir="/tmp")
    dirs = [os.path.join(base, f"gen{i}") for i in range(3)]
    for d in dirs:
        os.makedirs(d, exist_ok=True)

    def split(g: int, cols_fn):
        def f(t: pa.Table) -> pa.Table:
            mod = pc.subtract(
                t.column("doc_id"),
                pc.multiply(pc.divide(t.column("doc_id"), pa.scalar(3)),
                            pa.scalar(3)))
            return cols_fn(t.filter(pc.equal(mod, g)))

        return f

    docs.map_batches(split(0, lambda t: pa.table({
        "doc_id": t.column("doc_id").cast(pa.int32()),
        "text": t.column("text")})), batch_format="pyarrow"
    ).write_parquet(dirs[0])
    docs.map_batches(split(1, lambda t: pa.table({
        "doc_id": t.column("doc_id"),
        "text": t.column("text"),
        "lang": t.column("lang")})), batch_format="pyarrow"
    ).write_parquet(dirs[1])
    docs.map_batches(split(2, lambda t: pa.table({
        "doc_id": t.column("doc_id"),
        "text": t.column("text"),
        "lang": t.column("lang"),
        "source": t.column("source"),
        "n_chars": t.column("n_chars"),
        "rev": pc.binary_join_element_wise(
            pa.array(["r"] * len(t)), t.column("doc_id").cast(pa.string()),
            "")})), batch_format="pyarrow"
    ).write_parquet(dirs[2])

    ev = read_parquet_evolved(dirs)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd_

        lang_k = (t.column("lang").cast(pa.string()).fill_null("??")
                  if "lang" in t.column_names
                  else pa.array(["??"] * len(t)))
        n_chars = (t.column("n_chars").fill_null(0)
                   if "n_chars" in t.column_names
                   else pa.array([0] * len(t), pa.int64()))
        rev_ok = (pc.is_valid(t.column("rev")).cast(pa.int64())
                  if "rev" in t.column_names
                  else pa.array([0] * len(t), pa.int64()))
        df = pd_.DataFrame({
            "lang_k": lang_k.to_pandas() if hasattr(lang_k, "to_pandas")
            else lang_k,
            "sum_chars": n_chars.to_pandas() if hasattr(n_chars, "to_pandas")
            else n_chars,
            "n_rev": rev_ok.to_pandas() if hasattr(rev_ok, "to_pandas")
            else rev_ok})
        g = df.groupby("lang_k", as_index=False).agg(
            n_docs=("sum_chars", "size"), sum_chars=("sum_chars", "sum"),
            n_rev=("n_rev", "sum"))
        g["n_docs"] = g["n_docs"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("lang_k")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars"),
                       Sum("n_rev", alias_name="n_rev")))


SQL_DOCS_EVOLVED_UNION = """
WITH ev AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang,
         CASE WHEN doc_id % 3 = 2 THEN n_chars END AS n_chars,
         CASE WHEN doc_id % 3 = 2
              THEN 'r' || CAST(doc_id AS VARCHAR) END AS rev
  FROM documents)
SELECT COALESCE(lang, '??') AS lang_k,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(COALESCE(n_chars, 0)) AS BIGINT) AS sum_chars,
       CAST(count(rev) AS BIGINT) AS n_rev
FROM ev GROUP BY 1
"""


def q_docs_time_travel(sf_dir: str):
    """Snapshot time-travel over a versioned at-rest table
    (`state/versioned.py`, the Delta/Iceberg-lite commit log):
    documents are committed as v1 = APPEND even doc_ids, v2 = APPEND
    odd doc_ids, v3 = OVERWRITE with doc_id % 3 == 0, v4 = ROLLBACK to
    v2 — then snapshots AS OF v2, v3 and v4 are read back AFTER all
    four commits. v2 must still see every document (overwrite didn't
    destroy history), v3 the overwrite subset, v4 the restored full
    set; the oracle states each snapshot's content directly from
    `documents`, so a wrong log replay, a file leaked across versions
    or a rollback that re-added a live file changes the hash."""
    import tempfile

    from cosmos_ray.state import versioned as V

    docs = read(sf_dir, "documents", ["doc_id"])
    tdir = tempfile.mkdtemp(prefix="ttravel_", dir="/tmp")

    def part(rem: int, mod: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % mod == rem))

        return f

    V.commit_append(tdir, docs.map_batches(part(0, 2),
                                           batch_format="pyarrow"))
    V.commit_append(tdir, docs.map_batches(part(1, 2),
                                           batch_format="pyarrow"))
    V.commit_overwrite(tdir, docs.map_batches(part(0, 3),
                                              batch_format="pyarrow"))
    V.rollback(tdir, to_version=2)

    def tag(v: int):
        return lambda t: pa.table({
            "version": pa.array(np.full(t.num_rows, v, np.int64)),
            "doc_id": t.column("doc_id")})

    out = None
    for v in (2, 3, 4):
        snap = V.read_snapshot(tdir, v).map_batches(
            tag(v), batch_format="pyarrow")
        out = snap if out is None else out.union(snap)
    return out


SQL_DOCS_TIME_TRAVEL = """
SELECT CAST(2 AS BIGINT) AS version, doc_id FROM documents
UNION ALL
SELECT CAST(3 AS BIGINT), doc_id FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT CAST(4 AS BIGINT), doc_id FROM documents
"""


def q_docs_forget(sf_dir: str):
    """Targeted key deletion on the versioned store
    (`versioned.commit_delete_keys`, the right-to-be-forgotten pass):
    documents are committed in two appends, then every doc_id % 7 == 0
    is deleted — rewriting ONLY the files that contain those keys (one
    Ray task per affected file; untouched files keep their physical
    identity). The query returns the post-delete snapshot, which the
    oracle states as documents minus the deleted keys."""
    import tempfile

    from cosmos_ray.state import versioned as V

    docs = read(sf_dir, "documents", ["doc_id"])
    tdir = tempfile.mkdtemp(prefix="forget_", dir="/tmp")

    def half(rem: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == rem))

        return f

    V.commit_append(tdir, docs.map_batches(half(0), batch_format="pyarrow"))
    V.commit_append(tdir, docs.map_batches(half(1), batch_format="pyarrow"))
    keys = [r["doc_id"] for r in docs.map_batches(
        lambda t: t.filter(pa.array(
            t.column("doc_id").to_numpy(zero_copy_only=False) % 7 == 0)),
        batch_format="pyarrow").take_all()]
    V.commit_delete_keys(tdir, "doc_id", keys)
    return V.read_snapshot(tdir).select_columns(["doc_id"])


SQL_DOCS_FORGET = """
SELECT doc_id FROM documents WHERE doc_id % 7 <> 0
"""


def _merge_fixture(sf_dir: str):
    """Shared builder for the MERGE/change-feed queries: v1 = the
    documents table, v2 = MERGE (update n_chars for doc_id%7==0,
    content-identical touch for doc_id%11==0, insert doc_id+1000000
    for doc_id%13==0), v3 = targeted delete of doc_id%5==0."""
    import tempfile

    from cosmos_ray.state import versioned as V

    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    tdir = tempfile.mkdtemp(prefix="merge_", dir="/tmp")
    V.commit_append(tdir, docs)

    def upd(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((ids % 7 == 0) | (ids % 11 == 0)))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"), "lang": t.column("lang"),
            "n_chars": pa.array(np.where(ids % 7 == 0, nc + 1000, nc))})

    def ins(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 13 == 0))
        return pa.table({
            "doc_id": pc.add(t.column("doc_id"), pa.scalar(1_000_000)),
            "lang": t.column("lang"), "n_chars": t.column("n_chars")})

    updates = docs.map_batches(upd, batch_format="pyarrow").union(
        docs.map_batches(ins, batch_format="pyarrow"))
    V.commit_merge_upsert(tdir, "doc_id", updates)

    del_keys = [r["doc_id"] for r in docs.map_batches(
        lambda t: t.select(["doc_id"]).filter(pa.array(
            t.column("doc_id").to_numpy(zero_copy_only=False) % 5 == 0)),
        batch_format="pyarrow").take_all()]
    V.commit_delete_keys(tdir, "doc_id", del_keys)
    return tdir


def q_docs_upserted(sf_dir: str):
    """Delta-MERGE upsert on the versioned store
    (`versioned.commit_merge_upsert`): matched keys are replaced by
    rewriting ONLY the files that contain them (one Ray task per
    affected file), unmatched update rows insert, untouched files keep
    their physical identity — all one atomic commit. Returns the
    post-merge snapshot (v2); the oracle restates it from `documents`
    with the update/insert arithmetic."""
    from cosmos_ray.state import versioned as V

    tdir = _merge_fixture(sf_dir)
    return V.read_snapshot(tdir, 2)


SQL_DOCS_UPSERTED = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000 ELSE n_chars END
         AS n_chars
FROM documents
UNION ALL
SELECT doc_id + 1000000, lang, n_chars FROM documents WHERE doc_id % 13 = 0
"""


def q_docs_change_feed(sf_dir: str):
    """Change data feed between snapshots (`versioned.version_diff`,
    the Delta CDF analog): v1 -> v3 spans a MERGE and a targeted
    delete; the diff reads ONLY files that differ between the two
    snapshots (immutable files common to both prune out) and
    classifies by full-outer key join — delete for keys gone, update
    for keys whose non-key content changed, insert for new keys.
    Discriminative: the doc_id%11 rows were REWRITTEN by the merge
    with identical content and must NOT appear in the feed."""
    from cosmos_ray.state.versioned import version_diff

    tdir = _merge_fixture(sf_dir)
    return version_diff(tdir, "doc_id", 1, 3)


SQL_DOCS_CHANGE_FEED = """
SELECT doc_id, 'delete' AS change FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id, 'update' FROM documents
WHERE doc_id % 5 <> 0 AND doc_id % 7 = 0
UNION ALL
SELECT doc_id + 1000000, 'insert' FROM documents WHERE doc_id % 13 = 0
"""


def q_docs_view_incremental(sf_dir: str):
    """Incremental view maintenance driven by the versioned store's
    OWN change feed: a per-lang (count, sum n_chars) view built once on
    snapshot v1 is refreshed to v3 purely from
    `versioned.version_delta(1, 3)` — the signed Z-set delta that reads
    ONLY the files the MERGE and delete commits touched. Updates arrive
    as old-row(-1)/new-row(+1), the content-identical %11 rewrite
    survivors cancel algebraically inside `matview.maintain_view`, and
    the result is bit-identical to recomputing the view on the final
    snapshot (the oracle replays that recompute from `documents`)."""
    from cosmos_ray.functions.matview import delta_partials, maintain_view
    from cosmos_ray.state.versioned import read_snapshot, version_delta

    tdir = _merge_fixture(sf_dir)

    def sign1(t: pa.Table) -> pa.Table:
        return t.append_column("sign", pa.array([1] * t.num_rows, pa.int64()))

    view1 = delta_partials(
        read_snapshot(tdir, 1).map_batches(sign1, batch_format="pyarrow"),
        keys=["lang"], sum_cols=["n_chars"])
    delta = version_delta(tdir, 1, 3)
    return maintain_view(view1, delta, keys=["lang"], sum_cols=["n_chars"])


SQL_DOCS_VIEW_INCREMENTAL = """
WITH v3 AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000 ELSE n_chars END
           AS n_chars
  FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT doc_id + 1000000, lang, n_chars FROM documents WHERE doc_id % 13 = 0
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM v3 GROUP BY lang
"""


def q_events_skew_join(sf_dir: str):
    """Skew-aware fact-dim join (`relational.skew_join`): event_type is
    a catastrophically hot key (every fact row carries one of ~5
    values), so a plain hash join funnels the whole fact table through
    5 aggregator partitions; skew_join's hot-key census (combiner
    value_counts partials) routes hot rows through a map-side broadcast
    lookup and reserves the shuffle for the cold tail — no hot row ever
    enters an exchange. Output: every 97th event with its type's total
    count."""
    from cosmos_ray.queries.relational import skew_join

    ev = read(sf_dir, "events", ["event_id", "event_type"])
    dim = (read(sf_dir, "events", ["event_type"])
           .groupby("event_type").aggregate(Count(alias_name="type_n")))

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    big = ev.map_batches(pick, batch_format="pyarrow")
    return skew_join(big, dim, key="event_type", add_cols=["type_n"],
                     hot_count=50, max_hot_keys=10_000)


SQL_EVENTS_SKEW_JOIN = """
SELECT e.event_id, e.event_type, t.type_n
FROM events e
JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n
      FROM events GROUP BY event_type) t USING (event_type)
WHERE e.event_id % 97 = 0
"""


def q_events_box_scan(sf_dir: str):
    """2-D box scan served from Z-ORDER clustered storage
    (`state/zorder.py`): events are written once in Morton order of
    (user_id, value) with a per-file 2-D zone-map manifest, then the
    (user range x value range) probe opens ONLY intersecting files plus
    an exact residual filter — the Delta/Iceberg ZORDER BY analog. The
    oracle is the plain WHERE box over the raw table; prune-subset
    evidence is pytest-gated (`test_resume`)."""
    import os
    import tempfile

    from ray.data.aggregate import Max

    from cosmos_ray.state.zorder import read_box, write_zordered

    ev = read(sf_dir, "events", ["event_id", "user_id", "value"])
    u_hi = int(ev.aggregate(Max("user_id", alias_name="m"))["m"]) // 3
    store = os.path.join(tempfile.mkdtemp(prefix="zorder_", dir="/tmp"),
                         "events_z")
    write_zordered(ev, ("user_id", "value"), store, num_partitions=16)
    return read_box(store, (0, u_hi, 50.0, 150.0))


SQL_EVENTS_BOX_SCAN = """
SELECT event_id, user_id, value FROM events
WHERE user_id BETWEEN 0 AND (SELECT max(user_id) // 3 FROM events)
  AND value BETWEEN 50.0 AND 150.0
"""


def q_fingerprint_lookup(sf_dir: str):
    """Content-addressed point lookup via the file-level BLOOM index
    (`state/bloom_index.py`): documents are written in crawl order (no
    sort), a per-file bloom manifest is built over the md5 fingerprint
    column in one distributed column-pruned pass, and the probe (the
    middle doc's fingerprint) opens only bloom-hit files + an exact
    equality residual — point pruning on a column zone maps can't serve
    (high-cardinality, unclustered). Oracle: the same md5 equality over
    the raw table."""
    import os
    import tempfile

    from ray.data.aggregate import Max

    from cosmos_ray.functions.textops import fingerprints
    from cosmos_ray.state.bloom_index import build_bloom_index, read_point

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    # materialized ONCE: the md5 pass feeds the store write AND the
    # probe filter without re-executing its lineage
    fps = fingerprints(docs).materialize()
    store = os.path.join(tempfile.mkdtemp(prefix="bloomidx_", dir="/tmp"),
                         "docs_fp")
    os.makedirs(store, exist_ok=True)
    fps.repartition(16).write_parquet(store)
    build_bloom_index(store, "fingerprint")
    probe_id = int(docs.aggregate(Max("doc_id", alias_name="m"))["m"]) // 2
    probe_fp = (fps.map_batches(
        lambda t: t.filter(pc.equal(t.column("doc_id"),
                                    pa.scalar(probe_id))),
        batch_format="pyarrow").take_all()[0]["fingerprint"])  # one row
    return read_point(store, "fingerprint", probe_fp)


SQL_FINGERPRINT_LOOKUP = """
SELECT doc_id, md5(text) AS fingerprint FROM documents
WHERE md5(text) = (SELECT md5(text) FROM documents
                   WHERE doc_id = (SELECT max(doc_id) // 2 FROM documents))
"""


def q_user_event_types(sf_dir: str):
    """Per-user DISTINCT-set aggregate (SQL array_agg(DISTINCT ... ORDER
    BY) / collect_set): the sorted distinct event types each user has
    produced, emitted as a canonical comma-joined string + count. Scale
    shape: the exchange carries DISTINCT (user, type) pairs (one
    combiner groupby — bounded by user x type-vocabulary, not events),
    then a tiny per-user assembly."""
    from ray.data.aggregate import Count as _Count

    from cosmos_ray.queries.relational import bucketed_group_apply

    ev = read(sf_dir, "events", ["user_id", "event_type"])
    pairs = (ev.groupby(["user_id", "event_type"])
             .aggregate(_Count(alias_name="__n")).drop_columns(["__n"]))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values("event_type", kind="stable").groupby(
            "user_id", sort=False)["event_type"]
        return pd.DataFrame({
            "user_id": s.agg("first").index.to_numpy(),
            "n_types": s.size().to_numpy().astype(np.int64),
            "types": s.agg(",".join).to_numpy()})

    return bucketed_group_apply(pairs, ["user_id"], assemble)


SQL_USER_EVENT_TYPES = """
SELECT user_id,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
FROM events GROUP BY user_id
"""


def q_dedup_consecutive(sf_dir: str):
    """Consecutive-duplicate removal per user stream (the event-log
    cleanup / run-length compaction op): keep each event whose type
    differs from the SAME user's previous event in (ts, event_id) order.
    One user-hash exchange, vectorized shift compare in-bucket."""
    from cosmos_ray.functions.windows import _bucketed_by_user

    ev = read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def keep_changes(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = g.groupby("user_id", sort=False)["event_type"].shift(1)
        out = g[(prev.isna()) | (g["event_type"] != prev)]
        return out[["user_id", "event_id", "event_type"]]

    return _bucketed_by_user(ev, keep_changes)


SQL_DEDUP_CONSECUTIVE = """
WITH r AS (
  SELECT user_id, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events)
SELECT user_id, event_id, event_type FROM r
WHERE prev IS NULL OR event_type <> prev
"""


def q_doc_argmax_chars(sf_dir: str):
    """Per-language argmax (SQL arg_max / the max-by aggregate) with a
    COMBINER exchange: each batch emits at most one (lang, best) row —
    the longest doc, ties to the smallest doc_id — and one tiny groupby
    reduces the partials with the same rule. No per-group sort, no
    row_number window: one row per (batch, lang) crosses the shuffle,
    the physical plan arg_max compiles to at 100 TB."""
    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t.column("lang").to_pylist(),
            "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False),
            "n_chars": t.column("n_chars").to_numpy(zero_copy_only=False)})
        df = df.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True], kind="stable")
        best = df.drop_duplicates(subset=["lang"], keep="first")
        return pa.Table.from_pandas(best, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="stable")
        return g.drop_duplicates(subset=["lang"], keep="first")[
            ["lang", "doc_id", "n_chars"]]

    from cosmos_ray.queries.relational import bucketed_group_apply

    partials = docs.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_apply(partials, ["lang"], finish)


SQL_DOC_ARGMAX_CHARS = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn = 1
"""


def q_orders_loo_encoding(sf_dir: str):
    """Leave-one-out target encoding (the ML categorical-feature op):
    each order's o_orderstatus encoded as the mean o_totalprice of all
    OTHER orders in its category. Exactness: prices become integer
    CENTS via floor(x*100+0.5) on both sides, the per-category (sum,
    count) is an exact integer combiner broadcast back as a 3-row
    lookup, and the single float division of identical integers is
    bit-equal to the SQL window replay. Scale shape: one category-sized
    groupby + a broadcast; order rows never shuffle."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from cosmos_ray.queries.relational import join_or_broadcast

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        c = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_orderstatus": t.column("o_orderstatus"),
                         "cents": pa.array(c)})

    c = orders.map_batches(cents, batch_format="pyarrow")
    stats = (c.groupby("o_orderstatus")
             .aggregate(_Sum("cents", alias_name="sc"),
                        _Count(alias_name="n")))
    out = join_or_broadcast(c, stats, key="o_orderstatus",
                            add_cols=["sc", "n"])

    def loo(t: pa.Table) -> pa.Table:
        sc = t.column("sc").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        ci = t.column("cents").to_numpy(zero_copy_only=False).astype(np.float64)
        denom = 100.0 * (n - 1)
        val = np.where(denom > 0, (sc - ci) / np.where(denom > 0, denom, 1),
                       np.nan)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_orderstatus": t.column("o_orderstatus"),
            "loo_mean": pa.array(
                [None if not np.isfinite(x) else x for x in val],
                pa.float64())})

    return out.map_batches(loo, batch_format="pyarrow")


SQL_ORDERS_LOO_ENCODING = """
WITH c AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
s AS (SELECT o_orderstatus, sum(cents) AS sc, count(*) AS n
      FROM c GROUP BY 1)
SELECT c.o_orderkey, c.o_orderstatus,
       CAST(s.sc - c.cents AS DOUBLE)
         / (100.0 * NULLIF(s.n - 1, 0)) AS loo_mean
FROM c JOIN s USING (o_orderstatus)
"""


def q_rare_label_rollup(sf_dir: str):
    """Rare-category consolidation (sklearn 'infrequent categories' /
    feature-engineering rare-label encoder): event types with fewer
    than 10% of total events collapse into '__other__'. Scale shape:
    one category-sized count combiner; the relabel + rollup runs on the
    COUNTS table (vocabulary-sized), so event rows are read once and
    never shuffled."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    ev = read(sf_dir, "events", ["event_id", "event_type"])
    total = ev.count()
    thr = total // 10

    counts = ev.groupby("event_type").aggregate(_Count(alias_name="n"))

    def relabel(t: pa.Table) -> pa.Table:
        rare = pc.less(t.column("n"), pa.scalar(thr))
        return pa.table({
            "label": pc.if_else(rare, pa.scalar("__other__"),
                                t.column("event_type")),
            "n": t.column("n")})

    return (counts.map_batches(relabel, batch_format="pyarrow")
            .groupby("label").aggregate(_Sum("n", alias_name="n_events")))


SQL_RARE_LABEL_ROLLUP = """
WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
SELECT CASE WHEN n < (SELECT count(*) // 10 FROM events)
            THEN '__other__' ELSE event_type END AS label,
       CAST(sum(n) AS BIGINT) AS n_events
FROM c GROUP BY 1
"""


def q_vocab_overlap(sf_dir: str):
    """Cross-corpus vocabulary overlap: for every language pair, the
    distinct-token intersection size and overlap coefficient
    |A∩B| / min(|A|, |B|) — the corpus-comparison set-similarity op
    (sub-corpus drift / contamination screening at the vocabulary
    level). Scale shape: tokens explode vectorized, ONE distinct
    (lang, token) groupby bounds everything downstream by vocabulary
    (not corpus) size; the pair intersection is a token self-join over
    that distinct table; per-lang sizes broadcast back."""
    from ray.data.aggregate import Count as _Count

    from cosmos_ray.queries.relational import (_join_partitions,
                                               join_or_broadcast)

    docs = read(sf_dir, "documents", ["lang", "text"])

    def toks(t: pa.Table) -> pa.Table:
        s = pc.split_pattern(t.column("text"), " ")
        lens = pc.list_value_length(s).to_numpy(zero_copy_only=False)
        langs = np.repeat(
            np.asarray(t.column("lang").to_pylist(), dtype=object), lens)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "tok": pc.list_flatten(s)})

    distinct = (docs.map_batches(toks, batch_format="pyarrow")
                .groupby(["lang", "tok"])
                .aggregate(_Count(alias_name="__n")).drop_columns(["__n"]))
    v = distinct.groupby("lang").aggregate(_Count(alias_name="nv"))

    b = distinct.map_batches(
        lambda t: pa.table({"lb": t.column("lang"), "tok_b": t.column("tok")}),
        batch_format="pyarrow")
    pairs = (distinct.join(b, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("tok",), right_on=("tok_b",))
             .map_batches(lambda t: t.filter(
                 pc.less(t.column("lang"), t.column("lb"))),
                 batch_format="pyarrow")
             .groupby(["lang", "lb"]).aggregate(_Count(alias_name="n_common")))
    pairs = join_or_broadcast(pairs, v, key="lang", add_cols=["nv"])
    pairs = pairs.map_batches(
        lambda t: pa.table({"lang_a": t.column("lang"),
                            "lang_b": t.column("lb"),
                            "n_common": t.column("n_common"),
                            "nv_a": t.column("nv")}),
        batch_format="pyarrow")
    pairs = join_or_broadcast(pairs, v, key="lang", add_cols=["nv"],
                              big_key="lang_b")

    def finish(t: pa.Table) -> pa.Table:
        na = t.column("nv_a").to_numpy(zero_copy_only=False)
        nb = t.column("nv").to_numpy(zero_copy_only=False)
        nc = t.column("n_common").to_numpy(zero_copy_only=False)
        return pa.table({
            "lang_a": t.column("lang_a"), "lang_b": t.column("lang_b"),
            "n_common": pa.array(nc.astype(np.int64)),
            "overlap": pa.array(nc / np.minimum(na, nb), pa.float64())})

    return pairs.map_batches(finish, batch_format="pyarrow")


SQL_VOCAB_OVERLAP = """
WITH tok AS (SELECT DISTINCT lang, t.tok
             FROM documents, unnest(string_split(text, ' ')) AS t(tok)),
v AS (SELECT lang, CAST(count(*) AS BIGINT) AS nv FROM tok GROUP BY lang),
pairs AS (SELECT a.lang AS la, b.lang AS lb, CAST(count(*) AS BIGINT) AS nc
          FROM tok a JOIN tok b ON a.tok = b.tok AND a.lang < b.lang
          GROUP BY 1, 2)
SELECT la AS lang_a, lb AS lang_b, nc AS n_common,
       nc / least(va.nv, vb.nv) AS overlap
FROM pairs JOIN v va ON va.lang = la JOIN v vb ON vb.lang = lb
"""


# shared oracle CTE for the pred-level entity edge list (the engine's
# adjacency keyed (src, pred, dst); _SQL_ADJ_CTE collapses pred away)
_SQL_EDG_CTE = """
, edg AS (
  SELECT ss.canonical_id AS src, f.pred, so.canonical_id AS dst
  FROM facts f
  JOIN surf ss ON ss.surface = f.subj
  JOIN surf so ON so.surface = f.obj
  GROUP BY 1, 2, 3)
"""


def q_kg_negative_samples(sf_dir: str):
    """Filtered negative sampling for KG-embedding training (the
    TransE/DistMult corrupted-tail generator): every distinct adjacency
    edge (src, pred, dst) gets a deterministic corrupted tail
    ``neg_dst`` — the successor of ``dst`` in the md5-shuffled CYCLIC
    order of the entity vocabulary (a fixed pseudo-random derangement
    any engine replays exactly; same device as the md5 stratified
    sample) — plus the standard 'filtered' flag ``is_true_triple``
    marking corruptions that collide with a real edge (Bordes et al.
    2013 §3; the filtered protocol of Bordes' ranking eval).

    Scale shape: the successor map is entity-VOCABULARY-sized and
    broadcast once (`ray.put`, the J4 KB-lookup bound); the collision
    flag is a left join of corrupted keys against the edge-key table —
    size-guarded broadcast with a distributed fallback. Edge rows are
    read once and never re-shuffle."""
    import hashlib

    import ray
    from ray.data.aggregate import Count as _Count

    from cosmos_ray.queries.relational import (collect_small,
                                               left_join_or_broadcast)

    adj = _built_kg(sf_dir).adjacency.select_columns(
        ["src_entity", "pred", "dst_entity"])

    def ends(t: pa.Table) -> pa.Table:
        e = pa.chunked_array(t.column("src_entity").chunks
                             + t.column("dst_entity").chunks,
                             type=pa.string())
        return pa.table({"e": pc.unique(e)})

    ent_ds = (adj.map_batches(ends, batch_format="pyarrow")
              .groupby("e").aggregate(_Count(alias_name="__n"))
              .drop_columns(["__n"]))
    ents = collect_small(ent_ds, 2_000_000).column("e").to_pylist()
    order = sorted(ents, key=lambda x: (hashlib.md5(x.encode()).hexdigest(), x))
    succ_ref = ray.put(
        {order[i]: order[(i + 1) % len(order)] for i in range(len(order))})

    def corrupt(t: pa.Table) -> pa.Table:
        succ = ray.get(succ_ref)
        neg = pa.array(
            pd.Series(t.column("dst_entity").to_pylist()).map(succ),
            pa.string())
        key = pc.binary_join_element_wise(
            t.column("src_entity").cast(pa.string()),
            t.column("pred").cast(pa.string()), neg, "\x1f")
        return pa.table({
            "src_entity": t.column("src_entity"), "pred": t.column("pred"),
            "dst_entity": t.column("dst_entity"), "neg_dst": neg,
            "__k": key})

    corrupted = adj.map_batches(corrupt, batch_format="pyarrow")
    keys = adj.map_batches(
        lambda t: pa.table({
            "__k": pc.binary_join_element_wise(
                t.column("src_entity").cast(pa.string()),
                t.column("pred").cast(pa.string()),
                t.column("dst_entity").cast(pa.string()), "\x1f"),
            "__hit": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    out = left_join_or_broadcast(corrupted, keys, key="__k",
                                 add_cols=["__hit"], fill=0)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "src_entity": t.column("src_entity"), "pred": t.column("pred"),
            "dst_entity": t.column("dst_entity"),
            "neg_dst": t.column("neg_dst"),
            "is_true_triple": pc.equal(t.column("__hit"), pa.scalar(1))
            .cast(pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_KG_NEGATIVE_SAMPLES = with_goldens(_SQL_EDG_CTE + """
, ent AS (SELECT DISTINCT e FROM (
    SELECT src AS e FROM edg UNION ALL SELECT dst FROM edg) u)
, ord AS (SELECT e, row_number() OVER (ORDER BY md5(e), e) AS rn FROM ent)
, succ AS (
  SELECT o.e, o2.e AS nxt
  FROM ord o JOIN ord o2 ON o2.rn = o.rn % (SELECT count(*) FROM ord) + 1)
SELECT g.src AS src_entity, g.pred, g.dst AS dst_entity, s.nxt AS neg_dst,
       CAST(h.src IS NOT NULL AS BIGINT) AS is_true_triple
FROM edg g
JOIN succ s ON s.e = g.dst
LEFT JOIN edg h ON h.src = g.src AND h.pred = g.pred AND h.dst = s.nxt
""")


def q_kg_rule_mining(sf_dir: str):
    """AMIE-style closed Horn-rule mining over the entity graph: for
    every predicate triple (p1, p2, p3), the rule
    ``p1(x,y) AND p2(y,z) => p3(x,z)`` scored by body support
    (#distinct (x,z) pairs satisfying the body), head support
    (#distinct body pairs where the head edge exists) and standard
    confidence — the KB-completion rule miner (Galárraga et al.,
    WWW'13 §4, CWA confidence). Top-20 rules by (confidence, support).

    Scale shape: one edge self-join on the shared middle entity (the
    linkpred/2hop wedge fan-out — skew bounded by max entity degree),
    a distinct-tuple groupby that bounds everything downstream by
    distinct body pairs, one head hash-join, then predicate-cubed tiny
    aggregates; the rule table broadcast is |preds|^2-sized."""
    from ray.data.aggregate import Count as _Count

    from cosmos_ray.queries.relational import (_join_partitions,
                                               join_or_broadcast)

    adj = _built_kg(sf_dir).adjacency.select_columns(
        ["src_entity", "pred", "dst_entity"])
    right = adj.map_batches(
        lambda t: pa.table({"mid": t.column("dst_entity"),
                            "p1": t.column("pred"),
                            "a": t.column("src_entity")}),
        batch_format="pyarrow")
    body = right.join(adj, join_type="inner",
                      num_partitions=_join_partitions(),
                      on=("mid",), right_on=("src_entity",))
    # distinct (a, p1, p2, c) tuples: support counts distinct pairs
    body_pairs = (body.map_batches(
        lambda t: pa.table({"a": t.column("a"), "p1": t.column("p1"),
                            "p2": t.column("pred"),
                            "c": t.column("dst_entity")}),
        batch_format="pyarrow")
        .groupby(["a", "p1", "p2", "c"])
        .aggregate(_Count(alias_name="__n")).drop_columns(["__n"]))
    n_body = (body_pairs.groupby(["p1", "p2"])
              .aggregate(_Count(alias_name="n_body")))
    head = adj.map_batches(
        lambda t: pa.table({"h_src": t.column("src_entity"),
                            "p3": t.column("pred"),
                            "h_dst": t.column("dst_entity")}),
        batch_format="pyarrow")
    sup = (body_pairs.join(head, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("a", "c"), right_on=("h_src", "h_dst"))
           .groupby(["p1", "p2", "p3"])
           .aggregate(_Count(alias_name="support")))

    def with_key(t: pa.Table) -> pa.Table:
        return t.append_column("__k", pc.binary_join_element_wise(
            t.column("p1").cast(pa.string()),
            t.column("p2").cast(pa.string()), "\x1f"))

    sup = sup.map_batches(with_key, batch_format="pyarrow")
    n_body = n_body.map_batches(with_key, batch_format="pyarrow") \
        .drop_columns(["p1", "p2"])
    out = join_or_broadcast(sup, n_body, key="__k", add_cols=["n_body"])

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("support").to_numpy(zero_copy_only=False)
        nb = t.column("n_body").to_numpy(zero_copy_only=False)
        return pa.table({
            "p1": t.column("p1"), "p2": t.column("p2"), "p3": t.column("p3"),
            "n_body": t.column("n_body").cast(pa.int64()),
            "support": t.column("support").cast(pa.int64()),
            "confidence": pa.array(
                s.astype(np.float64) / nb.astype(np.float64), pa.float64())})

    return (out.map_batches(finish, batch_format="pyarrow")
            .sort(["confidence", "support", "p1", "p2", "p3"],
                  descending=[True, True, False, False, False])
            .limit(20))


SQL_KG_RULE_MINING = with_goldens(_SQL_EDG_CTE + """
, body AS (SELECT DISTINCT e1.src AS a, e1.pred AS p1,
                           e2.pred AS p2, e2.dst AS c
           FROM edg e1 JOIN edg e2 ON e2.src = e1.dst)
, nb AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_body
         FROM body GROUP BY 1, 2)
, sup AS (SELECT b.p1, b.p2, h.pred AS p3,
                 CAST(count(*) AS BIGINT) AS support
          FROM body b JOIN edg h ON h.src = b.a AND h.dst = b.c
          GROUP BY 1, 2, 3)
SELECT s.p1, s.p2, s.p3, nb.n_body, s.support,
       CAST(s.support AS DOUBLE) / nb.n_body AS confidence
FROM sup s JOIN nb USING (p1, p2)
ORDER BY confidence DESC, support DESC, p1, p2, p3
LIMIT 20
""")


def q_kg_rule_infer(sf_dir: str):
    """Rule-based KB COMPLETION — apply the TOP mined Horn rule
    (deterministic (confidence, support, preds) order from
    kg_rule_mining) to INFER the missing head edges: body pairs
    p1(x,y) AND p2(y,z) whose head p3(x,z) is absent become new
    candidate facts carrying the rule's confidence — the inference step
    AMIE-style completion runs after mining (Galárraga et al., WWW'13
    §7).

    Shape: the rule itself is ONE driver row; the body instantiation is
    one mid-keyed hash join of the two pred-filtered edge slices
    (wedge fan-out, degree-bounded skew) and the head check is a
    composite-key ANTI `semi_join_ds` (broadcast key set under the cap,
    distributed past it)."""
    from cosmos_ray.queries.relational import (_join_partitions,
                                               semi_join_ds)

    rule = q_kg_rule_mining(sf_dir).limit(1).take_all()[0]
    p1, p2, p3 = rule["p1"], rule["p2"], rule["p3"]
    conf = round(float(rule["confidence"]), 6)
    adj = _built_kg(sf_dir).adjacency.select_columns(
        ["src_entity", "pred", "dst_entity"])

    def slice_pred(p, out_src, out_dst):
        return adj.map_batches(
            lambda t, pp=p, a=out_src, b=out_dst: pa.table({
                a: t.column("src_entity"),
                b: t.column("dst_entity")}).filter(
                    pc.equal(t.column("pred"), pp)),
            batch_format="pyarrow")

    e1 = slice_pred(p1, "a", "mid")
    e2 = slice_pred(p2, "mid2", "c")
    cand = (e1.join(e2, join_type="inner",
                    num_partitions=_join_partitions(),
                    on=("mid",), right_on=("mid2",))
            .groupby(["a", "c"]).count().drop_columns(["count()"]))

    def keyed(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return t.append_column("k", pc.binary_join_element_wise(
            t.column("a").combine_chunks(),
            t.column("c").combine_chunks(), "\x1f"))

    heads = slice_pred(p3, "a", "c").map_batches(
        keyed, batch_format="pyarrow").select_columns(["k"])
    inferred = semi_join_ds(cand.map_batches(keyed,
                                             batch_format="pyarrow"),
                            heads, key_col="k", big_key="k", keep=False)

    def fin(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src_entity": t.column("a"),
            "pred": pa.array([p3] * n, pa.string()),
            "dst_entity": t.column("c"),
            "confidence": pa.array(np.full(n, conf, np.float64))})

    return inferred.map_batches(fin, batch_format="pyarrow")


SQL_KG_RULE_INFER = with_goldens(_SQL_EDG_CTE + """
, body AS (SELECT DISTINCT e1.src AS a, e1.pred AS p1,
                           e2.pred AS p2, e2.dst AS c
           FROM edg e1 JOIN edg e2 ON e2.src = e1.dst)
, nb AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_body
         FROM body GROUP BY 1, 2)
, sup AS (SELECT b.p1, b.p2, h.pred AS p3,
                 CAST(count(*) AS BIGINT) AS support
          FROM body b JOIN edg h ON h.src = b.a AND h.dst = b.c
          GROUP BY 1, 2, 3)
, top1 AS (SELECT s.p1, s.p2, s.p3,
                  CAST(s.support AS DOUBLE) / nb.n_body AS confidence
           FROM sup s JOIN nb USING (p1, p2)
           ORDER BY confidence DESC, support DESC, p1, p2, p3 LIMIT 1)
, cand AS (SELECT DISTINCT e1.src AS a, e2.dst AS c, t.p3, t.confidence
           FROM top1 t
           JOIN edg e1 ON e1.pred = t.p1
           JOIN edg e2 ON e2.src = e1.dst AND e2.pred = t.p2)
SELECT c.a AS src_entity, c.p3 AS pred, c.c AS dst_entity,
       round(c.confidence, 6) AS confidence
FROM cand c
LEFT JOIN edg h ON h.src = c.a AND h.dst = c.c AND h.pred = c.p3
WHERE h.src IS NULL
""")


def q_kg_entity_types(sf_dir: str):
    """Predicate-profile type induction: each entity typed by the
    predicate it most often appears as SUBJECT of (argmax over summed
    adjacency weight, ties to the lexicographically smallest pred) —
    the schema-bootstrap step that assigns coarse entity types before
    an ontology exists. Combiner shape (same as doc_argmax_chars): one
    (entity, pred)-keyed sum, at most one candidate row per (batch,
    entity) crosses the final exchange."""
    from ray.data.aggregate import Sum as _Sum

    from cosmos_ray.queries.relational import bucketed_group_apply

    adj = _built_kg(sf_dir).adjacency
    sp = (adj.groupby(["src_entity", "pred"])
          .aggregate(_Sum("weight", alias_name="n")))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "pred"],
                                       ascending=[False, True], kind="stable")
        return pa.Table.from_pandas(
            df.drop_duplicates(subset=["src_entity"], keep="first"),
            preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "pred"], ascending=[False, True],
                          kind="stable")
        best = g.drop_duplicates(subset=["src_entity"], keep="first")
        return pd.DataFrame({"entity": best["src_entity"],
                             "top_pred": best["pred"],
                             "n_as_subj": best["n"].astype("int64")})

    partials = sp.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_apply(partials, ["src_entity"], finish)


SQL_KG_ENTITY_TYPES = with_goldens("""
, sp AS (SELECT ss.canonical_id AS entity, f.pred,
                CAST(count(*) AS BIGINT) AS n
         FROM facts f
         JOIN surf ss ON ss.surface = f.subj
         JOIN surf so ON so.surface = f.obj
         GROUP BY 1, 2)
SELECT entity, pred AS top_pred, n AS n_as_subj FROM (
  SELECT entity, pred, n,
         row_number() OVER (PARTITION BY entity
                            ORDER BY n DESC, pred) AS rn
  FROM sp) WHERE rn = 1
""")


def q_kg_communities(sf_dir: str):
    """Deterministic synchronous label-propagation communities over
    the entity graph (`graph.label_propagation`, 4 fixed rounds,
    most-frequent-neighbor-label with smallest-label ties) — the
    community-detection member of the graph family; the oracle unrolls
    the rounds as materialized CTEs (kg_shortest pattern)."""
    from cosmos_ray.functions.graph import label_propagation

    return label_propagation(_built_kg(sf_dir).adjacency, rounds=4)


def _sql_kg_communities(rounds: int = 4) -> str:
    parts = [_SQL_ADJ_CTE.replace("adj AS (", "adj AS MATERIALIZED ("), """
, e0 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM adj WHERE src <> dst)
, und AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0)
, l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM und)
"""]
    for i in range(rounds):
        parts.append(f"""
, c{i} AS MATERIALIZED (
    SELECT u.src AS node, l.lbl, count(*) AS n
    FROM und u JOIN l{i} l ON l.node = u.dst GROUP BY 1, 2)
, l{i + 1} AS MATERIALIZED (
    SELECT node, lbl FROM (
      SELECT node, lbl,
             row_number() OVER (PARTITION BY node
                                ORDER BY n DESC, lbl) AS rn
      FROM c{i}) WHERE rn = 1)
""")
    parts.append(f"""
SELECT node AS entity, lbl AS community FROM l{rounds}
""")
    return with_goldens("".join(parts))


SQL_KG_COMMUNITIES = _sql_kg_communities()


def q_kg_modularity(sf_dir: str):
    """Newman modularity decomposition of the label-propagation
    partition (`graph.modularity` over `graph.label_propagation`,
    4 rounds): per community, intra-edge count, degree sum and
    Q_c = e_c/m - (d_c/2m)^2 — the partition-quality score a
    community detection pass is judged by. The oracle replays the
    unrolled LPA rounds (kg_communities pattern) then computes the
    identical two-division IEEE expression over exact BIGINT counts."""
    from cosmos_ray.functions.graph import label_propagation, modularity

    adj = _built_kg(sf_dir).adjacency
    return modularity(adj, label_propagation(adj, rounds=4))


def _sql_kg_modularity(rounds: int = 4) -> str:
    base = _sql_kg_communities(rounds)
    tail = f"SELECT node AS entity, lbl AS community FROM l{rounds}"
    assert tail in base
    return base.replace(tail, f"""
, lab AS MATERIALIZED (SELECT node, lbl FROM l{rounds})
, mm AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS m FROM e0)
, ej AS MATERIALIZED (
    SELECT la.lbl AS ca, lb.lbl AS cb
    FROM e0 JOIN lab la ON la.node = e0.a
            JOIN lab lb ON lb.node = e0.b)
, intra AS (SELECT ca AS community, CAST(count(*) AS BIGINT) AS e_c
            FROM ej WHERE ca = cb GROUP BY 1)
, deg AS (SELECT community, CAST(count(*) AS BIGINT) AS d_c
          FROM (SELECT ca AS community FROM ej
                UNION ALL SELECT cb FROM ej) GROUP BY 1)
SELECT d.community,
       coalesce(i.e_c, 0) AS intra_edges,
       d.d_c AS degree_sum,
       coalesce(i.e_c, 0) / mm.m
         - (d.d_c / (2 * mm.m)) * (d.d_c / (2 * mm.m)) AS modularity
FROM deg d LEFT JOIN intra i ON i.community = d.community
CROSS JOIN mm
ORDER BY d.community
""")


SQL_KG_MODULARITY = _sql_kg_modularity()


def q_kg_betweenness(sf_dir: str):
    """Sampled-source Brandes betweenness over the entity graph
    (`graph.betweenness_sampled`: exact two-phase Brandes from the 4
    smallest entity ids — forward BFS sigma levels, backward dependency
    joins, all node-bounded exchanges). Oracle-checked via the unrolled
    two-phase Brandes SQL replay (`_sql_kg_betweenness`), plus
    pytest-gated against direct Brandes on known graphs."""
    from cosmos_ray.functions.graph import betweenness_sampled

    return betweenness_sampled(_built_kg(sf_dir).adjacency,
                               k_sources=4, max_depth=6, topn=20)


def _sql_kg_betweenness(k_sources: int = 4, max_depth: int = 6,
                        topn: int = 20) -> str:
    """Unrolled two-phase Brandes replay: forward BFS levels with
    sigma path counts (one CTE per hop, the closeness frontier
    pattern), then backward dependency accumulation
    delta(v) = sum sigma_v / sigma_w * (1 + delta_w) per hop from the
    deepest level up. Float sums accumulate in different orders than
    the engine's distributed Sum, but every contribution is the same
    IEEE expression and the result rounds at 6dp on both sides."""
    parts = [_SQL_ADJ_CTE, f"""
, e AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM adj WHERE src <> dst)
, und AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e)
, sd AS MATERIALIZED (
    SELECT DISTINCT src AS seed FROM und ORDER BY seed LIMIT {k_sources})
, l0 AS MATERIALIZED (
    SELECT seed, seed AS entity, CAST(1 AS DOUBLE) AS sigma FROM sd)
, seen0 AS MATERIALIZED (SELECT seed, entity FROM l0)
"""]
    for i in range(1, max_depth + 1):
        parts.append(f"""
, l{i} AS MATERIALIZED (
    SELECT c.seed, c.entity, sum(c.sigma) AS sigma FROM (
      SELECT l.seed, u.dst AS entity, l.sigma
      FROM l{i - 1} l JOIN und u ON u.src = l.entity) c
    LEFT JOIN seen{i - 1} s ON s.seed = c.seed AND s.entity = c.entity
    WHERE s.seed IS NULL
    GROUP BY c.seed, c.entity)
, seen{i} AS MATERIALIZED (
    SELECT seed, entity FROM seen{i - 1}
    UNION ALL SELECT seed, entity FROM l{i})
""")
    parts.append(f"""
, d{max_depth} AS MATERIALIZED (
    SELECT seed, entity, sigma, CAST(0 AS DOUBLE) AS delta
    FROM l{max_depth})
""")
    for d in range(max_depth, 0, -1):
        parts.append(f"""
, d{d - 1} AS MATERIALIZED (
    SELECT l.seed, l.entity, l.sigma, COALESCE(c.delta, 0) AS delta
    FROM l{d - 1} l LEFT JOIN (
      SELECT w.seed, u.src AS entity,
             sum(lv.sigma / w.sigma * (1 + w.delta)) AS delta
      FROM d{d} w
      JOIN und u ON u.dst = w.entity
      JOIN l{d - 1} lv ON lv.seed = w.seed AND lv.entity = u.src
      GROUP BY w.seed, u.src) c
    ON c.seed = l.seed AND c.entity = l.entity)
""")
    acc = "\nUNION ALL ".join(
        f"SELECT entity, delta FROM d{i}"
        for i in range(1, max_depth + 1))
    parts.append(f"""
, acc AS ({acc})
SELECT entity, round(sum(delta) / 2, 6) AS betweenness
FROM acc GROUP BY entity
ORDER BY betweenness DESC, entity LIMIT {topn}
""")
    return with_goldens("".join(parts))


SQL_KG_BETWEENNESS = _sql_kg_betweenness()


def q_kg_bfs_tree(sf_dir: str):
    """Shortest-path TREE from the smallest entity — dist plus the
    lexicographically smallest shortest-path predecessor per node
    (`graph.bfs_tree`): the structure a KB's 'how are A and B related?'
    path explanation walks. Oracle: closeness-style unrolled BFS with a
    min(parent) per level."""
    from cosmos_ray.functions.graph import bfs_tree

    return bfs_tree(_built_kg(sf_dir).adjacency, max_depth=4)


def _sql_kg_bfs_tree(max_depth: int = 4) -> str:
    parts = [_SQL_ADJ_CTE, """
, e AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM adj WHERE src <> dst)
, und AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e)
, rt AS MATERIALIZED (SELECT min(src) AS root FROM und)
, l0 AS MATERIALIZED (
    SELECT root AS entity, CAST(NULL AS VARCHAR) AS parent FROM rt)
, seen0 AS MATERIALIZED (SELECT entity FROM l0)
"""]
    for i in range(1, max_depth + 1):
        parts.append(f"""
, l{i} AS MATERIALIZED (
    SELECT c.entity, min(c.parent) AS parent FROM (
      SELECT u.dst AS entity, u.src AS parent
      FROM l{i - 1} l JOIN und u ON u.src = l.entity) c
    LEFT JOIN seen{i - 1} s ON s.entity = c.entity
    WHERE s.entity IS NULL
    GROUP BY c.entity)
, seen{i} AS MATERIALIZED (
    SELECT entity FROM seen{i - 1} UNION ALL SELECT entity FROM l{i})
""")
    acc = "\nUNION ALL ".join(
        f"SELECT entity, CAST({i} AS BIGINT) AS dist, parent FROM l{i}"
        for i in range(0, max_depth + 1))
    parts.append(f"\n{acc}\n")
    return with_goldens("".join(parts))


SQL_KG_BFS_TREE = _sql_kg_bfs_tree()


def q_kg_closeness(sf_dir: str):
    """Sampled harmonic closeness centrality from the 4 smallest entity
    ids (`graph.closeness_sampled`: one composite-key (seed, entity) BFS
    frontier for all seeds, hop-bounded at 4; reciprocal contributions
    accumulate as lcm-scaled INTEGERS and divide once at the end, so the
    unrolled-BFS SQL oracle matches bit-for-bit)."""
    from cosmos_ray.functions.graph import closeness_sampled

    return closeness_sampled(_built_kg(sf_dir).adjacency,
                             k_sources=4, max_depth=4)


def _sql_kg_closeness(k_sources: int = 4, max_depth: int = 4) -> str:
    """Unrolled multi-source BFS replay: per hop one frontier-expand CTE
    (join the undirected simple edge list) + one anti-join against the
    seen set; harmonic sum as integer lcm/hop contributions."""
    import math

    lcm = math.lcm(*range(1, max_depth + 1))
    parts = [_SQL_ADJ_CTE, f"""
, e AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM adj WHERE src <> dst)
, und AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e)
, sd AS MATERIALIZED (
    SELECT DISTINCT src AS seed FROM und ORDER BY seed LIMIT {k_sources})
, l0 AS MATERIALIZED (SELECT seed, seed AS entity FROM sd)
, seen0 AS MATERIALIZED (SELECT seed, entity FROM l0)
"""]
    for i in range(1, max_depth + 1):
        parts.append(f"""
, l{i} AS MATERIALIZED (
    SELECT DISTINCT c.seed, c.entity FROM (
      SELECT l.seed, u.dst AS entity
      FROM l{i - 1} l JOIN und u ON u.src = l.entity) c
    LEFT JOIN seen{i - 1} s ON s.seed = c.seed AND s.entity = c.entity
    WHERE s.seed IS NULL)
, seen{i} AS MATERIALIZED (
    SELECT seed, entity FROM seen{i - 1}
    UNION ALL SELECT seed, entity FROM l{i})
""")
    reach = "\nUNION ALL ".join(
        f"SELECT seed, {lcm // i} AS c FROM l{i}"
        for i in range(1, max_depth + 1))
    parts.append(f"""
, r AS ({reach})
, agg AS (SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
                 CAST(sum(c) AS BIGINT) AS tot
          FROM r GROUP BY seed)
SELECT sd.seed AS entity,
       COALESCE(agg.n_reached, 0) AS n_reached,
       COALESCE(agg.tot, 0) / {float(lcm)} AS closeness
FROM sd LEFT JOIN agg ON agg.seed = sd.seed
ORDER BY entity
""")
    return with_goldens("".join(parts))


SQL_KG_CLOSENESS = _sql_kg_closeness()


def _mentions_batch(t: pa.Table, with_surface: bool = False) -> pa.Table:
    """(url, entity_id[, surface]) rows for the LINKED endpoints of a
    linked-triples batch (subject and object slots; unlinked mentions
    drop batch-side). Shared by the alias-usage / trend / salience
    mention streams."""
    t = t.combine_chunks()
    parts = []
    for idc, surfc in (("subj_id", "subj"), ("obj_id", "obj")):
        eid = t.column(idc).combine_chunks()
        ok = pc.not_equal(eid, "")
        cols = {"url": t.column("url").combine_chunks().filter(ok),
                "entity_id": eid.filter(ok)}
        if with_surface:
            cols["surface"] = t.column(surfc).combine_chunks().filter(ok)
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def q_alias_usage(sf_dir: str):
    """Per-entity ALIAS-USAGE statistics: for each canonical entity, how
    often each surface form (canonical name vs alias) appears across the
    linked mentions (subject and object slots of extracted facts), plus
    its distinct-page spread — the signal an entity-resolution pipeline
    uses to maintain its alias dictionary (reference analog: the
    scispacy linker's per-candidate alias table,
    `ingest/process/entity_linking/link.py:60-67`).

    Shape: the per-mention linked table is split into two narrow
    (entity_id, surface, url) streams inside one map_batches (columns
    pruned to 3, unlinked mentions dropped batch-side); usage rolls up
    through a (entity, surface, url)-keyed partial then an
    (entity, surface) groupby, so the exchange is bounded by distinct
    mention shapes, not corpus size. is_alias is a KB name lookup (120
    entries, vocabulary-sized closure) applied batch-side."""
    from ray.data.aggregate import Count, Sum

    from cosmos_ray.sources.entity_dict import build_entity_dict

    lk = _built_kg(sf_dir).linked
    names = {r["canonical_id"]: r["name"]
             for r in build_entity_dict().to_pylist()}

    per_url = (lk.map_batches(lambda t: _mentions_batch(t, True),
                              batch_format="pyarrow")
               .groupby(["entity_id", "surface", "url"])
               .aggregate(Count(alias_name="m")))
    rolled = (per_url.groupby(["entity_id", "surface"])
              .aggregate(Sum("m", alias_name="n_mentions"),
                         Count(alias_name="n_urls")))

    def flag(t: pa.Table) -> pa.Table:
        eids = t.column("entity_id").to_pylist()
        surfs = t.column("surface").to_pylist()
        return t.append_column(
            "is_alias",
            pa.array([names.get(e) != s for e, s in zip(eids, surfs)],
                     pa.bool_()))

    return rolled.map_batches(flag, batch_format="pyarrow")


SQL_ALIAS_USAGE = with_goldens("""
, men AS (
  SELECT s.canonical_id AS entity_id, f.subj AS surface, f.url
  FROM facts f JOIN surf s ON s.surface = f.subj
  UNION ALL
  SELECT s.canonical_id, f.obj, f.url
  FROM facts f JOIN surf s ON s.surface = f.obj)
, pu AS (SELECT entity_id, surface, url, count(*) AS m
         FROM men GROUP BY 1, 2, 3)
SELECT pu.entity_id, pu.surface,
       CAST(sum(pu.m) AS BIGINT) AS n_mentions,
       CAST(count(*) AS BIGINT) AS n_urls,
       (pu.surface != k.name) AS is_alias
FROM pu JOIN kbname k ON k.canonical_id = pu.entity_id
GROUP BY 1, 2, 5
""")


QUERIES = {
    "lineitem_agg": q_lineitem_agg,
    "revenue_by_segment": q_revenue_by_segment,
    "order_lineitem_join": q_order_lineitem_join,
    "local_supplier_volume": q_local_supplier_volume,
    "copart_join_revenue": q_copart_join_revenue,
    "events_range_scan": q_events_range_scan,
    "key_skew": q_key_skew,
    "source_prior": q_source_prior,
    "peak_concurrency": q_peak_concurrency,
    "copurchase_pairs": q_copurchase_pairs,
    "profile_docs": q_profile_docs,
    "media_image_features": q_media_image_features,
    "media_jpeg_features": q_media_jpeg_features,
    "media_audio_features": q_media_audio_features,
    "media_video_features": q_media_video_features,
    "twap_value": q_twap_value,
    "weekly_growth": q_weekly_growth,
    "value_percentiles_cont": q_value_percentiles_cont,
    "dedup_report": q_dedup_report,
    "gap_quantiles": q_gap_quantiles,
    "pca_embed": q_pca_embed,
    "pca_moments": q_pca_moments,
    "top_customers": q_top_customers,
    "top_customers_page2": q_top_customers_page2,
    "phrase_search": q_phrase_search,
    "substring_lookup": q_substring_lookup,
    "count_by_lang": q_count_by_lang,
    "events_hourly": q_events_hourly,
    "events_hourly_incremental": q_events_hourly_incremental,
    "order_window_overlaps": q_order_window_overlaps,
    "big_spenders": q_big_spenders,
    "customer_order_counts": q_customer_order_counts,
    "customers_no_orders": q_customers_no_orders,
    "distinct_pairs": q_distinct_pairs,
    "median_order": q_median_order,
    "top2_orders_per_segment": q_top2_orders_per_segment,
    "region_customers": q_region_customers,
    "token_counts": q_token_counts,
    "regex_tokens": q_regex_tokens,
    "rolling_fp": q_rolling_fp,
    "cdc_chunks": q_cdc_chunks,
    "subdoc_dedup": q_subdoc_dedup,
    "exact_substring_dedup": q_exact_substring_dedup,
    "quality": q_quality,
    "fingerprints": q_fingerprints,
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard_adjacent": q_ngram_jaccard_adjacent,
    "events_latest": q_events_latest,
    "sessionize": q_sessionize,
    "user_cumsum": q_user_cumsum,
    "rolling_value": q_rolling_value,
    "fuzzy_parts": q_fuzzy_parts,
    "lineitem_corr": q_lineitem_corr,
    "session_stats": q_session_stats,
    "mad_outlier_days": q_mad_outlier_days,
    "order_quartiles": q_order_quartiles,
    "winsorized_values": q_winsorized_values,
    "user_modal_type": q_user_modal_type,
    "assoc_rules": q_assoc_rules,
    "seasonal_naive": q_seasonal_naive,
    "source_entropy": q_source_entropy,
    "balanced_docs": q_balanced_docs,
    "user_growth": q_user_growth,
    "event_transitions": q_event_transitions,
    "revenue_share": q_revenue_share,
    "user_paths": q_user_paths,
    "scaled_lengths": q_scaled_lengths,
    "ewma_value": q_ewma_value,
    "value_histogram": q_value_histogram,
    "distinct_users_kmv": q_distinct_users_kmv,
    "weekly_users_kmv": q_weekly_users_kmv,
    "fuzzy_clusters": q_fuzzy_clusters,
    "docs_merged": q_docs_merged,
    "event_attribution": q_event_attribution,
    "error_burst": q_error_burst,
    "bm25_docs": q_bm25_docs,
    "boolean_query": q_boolean_query,
    "boolean_fuzzy": q_boolean_fuzzy,
    "fuzzy_search": q_fuzzy_search,
    "bm25_index_docs": q_bm25_index_docs,
    "snippets": q_snippets,
    "mixture_weights": q_mixture_weights,
    "token_budget": q_token_budget,
    "event_pivot": q_event_pivot,
    "hybrid_rrf": q_hybrid_rrf,
    "stratified_docs": q_stratified_docs,
    "hopping_counts": q_hopping_counts,
    "hopping_distinct_users": q_hopping_distinct_users,
    "user_key_moments": q_user_key_moments,
    "watermarked_counts": q_watermarked_counts,
    "distinct_users_daily": q_distinct_users_daily,
    "top_terms_by_lang": q_top_terms_by_lang,
    "value_quantiles": q_value_quantiles,
    "value_quantiles_sketch": q_value_quantiles_sketch,
    "props_k_by_type": q_props_k_by_type,
    "embedding_kmeans": q_embedding_kmeans,
    "semantic_dedup": q_semantic_dedup,
    "curate_docs": q_curate_docs,
    "pack_sequences": q_pack_sequences,
    "contamination": q_contamination,
    "shuffle_shards": q_shuffle_shards,
    "dup_ngram_frac": q_dup_ngram_frac,
    "tfidf_keywords": q_tfidf_keywords,
    "vocab_counts": q_vocab_counts,
    "redact_pii": q_redact_pii,
    "perplexity": q_perplexity,
    "nb_lang": q_nb_lang,
    "weighted_sample": q_weighted_sample,
    "doc_splits": q_doc_splits,
    "event_gaps": q_event_gaps,
    "cohort_retention": q_cohort_retention,
    "table_checksum": q_table_checksum,
    "validate_events": q_validate_events,
    "funnel": q_funnel,
    "daily_anomalies": q_daily_anomalies,
    "repetition_stats": q_repetition_stats,
    "bpe_merges": q_bpe_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "word_vectors": q_word_vectors,
    "embed_docs": q_embed_docs,
    "doc_windows": q_doc_windows,
    "embedding_topk": q_embedding_topk,
    "class_centroids": q_class_centroids,
    "centroid_assign": q_centroid_assign,
    "knn_join": q_knn_join,
    "mmr_rerank": q_mmr_rerank,
    "percent_rank": q_percent_rank,
    "events_rollup": q_events_rollup,
    "char_outliers": q_char_outliers,
    "doc_triples": q_doc_triples,
    "doc_adjacency": q_doc_adjacency,
    "kg_triples": q_kg_triples,
    "kg_entities": q_kg_entities,
    "kg_adjacency": q_kg_adjacency,
    "kg_degree": q_kg_degree,
    "kg_triangles": q_kg_triangles,
    "kg_kcore": q_kg_kcore,
    "kg_linkpred": q_kg_linkpred,
    "kg_shortest": q_kg_shortest,
    "kg_pagerank": q_kg_pagerank,
    "kg_ppr": q_kg_ppr,
    "kg_hits": q_kg_hits,
    "kg_clustering": q_kg_clustering,
    "kg_assortativity": q_kg_assortativity,
    "kg_reciprocity": q_kg_reciprocity,
    "kg_components": q_kg_components,
    "kg_2hop": q_kg_2hop,
    "kg_crawl_diff": q_kg_crawl_diff,
    "kg_sections": q_kg_sections,
    "kg_layout_pages": q_kg_layout_pages,
    "entity_pmi": q_entity_pmi,
    "kg_dead_letter": q_kg_dead_letter,
    "host_stats": q_host_stats,
    "kg_captions": q_kg_captions,
    "kg_table_context": q_kg_table_context,
    "dehyphenate": q_dehyphenate,
    "kg_eval_ap": q_kg_eval_ap,
    "kg_eval_prf": q_kg_eval_prf,
    "kg_equations": q_kg_equations,
    "qa_spans": q_qa_spans,
    "rerank_windows": q_rerank_windows,
    "kg_boilerplate": q_kg_boilerplate,
    "kg_tables_cells": q_kg_tables_cells,
    "kg_table_qa": q_kg_table_qa,
    "langid": q_langid,
    "minhash_clusters": q_minhash_clusters,
    "crawl_dedup_index": q_crawl_dedup_index,
    "simhash_pairs": q_simhash_pairs,
    "ivf_topk": q_ivf_topk,
    "pq_topk": q_pq_topk,
    "jw_part_pairs": q_jw_part_pairs,
    "orders_above_cust_avg": q_orders_above_cust_avg,
    "hash_embed_long": q_hash_embed_long,
    "heavy_tokens": q_heavy_tokens,
    "value_trend": q_value_trend,
    "order_zscores": q_order_zscores,
    "cume_dist_chars": q_cume_dist_chars,
    "readability": q_readability,
    "scd2_user_state": q_scd2_user_state,
    "len_quantiles_counted": q_len_quantiles_counted,
    "multi_ols": q_multi_ols,
    "parts_skyline": q_parts_skyline,
    "revenue_gini": q_revenue_gini,
    "ks_lang_lengths": q_ks_lang_lengths,
    "chi2_lang_source": q_chi2_lang_source,
    "mi_lang_source": q_mi_lang_source,
    "locf_purchase": q_locf_purchase,
    "mannwhitney_lengths": q_mannwhitney_lengths,
    "welch_lang_lengths": q_welch_lang_lengths,
    "drift_lang_lengths": q_drift_lang_lengths,
    "trailing_hour_value": q_trailing_hour_value,
    "mann_kendall_hourly": q_mann_kendall_hourly,
    "kendall_qty_discount": q_kendall_qty_discount,
    "theil_sen_hourly": q_theil_sen_hourly,
    "hellinger_lang_lengths": q_hellinger_lang_lengths,
    "anova_chars_by_source": q_anova_chars_by_source,
    "kruskal_chars_by_source": q_kruskal_chars_by_source,
    "auc_price_urgent": q_auc_price_urgent,
    "km_user_survival": q_km_user_survival,
    "logrank_first_purchase": q_logrank_first_purchase,
    "ap_price_urgent": q_ap_price_urgent,
    "calibration_price_urgent": q_calibration_price_urgent,
    "keyness_en": q_keyness_en,
    "motif_view_purchase": q_motif_view_purchase,
    "isotonic_price_urgent": q_isotonic_price_urgent,
    "holt_hourly": q_holt_hourly,
    "ntile_chars": q_ntile_chars,
    "kg_betweenness": q_kg_betweenness,
    "kg_closeness": q_kg_closeness,
    "token_dense_rank": q_token_dense_rank,
    "docs_evolved_union": q_docs_evolved_union,
    "docs_time_travel": q_docs_time_travel,
    "docs_forget": q_docs_forget,
    "docs_upserted": q_docs_upserted,
    "docs_change_feed": q_docs_change_feed,
    "docs_view_incremental": q_docs_view_incremental,
    "events_skew_join": q_events_skew_join,
    "similar_pairs": q_similar_pairs,
    "events_box_scan": q_events_box_scan,
    "fingerprint_lookup": q_fingerprint_lookup,
    "user_event_types": q_user_event_types,
    "dedup_consecutive": q_dedup_consecutive,
    "doc_argmax_chars": q_doc_argmax_chars,
    "kg_negative_samples": q_kg_negative_samples,
    "kg_rule_mining": q_kg_rule_mining,
    "kg_entity_types": q_kg_entity_types,
    "kg_communities": q_kg_communities,
    "kg_modularity": q_kg_modularity,
    "kg_evidence": q_kg_evidence,
    "kg_fact_intervals": q_kg_fact_intervals,
    "kg_pred_functionality": q_kg_pred_functionality,
    "kg_ntriples": q_kg_ntriples,
    "kg_type_violations": q_kg_type_violations,
    "kg_conflicts": q_kg_conflicts,
    "kg_fused_facts": q_kg_fused_facts,
    "kg_nil_entities": q_kg_nil_entities,
    "kg_links": q_kg_links,
    "host_link_graph": q_host_link_graph,
    "host_pagerank": q_host_pagerank,
    "inlink_anchors": q_inlink_anchors,
    "crawl_frontier": q_crawl_frontier,
    "vocab_overlap": q_vocab_overlap,
    "orders_loo_encoding": q_orders_loo_encoding,
    "rare_label_rollup": q_rare_label_rollup,
    "cusum_hourly": q_cusum_hourly,
    "spearman_qty_discount": q_spearman_qty_discount,
    "rolling_median": q_rolling_median,
    "ttr_docs": q_ttr_docs,
    "zipf_slope": q_zipf_slope,
    "markov_stationary": q_markov_stationary,
    "acf_hourly": q_acf_hourly,
    "events_cube": q_events_cube,
    "benford_prices": q_benford_prices,
    "ab_conversion_ztest": q_ab_conversion_ztest,
    "lineitem_unpivot": q_lineitem_unpivot,
    "dsir_weights": q_dsir_weights,
    "canonical_urls": q_canonical_urls,
    "dedup_best_rep": q_dedup_best_rep,
    "alias_usage": q_alias_usage,
    "kg_numeric_facts": q_kg_numeric_facts,
    "anchor_entity_links": q_anchor_entity_links,
    "kg_entity_profile": q_kg_entity_profile,
    "kg_pred_cooccurrence": q_kg_pred_cooccurrence,
    "host_url_sample": q_host_url_sample,
    "autocomplete": q_autocomplete,
    "kg_mention_offsets": q_kg_mention_offsets,
    "image_phash_dups": q_image_phash_dups,
    "entity_trend": q_entity_trend,
    "entity_salience": q_entity_salience,
    "kg_inverse_preds": q_kg_inverse_preds,
    "kb_release": q_kb_release,
    "kg_entity_abstract": q_kg_entity_abstract,
    "kg_measurement_outliers": q_kg_measurement_outliers,
    "kg_fact_sources": q_kg_fact_sources,
    "kg_2hop_store": q_kg_2hop_store,
    "curation_funnel": q_curation_funnel,
    "join_key_overlap": q_join_key_overlap,
    "kg_bfs_tree": q_kg_bfs_tree,
    "kg_rule_infer": q_kg_rule_infer,
    "lang_confusion": q_lang_confusion,
    "lang_kappa": q_lang_kappa,
    "host_politeness": q_host_politeness,
    "compression_quality": q_compression_quality,
    "template_clusters": q_template_clusters,
    "release_validation": q_release_validation,
}

# The driver's correctness sweep checks a PREFIX of QUERIES in insertion
# order. Round-5 rotation (round-4 verdict item #3): rounds 1-4 together
# put 112 of the 285 queries in a driver record; this prefix keeps ~10
# flagship KG anchors and fills the rest with families the driver has
# NEVER checked (retrieval / index-at-rest, state stores, statistics,
# graph analytics, LLM-data ops) — all value-exact oracle rows in the
# full sweep. Everything else keeps its original relative order below.
_DRIVER_PREFIX = [
    # KG construction flagship anchors (extract -> link -> canonicalize
    # -> materialize -> fuse -> release), held from the r4 prefix
    "kg_triples",
    "kg_entities",
    "kg_adjacency",
    "kg_sections",
    "kg_captions",
    "kg_eval_prf",
    "kb_release",
    "release_validation",
    "curation_funnel",
    "minhash_clusters",
    # retrieval / index-at-rest (never driver-checked before r5)
    "exact_substring_dedup",
    "bm25_docs",
    "bm25_index_docs",
    "autocomplete",
    "hybrid_rrf",
    "snippets",
    "boolean_fuzzy",
    # state stores / time travel / change feeds
    "docs_time_travel",
    "docs_change_feed",
    "docs_upserted",
    "docs_view_incremental",
    "docs_evolved_union",
    "events_box_scan",
    "fingerprint_lookup",
    "scd2_user_state",
    "table_checksum",
    "validate_events",
    # statistics
    "multi_ols",
    "km_user_survival",
    "auc_price_urgent",
    "welch_lang_lengths",
    "chi2_lang_source",
    "value_quantiles",
    "cohort_retention",
    "funnel",
    "revenue_gini",
    "rolling_median",
    # graph analytics over the constructed KG
    "kg_triangles",
    "kg_kcore",
    "kg_ppr",
    "kg_hits",
    "kg_2hop",
    # LLM-data-pipeline ops
    "perplexity",
    "nb_lang",
    "contamination",
    "pack_sequences",
    "dsir_weights",
    "similar_pairs",
    # web / link graph
    "host_link_graph",
    "host_pagerank",
]
assert all(k in QUERIES for k in _DRIVER_PREFIX), sorted(
    set(_DRIVER_PREFIX) - set(QUERIES)
)
QUERIES = {
    **{k: QUERIES[k] for k in _DRIVER_PREFIX},
    **{k: v for k, v in QUERIES.items() if k not in set(_DRIVER_PREFIX)},
}

ORACLES = {
    "lineitem_agg": SQL_LINEITEM_AGG,
    "revenue_by_segment": SQL_REVENUE_BY_SEGMENT,
    "order_lineitem_join": SQL_ORDER_LINEITEM_JOIN,
    "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
    "copart_join_revenue": SQL_COPART_JOIN_REVENUE,
    "events_range_scan": SQL_EVENTS_RANGE_SCAN,
    "lineitem_unpivot": SQL_LINEITEM_UNPIVOT,
    "jw_part_pairs": SQL_JW_PART_PAIRS,
    "orders_above_cust_avg": SQL_ORDERS_ABOVE_CUST_AVG,
    "hash_embed_long": SQL_HASH_EMBED_LONG,
    "pca_moments": SQL_PCA_MOMENTS,
    "heavy_tokens": SQL_HEAVY_TOKENS,
    "value_trend": SQL_VALUE_TREND,
    "order_zscores": SQL_ORDER_ZSCORES,
    "cume_dist_chars": SQL_CUME_DIST_CHARS,
    "readability": SQL_READABILITY,
    "scd2_user_state": SQL_SCD2_USER_STATE,
    "len_quantiles_counted": SQL_LEN_QUANTILES_COUNTED,
    "multi_ols": SQL_MULTI_OLS,
    "parts_skyline": SQL_PARTS_SKYLINE,
    "revenue_gini": SQL_REVENUE_GINI,
    "ks_lang_lengths": SQL_KS_LANG_LENGTHS,
    "chi2_lang_source": SQL_CHI2_LANG_SOURCE,
    "mi_lang_source": SQL_MI_LANG_SOURCE,
    "locf_purchase": SQL_LOCF_PURCHASE,
    "mannwhitney_lengths": SQL_MANNWHITNEY_LENGTHS,
    "welch_lang_lengths": SQL_WELCH_LANG_LENGTHS,
    "drift_lang_lengths": SQL_DRIFT_LANG_LENGTHS,
    "trailing_hour_value": SQL_TRAILING_HOUR_VALUE,
    "mann_kendall_hourly": SQL_MANN_KENDALL_HOURLY,
    "kendall_qty_discount": SQL_KENDALL_QTY_DISCOUNT,
    "theil_sen_hourly": SQL_THEIL_SEN_HOURLY,
    "hellinger_lang_lengths": SQL_HELLINGER_LANG_LENGTHS,
    "anova_chars_by_source": SQL_ANOVA_CHARS_BY_SOURCE,
    "kruskal_chars_by_source": SQL_KRUSKAL_CHARS_BY_SOURCE,
    "auc_price_urgent": SQL_AUC_PRICE_URGENT,
    "km_user_survival": SQL_KM_USER_SURVIVAL,
    "logrank_first_purchase": SQL_LOGRANK_FIRST_PURCHASE,
    "ap_price_urgent": SQL_AP_PRICE_URGENT,
    "calibration_price_urgent": SQL_CALIBRATION_PRICE_URGENT,
    "keyness_en": SQL_KEYNESS_EN,
    "motif_view_purchase": SQL_MOTIF_VIEW_PURCHASE,
    "holt_hourly": SQL_HOLT_HOURLY,
    "ntile_chars": SQL_NTILE_CHARS,
    "cusum_hourly": SQL_CUSUM_HOURLY,
    "spearman_qty_discount": SQL_SPEARMAN_QTY_DISCOUNT,
    "rolling_median": SQL_ROLLING_MEDIAN,
    "ttr_docs": SQL_TTR_DOCS,
    "zipf_slope": SQL_ZIPF_SLOPE,
    "markov_stationary": SQL_MARKOV_STATIONARY,
    "acf_hourly": SQL_ACF_HOURLY,
    "events_cube": SQL_EVENTS_CUBE,
    "benford_prices": SQL_BENFORD_PRICES,
    "ab_conversion_ztest": SQL_AB_CONVERSION_ZTEST,
    "key_skew": SQL_KEY_SKEW,
    "source_prior": SQL_SOURCE_PRIOR,
    "peak_concurrency": SQL_PEAK_CONCURRENCY,
    "copurchase_pairs": SQL_COPURCHASE_PAIRS,
    "profile_docs": SQL_PROFILE_DOCS,
    "media_image_features": SQL_MEDIA_IMAGE_FEATURES,
    "media_jpeg_features": SQL_MEDIA_JPEG_FEATURES,
    "image_phash_dups": SQL_IMAGE_PHASH_DUPS,
    "embedding_kmeans": SQL_EMBEDDING_KMEANS,
    "media_audio_features": SQL_MEDIA_AUDIO_FEATURES,
    "media_video_features": SQL_MEDIA_VIDEO_FEATURES,
    "twap_value": SQL_TWAP_VALUE,
    "weekly_growth": SQL_WEEKLY_GROWTH,
    "value_percentiles_cont": SQL_VALUE_PERCENTILES_CONT,
    "dedup_report": SQL_DEDUP_REPORT,
    "gap_quantiles": SQL_GAP_QUANTILES,
    # pca_embed: eigendecomposition (model op) — exact numpy-replay
    # pytest gate instead of SQL (word_vectors convention)
    "top_customers": SQL_TOP_CUSTOMERS,
    "top_customers_page2": SQL_TOP_CUSTOMERS_PAGE2,
    "phrase_search": SQL_PHRASE_SEARCH,
    "substring_lookup": SQL_SUBSTRING_LOOKUP,
    "count_by_lang": SQL_COUNT_BY_LANG,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_hourly_incremental": SQL_EVENTS_HOURLY_INCREMENTAL,
    "order_window_overlaps": SQL_ORDER_WINDOW_OVERLAPS,
    "big_spenders": SQL_BIG_SPENDERS,
    "customer_order_counts": SQL_CUSTOMER_ORDER_COUNTS,
    "customers_no_orders": SQL_CUSTOMERS_NO_ORDERS,
    "distinct_pairs": SQL_DISTINCT_PAIRS,
    "median_order": SQL_MEDIAN_ORDER,
    "top2_orders_per_segment": SQL_TOP2_ORDERS_PER_SEGMENT,
    "region_customers": SQL_REGION_CUSTOMERS,
    "token_counts": SQL_TOKEN_COUNTS,
    "regex_tokens": SQL_REGEX_TOKENS,
    "quality": SQL_QUALITY,
    "fingerprints": SQL_FINGERPRINTS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "ngram_jaccard_adjacent": SQL_NGRAM_JACCARD_ADJACENT,
    "events_latest": SQL_EVENTS_LATEST,
    "sessionize": SQL_SESSIONIZE,
    "user_cumsum": SQL_USER_CUMSUM,
    "rolling_value": SQL_ROLLING_VALUE,
    "fuzzy_parts": SQL_FUZZY_PARTS,
    "lineitem_corr": SQL_LINEITEM_CORR,
    "session_stats": SQL_SESSION_STATS,
    "mad_outlier_days": SQL_MAD_OUTLIER_DAYS,
    "order_quartiles": SQL_ORDER_QUARTILES,
    "winsorized_values": SQL_WINSORIZED_VALUES,
    "user_modal_type": SQL_USER_MODAL_TYPE,
    "assoc_rules": SQL_ASSOC_RULES,
    "seasonal_naive": SQL_SEASONAL_NAIVE,
    "source_entropy": SQL_SOURCE_ENTROPY,
    "balanced_docs": SQL_BALANCED_DOCS,
    "user_growth": SQL_USER_GROWTH,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "revenue_share": SQL_REVENUE_SHARE,
    "user_paths": SQL_USER_PATHS,
    "scaled_lengths": SQL_SCALED_LENGTHS,
    "ewma_value": SQL_EWMA_VALUE,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "distinct_users_kmv": SQL_DISTINCT_USERS_KMV,
    "weekly_users_kmv": SQL_WEEKLY_USERS_KMV,
    "fuzzy_clusters": SQL_FUZZY_CLUSTERS,
    "docs_merged": SQL_DOCS_MERGED,
    "event_attribution": SQL_EVENT_ATTRIBUTION,
    "error_burst": SQL_ERROR_BURST,
    "bm25_docs": SQL_BM25_DOCS,
    "boolean_query": _sql_boolean_query(_BOOLEAN_QUERY, 10),
    "boolean_fuzzy": _sql_boolean_query(_BOOLEAN_FUZZY_QUERY, 10),
    "fuzzy_search": SQL_FUZZY_SEARCH,
    "bm25_index_docs": SQL_BM25_DOCS,
    "snippets": SQL_SNIPPETS,
    "mixture_weights": SQL_MIXTURE_WEIGHTS,
    "token_budget": SQL_TOKEN_BUDGET,
    "event_pivot": SQL_EVENT_PIVOT,
    "hybrid_rrf": SQL_HYBRID_RRF,
    "stratified_docs": SQL_STRATIFIED_DOCS,
    "hopping_counts": SQL_HOPPING_COUNTS,
    "hopping_distinct_users": SQL_HOPPING_DISTINCT_USERS,
    "user_key_moments": SQL_USER_KEY_MOMENTS,
    "watermarked_counts": SQL_WATERMARKED_COUNTS,
    "distinct_users_daily": SQL_DISTINCT_USERS_DAILY,
    "top_terms_by_lang": SQL_TOP_TERMS_BY_LANG,
    "value_quantiles": SQL_VALUE_QUANTILES,
    "value_quantiles_sketch": SQL_VALUE_QUANTILES_SKETCH,
    "props_k_by_type": SQL_PROPS_K_BY_TYPE,
    "curate_docs": SQL_CURATE_DOCS,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "contamination": SQL_CONTAMINATION,
    "shuffle_shards": SQL_SHUFFLE_SHARDS,
    "dup_ngram_frac": SQL_DUP_NGRAM_FRAC,
    "tfidf_keywords": SQL_TFIDF_KEYWORDS,
    "redact_pii": SQL_REDACT_PII,
    "perplexity": SQL_PERPLEXITY,
    "nb_lang": SQL_NB_LANG,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "doc_splits": SQL_DOC_SPLITS,
    "event_gaps": SQL_EVENT_GAPS,
    "cohort_retention": SQL_COHORT_RETENTION,
    "table_checksum": SQL_TABLE_CHECKSUM,
    "validate_events": SQL_VALIDATE_EVENTS,
    "funnel": SQL_FUNNEL,
    "daily_anomalies": SQL_DAILY_ANOMALIES,
    "repetition_stats": SQL_REPETITION_STATS,
    "vocab_counts": SQL_VOCAB_COUNTS,
    "embedding_topk": SQL_EMBEDDING_TOPK,
    "class_centroids": SQL_CLASS_CENTROIDS,
    "centroid_assign": SQL_CENTROID_ASSIGN,
    "knn_join": SQL_KNN_JOIN,
    "percent_rank": SQL_PERCENT_RANK,
    "events_rollup": SQL_EVENTS_ROLLUP,
    "char_outliers": SQL_CHAR_OUTLIERS,
    "doc_triples": SQL_DOC_TRIPLES,
    "doc_adjacency": SQL_DOC_ADJACENCY,
    "doc_windows": SQL_DOC_WINDOWS,
    "dehyphenate": SQL_DEHYPHENATE,
    "qa_spans": SQL_QA_SPANS,
    # kg_* family: DuckDB reconstructs the goldens from `documents` via
    # the arithmetic-deterministic generator (oracle_gen.py)
    "kg_triples": SQL_KG_TRIPLES,
    "kg_entities": SQL_KG_ENTITIES,
    "kg_adjacency": SQL_KG_ADJACENCY,
    "kg_degree": SQL_KG_DEGREE,
    "kg_triangles": SQL_KG_TRIANGLES,
    "kg_kcore": SQL_KG_KCORE,
    "kg_closeness": SQL_KG_CLOSENESS,
    "kg_betweenness": SQL_KG_BETWEENNESS,
    "token_dense_rank": SQL_TOKEN_DENSE_RANK,
    "docs_evolved_union": SQL_DOCS_EVOLVED_UNION,
    "docs_time_travel": SQL_DOCS_TIME_TRAVEL,
    "docs_forget": SQL_DOCS_FORGET,
    "docs_upserted": SQL_DOCS_UPSERTED,
    "docs_change_feed": SQL_DOCS_CHANGE_FEED,
    "docs_view_incremental": SQL_DOCS_VIEW_INCREMENTAL,
    "events_skew_join": SQL_EVENTS_SKEW_JOIN,
    "similar_pairs": SQL_SIMILAR_PAIRS,
    "events_box_scan": SQL_EVENTS_BOX_SCAN,
    "fingerprint_lookup": SQL_FINGERPRINT_LOOKUP,
    "user_event_types": SQL_USER_EVENT_TYPES,
    "dedup_consecutive": SQL_DEDUP_CONSECUTIVE,
    "doc_argmax_chars": SQL_DOC_ARGMAX_CHARS,
    "kg_negative_samples": SQL_KG_NEGATIVE_SAMPLES,
    "kg_rule_mining": SQL_KG_RULE_MINING,
    "kg_entity_types": SQL_KG_ENTITY_TYPES,
    "kg_communities": SQL_KG_COMMUNITIES,
    "kg_modularity": SQL_KG_MODULARITY,
    "kg_evidence": SQL_KG_EVIDENCE,
    "kg_fact_intervals": SQL_KG_FACT_INTERVALS,
    "kg_pred_functionality": SQL_KG_PRED_FUNCTIONALITY,
    "kg_ntriples": SQL_KG_NTRIPLES,
    "kg_type_violations": SQL_KG_TYPE_VIOLATIONS,
    "kg_conflicts": SQL_KG_CONFLICTS,
    "kg_fused_facts": SQL_KG_FUSED_FACTS,
    "kg_nil_entities": SQL_KG_NIL_ENTITIES,
    "kg_links": SQL_KG_LINKS,
    "host_link_graph": SQL_HOST_LINK_GRAPH,
    "host_pagerank": SQL_HOST_PAGERANK,
    "inlink_anchors": SQL_INLINK_ANCHORS,
    "crawl_frontier": SQL_CRAWL_FRONTIER,
    "vocab_overlap": SQL_VOCAB_OVERLAP,
    "orders_loo_encoding": SQL_ORDERS_LOO_ENCODING,
    "rare_label_rollup": SQL_RARE_LABEL_ROLLUP,
    "kg_linkpred": SQL_KG_LINKPRED,
    "kg_shortest": SQL_KG_SHORTEST,
    "kg_pagerank": SQL_KG_PAGERANK,
    "kg_ppr": SQL_KG_PPR,
    "kg_hits": SQL_KG_HITS,
    "kg_clustering": SQL_KG_CLUSTERING,
    "kg_assortativity": SQL_KG_ASSORTATIVITY,
    "kg_reciprocity": SQL_KG_RECIPROCITY,
    "kg_components": SQL_KG_COMPONENTS,
    "kg_2hop": SQL_KG_2HOP,
    "kg_crawl_diff": SQL_KG_CRAWL_DIFF,
    "kg_sections": SQL_KG_SECTIONS,
    "kg_layout_pages": SQL_KG_LAYOUT_PAGES,
    "entity_pmi": SQL_ENTITY_PMI,
    "kg_dead_letter": SQL_KG_DEAD_LETTER,
    "host_stats": SQL_HOST_STATS,
    "kg_captions": SQL_KG_CAPTIONS,
    "kg_table_context": SQL_KG_TABLE_CONTEXT,
    "kg_boilerplate": SQL_KG_BOILERPLATE,
    "kg_tables_cells": SQL_KG_TABLES_CELLS,
    "kg_table_qa": SQL_KG_TABLE_QA,
    "kg_equations": SQL_KG_EQUATIONS,
    "kg_eval_ap": SQL_KG_EVAL_AP,
    "kg_eval_prf": SQL_KG_EVAL_PRF,
    "langid": SQL_LANGID,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "minhash_clusters": SQL_MINHASH_CLUSTERS,
    "crawl_dedup_index": SQL_CRAWL_DEDUP_INDEX,
    "rolling_fp": SQL_ROLLING_FP,
    "cdc_chunks": SQL_CDC_CHUNKS,
    "subdoc_dedup": SQL_SUBDOC_DEDUP,
    "exact_substring_dedup": SQL_EXACT_SUBSTRING_DEDUP,
    "rerank_windows": SQL_RERANK_WINDOWS,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "canonical_urls": SQL_CANONICAL_URLS,
    "dedup_best_rep": SQL_DEDUP_BEST_REP,
    "mmr_rerank": SQL_MMR_RERANK,
    "alias_usage": SQL_ALIAS_USAGE,
    "kg_numeric_facts": SQL_KG_NUMERIC_FACTS,
    "anchor_entity_links": SQL_ANCHOR_ENTITY_LINKS,
    "kg_entity_profile": SQL_KG_ENTITY_PROFILE,
    "kg_pred_cooccurrence": SQL_KG_PRED_COOCCURRENCE,
    "host_url_sample": SQL_HOST_URL_SAMPLE,
    "autocomplete": SQL_AUTOCOMPLETE,
    "kg_mention_offsets": SQL_KG_MENTION_OFFSETS,
    "entity_trend": SQL_ENTITY_TREND,
    "entity_salience": SQL_ENTITY_SALIENCE,
    "kg_inverse_preds": SQL_KG_INVERSE_PREDS,
    "kb_release": SQL_KB_RELEASE,
    "kg_entity_abstract": SQL_KG_ENTITY_ABSTRACT,
    "kg_measurement_outliers": SQL_KG_MEASUREMENT_OUTLIERS,
    "kg_fact_sources": SQL_KG_FACT_SOURCES,
    "kg_2hop_store": SQL_KG_2HOP_STORE,
    "curation_funnel": SQL_CURATION_FUNNEL,
    "join_key_overlap": SQL_JOIN_KEY_OVERLAP,
    "kg_bfs_tree": SQL_KG_BFS_TREE,
    "kg_rule_infer": SQL_KG_RULE_INFER,
    "lang_confusion": SQL_LANG_CONFUSION,
    "lang_kappa": SQL_LANG_KAPPA,
    "host_politeness": SQL_HOST_POLITENESS,
    "template_clusters": SQL_TEMPLATE_CLUSTERS,
    "release_validation": SQL_RELEASE_VALIDATION,
    # word_vectors, embed_docs, ivf_topk: genuinely non-SQL (SVD model
    # state / float accumulation order / seeded approximate index);
    # exact pytest goldens hold those gates
}
