"""Co-partitioned at-rest joins: the shuffle-free join for tables that
will be joined on the same key again and again.

At 100-TB scale the dominant cost of a repeated large-large join is
re-shuffling both sides every run. The standard fix (Hive/Iceberg
bucketing, Spark bucketed tables) is to pay the exchange ONCE at write
time: hash the join key into K buckets and store each side as
``bucket=<k>/`` hive partitions. Any later join then runs as K
independent bucket-local joins — each task reads bucket k of both
sides and merges in memory; no network exchange, no sort, and adding
nodes splits the K tasks across them (K should be sized to several ×
cluster cores).

``write_bucketed``   one hash exchange -> hive ``bucket=K/`` layout
``join_copartitioned``  K bucket-local pandas merges, zero shuffle
(the bucket hash must match on both sides — it is the same stable
``pd.util.hash_array`` both write paths share).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket_of(vals: np.ndarray, num_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(vals) % np.uint64(num_buckets)).astype(np.int64)


def write_bucketed(ds, key: str, out_dir: str, num_buckets: int = 32):
    """Write ``ds`` as hive ``bucket=<k>/`` partitions by stable hash of
    ``key`` — the one-time exchange that makes every later join on
    ``key`` shuffle-free."""

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column(key).to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(_bucket_of(v, num_buckets)))

    (ds.map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["bucket"]))
    return out_dir


def join_copartitioned(dir_a: str, dir_b: str, key_a: str, key_b: str,
                       num_buckets: int = 32):
    """Inner join of two bucket-aligned at-rest tables WITHOUT a
    shuffle: a Dataset of K bucket ids fans out one task per bucket;
    each task reads ONLY ``bucket=k`` of both sides (disk-level
    partition pruning) and merges locally. -> Dataset of joined rows.

    The per-bucket merge holds one bucket of each side in task memory —
    size K so a bucket fits a worker (same contract as any bucketed
    hash join's partition count)."""
    import ray.data as rd

    ids = rd.from_arrow(pa.table({"bucket": pa.array(range(num_buckets),
                                                     pa.int64())}))

    def _empty_joined() -> pa.Table:
        import pyarrow.parquet as pq

        # typed empty result (a zero-schema block poisons downstream ops)
        fa = sorted(glob.glob(os.path.join(dir_a, "bucket=*", "*.parquet")))
        fb = sorted(glob.glob(os.path.join(dir_b, "bucket=*", "*.parquet")))
        da = pq.read_schema(fa[0]).empty_table().to_pandas()
        db = pq.read_schema(fb[0]).empty_table().to_pandas()
        m = da.merge(db, left_on=key_a, right_on=key_b, how="inner")
        return pa.Table.from_pandas(m, preserve_index=False)

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = []
        for k in t.column("bucket").to_pylist():
            fa = sorted(glob.glob(os.path.join(dir_a, f"bucket={k}", "*.parquet")))
            fb = sorted(glob.glob(os.path.join(dir_b, f"bucket={k}", "*.parquet")))
            if not fa or not fb:
                continue
            da = pq.read_table(fa).to_pandas()
            db = pq.read_table(fb).to_pandas()
            m = da.merge(db, left_on=key_a, right_on=key_b, how="inner")
            if len(m):
                out.append(pa.Table.from_pandas(m, preserve_index=False))
        if not out:
            return _empty_joined()
        return pa.concat_tables(out, promote_options="default")

    # one bucket id per task: override block granularity via repartition
    return ids.repartition(num_buckets).map_batches(
        join_bucket, batch_format="pyarrow")
