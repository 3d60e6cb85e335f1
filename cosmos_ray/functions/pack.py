"""Sequence packing for pretraining: concatenate the corpus token
stream in doc_id order and chunk it into fixed-length training
sequences (GPT-style packing). Each doc is mapped to the sequence range
it lands in — the table a loader needs to build packed batches without
ever materializing the concatenated stream.

Scale shape (global ordered cumsum without a global sort):
- pass 1: per-bucket (doc_id // bucket_span) token totals — a tiny
  groupby whose row count is |id range| / bucket_span;
- driver: exclusive prefix over the ordered bucket totals (model-sized);
- pass 2: one bucketed pass computes each doc's global cumulative
  offset as bucket_prefix + within-bucket cumsum (vectorized), then the
  sequence arithmetic. The exchange never carries text or tokens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(docs_ds, seq_len: int = 512, bucket_span: int = 1024,
                   id_col: str = "doc_id", text_col: str = "text"):
    """-> (doc_id, n_tokens, start_offset, first_seq, last_seq) where
    start_offset is the doc's first token position in the concatenated
    doc_id-ordered stream, and [first_seq, last_seq] the range of
    ``seq_len``-token sequences it overlaps. Empty docs occupy no
    sequence (last_seq = first_seq - 1 convention is avoided: they get
    first_seq = last_seq = the sequence their offset falls in)."""
    import ray

    from ray.data.aggregate import Sum

    from cosmos_ray.queries.relational import bucketed_group_apply

    def count_tokens(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), " ")
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
            "__bucket_id": pc.divide(t.column(id_col).cast(pa.int64()),
                                     pa.scalar(bucket_span)),
        })

    counted = docs_ds.select_columns([id_col, text_col]).map_batches(
        count_tokens, batch_format="pyarrow").materialize()

    totals = (counted.select_columns(["__bucket_id", "n_tokens"])
              .groupby("__bucket_id").aggregate(Sum("n_tokens", alias_name="t"))
              .to_pandas().sort_values("__bucket_id"))
    prefix = np.concatenate(([0], np.cumsum(totals["t"].to_numpy())[:-1]))
    bucket_prefix = dict(zip(totals["__bucket_id"].tolist(), prefix.tolist()))
    bp_ref = ray.put(bucket_prefix)

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        bp = ray.get(bp_ref)
        g = g.sort_values(id_col, kind="stable")
        n = g["n_tokens"].to_numpy()
        cum = np.cumsum(n) - n + bp[int(g["__bucket_id"].iloc[0])]
        first = cum // seq_len
        last = np.maximum(first, (cum + np.maximum(n, 1) - 1) // seq_len)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "n_tokens": n,
            "start_offset": cum,
            "first_seq": first.astype(np.int64),
            "last_seq": last.astype(np.int64),
        })

    return bucketed_group_apply(counted, ["__bucket_id"], offsets)


# ------------------------------------------------- shuffle-and-shard export
def shuffle_shards(docs_ds, n_shards: int = 8, seed: str = "s0",
                   id_col: str = "doc_id", num_buckets: int = 64):
    """Deterministic global shuffle plan for training-data export:
    (doc_id, shard, pos) where shard = md5(seed:doc_id) % n_shards and
    pos is the doc's rank inside its shard under the md5 order — a
    seedable uniform permutation ANY engine reproduces exactly (the
    stratified_sample md5-draw convention; `ds.random_shuffle` is not
    replayable and moves full rows, this moves ids only).

    Scale shape: the exchange carries (id, hash) pairs; text/payload
    columns never move. The pos rank is an in-bucket vectorized sort via
    `bucketed_group_apply` over the shard key."""
    import hashlib

    from cosmos_ray.queries.relational import bucketed_group_apply

    def hashes(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        # md5_number_upper parity: first 8 digest bytes, little-endian
        h = [int.from_bytes(
                hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "little")
             for i in ids]
        hs = np.array(h, dtype=np.uint64)
        return pa.table({
            id_col: t.column(id_col),
            "__h": pa.array(hs, pa.uint64()),
            "shard": pa.array((hs % np.uint64(n_shards)).astype(np.int64),
                              pa.int64()),
        })

    hashed = docs_ds.select_columns([id_col]).map_batches(
        hashes, batch_format="pyarrow")

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", id_col], kind="stable").reset_index(drop=True)
        return pd.DataFrame({
            id_col: g[id_col],
            "shard": g["shard"],
            "pos": np.arange(len(g), dtype=np.int64),
        })

    return bucketed_group_apply(hashed, ["shard"], rank,
                                num_buckets=num_buckets)


def export_training_shards(docs_ds, out_dir: str, n_shards: int = 8,
                           seed: str = "s0", id_col: str = "doc_id"):
    """Write the corpus as ``shard=K/`` hive-partitioned parquet under
    the deterministic shuffle plan (`shuffle_shards`). Payload rows gain
    (shard, sort_key); a loader reads one shard directory per worker and
    sorts by sort_key — no global sort, no full-row shuffle beyond the
    partitioned write itself. Re-running is idempotent (same hash, same
    layout), which is the resume story."""
    import hashlib
    import os

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        h = [int.from_bytes(
                hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "little")
             for i in ids]
        hs = np.array(h, dtype=np.uint64)
        return (t.append_column("shard",
                                pa.array((hs % np.uint64(n_shards)).astype(np.int64),
                                         pa.int64()))
                 .append_column("sort_key", pa.array(hs, pa.uint64())))

    os.makedirs(out_dir, exist_ok=True)
    tagged = docs_ds.map_batches(tag, batch_format="pyarrow")
    tagged.write_parquet(out_dir, partition_cols=["shard"], mode="overwrite")
    return out_dir


def assign_splits(ds, id_col: str = "doc_id", seed: str = "sp0",
                  train: int = 900, val: int = 950):
    """Deterministic train/val/test assignment: draw = md5(seed:id) %
    1000; < ``train`` -> 'train', < ``val`` -> 'val', else 'test'. The
    standard leakage-safe split for training-data exports — stable
    across runs, engines and re-shards because the draw depends only on
    the id (the shuffle_shards md5 convention); a stateless map, no
    exchange. -> (id, draw, split)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        h = np.array([int.from_bytes(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "little")
            for i in ids], dtype=np.uint64)
        d = (h % np.uint64(1000)).astype(np.int64)
        split = np.where(d < train, "train", np.where(d < val, "val", "test"))
        return pa.table({
            id_col: t.column(id_col),
            "draw": pa.array(d, pa.int64()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    return ds.select_columns([id_col]).map_batches(f, batch_format="pyarrow")


def token_budget_sample(docs_ds, budget: int, group_col: str = "source",
                        id_col: str = "doc_id", text_col: str = "text",
                        num_buckets: int = 64):
    """Data-mixture construction: per ``group_col`` (data source), keep
    documents in the deterministic md5-of-id order until the group's
    running token total would exceed ``budget`` — the standard
    "N tokens per source" sampling step when assembling a pretraining
    mix. A doc is kept iff its INCLUSIVE running sum <= budget (so one
    doc larger than the whole budget is dropped, and document order is
    an engine-replayable uniform draw, not a PRNG). -> (doc_id, source,
    n_tokens, cum_tokens).

    Scale shape: token counts are computed vectorized per batch; only
    (id, group, n_tokens) enter the one coarse group-hash exchange; the
    in-group order + cumsum is vectorized numpy."""
    import hashlib

    import pyarrow.compute as pc

    from cosmos_ray.queries.relational import bucketed_group_apply

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(t.column(text_col), " ")).cast(pa.int64())
        return pa.table({id_col: t.column(id_col),
                         group_col: t.column(group_col),
                         "n_tokens": toks})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(x).encode()).hexdigest()
             for x in g[id_col].tolist()]
        g = g.assign(__h=h).sort_values(["__h", id_col], kind="stable")
        cum = g["n_tokens"].to_numpy().cumsum()
        keep = cum <= budget
        out = g.loc[keep, [id_col, group_col, "n_tokens"]].copy()
        out["cum_tokens"] = cum[keep]
        return out.reset_index(drop=True)

    slim = docs_ds.select_columns([id_col, group_col, text_col]).map_batches(
        counts, batch_format="pyarrow")
    return bucketed_group_apply(slim, [group_col], pick,
                                num_buckets=num_buckets)
