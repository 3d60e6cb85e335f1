"""Relational query primitives, Ray-Data-first.

The reference's "retrieval" layer is filtered search + top-k + counts +
a parent/child join index (`elastic_retriever.py:228-342,615-629`); in
batch form those are Dataset filters, joins, sorts and aggregates. The
helpers here encode the scale idioms:

- ``read``: column-pruned parquet reads (prune at the read).
- ``broadcast_join``: small-side hash join without a shuffle — the small
  table is ``ray.put`` once and each batch does a vectorized lookup
  (dimension tables, key sets). The big side never moves.
- ``semi_join_filter``: broadcast key-set membership filter.
Large-large joins use ``Dataset.join`` (hash-partitioned) directly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def read(sf_dir: str, name: str, columns: list[str] | None = None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def broadcast_join(big_ds, small_table: pa.Table, key: str, add_cols: list[str],
                   big_key: str | None = None):
    """Append ``add_cols`` from the small side to every big-side row by
    key lookup. Inner-join semantics (rows without a match are dropped)."""
    big_key = big_key or key
    small_df = small_table.to_pandas().set_index(key)[add_cols]
    ref = ray.put(small_df)

    class Lookup:
        def __init__(self, ref=None) -> None:
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.merge(
                self.small, left_on=big_key, right_index=True, how="inner", sort=False
            )
            return out

    return big_ds.map_batches(Lookup, fn_constructor_kwargs={"ref": ref},
                              batch_format="pandas", batch_size=32768, concurrency=(1, 4))


def semi_join_filter(big_ds, keys: set, key_col: str, keep: bool = True):
    """Broadcast semi/anti join: filter big rows by key-set membership."""
    ref = ray.put(np.array(sorted(keys)))

    class Member:
        def __init__(self, ref=None) -> None:
            import pyarrow.compute as pc

            self.keys = pa.array(ray.get(ref))
            self.pc = pc

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = self.pc.is_in(batch.column(key_col), value_set=self.keys)
            if not keep:
                mask = self.pc.invert(mask)
            return batch.filter(mask)

    return big_ds.map_batches(Member, fn_constructor_kwargs={"ref": ref},
                              batch_format="pyarrow", concurrency=(1, 4))


def topk(ds, sort_cols: list[tuple[str, bool]], k: int):
    """Global top-k: sort (Ray's distributed sample-sort) + limit.
    sort_cols: [(col, descending)]."""
    keys = [c for c, _ in sort_cols]
    desc = [d for _, d in sort_cols]
    return ds.sort(keys, descending=desc).limit(k)
