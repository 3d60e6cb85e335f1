"""File-level bloom index — point-lookup pruning on columns the table
is NOT sorted or clustered by (zone maps need ordering; blooms don't).

``build_bloom_index`` scans an existing parquet directory ONCE with a
distributed column-pruned read (`include_paths=True`, so each batch
knows its file), folds each file's key column into a packed bloom
bitmap (`relational._bloom_indices` double hashing — the same family
the bloom semi-join tier uses), and writes a file→bitmap manifest via
atomic rename. The driver only ever holds one bitmap per FILE
(manifest-sized state, the `sorted_store` footer-pass discipline).

``read_point`` tests the probe against each file's bitmap and reads
ONLY hit files plus an exact equality residual: false positives cost
extra file reads, never wrong rows; false negatives cannot happen.

The 100-TB use: content-addressed lookups (find the document with this
fingerprint / url hash) over a corpus laid out by crawl order — a
handful of file opens instead of a full scan, with no re-sort of the
corpus required."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from cosmos_ray.queries.relational import (_bloom_indices, _key_np,
                                           _key_np_scalar)


def build_bloom_index(store_dir: str, col: str, m_bits: int = 1 << 19,
                      k_hashes: int = 4) -> dict:
    """One distributed pass over ``store_dir``'s parquet files →
    ``bloom_index_<col>.json`` manifest of per-file hex bitmaps."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(store_dir, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {store_dir!r}")
    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        paths = t.column("path").to_pylist()
        vals = _key_np(t.column(col))
        out_p, out_w = [], []
        df = pd.DataFrame({"p": paths})
        for p, g in df.groupby("p"):
            idx = _bloom_indices(vals[g.index.to_numpy()], m_bits, k_hashes)
            w = np.zeros(words, np.uint64)
            flat = idx.reshape(-1)
            np.bitwise_or.at(w, flat >> 6,
                             np.uint64(1) << (flat & 63).astype(np.uint64))
            out_p.append(os.path.basename(p))
            out_w.append(w)
        return pa.table({"file": pa.array(out_p, pa.string()),
                         "w": pa.array([x.tolist() for x in out_w],
                                       pa.list_(pa.uint64()))})

    import pyarrow.parquet as pq

    ctype = pq.read_schema(files[0]).field(col).type
    kind = ("int" if pa.types.is_integer(ctype)
            else "float" if pa.types.is_floating(ctype) else "str")
    ds = rd.read_parquet(files, columns=[col], include_paths=True)
    bitmaps: dict[str, np.ndarray] = {}
    # one row per (batch, file): file-count-bounded driver state
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for f, w in zip(b.column("file").to_pylist(),
                        b.column("w").to_pylist()):
            acc = bitmaps.setdefault(f, np.zeros(words, np.uint64))
            np.bitwise_or(acc, np.asarray(w, np.uint64), out=acc)
    manifest = {
        "col": col, "kind": kind, "m_bits": m_bits, "k_hashes": k_hashes,
        "files": {f: w.tobytes().hex() for f, w in sorted(bitmaps.items())},
    }
    tmp = os.path.join(store_dir, f"_bloom_index_{col}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(store_dir, f"bloom_index_{col}.json"))
    return manifest


def _load(store_dir: str, col: str) -> dict:
    with open(os.path.join(store_dir, f"bloom_index_{col}.json")) as f:
        return json.load(f)


def lookup_files(store_dir: str, col: str, value) -> list[str]:
    """Files whose bloom bitmap hits ``value`` (superset of the files
    actually containing it)."""
    m = _load(store_dir, col)
    # coerce the probe to the COLUMN's canonical hash family recorded at
    # build time (int64/float64/object — `_key_np` discipline): a Python
    # int probing a float column must hash as float64 or the bloom
    # false-negatives silently
    kind = m.get("kind", "str")
    if kind == "int":
        probe = np.asarray([int(value)], dtype=np.int64)
    elif kind == "float":
        probe = np.asarray([float(value)], dtype=np.float64)
    else:
        probe = _key_np_scalar(str(value))
    idx = _bloom_indices(probe, m["m_bits"], m["k_hashes"])[0]
    hits = []
    for f, hexw in m["files"].items():
        w = np.frombuffer(bytes.fromhex(hexw), np.uint64)
        if all((int(w[i >> 6]) >> (int(i) & 63)) & 1 for i in idx):
            hits.append(f)
    return hits


def read_point(store_dir: str, col: str, value):
    """Dataset of rows with ``col == value``: bloom-pruned file reads
    plus the exact equality residual."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    kind = _load(store_dir, col).get("kind", "str")
    value = (int(value) if kind == "int"
             else float(value) if kind == "float" else str(value))
    hit = lookup_files(store_dir, col, value)
    if not hit:
        any_file = glob.glob(os.path.join(store_dir, "*.parquet"))
        return rd.from_arrow(pq.read_schema(any_file[0]).empty_table())
    ds = rd.read_parquet([os.path.join(store_dir, f) for f in hit])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column(col), pa.scalar(value))),
        batch_format="pyarrow")
