"""Z-order (Morton-curve) clustered storage — the at-rest layout for
MULTI-dimensional box scans, complementing `sorted_store` (1-D ranges).

``write_zordered`` interleaves the bits of two rank-quantized key
columns into one 64-bit Morton code, pays ONE distributed sort on it,
and writes contiguous parquet partitions (worker-side writes). Because
the curve keeps 2-D-close rows in the same files, the per-file
[min, max] bounds of BOTH columns (taken from parquet footer statistics
— a metadata-only pass) are tight, and ``read_box`` opens only files
whose 2-D bounding box intersects the query box, with an exact residual
filter. Pruning CORRECTNESS never depends on the quantization (the
manifest stores true per-file value bounds); quantization only shapes
locality. The manifest is written last via atomic rename
(`sorted_store` discipline).

This is the Delta/Iceberg ``ZORDER BY`` analog for the 100-TB events
table: a (user range x value range) probe touches a handful of files
instead of a full scan down either single-column layout."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cosmos_ray.state.sorted_store import _file_bounds, _json_key

_QBITS = 31  # quantization width per dimension (float64-exact)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 32 bits of each uint64 value
    (classic Morton magic masks), vectorized."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _quantize(col: pa.ChunkedArray | pa.Array, lo: float, hi: float) -> np.ndarray:
    """Monotone map of values into [0, 2^_QBITS): rank-preserving scale
    over the GLOBAL [lo, hi] range; nulls place at 0 (they can never
    satisfy a box predicate, so placement is arbitrary)."""
    if pa.types.is_timestamp(col.type):
        # arrow has no timestamp->float cast; epoch-us int64 first
        col = col.cast(pa.int64())
    v = np.asarray(col.cast(pa.float64()).fill_null(lo).to_numpy(
        zero_copy_only=False), dtype=np.float64)
    span = hi - lo
    if span <= 0:
        return np.zeros(len(v), dtype=np.uint64)
    q = (v - lo) / span * float((1 << _QBITS) - 1)
    return np.clip(q, 0, (1 << _QBITS) - 1).astype(np.uint64)


def write_zordered(ds, cols: tuple[str, str], out_dir: str,
                   num_partitions: int = 16) -> dict:
    """Cluster ``ds`` on the Morton order of ``cols`` (two numeric or
    timestamp columns) and write parquet + a 2-D zone-map manifest.
    Returns the manifest dict."""
    from ray.data.aggregate import Max, Min

    c0, c1 = cols
    os.makedirs(out_dir, exist_ok=True)
    stats = ds.aggregate(Min(c0, alias_name="lo0"), Max(c0, alias_name="hi0"),
                         Min(c1, alias_name="lo1"), Max(c1, alias_name="hi1"))
    # an all-null key column has no range: span 0 places every row at 0
    rng = {k: _to_float(stats[k]) if stats[k] is not None else 0.0
           for k in ("lo0", "hi0", "lo1", "hi1")}

    def add_z(t: pa.Table) -> pa.Table:
        q0 = _quantize(t.column(c0), rng["lo0"], rng["hi0"])
        q1 = _quantize(t.column(c1), rng["lo1"], rng["hi1"])
        z = _spread_bits(q0) | (_spread_bits(q1) << np.uint64(1))
        return t.append_column("__z", pa.array(z, pa.uint64()))

    (ds.map_batches(add_z, batch_format="pyarrow")
       .sort("__z").repartition(num_partitions)
       .drop_columns(["__z"]).write_parquet(out_dir))

    zones = []
    for p in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
        lo0, hi0, rows = _file_bounds(p, c0)
        lo1, hi1, _ = _file_bounds(p, c1)
        if rows:
            zones.append({"file": os.path.basename(p), "rows": rows,
                          "min0": _json_key(lo0), "max0": _json_key(hi0),
                          "min1": _json_key(lo1), "max1": _json_key(hi1)})
    manifest = {"cols": [c0, c1], "zones": zones}
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, default=str)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def _to_float(v) -> float:
    import datetime

    if isinstance(v, datetime.datetime):
        return float(_json_key(v))
    return float(v)


def pruned_box_files(store_dir: str, box: tuple) -> list[str]:
    """Files whose per-file 2-D bounds intersect ``box`` =
    (lo0, hi0, lo1, hi1) in the manifest's key domains."""
    lo0, hi0, lo1, hi1 = box
    with open(os.path.join(store_dir, "manifest.json")) as f:
        manifest = json.load(f)
    def hits(z) -> bool:
        # null bounds = the file's key column is entirely null there
        # (parquet stats ignore nulls): no row can satisfy a box
        # predicate, so the file never intersects
        if any(z[k] is None for k in ("min0", "max0", "min1", "max1")):
            return False
        return not (z["max0"] < lo0 or z["min0"] > hi0
                    or z["max1"] < lo1 or z["min1"] > hi1)

    return [z["file"] for z in manifest["zones"] if hits(z)]


def read_box(store_dir: str, box: tuple, scalars: tuple | None = None):
    """Dataset of rows inside the 2-D box: manifest-pruned reads + exact
    residual filter. ``scalars`` optionally maps manifest-domain bounds
    back to arrow scalars (timestamp keys), like `read_range`."""
    import pyarrow.parquet as pq
    import ray.data as rd

    with open(os.path.join(store_dir, "manifest.json")) as f:
        manifest = json.load(f)
    c0, c1 = manifest["cols"]
    hit = pruned_box_files(store_dir, box)
    if not hit:
        any_file = glob.glob(os.path.join(store_dir, "*.parquet"))
        return rd.from_arrow(pq.read_schema(any_file[0]).empty_table())
    ds = rd.read_parquet([os.path.join(store_dir, f) for f in hit])
    b = scalars if scalars is not None else box
    lo0, hi0, lo1, hi1 = b

    def residual(t: pa.Table) -> pa.Table:
        a, c = t.column(c0), t.column(c1)
        keep = pc.and_(
            pc.and_(pc.greater_equal(a, pa.scalar(lo0)),
                    pc.less_equal(a, pa.scalar(hi0))),
            pc.and_(pc.greater_equal(c, pa.scalar(lo1)),
                    pc.less_equal(c, pa.scalar(hi1))))
        return t.filter(keep)

    return ds.map_batches(residual, batch_format="pyarrow")
