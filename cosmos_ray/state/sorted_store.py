"""Range-partitioned sorted storage with zone-map pruning — the
at-rest layout for key-range scans (time slices, id ranges).

``write_sorted`` pays one distributed sort and writes the blocks as
parquet (workers write their own files — nothing streams through the
driver), then builds a zone map of per-file [min, max] key bounds from
PARQUET FOOTER STATISTICS ONLY (a metadata pass: one footer read per
file, no data bytes). ``read_range`` consults the manifest and reads
ONLY files overlapping the requested range — at 100 TB a narrow
time-slice query touches a handful of files instead of the whole
table. A residual in-file filter keeps the result exact (file bounds
are coarse).

The manifest is written LAST (atomic rename) so a killed write leaves
no readable-but-incomplete store; re-running overwrites cleanly.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc


def _file_bounds(path: str, key: str):
    """[min, max, rows] of ``key`` from the file footer; falls back to
    reading just the key column if stats are absent."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index(key)
    lo = hi = None
    ok = True
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            ok = False
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if not ok:
        col = pq.read_table(path, columns=[key]).column(key)
        lo, hi = pc.min(col).as_py(), pc.max(col).as_py()
    return lo, hi, f.metadata.num_rows


def write_sorted(ds, key: str, out_dir: str, num_partitions: int = 16):
    """Sort by ``key`` into ``num_partitions`` contiguous ranges, write
    worker-side, zone-map from footers. Returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)
    ds.sort(key).repartition(num_partitions).write_parquet(out_dir)
    zones = []
    for p in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
        lo, hi, rows = _file_bounds(p, key)
        if rows:
            zones.append({"file": os.path.basename(p),
                          "min": _json_key(lo), "max": _json_key(hi),
                          "rows": rows})
    manifest = {"key": key, "zones": zones}
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, default=str)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def _json_key(v):
    # timestamps serialize as microseconds so range compares stay exact
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:  # naive = UTC in this store
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    return v


def pruned_files(store_dir: str, lo, hi) -> list[str]:
    """Zone-map hit list for [lo, hi] (lo/hi in the manifest's key
    domain: plain values, or epoch-us for timestamp keys)."""
    with open(os.path.join(store_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return [z["file"] for z in manifest["zones"]
            if not (z["max"] < lo or z["min"] > hi)]


def read_range(store_dir: str, lo, hi, key_scalar=None):
    """Dataset of rows with key in [lo, hi]: manifest-pruned file reads
    + an exact residual filter. ``key_scalar`` optionally maps a
    manifest-domain bound back to an arrow scalar for the residual
    compare (needed for timestamp keys); defaults to the raw bound."""
    import ray.data as rd

    with open(os.path.join(store_dir, "manifest.json")) as f:
        manifest = json.load(f)
    key = manifest["key"]
    hit = pruned_files(store_dir, lo, hi)
    if not hit:
        import pyarrow.parquet as pq

        any_file = glob.glob(os.path.join(store_dir, "*.parquet"))
        sch = pq.read_schema(any_file[0])
        return rd.from_arrow(sch.empty_table())
    ds = rd.read_parquet([os.path.join(store_dir, f) for f in hit])
    slo = key_scalar(lo) if key_scalar else lo
    shi = key_scalar(hi) if key_scalar else hi

    def residual(t: pa.Table) -> pa.Table:
        c = t.column(key)
        return t.filter(pc.and_(pc.greater_equal(c, pa.scalar(slo)),
                                pc.less_equal(c, pa.scalar(shi))))

    return ds.map_batches(residual, batch_format="pyarrow")
