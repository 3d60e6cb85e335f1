"""Small-file compaction for partitioned parquet sinks.

A streaming pipeline that checkpoints per partition (`run_partitioned`)
or writes per-block (`write_parquet`) accumulates many small files;
at 100-TB scale the file count itself becomes the bottleneck (NN/
listing pressure, per-file open cost, tiny row groups defeating column
pruning). Compaction is the standard maintenance pass (the batch analog
of the reference's periodic ES index optimization): bin-pack files into
~target-size groups from FOOTER METADATA only, rewrite each group as
one file in its own Ray task, publish atomically, skip groups whose
output already exists — so a killed compaction resumes where it left
off and a re-run is a no-op.

Scale shape: the driver touches file names + sizes only (one listing);
group rewrites run as a Dataset of group rows fanned out through
``map_batches`` (one group per task, bytes stream worker-side); no
shuffle anywhere.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq


def plan_groups(in_dir: str, target_bytes: int = 128 * 1024 * 1024
                ) -> list[list[str]]:
    """Greedy first-fit bin-packing of the directory's parquet files
    into groups of ~``target_bytes`` (name-sorted for determinism:
    the same directory always plans the same groups, which is what
    makes resume/idempotence safe)."""
    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        sz = os.path.getsize(f)
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


def compact_parquet_dir(in_dir: str, out_dir: str,
                        target_bytes: int = 128 * 1024 * 1024) -> dict:
    """Compact ``in_dir``'s parquet files into ``out_dir`` (one file per
    planned group, ``part-{k:05d}.parquet``). Atomic per group
    (tmp → rename); a group whose output file already exists is skipped
    untouched, so kill/re-run completes only the remainder. Returns
    {groups, written, skipped, rows}."""
    import ray.data as rd

    groups = plan_groups(in_dir, target_bytes)
    os.makedirs(out_dir, exist_ok=True)
    rows = [{"gid": k, "files": g} for k, g in enumerate(groups)]
    if not rows:
        return {"groups": 0, "written": 0, "skipped": 0, "rows": 0}

    def compact_one(batch: pa.Table) -> pa.Table:
        out_gid, out_rows, out_written = [], [], []
        for gid, files in zip(batch.column("gid").to_pylist(),
                              batch.column("files").to_pylist()):
            dst = os.path.join(out_dir, f"part-{gid:05d}.parquet")
            if os.path.exists(dst):
                out_gid.append(gid)
                out_rows.append(pq.read_metadata(dst).num_rows)
                out_written.append(False)
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files])
            tmp = dst + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, dst)  # atomic publish
            out_gid.append(gid)
            out_rows.append(t.num_rows)
            out_written.append(True)
        return pa.table({
            "gid": pa.array(out_gid, pa.int64()),
            "rows": pa.array(out_rows, pa.int64()),
            "written": pa.array(out_written, pa.bool_()),
        })

    res = rd.from_items(rows).map_batches(
        compact_one, batch_format="pyarrow", batch_size=1).take_all()
    return {
        "groups": len(groups),
        "written": sum(1 for r in res if r["written"]),
        "skipped": sum(1 for r in res if not r["written"]),
        "rows": sum(r["rows"] for r in res),
    }
