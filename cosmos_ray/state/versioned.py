"""Versioned at-rest table with snapshot time-travel (Delta/Iceberg-lite).

The missing piece of the at-rest family (`sorted_store` / `zorder` /
`bloom_index` / `copartition` / `compact`): a parquet directory whose
COMMIT LOG makes every historical state readable. Layout:

    table_dir/
      data/                 immutable parquet files, never rewritten
      _log/v00000001.json   one JSON record per commit (the table state)

Each commit record lists the files it ``added`` and ``removed``; the
active file set of version V is the log replay up to V. Readers resolve
a snapshot to a FILE LIST first, then ``read_parquet`` exactly those
files — so a reader pinned to version V is untouched by any later
commit (snapshot isolation by immutability), and time travel is free.

Scale shape: the log is file-count-sized driver metadata (this is how
production table formats work — the data plane streams, the commit
plane is tiny JSON); data writes stream through ``ds.write_parquet``
into a per-version staging dir and are published by atomic renames,
log record last. A crash anywhere before the log rename leaves the
commit invisible; re-running the same commit overwrites its own
staging/data files and republishes — idempotent under Ray lineage
re-execution, same discipline as `compact_parquet_dir`.

Single-writer assumption: version allocation is max(log)+1 with an
O_EXCL log-file claim — concurrent writers on shared storage need a
CAS/lock service exactly as Delta does; documented, not hidden.

Reference analog: the reference mutates one live ES index in place
(`cosmos_service/.../api.py` ingest endpoints) with no history; a
100-TB corpus store needs reproducible as-of reads (eval pinning,
incremental-crawl rollback) — `pipelines/incremental.py` composes with
this by committing each refresh as one version.
"""

from __future__ import annotations

import glob
import json
import os

__all__ = ["commit_append", "commit_overwrite", "commit_delete_keys",
           "commit_merge_upsert", "commit_compact", "rollback", "history",
           "snapshot_files", "read_snapshot", "current_version", "vacuum",
           "version_diff", "version_delta"]


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_log")


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def _log_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"v{version:08d}.json")


def _read_log(table_dir: str) -> list[dict]:
    recs = []
    for f in sorted(glob.glob(os.path.join(_log_dir(table_dir), "v*.json"))):
        with open(f) as fh:
            recs.append(json.load(fh))
    return recs


def current_version(table_dir: str) -> int:
    """Latest committed version (0 = empty table, no commits yet)."""
    recs = _read_log(table_dir)
    return recs[-1]["version"] if recs else 0


def snapshot_files(table_dir: str, version: int | None = None) -> list[str]:
    """Active data-file paths as of ``version`` (default: latest) —
    the log replay. Raises on a version that was never committed."""
    recs = _read_log(table_dir)
    if version is None:
        version = recs[-1]["version"] if recs else 0
    if version == 0:
        return []
    if not any(r["version"] == version for r in recs):
        raise ValueError(f"version {version} not in log "
                         f"(have {[r['version'] for r in recs]})")
    active: list[str] = []
    for r in recs:
        if r["version"] > version:
            break
        removed = set(r["removed"])
        active = [f for f in active if f not in removed] + r["added"]
    return [os.path.join(_data_dir(table_dir), f) for f in sorted(active)]


def read_snapshot(table_dir: str, version: int | None = None):
    """Streaming Dataset of the table as of ``version`` — the
    time-travel read. Empty snapshots return an empty Dataset."""
    import ray.data as rd

    files = snapshot_files(table_dir, version)
    if not files:
        import pyarrow as pa

        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(files)


def _publish(table_dir: str, ds, removed: list[str], op: str) -> dict:
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    os.makedirs(_data_dir(table_dir), exist_ok=True)
    version = current_version(table_dir) + 1

    added: list[str] = []
    rows = 0
    if ds is not None:
        stage = os.path.join(table_dir, f"_stage_v{version:08d}")
        if os.path.isdir(stage):  # leftover from a crashed attempt
            for f in glob.glob(os.path.join(stage, "*")):
                os.remove(f)
        ds.write_parquet(stage)
        for k, f in enumerate(sorted(glob.glob(
                os.path.join(stage, "*.parquet")))):
            name = f"v{version:08d}-{k:05d}.parquet"
            os.replace(f, os.path.join(_data_dir(table_dir), name))
            added.append(name)
        os.rmdir(stage)
        import pyarrow.parquet as pq

        rows = sum(pq.read_metadata(
            os.path.join(_data_dir(table_dir), n)).num_rows for n in added)

    rec = {"version": version, "op": op, "added": added,
           "removed": sorted(removed), "rows_added": rows}
    tmp = _log_path(table_dir, version) + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, _log_path(table_dir, version))  # commit point
    return rec


def commit_append(table_dir: str, ds, op: str = "append") -> dict:
    """Append ``ds`` as a new version; existing files stay active.
    Returns the commit record."""
    return _publish(table_dir, ds, removed=[], op=op)


def commit_overwrite(table_dir: str, ds, op: str = "overwrite") -> dict:
    """Replace the table contents with ``ds`` as a new version. Old
    files leave the ACTIVE set but remain on disk (time travel keeps
    working) until `vacuum`."""
    recs = _read_log(table_dir)
    active: list[str] = []
    for r in recs:
        removed = set(r["removed"])
        active = [f for f in active if f not in removed] + r["added"]
    return _publish(table_dir, ds, removed=active, op=op)


def rollback(table_dir: str, to_version: int) -> dict:
    """Restore the table to ``to_version``'s content as a NEW commit
    (roll-forward rollback: history is append-only, nothing is
    deleted). The new version re-references the old version's files."""
    target = [os.path.basename(f)
              for f in snapshot_files(table_dir, to_version)]
    recs = _read_log(table_dir)
    active: list[str] = []
    for r in recs:
        removed = set(r["removed"])
        active = [f for f in active if f not in removed] + r["added"]
    version = current_version(table_dir) + 1
    # added/removed are DELTAS vs the current active set: re-adding an
    # already-active file would double-count it in the replay
    rec = {"version": version, "op": f"rollback({to_version})",
           "added": sorted(set(target) - set(active)),
           "removed": sorted(set(active) - set(target)), "rows_added": 0}
    tmp = _log_path(table_dir, version) + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, _log_path(table_dir, version))
    return rec


def history(table_dir: str) -> list[dict]:
    """All commit records, oldest first."""
    return _read_log(table_dir)


def vacuum(table_dir: str, keep_versions: int = 1) -> list[str]:
    """Delete data files unreachable from the latest ``keep_versions``
    snapshots (maintenance pass — after it, time travel older than the
    kept window raises on read). Returns the deleted file names."""
    recs = _read_log(table_dir)
    if not recs:
        return []
    versions = [r["version"] for r in recs][-keep_versions:]
    keep: set[str] = set()
    for v in versions:
        keep.update(os.path.basename(f) for f in snapshot_files(table_dir, v))
    deleted = []
    for f in sorted(glob.glob(os.path.join(_data_dir(table_dir),
                                           "*.parquet"))):
        if os.path.basename(f) not in keep:
            os.remove(f)
            deleted.append(os.path.basename(f))
    return deleted


def _rewrite_without_keys(files: list[str], key_col: str, key_ref,
                          version: int, stage: str, tag: str):
    """Fan out one Ray task per active file: files whose ``key_col``
    hits the broadcast key set are rewritten into ``stage`` WITHOUT
    those rows; misses are skipped entirely (column-pruned probe read).
    -> pandas(old, new, n_removed) of the affected files only."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    def probe_rewrite(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        out_old, out_new, out_removed = [], [], []
        for path in t.column("path").to_pylist():
            col = pq.read_table(path, columns=[key_col]).column(key_col)
            hit = pc.any(pc.is_in(
                col, value_set=ks.cast(col.type))).as_py()
            if not hit:
                continue
            full = pq.read_table(path)
            keep = pc.invert(pc.is_in(
                full.column(key_col),
                value_set=ks.cast(full.column(key_col).type)))
            kept = full.filter(keep)
            name = os.path.basename(path)
            new_name = f"v{version:08d}-{tag}-{name}"
            tmp = os.path.join(stage, new_name)
            if kept.num_rows:
                pq.write_table(kept, tmp)
                out_new.append(new_name)
            else:
                out_new.append("")  # file fully emptied, no replacement
            out_old.append(name)
            out_removed.append(full.num_rows - kept.num_rows)
        return pa.table({
            "old": pa.array(out_old, pa.string()),
            "new": pa.array(out_new, pa.string()),
            "n_removed": pa.array(out_removed, pa.int64())})

    plan = rd.from_arrow(pa.table({"path": pa.array(files, pa.string())}))
    return (plan.repartition(max(1, len(files)))
            .map_batches(probe_rewrite, batch_format="pyarrow")
            .to_pandas())


def commit_merge_upsert(table_dir: str, key_col: str, updates_ds,
                        op: str = "merge_upsert",
                        max_update_keys: int = 5_000_000) -> dict:
    """Delta ``MERGE`` analog — WHEN MATCHED THEN UPDATE, WHEN NOT
    MATCHED THEN INSERT — published as ONE atomic commit: active files
    containing a matched key are rewritten without those rows (the
    `commit_delete_keys` probe, one Ray task per file, O(affected
    files) not O(table)), and the full update batch is appended as new
    files; the log record lands last, so readers see either the old
    snapshot or the complete merge, never a half-applied state.
    Untouched files keep their physical identity.

    Contract: ``updates_ds`` must be key-unique (Delta raises on
    multiple source matches per target key; duplicate update keys here
    would both insert). The DISTINCT update-key set is pulled to the
    driver and broadcast once via ``ray.put`` — a MERGE batch is
    update-sized, not table-sized; ``max_update_keys`` guards the pull
    and the function raises past it rather than degrade silently.

    Reference analog: the reference upserts documents into one live ES
    index (`cosmos_service` ingest endpoints) destroying history; this
    keeps every pre-merge snapshot readable."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    def batch_keys(t: pa.Table) -> pa.Table:
        return pa.table({key_col: pc.unique(t.column(key_col))})

    parts = (updates_ds.select_columns([key_col])
             .map_batches(batch_keys, batch_format="pyarrow")
             .take_all())
    keys = np.unique(np.array([r[key_col] for r in parts]))
    if len(keys) > max_update_keys:
        raise ValueError(
            f"merge batch has {len(keys)} distinct keys > max_update_keys="
            f"{max_update_keys}; split the merge or raise the cap")

    os.makedirs(_log_dir(table_dir), exist_ok=True)
    os.makedirs(_data_dir(table_dir), exist_ok=True)
    files = snapshot_files(table_dir)
    version = current_version(table_dir) + 1
    stage = os.path.join(table_dir, f"_stage_v{version:08d}")
    if os.path.isdir(stage):
        for root, _dirs, fs in os.walk(stage, topdown=False):
            for f in fs:
                os.remove(os.path.join(root, f))
    os.makedirs(stage, exist_ok=True)

    if files and len(keys):
        res = _rewrite_without_keys(files, key_col, ray.put(pa.array(keys)),
                                    version, stage, tag="mrg")
    else:
        import pandas as pd

        res = pd.DataFrame({"old": [], "new": [], "n_removed": []})

    # the update batch streams into its own staging subdir
    ups_stage = os.path.join(stage, "ups")
    updates_ds.write_parquet(ups_stage)

    import pyarrow.parquet as pq

    added, rows_added = [], 0
    for r_new in res["new"]:
        if r_new:
            os.replace(os.path.join(stage, r_new),
                       os.path.join(_data_dir(table_dir), r_new))
            added.append(r_new)
    for k, f in enumerate(sorted(glob.glob(
            os.path.join(ups_stage, "*.parquet")))):
        name = f"v{version:08d}-ups-{k:05d}.parquet"
        os.replace(f, os.path.join(_data_dir(table_dir), name))
        rows_added += pq.read_metadata(
            os.path.join(_data_dir(table_dir), name)).num_rows
        added.append(name)
    for root, _dirs, fs in os.walk(stage, topdown=False):
        for f in fs:
            os.remove(os.path.join(root, f))
        os.rmdir(root)

    rec = {"version": version, "op": op, "added": sorted(added),
           "removed": sorted(res["old"].tolist()),
           "rows_added": rows_added,
           "rows_updated": int(res["n_removed"].sum()),
           "rewritten": len(res), "untouched": len(files) - len(res)}
    tmp = _log_path(table_dir, version) + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, _log_path(table_dir, version))
    return rec


def version_diff(table_dir: str, key_col: str, v_from: int, v_to: int,
                 num_partitions: int | None = None):
    """Change data feed between two snapshots (Delta CDF analog) ->
    Dataset(key_col, change) with change in {'insert','delete',
    'update'}. Reads ONLY the files that differ between the two
    snapshots: data files are immutable, so rows in files common to
    both versions cannot have changed and are never opened — the cost
    is O(changed files), not O(table).

    Classification is a full-outer join of the two changed-file row
    sets on ``key_col``: key only on the from-side -> delete, only on
    the to-side -> insert, both sides with different non-key content ->
    update; rewrite survivors (same key, same content, merely moved to
    a new file by delete/merge/compact rewrites) cancel out and are
    dropped. Content equality is a vectorized column-wise string join
    per row (no per-row Python). Assumes key-uniqueness per snapshot —
    the `commit_merge_upsert` discipline."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    import ray.data as rd

    f_from = set(snapshot_files(table_dir, v_from))
    f_to = set(snapshot_files(table_dir, v_to))
    only_f = sorted(f_from - f_to)
    only_t = sorted(f_to - f_from)

    def empty() -> "rd.Dataset":
        return rd.from_arrow(pa.table({key_col: pa.array([], pa.int64()),
                                       "change": pa.array([], pa.string())}))

    def contented(col_out: str):
        def fn(t: pa.Table) -> pa.Table:
            others = [c for c in t.column_names if c != key_col]
            if not others:
                content = pa.array([""] * t.num_rows, pa.string())
            elif len(others) == 1:
                content = pc.fill_null(
                    pc.cast(t.column(others[0]), pa.string()), "\x00null")
            else:
                strs = [pc.cast(t.column(c), pa.string()) for c in others]
                content = pc.binary_join_element_wise(
                    *strs, "\x1f", null_handling="replace",
                    null_replacement="\x00null")
            return pa.table({key_col: t.column(key_col), col_out: content})

        return fn

    if not only_f and not only_t:
        return empty()
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))

    def tagged(files, change):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                key_col: t.column(key_col),
                "change": pa.array([change] * t.num_rows, pa.string())})

        return rd.read_parquet(files).map_batches(fn, batch_format="pyarrow")

    if not only_f:
        return tagged(only_t, "insert")
    if not only_t:
        return tagged(only_f, "delete")

    a = rd.read_parquet(only_f).map_batches(
        contented("c_from"), batch_format="pyarrow")
    b = rd.read_parquet(only_t).map_batches(
        contented("c_to"), batch_format="pyarrow")
    j = a.join(b, join_type="full_outer", num_partitions=num_partitions,
               on=(key_col,))

    def classify(t: pa.Table) -> pa.Table:
        key = t.column(key_col)
        cf, ct = t.column("c_from"), t.column("c_to")
        ins = pc.is_null(cf)
        dele = pc.is_null(ct)
        upd = pc.and_kleene(pc.invert(ins), pc.invert(dele))
        changed = pc.or_(pc.or_(ins, dele),
                         pc.and_kleene(upd, pc.not_equal(cf, ct)))
        change = pc.if_else(ins, "insert", pc.if_else(dele, "delete",
                                                      "update"))
        out = pa.table({key_col: key, "change": change})
        return out.filter(pc.fill_null(changed, False))

    return j.map_batches(classify, batch_format="pyarrow")


def commit_delete_keys(table_dir: str, key_col: str, keys,
                       op: str = "delete_keys") -> dict:
    """Targeted key deletion (the right-to-be-forgotten pass) with
    MINIMAL rewrite: only data files that actually contain one of
    ``keys`` are rewritten (column-pruned scan of ``key_col`` decides
    per file; compose with `state/bloom_index.py` to pre-prune the
    candidate list at 100-TB file counts); untouched files keep their
    physical identity, so the commit's cost is O(affected files), not
    O(table). History is preserved — pre-delete snapshots still read
    the full data until `vacuum` reclaims them (run vacuum after a
    compliance delete to physically destroy the rows).

    Scale shape: the per-file probe and rewrite fan out as one Ray task
    per file (the `compact_parquet_dir` pattern); the key set is
    broadcast once via ``ray.put``. Returns the commit record with
    ``rewritten`` / ``untouched`` file counts; a delete hitting no
    file publishes no new version (no-op, returns the current record
    shape with "noop": True)."""
    import pyarrow as pa

    import ray

    files = snapshot_files(table_dir)
    if not files:
        return {"noop": True, "version": current_version(table_dir),
                "rewritten": 0, "untouched": 0}
    key_ref = ray.put(pa.array(list(keys)))
    version = current_version(table_dir) + 1
    stage = os.path.join(table_dir, f"_stage_v{version:08d}")
    if os.path.isdir(stage):
        for f in glob.glob(os.path.join(stage, "*")):
            os.remove(f)
    os.makedirs(stage, exist_ok=True)

    res = _rewrite_without_keys(files, key_col, key_ref, version, stage,
                                tag="del")
    if res.empty:
        for f in glob.glob(os.path.join(stage, "*")):
            os.remove(f)
        os.rmdir(stage)
        return {"noop": True, "version": version - 1,
                "rewritten": 0, "untouched": len(files)}

    added = []
    for new_name in res["new"]:
        if new_name:
            os.replace(os.path.join(stage, new_name),
                       os.path.join(_data_dir(table_dir), new_name))
            added.append(new_name)
    for f in glob.glob(os.path.join(stage, "*")):
        os.remove(f)
    os.rmdir(stage)
    rec = {"version": version, "op": op, "added": sorted(added),
           "removed": sorted(res["old"].tolist()),
           "rows_added": 0, "rows_deleted": int(res["n_removed"].sum()),
           "rewritten": len(res), "untouched": len(files) - len(res)}
    tmp = _log_path(table_dir, version) + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, _log_path(table_dir, version))
    return rec


def commit_compact(table_dir: str, target_bytes: int = 128 * 1024 * 1024,
                   op: str = "compact") -> dict:
    """OPTIMIZE for the versioned table: bin-pack the ACTIVE small
    files into ~``target_bytes`` groups (`state/compact.py:plan_groups`
    on footer metadata only) and rewrite each multi-file group as one
    file in its own Ray task, publishing the swap as a new commit —
    content identical, file count lower, history intact (pre-compact
    snapshots still reference the old files until `vacuum`). Groups
    already consisting of one file are left untouched. No-op (no new
    version) when nothing would shrink."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from cosmos_ray.state.compact import plan_groups

    files = snapshot_files(table_dir)
    sizes = {f: os.path.getsize(f) for f in files}
    # plan over the active set only (plan_groups scans a dir; inline
    # the same greedy name-sorted bin-pack here on the snapshot list)
    groups, cur, cur_b = [], [], 0
    for f in sorted(files):
        sz = sizes[f]
        if cur and cur_b + sz > target_bytes:
            groups.append(cur)
            cur, cur_b = [], 0
        cur.append(f)
        cur_b += sz
    if cur:
        groups.append(cur)
    multi = [g for g in groups if len(g) > 1]
    if not multi:
        return {"noop": True, "version": current_version(table_dir),
                "compacted_groups": 0}

    version = current_version(table_dir) + 1
    stage = os.path.join(table_dir, f"_stage_v{version:08d}")
    if os.path.isdir(stage):
        for f in glob.glob(os.path.join(stage, "*")):
            os.remove(f)
    os.makedirs(stage, exist_ok=True)

    def rewrite(t: pa.Table) -> pa.Table:
        out_new, out_olds = [], []
        for k, paths in zip(t.column("k").to_pylist(),
                            t.column("paths").to_pylist()):
            tbl = pa.concat_tables([pq.read_table(p) for p in paths],
                                   promote_options="default")
            name = f"v{version:08d}-cmp-{k:05d}.parquet"
            pq.write_table(tbl, os.path.join(stage, name))
            out_new.append(name)
            out_olds.append("|".join(os.path.basename(p) for p in paths))
        return pa.table({"new": pa.array(out_new, pa.string()),
                         "olds": pa.array(out_olds, pa.string())})

    plan = rd.from_arrow(pa.table({
        "k": pa.array(range(len(multi)), pa.int64()),
        "paths": pa.array(multi, pa.list_(pa.string()))}))
    res = (plan.repartition(len(multi))
           .map_batches(rewrite, batch_format="pyarrow").to_pandas())

    added, removed = [], []
    for _, r in res.iterrows():
        os.replace(os.path.join(stage, r["new"]),
                   os.path.join(_data_dir(table_dir), r["new"]))
        added.append(r["new"])
        removed.extend(r["olds"].split("|"))
    for f in glob.glob(os.path.join(stage, "*")):
        os.remove(f)
    os.rmdir(stage)
    rec = {"version": version, "op": op, "added": sorted(added),
           "removed": sorted(removed), "rows_added": 0,
           "compacted_groups": len(multi)}
    tmp = _log_path(table_dir, version) + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, _log_path(table_dir, version))
    return rec

def version_delta(table_dir: str, v_from: int, v_to: int,
                  sign_col: str = "sign"):
    """Signed Z-set delta between two snapshots -> Dataset(all data
    columns + ``sign_col``): rows in files only the FROM snapshot holds
    carry sign -1, rows in files only the TO snapshot holds carry +1;
    files common to both snapshots are never opened (immutability
    prunes them), so the delta costs O(changed files), not O(table).

    This is the feed for `functions/matview.maintain_view`: an update
    appears as the old row at -1 plus the new row at +1, a no-op
    rewrite survivor as identical rows at -1/+1 — both resolve to the
    correct (respectively zero) net effect ALGEBRAICALLY inside any
    SUM/COUNT view, so unlike `version_diff` no key join is needed at
    all. Works in either direction (swap the versions for the inverse
    delta)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    f_from = set(snapshot_files(table_dir, v_from))
    f_to = set(snapshot_files(table_dir, v_to))
    only_f = sorted(f_from - f_to)
    only_t = sorted(f_to - f_from)

    def tag(files: list[str], s: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                sign_col, pa.array([s] * t.num_rows, pa.int64()))

        return rd.read_parquet(files).map_batches(fn, batch_format="pyarrow")

    if not only_f and not only_t:
        ref = sorted(f_to) or sorted(f_from)
        if not ref:  # table empty at both versions
            return rd.from_arrow(pa.table({sign_col: pa.array([], pa.int64())}))
        sch = pq.read_schema(ref[0]).append(pa.field(sign_col, pa.int64()))
        return rd.from_arrow(sch.empty_table())
    parts = ([tag(only_f, -1)] if only_f else []) + \
            ([tag(only_t, +1)] if only_t else [])
    return parts[0] if len(parts) == 1 else parts[0].union(parts[1])
