"""Per-partition checkpointed lineage + metrics — the resumability story.

Reference analog: `htcosmos/make_parquet.py:666-690` marks each (pdf,
phase) with a ``.complete`` file and skips finished work on re-run; the
service layer caches whole jobs by content hash
(`cosmos_service/src/routers/process.py:57-60`).

Our design (north rule: any failed partition resumes without recompute):

- the partition unit is the input parquet FILE: the file list is split
  round-robin into ``num_partitions`` groups and each partition reads
  ONLY its own files (~1/N of input bytes — N partitions never re-scan
  the whole input). When the input has fewer files than partitions
  (tiny/test corpora) a url-hash row filter over the full input is the
  fallback;
- cross-partition keep-latest-per-url stays exact under file
  partitioning via a GLOBAL metadata-only dup plan (url, max warc_ts —
  two pruned columns, computed once, persisted to
  ``out_dir/_dup_plan.parquet`` so resume reuses it); stale rows are
  dropped inside each partition before extraction. Max-ts ties for the
  same url that span partitions are the one uncovered edge (resolve
  upstream; within a partition ``keep_latest`` collapses them);
- each partition runs the FULL pipeline and writes every output table
  under ``out_dir/<table>/part=<k>/`` via an atomic tmp-dir rename;
- a JSON manifest row per finished partition records row counts, input
  file count, wall time (the per-partition metrics the north rule
  requires);
- resume = anti-join: partitions present in the manifest are skipped
  entirely (their outputs are already durable).

At cluster scale each partition is a separate ``ray job submit``-able
unit of work over its own slice of input files; in-sandbox we iterate
partitions in one driver, which exercises the identical layout.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = ("documents", "dead_letter", "segments", "triples", "entities", "adjacency")


def partition_of(urls, num_partitions: int) -> np.ndarray:
    """Stable url-hash partition assignment (pandas' process-stable
    64-bit hash)."""
    h = pd.util.hash_array(np.asarray(list(urls), dtype=object))
    return (h % num_partitions).astype(np.int64)


class Manifest:
    """Append-only JSONL manifest of completed partitions."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> dict[int, dict]:
        done: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        done[rec["partition"]] = rec
        return done

    def record(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def _list_parquet_files(path: str) -> list[str]:
    import glob

    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def _global_dup_plan(files: list[str], out_dir: str):
    """Metadata-only keep-latest plan over the WHOLE input (url, max
    warc_ts for urls crawled more than once), persisted under the out_dir
    so resumed runs reuse it instead of re-scanning. Returns a broadcast
    ObjectRef of {url: max_ts_us}, or None if the dup-url set exceeds the
    discovery cap (degenerate corpus — caller falls back to row-hash
    partitioning so per-partition keep_latest stays exact)."""
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from cosmos_ray.stages.extract import _ts_us, discover_dup_urls

    plan_path = os.path.join(out_dir, "_dup_plan.parquet")
    if os.path.exists(plan_path):
        tbl = pq.read_table(plan_path)
        urls = tbl.column("url").to_pylist()
        dups = dict(zip(urls, tbl.column("ts_max_us").to_pylist()))
        tied = frozenset(
            u for u, t in zip(urls, tbl.column("tied").to_pylist()) if t
        ) if "tied" in tbl.column_names else frozenset()
        return ray.put({"ts": dups, "tied": tied})
    meta = rd.read_parquet(files, columns=["url", "warc_ts"])
    ref = discover_dup_urls(meta)
    if ref is None:
        return None
    plan = ray.get(ref)
    dups = {u: _ts_us(t) for u, t in plan["ts"].items()}
    tmp = plan_path + f".tmp{os.getpid()}"
    pq.write_table(
        pa.table({"url": pa.array(list(dups), pa.string()),
                  "ts_max_us": pa.array(list(dups.values()), pa.int64()),
                  "tied": pa.array([u in plan["tied"] for u in dups],
                                   pa.bool_())}),
        tmp,
    )
    os.replace(tmp, plan_path)  # atomic; safe under crash/re-run
    return ray.put({"ts": dups, "tied": plan["tied"]})


def _tie_winners(files: list[str], out_dir: str, dup_ref) -> "pa.Table | None":
    """Exact winner rows for urls tied at their max warc_ts, computed
    ONCE per run from a predicate-pushdown read over only the tied urls
    (tiny by construction — a metadata edge) and persisted to
    ``out_dir/_tie_winners.parquet`` so resume reuses them. Winner rule:
    min md5(html) at the max ts (see ``extract.resolve_tied``) —
    deterministic regardless of file/partition boundaries."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from cosmos_ray.stages.extract import resolve_tied

    plan = ray.get(dup_ref)
    if not plan["tied"]:
        return None
    win_path = os.path.join(out_dir, "_tie_winners.parquet")
    if os.path.exists(win_path):
        return pq.read_table(win_path)
    cand = rd.read_parquet(
        files, filter=pc.field("url").isin(list(plan["tied"])))
    winners = resolve_tied(cand, dup_ref)
    tbl = pa.Table.from_pylist(
        winners.take_all(), schema=winners.schema().base_schema)
    tmp = win_path + f".tmp{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, win_path)
    return tbl


def run_partitioned(
    pages_path: str,
    out_dir: str,
    num_partitions: int = 4,
    fail_after: int | None = None,
    **build_kw,
) -> dict:
    """Run the KG pipeline partition by partition with checkpoint/resume.

    ``fail_after=k`` aborts after k partitions (test hook simulating a
    mid-run crash). Returns summary with per-partition metrics; re-running
    with the same ``out_dir`` completes only what is missing.
    """
    import ray.data as rd

    from cosmos_ray.pipelines.kg import build_kg, _parquet_rows, _stub_fsspec_http
    from cosmos_ray.stages.extract import drop_stale

    _stub_fsspec_http()
    manifest = Manifest(out_dir)
    done = manifest.completed()
    files = _list_parquet_files(pages_path)
    dedup_input = build_kw.pop("dedup_input", True)
    # file-partitioned mode (the scale path): each partition reads only
    # its own ~1/N of the input files; needs the global dup plan for
    # exact cross-partition keep-latest. Fewer files than partitions, or
    # a dup plan over cap, falls back to url-hash row filtering.
    by_files = len(files) >= num_partitions
    dup_ref = None
    winners = None
    if by_files and dedup_input:
        dup_ref = _global_dup_plan(files, out_dir)
        if dup_ref is None:
            by_files = False
        else:
            # urls tied at their max ts span partitions; exclude them
            # from every partition's stream and route each one's single
            # deterministic winner to its url-hash partition.
            winners = _tie_winners(files, out_dir, dup_ref)
    ran = []
    for k in range(num_partitions):
        if k in done:
            continue
        if fail_after is not None and len(ran) >= fail_after:
            break
        t0 = time.perf_counter()
        if by_files:
            part_files = files[k::num_partitions]
            part_pages = rd.read_parquet(part_files)
            if dup_ref is not None:
                part_pages = drop_stale(part_pages, dup_ref, tied="exclude")
            if winners is not None:
                mine = partition_of(
                    winners.column("url").to_pylist(), num_partitions
                ) == k
                if mine.any():
                    part_pages = part_pages.union(
                        rd.from_arrow(winners.filter(pa.array(mine))))
            n_input_files = len(part_files)
        else:
            pages = rd.read_parquet(files)

            def pick(t: pa.Table, k=k) -> pa.Table:
                part = partition_of(t.column("url").to_pylist(), num_partitions)
                return t.filter(pa.array(part == k))

            part_pages = pages.map_batches(pick, batch_format="pyarrow")
            n_input_files = len(files)
        kg = build_kg(part_pages, dedup_input=dedup_input, **build_kw)
        rec: dict = {"partition": k, "input": pages_path,
                     "n_input_files": n_input_files,
                     "input_files_total": len(files)}
        for name in TABLES:
            ds = getattr(kg, name)
            final = os.path.join(out_dir, name, f"part={k}")
            tmp = final + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(final, ignore_errors=True)
            os.makedirs(tmp, exist_ok=True)
            ds.write_parquet(tmp)
            os.rename(tmp, final)  # atomic publish
            rec[f"{name}_rows"] = _parquet_rows(final)
        rec["wall_s"] = round(time.perf_counter() - t0, 3)
        manifest.record(rec)
        ran.append(k)
    all_done = manifest.completed()
    return {
        "partitions_total": num_partitions,
        "partitions_done": len(all_done),
        "partitions_ran_now": ran,
        "records": all_done,
    }
