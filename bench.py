"""Benchmark harness (driver contract).

Runs the headline KG-construction pipeline over a Common-Crawl-style
pages table synthesized (once, cached, untimed) from
``$GRAFT_SF_DIR/documents.parquet``, plus a set of representative
operator queries, and prints ONE JSON line:

    {"metric": "kg_e2e_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ..., "triples_per_sec": ...}

``python bench.py --scaling`` runs the headline pipeline in fresh
processes at N and 4N cpus (default 4 vs 16; override GRAFT_SCALE_LO /
GRAFT_SCALE_HI) on the SAME input, best-of-2 per level (shared-tenant
host noise), and reports both throughputs + scaling efficiency
(criterion: eff >= 0.8 from N to 4N). ``--calibrate`` prints this
host's own 4->16 multiprocessing ceiling (pure-python compute ~0.80
here: 16 procs land on SMT siblings of 16 physical cores; memory-
streaming ~0.34) — normalize the pipeline's measured efficiency
against the cpu ceiling before judging it (BASELINE.md).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), GRAFT_BENCH_REPEAT (pages = docs x repeat, default 12),
GRAFT_SCALING_REPEAT (default 380), GRAFT_SKIP_QUERIES,
GRAFT_BENCH_PHASES (phase timing to stderr).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "12"))
CACHE_DIR = "/tmp/cosmos_ray_bench"


def _prepare_pages() -> str:
    """Synthesize + cache the bench pages as a DIRECTORY of parquet
    shards (NOT timed). Many files => the Ray read parallelizes; a single
    file is read by ONE task regardless of override_num_blocks."""
    from cosmos_ray.sources.pages import GEN_VERSION

    os.makedirs(CACHE_DIR, exist_ok=True)
    tag = SF_DIR.strip("/").replace("/", "_")
    path = os.path.join(CACHE_DIR, f"pages_{tag}_r{REPEAT}_v{GEN_VERSION}")
    if not os.path.isdir(path):
        from concurrent.futures import ProcessPoolExecutor

        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        # one shard per repeat index; each worker regenerates deterministically
        with ProcessPoolExecutor(max_workers=min(16, REPEAT)) as pool:
            list(
                pool.map(
                    _write_repeat_shard,
                    [(SF_DIR, tmp, r) for r in range(REPEAT)],
                )
            )
        os.rename(tmp, path)
    return path


def _write_repeat_shard(args) -> str:
    sf_dir, out_dir, r = args
    import pyarrow.parquet as pq

    from cosmos_ray.sources.pages import generate_pages_shard

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    tbl = generate_pages_shard(docs, repeat_index=r)
    # several files per shard: files are the unit of read parallelism
    chunk = int(os.environ.get("GRAFT_SHARD_ROWS","6000"))
    for k, off in enumerate(range(0, tbl.num_rows, chunk)):
        out = os.path.join(out_dir, f"shard_{r:04d}_{k:02d}.parquet")
        pq.write_table(tbl.slice(off, chunk), out, row_group_size=1024)
    return out_dir


def _run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import glob as _glob

    pages_path = _prepare_pages()
    # warm the page cache so we measure compute+shuffle, not first disk read
    for fp in _glob.glob(os.path.join(pages_path, "*.parquet")):
        with open(fp, "rb") as f:
            while f.read(1 << 24):
                pass
    # warm the worker pool: ray starts worker processes lazily on the
    # first task wave (~seconds at num_cpus=32); not part of steady-state
    # throughput on a long-lived cluster
    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()
    # warm the driver's parquet-metadata cache (first read_parquet call
    # samples every file footer serially, ~3s for hundreds of shards)
    rd.read_parquet(pages_path, columns=["url"]).count()

    from cosmos_ray.pipelines.kg import run_kg_streaming

    out_dir = os.path.join(CACHE_DIR, f"out_{NUM_CPUS}")
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    pages = rd.read_parquet(pages_path)
    meta = rd.read_parquet(pages_path, columns=["url", "warc_ts"])  # pruned at the read
    # driver_threshold=0: always use the distributed reduce — the local
    # fast path is serial driver time, which is constant in cluster size
    # and would distort the scaling measurement
    metrics = run_kg_streaming(pages, out_dir, pages_meta=meta, driver_threshold=0)
    kg_sec = time.perf_counter() - t0

    # operator queries at the sf dir (each timed to completion)
    from cosmos_ray.queries import driver_queries as dq

    def consume(ds):
        if hasattr(ds, "count"):
            return ds.count()
        return len(ds)

    q_times: dict[str, float] = {}
    q_names = () if os.environ.get("GRAFT_SKIP_QUERIES") else (
        "lineitem_agg",
        "revenue_by_segment",
        "events_hourly",
        "token_counts",
        "dedup_exact",
        "doc_adjacency",
        "embedding_topk",
        "minhash_clusters",
    )
    for name in q_names:
        t0 = time.perf_counter()
        consume(dq.QUERIES[name](SF_DIR))
        q_times[name] = round(time.perf_counter() - t0, 3)

    import pyarrow.parquet as _pq

    n_docs = sum(
        _pq.read_metadata(f).num_rows
        for f in _glob.glob(os.path.join(pages_path, "*.parquet"))
    )  # input pages processed
    n_triples = metrics["triples_rows"]
    result = {
        "metric": "kg_e2e_sec",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages_repeat": REPEAT,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / kg_sec, 1),
        "triples": n_triples,
        "triples_per_sec": round(n_triples / kg_sec, 1),
        "table_rows": metrics,
    }
    ray.shutdown()
    return result


SCALING_REPEAT = int(os.environ.get("GRAFT_SCALING_REPEAT", "380"))


def _run_child(ncpu: int) -> dict:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_BENCH_REPEAT=str(SCALING_REPEAT),
        GRAFT_SKIP_QUERIES="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _calibrate() -> dict:
    """Host scaling ceiling probe: fixed total work split over 4 vs 16
    multiprocessing workers, arithmetic-only vs memory-streaming. On this
    sandbox 16 procs land on SMT siblings (16 physical cores), so even
    pure-python compute tops out near 0.8 — the number the pipeline's
    measured efficiency should be normalized against."""
    import multiprocessing as mp

    def run(task, total, procs):
        per = total // procs
        t0 = time.perf_counter()
        with mp.Pool(procs) as p:
            p.map(task, [per] * procs)
        return time.perf_counter() - t0

    out = {"metric": "host_calibration", "unit": "ratio"}
    for name, task, total in (("cpu", _calib_cpu, 160_000_000),
                              ("mem", _calib_mem, 4000)):
        t4 = min(run(task, total, 4) for _ in range(2))
        t16 = min(run(task, total, 16) for _ in range(2))
        out[f"{name}_t4"] = round(t4, 2)
        out[f"{name}_t16"] = round(t16, 2)
        out[f"{name}_eff_4_16"] = round((t4 / t16) / 4, 3)
    return out


def _calib_cpu(n: int) -> int:
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
    return x


def _calib_mem(n: int) -> int:
    import numpy as np

    a = np.arange(2_000_000, dtype=np.int64)  # 16 MB: busts cache per copy
    s = 0
    for _ in range(n):
        b = a.copy()
        s += int(b[::4096].sum())
    return s


def main() -> None:
    if "--calibrate" in sys.argv:
        print(json.dumps(_calibrate()))
        return
    if "--scaling" in sys.argv:
        global REPEAT
        REPEAT = SCALING_REPEAT
        _prepare_pages()  # build cache once so both children skip it
        lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
        hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
        # best-of-2 per level: this sandbox shares the host with other
        # tenants, so single runs carry multi-second noise
        r_lo = min((_run_child(lo) for _ in range(2)), key=lambda r: r["value"])
        r_hi = min((_run_child(hi) for _ in range(2)), key=lambda r: r["value"])
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "sec_lo": r_lo["value"],
                    "sec_hi": r_hi["value"],
                    "cpus_lo": lo,
                    "cpus_hi": hi,
                    "docs_per_sec_lo": r_lo["docs_per_sec"],
                    "docs_per_sec_hi": r_hi["docs_per_sec"],
                    "sf": SF_DIR,
                }
            )
        )
        return
    print(json.dumps(_run_bench()))


if __name__ == "__main__":
    main()
