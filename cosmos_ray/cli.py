"""Job driver CLI — the ``ray job submit`` entry point.

North-rule lifecycle: the pipeline is submitted as a driver script to a
fixed-size Ray cluster and processes its input as checkpointed url-hash
partitions (resume skips finished partitions via the manifest).

    ray job submit -- python -m cosmos_ray.cli \
        --input /data/pages --output /data/kg --partitions 64

In this sandbox (single node) the same command runs standalone: Ray
auto-initialises in local mode. The module never calls ray.init when a
session already exists (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _queue_worker(params: dict, attempt: int,
                  num_cpus: int | None = None) -> dict:
    """Run one queued job's params as a CLI invocation (shared by
    --drain-queue and the HTTP service's in-process workers)."""
    argv2 = ["--input", params["input"], "--output", params["output"],
             "--partitions", str(params.get("partitions", 16)),
             "--input-format", params.get("input_format", "parquet")]
    if params.get("streaming"):
        argv2.append("--streaming")
    if params.get("update"):
        argv2.append("--update")
    if params.get("aggregations"):
        argv2 += ["--aggregations", params["aggregations"]]
    if num_cpus:
        argv2 += ["--num-cpus", str(num_cpus)]
    rc = main(argv2)
    if rc != 0:
        raise RuntimeError(f"job exited {rc}")
    return {"ok": True, "attempt": attempt}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="cosmos_ray KG-construction job driver")
    p.add_argument("--input", default=None, help="pages parquet file/dir")
    p.add_argument("--output", default=None, help="output root (tables + manifest)")
    p.add_argument("--queue", default=None, metavar="DIR",
                   help="submit this job to the durable queue at DIR "
                        "instead of running it (state/jobqueue.py — the "
                        "service-queue analog); prints the job id")
    p.add_argument("--drain-queue", default=None, metavar="DIR",
                   help="run queued jobs from DIR until empty (a worker "
                        "loop; failures re-enqueue per queue policy)")
    p.add_argument("--serve", default=None, metavar="DIR",
                   help="serve the HTTP job service over the queue at "
                        "DIR (service/app.py — POST /process/, GET "
                        "status/result; the cosmos_service analog); "
                        "drains in-process with --serve-workers threads")
    p.add_argument("--serve-port", type=int, default=8765)
    p.add_argument("--serve-workers", type=int, default=1)
    p.add_argument("--partitions", type=int, default=16, help="url-hash partitions")
    p.add_argument("--streaming", action="store_true",
                   help="single-pass graph-only run (no per-partition checkpoints)")
    p.add_argument("--update", action="store_true",
                   help="incremental refresh: fold --input (a NEW crawl) "
                        "into the existing graph at --output; new urls "
                        "replace their old triples, old pages are never "
                        "re-extracted")
    p.add_argument("--aggregations", default=None,
                   help="comma-separated derived tables to also write "
                        "(registry names: sections,documents,captions,"
                        "figures,equations,table_context); requires the "
                        "checkpointing path")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus when starting a fresh local session")
    p.add_argument("--revisit-dedup", action="store_true",
                   help="fold WARC revisit records (the crawl's own "
                        "duplicate declarations) into keep-latest: a "
                        "url whose latest capture is a revisit keeps "
                        "the REFERRED response row "
                        "(sources/warc.effective_latest_pages); "
                        "requires --input-format warc")
    p.add_argument("--input-format", choices=("parquet", "warc"),
                   default="parquet",
                   help="'warc' reads raw ISO-28500 crawl shards "
                        "(sources/warc.py; one task per shard) — "
                        "supported on the --streaming and --update "
                        "paths, whose readers take a Dataset; the "
                        "checkpointing path partitions parquet FILES "
                        "and needs parquet input")
    args = p.parse_args(argv)

    if args.input_format == "warc" and not (args.streaming or args.update):
        p.error("--input-format warc requires --streaming or --update")
    if args.revisit_dedup and args.input_format != "warc":
        p.error("--revisit-dedup requires --input-format warc")
    if (args.drain_queue is None and args.serve is None
            and not (args.input and args.output)):
        p.error("--input and --output are required "
                "(except with --drain-queue / --serve)")

    if args.serve:
        from cosmos_ray.service.app import JobService
        from cosmos_ray.state.jobqueue import JobQueue

        def serve_worker(params: dict, attempt: int) -> dict:
            return _queue_worker(params, attempt, args.num_cpus)

        svc = JobService(JobQueue(args.serve), serve_worker,
                         workers=args.serve_workers,
                         reclaim_after_s=3600.0,
                         expire_after_s=24 * 3600.0, tick_s=60.0)
        host, port = svc.start(port=args.serve_port)
        print(json.dumps({"serving": f"http://{host}:{port}",
                          "queue": args.serve}), flush=True)
        try:
            import threading

            threading.Event().wait()  # serve until interrupted
        except KeyboardInterrupt:
            pass
        finally:
            svc.stop()
        return 0

    if args.queue:
        from cosmos_ray.state.jobqueue import JobQueue

        q = JobQueue(args.queue)
        job_id = q.submit({
            "input": args.input, "output": args.output,
            "partitions": args.partitions, "streaming": args.streaming,
            "update": args.update, "input_format": args.input_format,
            "aggregations": args.aggregations,
        })
        print(json.dumps({"job_id": job_id, **q.status(job_id)}))
        return 0
    if args.drain_queue:
        from cosmos_ray.state.jobqueue import JobQueue

        q = JobQueue(args.drain_queue)

        def worker(params: dict, attempt: int) -> dict:
            return _queue_worker(params, attempt, args.num_cpus)

        results = q.drain(worker)
        print(json.dumps({"ran": len(results),
                          "states": [r["state"] for r in results]}))
        return 0

    def _load_pages():
        import ray.data as rd

        if args.input_format == "warc":
            from cosmos_ray.sources.warc import read_warc_pages

            pages = read_warc_pages(args.input)
            if args.revisit_dedup:
                from cosmos_ray.sources.warc import (effective_latest_pages,
                                                     read_warc_revisits)

                pages = effective_latest_pages(
                    pages, read_warc_revisits(args.input)
                ).drop_columns(["effective_ts"])
            return pages, pages.select_columns(["url", "warc_ts"])
        return (rd.read_parquet(args.input),
                rd.read_parquet(args.input, columns=["url", "warc_ts"]))

    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.update:
        from cosmos_ray.pipelines.incremental import run_kg_update

        pages, meta = _load_pages()
        summary = run_kg_update(args.output, pages, pages_meta=meta)
    elif args.streaming:
        from cosmos_ray.pipelines.kg import run_kg_streaming

        pages, meta = _load_pages()
        summary = run_kg_streaming(pages, args.output, pages_meta=meta)
    else:
        from cosmos_ray.state.manifest import run_partitioned

        summary = run_partitioned(args.input, args.output, num_partitions=args.partitions)
        if args.aggregations:
            import os

            import ray.data as rd

            from cosmos_ray.pipelines.kg import _parquet_rows, _stub_fsspec_http
            from cosmos_ray.pipelines.registry import run_aggregations

            _stub_fsspec_http()
            segs = rd.read_parquet(os.path.join(args.output, "segments"))
            names = [n.strip() for n in args.aggregations.split(",") if n.strip()]
            for name, ds in run_aggregations(segs, names).items():
                path = os.path.join(args.output, name)
                os.makedirs(path, exist_ok=True)
                ds.write_parquet(path)
                summary[f"{name}_rows"] = _parquet_rows(path)
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
