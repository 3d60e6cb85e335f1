"""Generic fault-quarantining batch map — `extract_streaming`'s
dead-letter discipline (content-keyed atomic side shards, exact under
Ray lineage re-execution) generalized to ANY row-wise batch transform.

``safe_map_batches`` applies the UDF per batch; when it raises, the
batch is BISECTED recursively until the poison rows are isolated at
size 1 — good rows still flow through the same UDF, poison rows are
side-written as dead-letter parquet shards (id, stage, error) and
dropped from the stream. Cost on failure is O(log batch) extra UDF
calls per contiguous poison region; zero overhead on clean batches.

Contract: ``fn`` must be row-wise (output rows derive only from input
rows of the same batch — no cross-row state), because it is re-applied
to sub-batches during isolation. Reference analog: the per-PDF
try/except + failure log that keeps a Cosmos run alive
(`ingest/ingest.py:262-272`, `htcosmos/make_parquet.py:709-716`)."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa


def _write_dead(dead_dir: str, ids: list, stage: str, errors: list) -> None:
    import pyarrow.parquet as pq

    tbl = pa.table({
        "id": pa.array([str(x) for x in ids], pa.string()),
        "stage": pa.array([stage] * len(ids), pa.string()),
        "error": pa.array([e[:500] for e in errors], pa.string()),
    })
    key = hashlib.md5("|".join(sorted(str(x) for x in ids)).encode()
                      ).hexdigest()[:16]
    final = os.path.join(dead_dir, f"dead_{key}.parquet")
    tmp = final + f".tmp{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, final)  # atomic; identical content on re-run


class BatchTimeout(Exception):
    """A (sub)batch exceeded the safemap watchdog budget."""


def _with_timeout(fn, timeout_s: float):
    """Wrap ``fn`` with a SIGALRM watchdog raising `BatchTimeout` —
    the lossless analog of the reference's 180 s straggler alarm that
    silently DROPS unfinished futures (`ingest/ingest.py:134-148`):
    here the timeout feeds the same bisection as a raise, so the slow
    ROW is isolated and dead-lettered while the rest of the batch
    flows. Each bisection level gets a fresh budget, so one slow row
    costs at most timeout * log2(batch) extra wall time. Signals bind
    only in the worker's main thread (Ray's default for map_batches
    tasks); elsewhere the watchdog degrades to no-timeout."""
    import signal

    def run(t):
        def on_alarm(signum, frame):
            raise BatchTimeout(f"batch exceeded {timeout_s}s")

        try:
            old = signal.signal(signal.SIGALRM, on_alarm)
        except ValueError:  # non-main thread: no watchdog
            return fn(t)
        signal.setitimer(signal.ITIMER_REAL, timeout_s)
        try:
            return fn(t)
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0.0)
            signal.signal(signal.SIGALRM, old)

    return run


def safe_map_batches(ds, fn, dead_dir: str, id_col: str,
                     stage: str = "udf", batch_size: int | None = None,
                     timeout_s: float | None = None):
    """-> Dataset of ``fn``'s output over the non-poison rows; poison
    rows land under ``dead_dir`` (read back with `read_dead`). Use a
    fresh ``dead_dir`` per run; on multi-node it must be shared storage
    (same requirement as `extract_streaming`). ``timeout_s`` arms a
    per-(sub)batch watchdog: rows that hang past the budget are
    isolated and quarantined exactly like raising rows."""
    os.makedirs(dead_dir, exist_ok=True)
    if timeout_s is not None:
        fn = _with_timeout(fn, timeout_s)

    def apply(t: pa.Table) -> pa.Table:
        try:
            return fn(t)
        except Exception as e:
            if t.num_rows <= 1:
                _write_dead(dead_dir, t.column(id_col).to_pylist(),
                            stage, [repr(e)])
                return None
            mid = t.num_rows // 2
            parts = [apply(t.slice(0, mid)), apply(t.slice(mid))]
            parts = [p for p in parts if p is not None and p.num_rows]
            if not parts:
                return None
            return pa.concat_tables(parts, promote_options="default")

    def guarded(t: pa.Table) -> pa.Table:
        out = apply(t)
        if out is not None:
            return out
        # all rows poison: emit a typed empty table from a clean probe
        # (fall back to the input schema if the UDF rejects empties)
        try:
            probe = fn(t.slice(0, 0))
        except Exception:
            probe = None
        return probe if probe is not None else t.slice(0, 0)

    kw = {} if batch_size is None else {"batch_size": batch_size}
    return ds.map_batches(guarded, batch_format="pyarrow", **kw)


def read_dead(dead_dir: str):
    """Dataset of quarantined rows (id, stage, error); empty-typed when
    no shard was written."""
    import glob

    import ray.data as rd

    files = glob.glob(os.path.join(dead_dir, "dead_*.parquet"))
    if not files:
        return rd.from_arrow(pa.table({
            "id": pa.array([], pa.string()),
            "stage": pa.array([], pa.string()),
            "error": pa.array([], pa.string())}))
    return rd.read_parquet(files)
