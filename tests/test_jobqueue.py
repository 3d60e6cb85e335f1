"""Durable job queue (`state/jobqueue.py`): the batch analog of the
reference's processing-service queue (process.py:40-73 content-hash
cache + work_queue.py:15-29 OOM re-enqueue)."""

from __future__ import annotations

from cosmos_ray.state.jobqueue import JobQueue


def test_submit_run_done_and_content_cache(tmp_path):
    q = JobQueue(str(tmp_path / "q"))
    jid = q.submit({"pipeline": "kg", "input": "a.parquet", "batch_size": 256})
    assert q.status(jid)["state"] == "queued"
    # identical params -> same id (content-keyed cache)
    assert q.submit({"batch_size": 256, "input": "a.parquet",
                     "pipeline": "kg"}) == jid

    def worker(params, attempt):
        return {"rows": 42, "batch_size": params["batch_size"]}

    st = q.run_next(worker)
    assert st["state"] == "done" and st["result"]["rows"] == 42
    assert q.status(jid)["state"] == "done"
    # resubmit after done still returns the cached job
    assert q.submit({"pipeline": "kg", "input": "a.parquet",
                     "batch_size": 256}) == jid
    assert q.run_next(worker) is None  # queue drained


def test_failure_reenqueues_with_halved_batch_then_succeeds(tmp_path):
    q = JobQueue(str(tmp_path / "q"), max_attempts=3)
    jid = q.submit({"input": "big.parquet", "batch_size": 512})
    seen = []

    def worker(params, attempt):
        seen.append((attempt, params["batch_size"]))
        if params["batch_size"] > 128:
            raise MemoryError("simulated OOM")
        return {"rows": 7}

    sts = q.drain(worker)
    # attempt 0 @512 OOM -> requeue @256; attempt 1 @256 OOM -> requeue
    # @128; attempt 2 @128 succeeds
    assert seen == [(0, 512), (1, 256), (2, 128)]
    assert sts[-1]["state"] == "done"
    assert len(q.status(jid)["errors"]) == 2


def test_exhausted_attempts_park_in_failed_and_retry(tmp_path):
    q = JobQueue(str(tmp_path / "q"), max_attempts=2)
    jid = q.submit({"input": "bad.parquet", "batch_size": 8})

    def worker(params, attempt):
        raise ValueError("always broken")

    q.drain(worker)
    st = q.status(jid)
    assert st["state"] == "failed" and len(st["errors"]) == 2
    assert q.list_jobs()["failed"] == [jid]
    # operator retry: back to queued with fresh budget, history kept
    assert q.retry_failed(jid)
    st = q.status(jid)
    assert st["state"] == "queued" and st["attempt"] == 0 and st["errors"]


def test_lease_is_exclusive_under_racing_workers(tmp_path):
    """Two workers draining the same directory never double-run a job
    (atomic rename leasing)."""
    q1 = JobQueue(str(tmp_path / "q"))
    q2 = JobQueue(str(tmp_path / "q"))
    ids = [q1.submit({"n": i}) for i in range(20)]
    runs: list[str] = []

    def worker(params, attempt):
        runs.append(json.dumps(params, sort_keys=True))
        return {"ok": True}

    import json
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        list(pool.map(lambda q: q.drain(worker), [q1, q2]))
    assert len(runs) == 20 and len(set(runs)) == 20
    assert sorted(q1.list_jobs()["done"]) == sorted(ids)


def test_reclaim_stale_lease_walks_retry_ladder(tmp_path):
    """A worker killed without an exception (OOM-kill) leaves its lease
    in running/; reclaim_stale re-enqueues it as a failed attempt with
    the halved batch size, and repeated reclaims park it in failed/."""
    import os
    import time

    q = JobQueue(str(tmp_path / "q"), max_attempts=2)
    jid = q.submit({"input": "x", "batch_size": 64})

    # simulate the kill: lease the job and never finish it
    rec = q._lease()
    assert rec["job_id"] == jid
    lease = q._path("running", jid)
    old = time.time() - 3600
    os.utime(lease, (old, old))

    assert q.reclaim_stale(600) == [jid]
    st = q.status(jid)
    assert st["state"] == "queued" and st["attempt"] == 1
    assert st["params"]["batch_size"] == 32
    assert "lease expired" in st["errors"][0]

    rec = q._lease()
    os.utime(q._path("running", jid), (old, old))
    assert q.reclaim_stale(600) == [jid]
    assert q.status(jid)["state"] == "failed"
    # young leases are left alone
    jid2 = q.submit({"input": "y"})
    q._lease()
    assert q.reclaim_stale(600) == []


def test_expire_frees_content_key_for_resubmit(tmp_path):
    import os
    import time

    q = JobQueue(str(tmp_path / "q"))
    jid = q.submit({"input": "x"})
    q.run_next(lambda p, a: {"ok": True})
    assert q.status(jid)["state"] == "done"
    # fresh results are kept
    assert q.expire(3600) == []
    done = q._path("done", jid)
    old = time.time() - 7200
    os.utime(done, (old, old))
    assert q.expire(3600) == [jid]
    assert q.status(jid)["state"] == "unknown"
    # the content key is free again: same params -> a NEW queued job
    assert q.submit({"input": "x"}) == jid
    assert q.status(jid)["state"] == "queued"
