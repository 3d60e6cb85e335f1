"""HTTP job service e2e (reference `cosmos_service/tests/test_e2e.py:5-18`
analog: submit over HTTP, poll to completion, fetch the result) plus the
multi-process drain-contention gate over one shared queue directory."""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import threading
import time
import urllib.error
import urllib.request

import pytest

from cosmos_ray.service.app import JobService
from cosmos_ray.state.jobqueue import JobQueue


def _req(method: str, url: str, body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestJobServiceE2E:
    def test_submit_poll_result_cached(self, tmp_path):
        """The reference e2e: POST a job, poll status until done, GET the
        result; an identical re-submit returns the SAME job as a cache
        hit without re-running it."""
        runs = []

        def worker(params, attempt):
            runs.append(params["n"])
            return {"doubled": params["n"] * 2}

        svc = JobService(JobQueue(str(tmp_path / "q")), worker, workers=2)
        host, port = svc.start()
        base = f"http://{host}:{port}"
        try:
            code, sub = _req("POST", f"{base}/process/", {"n": 21})
            assert code == 201 and not sub["cached"]
            jid = sub["job_id"]
            deadline = time.time() + 10
            while time.time() < deadline:
                code, st = _req("GET", f"{base}/process/{jid}/status")
                assert code == 200
                if st["state"] == "done":
                    break
                time.sleep(0.05)
            assert st["state"] == "done"
            code, res = _req("GET", f"{base}/process/{jid}/result")
            assert code == 200 and res["result"] == {"doubled": 42}
            # content-cache: identical params -> same job, no second run
            code, sub2 = _req("POST", f"{base}/process/", {"n": 21})
            assert code == 200 and sub2["cached"] and sub2["job_id"] == jid
            assert runs == [21]
            # listing shows it under done/
            code, jobs = _req("GET", f"{base}/jobs")
            assert code == 200 and jid in jobs["done"]
        finally:
            svc.stop()

    def test_result_conflict_while_pending_and_unknown_404(self, tmp_path):
        gate = threading.Event()

        def worker(params, attempt):
            gate.wait(5)
            return {"ok": True}

        svc = JobService(JobQueue(str(tmp_path / "q")), worker, workers=1)
        host, port = svc.start()
        base = f"http://{host}:{port}"
        try:
            _, sub = _req("POST", f"{base}/process/", {"x": 1})
            jid = sub["job_id"]
            code, res = _req("GET", f"{base}/process/{jid}/result")
            assert code == 409 and res["state"] in ("queued", "running")
            code, _ = _req("GET", f"{base}/process/nope/status")
            assert code == 404
            gate.set()
            deadline = time.time() + 10
            while time.time() < deadline:
                code, res = _req("GET", f"{base}/process/{jid}/result")
                if code == 200:
                    break
                time.sleep(0.05)
            assert code == 200 and res["result"] == {"ok": True}
        finally:
            gate.set()
            svc.stop()

    def test_failed_job_500_and_http_retry(self, tmp_path):
        def worker(params, attempt):
            raise RuntimeError("boom")

        q = JobQueue(str(tmp_path / "q"), max_attempts=2)
        svc = JobService(q, worker, workers=1)
        host, port = svc.start()
        base = f"http://{host}:{port}"
        try:
            _, sub = _req("POST", f"{base}/process/", {"batch_size": 8})
            jid = sub["job_id"]
            deadline = time.time() + 10
            while time.time() < deadline:
                _, st = _req("GET", f"{base}/process/{jid}/status")
                if st["state"] == "failed":
                    break
                time.sleep(0.05)
            assert st["state"] == "failed" and len(st["errors"]) == 2
            # the OOM-retry analog halved batch_size on the way down
            assert st["params"]["batch_size"] == 4
            code, res = _req("GET", f"{base}/process/{jid}/result")
            assert code == 500
            code, st = _req("POST", f"{base}/process/{jid}/retry")
            assert code == 200 and st["state"] == "queued"
        finally:
            svc.stop()

    def test_bad_requests(self, tmp_path):
        svc = JobService(JobQueue(str(tmp_path / "q")))
        host, port = svc.start()
        base = f"http://{host}:{port}"
        try:
            req = urllib.request.Request(
                f"{base}/process/", data=b"not json{", method="POST")
            try:
                urllib.request.urlopen(req, timeout=10)
                code = 200
            except urllib.error.HTTPError as e:
                code = e.code
            assert code == 400
            code, _ = _req("GET", f"{base}/nowhere")
            assert code == 404
        finally:
            svc.stop()


# ------------------------------------------------- drain contention gate

def _drain_proc(qdir: str, marker_dir: str) -> None:
    """One external drain worker (the `--drain-queue` shape): drains the
    shared queue dir until empty. The worker drops an O_EXCL marker per
    (job, execution) — a second execution of the same job would create a
    second marker file."""
    import uuid

    q = JobQueue(qdir)

    def worker(params, attempt):
        path = os.path.join(
            marker_dir, f"{params['i']:04d}.{uuid.uuid4().hex}")
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        return {"i": params["i"]}

    q.drain(worker)


class TestConcurrentDrainers:
    def test_no_job_runs_twice_across_processes(self, tmp_path):
        """N concurrent drain processes on ONE queue dir: every job
        completes exactly once (rename-atomic leasing), nothing is left
        queued/running, and no content key reports two executions."""
        qdir = str(tmp_path / "q")
        marker_dir = str(tmp_path / "markers")
        os.makedirs(marker_dir)
        q = JobQueue(qdir)
        n_jobs = 40
        ids = [q.submit({"i": i}) for i in range(n_jobs)]
        assert len(set(ids)) == n_jobs

        ctx = mp.get_context("spawn")
        procs = [ctx.Process(target=_drain_proc, args=(qdir, marker_dir))
                 for _ in range(4)]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=60)
            assert p.exitcode == 0

        jobs = q.list_jobs()
        assert len(jobs["done"]) == n_jobs
        assert jobs["queued"] == [] and jobs["running"] == []
        # exactly ONE execution marker per job
        by_job: dict[str, int] = {}
        for name in os.listdir(marker_dir):
            by_job[name.split(".")[0]] = by_job.get(name.split(".")[0], 0) + 1
        assert len(by_job) == n_jobs
        assert all(v == 1 for v in by_job.values()), by_job
        # every result landed
        for jid in ids:
            assert "result" in q.status(jid)

    def test_expiry_frees_content_keys_under_contention(self, tmp_path):
        """Finished jobs expire while new submits race in: the freed
        content key accepts a fresh submission as NEW work."""
        q = JobQueue(str(tmp_path / "q"))
        jid = q.submit({"i": 1})
        q.run_next(lambda p, a: {"ok": True})
        assert q.status(jid)["state"] == "done"
        assert q.expire(0.0) == [jid]
        sub = q.submit_cached({"i": 1})
        assert sub["job_id"] == jid and not sub["cached"]
        assert q.status(jid)["state"] == "queued"


class TestLeaseLostPublish:
    def test_reclaimed_lease_discards_result(self, tmp_path):
        """A worker whose lease was reclaimed mid-run must NOT publish:
        the job id stays in exactly one state dir (the re-enqueued
        copy)."""
        q = JobQueue(str(tmp_path / "q"))
        jid = q.submit({"i": 7})

        def slow_worker(params, attempt):
            # simulate the lease expiring mid-run: a reclaimer moves the
            # running lease back to queued while we are still working
            q.reclaim_stale(0.0)
            return {"late": True}

        st = q.run_next(slow_worker)
        assert st.get("lease_lost") is True
        assert st["state"] == "queued"  # the reclaimed copy
        jobs = q.list_jobs()
        present = [s for s, lst in jobs.items() if jid in lst]
        assert present == ["queued"]  # exactly one state dir
        # the re-run (attempt 2) publishes normally
        st2 = q.run_next(lambda p, a: {"ok": True})
        assert st2["state"] == "done" and st2["result"] == {"ok": True}
