"""Durable job queue — the batch analog of the reference's processing
service queue.

Reference analog: `cosmos_service/src/routers/process.py:40-73` accepts
a document job, caches by content hash (57-60), and polls status;
`work_queue.py:15-29` re-enqueues OOM-killed jobs at a reduced batch
size. An HTTP server is out of scope for a batch engine, but the
LIFECYCLE is not: this module gives the same contract over shared
POSIX storage so any number of `ray job submit`-style workers can
cooperate.

Design (single directory, crash-safe, multi-worker):

- a job is a JSON file; its id is the md5 of its canonical params
  (content-keyed: re-submitting identical work returns the existing
  job — the reference's whole-job cache);
- state = which subdirectory the file lives in (``queued/ running/
  done/ failed``); ALL transitions are atomic ``os.rename`` of that
  file, so two workers can never lease the same job (exactly one
  rename wins; the loser gets FileNotFoundError and moves on);
- failure re-enqueues with ``batch_size`` halved (the OOM-retry
  analog) until ``max_attempts``, then parks the job in ``failed/``
  with the error chain;
- results (row counts, wall time, output path) ride in the job file;
  ``status()`` is one small-file read — the polling surface.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

_STATES = ("queued", "running", "done", "failed")


class JobQueue:
    def __init__(self, root: str, max_attempts: int = 3) -> None:
        self.root = root
        self.max_attempts = max_attempts
        for s in _STATES:
            os.makedirs(os.path.join(root, s), exist_ok=True)

    # ------------------------------------------------------------ paths
    def _path(self, state: str, job_id: str) -> str:
        return os.path.join(self.root, state, job_id + ".json")

    def _find(self, job_id: str) -> tuple[str, str] | None:
        for s in _STATES:
            p = self._path(s, job_id)
            if os.path.exists(p):
                return s, p
        return None

    def _write(self, path: str, rec: dict) -> None:
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, path)

    # ------------------------------------------------------------- API
    def submit(self, params: dict) -> str:
        """Content-keyed submit: identical params -> the SAME job id,
        whatever state it is in (the reference's content-hash job
        cache); new work lands in ``queued/``."""
        canon = json.dumps(params, sort_keys=True)
        job_id = hashlib.md5(canon.encode()).hexdigest()
        if self._find(job_id) is not None:
            return job_id
        self._write(self._path("queued", job_id), {
            "job_id": job_id, "params": params, "attempt": 0,
            "submitted_at": time.time(), "errors": []})
        return job_id

    def submit_cached(self, params: dict) -> dict:
        """`submit` plus the reference service's cache semantics
        (`cosmos_service/src/routers/process.py:57-60`): report whether
        the content-keyed job already existed. -> {job_id, state,
        cached}."""
        canon = json.dumps(params, sort_keys=True)
        job_id = hashlib.md5(canon.encode()).hexdigest()
        cached = self._find(job_id) is not None
        if not cached:
            job_id = self.submit(params)
        st = self._find(job_id)
        return {"job_id": job_id, "cached": cached,
                "state": st[0] if st else "queued"}

    def status(self, job_id: str) -> dict:
        """One small-file read: {state, attempt, result?, errors}."""
        found = self._find(job_id)
        if found is None:
            return {"state": "unknown", "job_id": job_id}
        state, path = found
        with open(path) as f:
            rec = json.load(f)
        rec["state"] = state
        return rec

    def list_jobs(self) -> dict[str, list[str]]:
        return {s: sorted(f[:-5] for f in os.listdir(os.path.join(self.root, s))
                          if f.endswith(".json"))
                for s in _STATES}

    def retry_failed(self, job_id: str) -> bool:
        """Move a parked failed job back to queued with a fresh attempt
        budget (operator-initiated retry; error history kept)."""
        src = self._path("failed", job_id)
        if not os.path.exists(src):
            return False
        with open(src) as f:
            rec = json.load(f)
        rec["attempt"] = 0
        self._write(self._path("queued", job_id), rec)
        os.remove(src)
        return True

    def _lease(self) -> dict | None:
        """Atomically move the oldest queued job to running/ — exactly
        one concurrent worker wins each job (rename either succeeds or
        raises; no lock files, no partial states)."""
        qdir = os.path.join(self.root, "queued")

        def mtime(f: str) -> float:
            try:
                return os.path.getmtime(os.path.join(qdir, f))
            except FileNotFoundError:
                return float("inf")  # just leased by a racing worker

        names = sorted(
            (f for f in os.listdir(qdir) if f.endswith(".json")), key=mtime)
        for name in names:
            src = os.path.join(qdir, name)
            dst = self._path("running", name[:-5])
            try:
                os.rename(src, dst)
            except FileNotFoundError:
                continue  # another worker won this job
            with open(dst) as f:
                return json.load(f)
        return None

    def run_next(self, worker) -> dict | None:
        """Lease one queued job and run ``worker(params, attempt)``.

        Success -> done/ with the worker's result dict. Exception ->
        the OOM-retry analog: halve ``params['batch_size']`` (if
        present, floor 1) and re-enqueue, until ``max_attempts`` parks
        it in failed/ with the error chain. Returns the final status
        dict, or None when the queue is empty."""
        rec = self._lease()
        if rec is None:
            return None
        job_id = rec["job_id"]
        running = self._path("running", job_id)
        try:
            result = worker(dict(rec["params"]), rec["attempt"])
        except Exception as e:  # noqa: BLE001 - the queue must survive any job
            rec["errors"].append(f"{type(e).__name__}: {e}")
            rec["attempt"] += 1
            if rec["attempt"] >= self.max_attempts:
                dst = self._path("failed", job_id)
            else:
                if isinstance(rec["params"].get("batch_size"), int):
                    rec["params"]["batch_size"] = max(
                        1, rec["params"]["batch_size"] // 2)
                dst = self._path("queued", job_id)
            return self._publish(running, rec, dst, job_id)
        rec["result"] = result
        rec["finished_at"] = time.time()
        return self._publish(running, rec, self._path("done", job_id), job_id)

    def _publish(self, running: str, rec: dict, dst: str,
                 job_id: str) -> dict:
        """Claim the lease for publishing with one atomic rename, THEN
        write the final record and rename it into its destination state.

        If a reclaimer re-enqueued this worker's expired lease while the
        job was still executing, the rename-aside raises
        FileNotFoundError — the lease is LOST: discard the result
        instead of writing it (a plain final _write would recreate the
        running/ file and leave the same job_id in two state dirs). A
        crash between claim and final rename leaves a ``.pub`` orphan
        that ``reclaim_stale`` recovers."""
        pub = running + ".pub"
        try:
            os.rename(running, pub)
        except FileNotFoundError:
            st = self.status(job_id)
            st["lease_lost"] = True
            return st
        self._write(pub, rec)
        os.replace(pub, dst)
        return self.status(job_id)

    def reclaim_stale(self, max_lease_s: float) -> list[str]:
        """Re-enqueue running/ jobs whose lease file is older than
        ``max_lease_s`` — the recovery path for a worker that died
        without an exception (OOM-kill, SIGKILL; `except Exception`
        cannot fire there). Counts as a failed attempt so a job whose
        work itself OOM-kills the worker still walks the halved-batch
        ladder into failed/ instead of looping forever."""
        out: list[str] = []
        rdir = os.path.join(self.root, "running")
        now = time.time()
        # recover orphaned publish claims first: a worker that crashed
        # between its rename-aside and the final rename leaves
        # <id>.json.pub. If the record carries a result the work DID
        # finish — publish it; otherwise it walks the retry ladder below
        # (renamed back to a plain lease, aged like any stale lease).
        for name in os.listdir(rdir):
            if not name.endswith(".json.pub"):
                continue
            path = os.path.join(rdir, name)
            try:
                if now - os.path.getmtime(path) < max_lease_s:
                    continue
                with open(path) as f:
                    rec = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            try:
                if "result" in rec:
                    os.replace(path, self._path("done", rec["job_id"]))
                    out.append(rec["job_id"])
                else:
                    os.replace(path, os.path.join(rdir, name[:-4]))
            except FileNotFoundError:
                continue  # racing reclaimer won
        for name in os.listdir(rdir):
            if not name.endswith(".json"):
                continue
            path = os.path.join(rdir, name)
            try:
                age = now - os.path.getmtime(path)
            except FileNotFoundError:
                continue
            if age < max_lease_s:
                continue
            try:
                with open(path) as f:
                    rec = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            rec["errors"].append(f"lease expired after {int(age)}s")
            rec["attempt"] += 1
            if rec["attempt"] >= self.max_attempts:
                dst = self._path("failed", rec["job_id"])
            else:
                if isinstance(rec["params"].get("batch_size"), int):
                    rec["params"]["batch_size"] = max(
                        1, rec["params"]["batch_size"] // 2)
                dst = self._path("queued", rec["job_id"])
            self._write(path, rec)
            try:
                os.replace(path, dst)
            except FileNotFoundError:
                continue  # racing reclaimer won
            out.append(rec["job_id"])
        return out

    def expire(self, max_age_s: float) -> list[str]:
        """Delete finished (done/failed) job records older than
        ``max_age_s`` — the reference's 24h cron expiry
        (`cosmos_service/src/scheduler.py:9-35`). Frees the
        content-keyed id so identical params can be resubmitted as new
        work. Queued/running jobs are never expired."""
        out: list[str] = []
        now = time.time()
        for state in ("done", "failed"):
            sdir = os.path.join(self.root, state)
            for name in os.listdir(sdir):
                if not name.endswith(".json"):
                    continue
                path = os.path.join(sdir, name)
                try:
                    if now - os.path.getmtime(path) >= max_age_s:
                        os.remove(path)
                        out.append(name[:-5])
                except FileNotFoundError:
                    continue
        return out

    def drain(self, worker, max_jobs: int | None = None,
              reclaim_after_s: float | None = None) -> list[dict]:
        """Run queued jobs (including retries) until the queue is empty
        or ``max_jobs`` executions have happened. ``reclaim_after_s``
        first re-enqueues leases older than that age (set it ABOVE the
        longest legitimate job runtime — a too-short lease double-runs
        a still-working job, the standard lease-timeout tradeoff)."""
        if reclaim_after_s is not None:
            self.reclaim_stale(reclaim_after_s)
        out = []
        while max_jobs is None or len(out) < max_jobs:
            st = self.run_next(worker)
            if st is None:
                break
            out.append(st)
        return out
