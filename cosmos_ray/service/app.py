"""HTTP job service — the serving facade over the durable job queue.

Reference analog: the `cosmos_service` FastAPI app
(`cosmos_service/src/routers/process.py:40-75`): POST a processing job
(content-hash cached, 57-60), poll status, fetch the result when done;
`src/work_queue.py:15-29` drains the queue in background workers with
OOM-halved-batch retry; `src/scheduler.py:9-35` expires finished jobs
on a cron. All of that lifecycle already exists filesystem-atomically
in `state/jobqueue.py` — this module is ONLY the HTTP surface: a
stdlib ``ThreadingHTTPServer`` (no framework deps, per the
no-new-packages rule) translating requests into queue calls, plus
optional in-process drain workers and an expiry ticker.

Routes (JSON in/out):

- ``POST /process/``            body = job params -> ``{job_id, state,
  cached}``; identical params return the EXISTING job (``cached:
  true``) — the reference's whole-job content cache.
- ``GET  /process/<id>/status`` -> the queue record (state, attempt,
  errors, result when finished).
- ``GET  /process/<id>/result`` -> the result manifest; 409 + state
  while the job is still queued/running, 404 for unknown ids.
- ``GET  /jobs``                -> ``{queued: [...], running: [...],
  done: [...], failed: [...]}``.
- ``POST /process/<id>/retry``  -> re-enqueue a parked failed job.

Deployment shape: the queue directory is shared POSIX storage, so any
number of service replicas and external drain workers (``cosmos-ray
--drain-queue``) cooperate through rename-atomic leases — the HTTP
layer holds NO state of its own and can be restarted freely.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from cosmos_ray.state.jobqueue import JobQueue


class JobService:
    """Thin HTTP front end over a :class:`JobQueue`.

    ``worker``: callable ``(params: dict, attempt: int) -> dict`` run by
    ``workers`` background drain threads (0 = serve-only; drain with
    external CLI workers). ``expire_after_s``: finished records older
    than this are deleted by a background ticker (the reference's 24 h
    scheduler cron, `cosmos_service/src/scheduler.py:9-35`);
    ``reclaim_after_s``: stale running leases are re-enqueued on the
    same ticker."""

    def __init__(self, queue: JobQueue, worker=None, workers: int = 0,
                 poll_s: float = 0.05, expire_after_s: float | None = None,
                 reclaim_after_s: float | None = None,
                 tick_s: float = 1.0) -> None:
        self.queue = queue
        self.worker = worker
        self.n_workers = workers if worker is not None else 0
        self.poll_s = poll_s
        self.expire_after_s = expire_after_s
        self.reclaim_after_s = reclaim_after_s
        self.tick_s = tick_s
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._httpd: ThreadingHTTPServer | None = None

    # --------------------------------------------------------- lifecycle
    def start(self, host: str = "127.0.0.1", port: int = 0) -> tuple[str, int]:
        """Bind (port 0 = ephemeral), start the serving + drain + ticker
        threads, return the bound (host, port)."""
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: tests/servers own logging
                pass

            def _json(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802 (stdlib casing)
                parts = [p for p in self.path.split("/") if p]
                try:
                    if parts == ["process"]:
                        n = int(self.headers.get("Content-Length", 0))
                        try:
                            params = json.loads(self.rfile.read(n) or b"{}")
                        except json.JSONDecodeError:
                            return self._json(400, {"error": "invalid JSON"})
                        if not isinstance(params, dict):
                            return self._json(
                                400, {"error": "params must be an object"})
                        existed = svc.queue.submit_cached(params)
                        return self._json(200 if existed["cached"] else 201,
                                          existed)
                    if (len(parts) == 3 and parts[0] == "process"
                            and parts[2] == "retry"):
                        ok = svc.queue.retry_failed(parts[1])
                        if not ok:
                            return self._json(
                                404, {"error": "no failed job", "job_id": parts[1]})
                        return self._json(200, svc.queue.status(parts[1]))
                    return self._json(404, {"error": "unknown route"})
                except Exception as e:  # noqa: BLE001 - surface, don't kill the server
                    return self._json(500, {"error": repr(e)})

            def do_GET(self):  # noqa: N802
                parts = [p for p in self.path.split("/") if p]
                try:
                    if parts == ["jobs"]:
                        return self._json(200, svc.queue.list_jobs())
                    if len(parts) == 3 and parts[0] == "process":
                        st = svc.queue.status(parts[1])
                        if st["state"] == "unknown":
                            return self._json(404, st)
                        if parts[2] == "status":
                            return self._json(200, st)
                        if parts[2] == "result":
                            if st["state"] == "done":
                                return self._json(200, {
                                    "job_id": st["job_id"],
                                    "result": st.get("result")})
                            code = 500 if st["state"] == "failed" else 409
                            return self._json(code, {
                                "job_id": st["job_id"], "state": st["state"],
                                "errors": st.get("errors", [])})
                    return self._json(404, {"error": "unknown route"})
                except Exception as e:  # noqa: BLE001
                    return self._json(500, {"error": repr(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        t = threading.Thread(target=self._httpd.serve_forever,
                             name="jobservice-http", daemon=True)
        t.start()
        self._threads.append(t)
        for i in range(self.n_workers):
            w = threading.Thread(target=self._drain_loop,
                                 name=f"jobservice-worker-{i}", daemon=True)
            w.start()
            self._threads.append(w)
        if self.expire_after_s is not None or self.reclaim_after_s is not None:
            k = threading.Thread(target=self._ticker,
                                 name="jobservice-ticker", daemon=True)
            k.start()
            self._threads.append(k)
        return self._httpd.server_address[0], self._httpd.server_address[1]

    def stop(self) -> None:
        self._stop.set()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        for t in self._threads:
            t.join(timeout=5)
        self._threads.clear()

    # --------------------------------------------------------- background
    def _drain_loop(self) -> None:
        """`work_queue.py:15-29` analog: lease-run-publish until stopped;
        empty queue = sleep one poll. Failures re-enqueue with halved
        batch_size inside run_next — nothing to do here."""
        while not self._stop.is_set():
            st = self.queue.run_next(self.worker)
            if st is None:
                self._stop.wait(self.poll_s)

    def _ticker(self) -> None:
        while not self._stop.is_set():
            if self.reclaim_after_s is not None:
                self.queue.reclaim_stale(self.reclaim_after_s)
            if self.expire_after_s is not None:
                self.queue.expire(self.expire_after_s)
            self._stop.wait(self.tick_s)
