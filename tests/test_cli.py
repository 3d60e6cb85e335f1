"""CLI driver smoke: `python -m cosmos_ray.cli` runs end-to-end in a
fresh process (the ray-job-submit surface)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def small_pages_file(tmp_path_factory, documents_small):
    from cosmos_ray.sources.pages import generate_pages_table

    p = tmp_path_factory.mktemp("cli") / "pages.parquet"
    # tiny slice: keep the subprocess fast
    pq.write_table(generate_pages_table(documents_small.slice(0, 60)), str(p))
    return str(p)


def test_cli_streaming_run(small_pages_file, tmp_path):
    out = str(tmp_path / "out")
    env = dict(os.environ, RAY_ADDRESS="local")
    res = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", small_pages_file,
         "--output", out, "--streaming", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo", env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["triples_rows"] > 0
    assert os.path.isdir(os.path.join(out, "triples"))
    assert os.path.isdir(os.path.join(out, "adjacency"))


def test_cli_partitioned_with_aggregations(small_pages_file, tmp_path):
    out = str(tmp_path / "out2")
    env = dict(os.environ, RAY_ADDRESS="local")
    res = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", small_pages_file,
         "--output", out, "--partitions", "2", "--num-cpus", "2",
         "--aggregations", "sections,equations"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo", env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["partitions_done"] == 2
    assert summary["sections_rows"] > 0
    assert summary["equations_rows"] >= 0
    assert os.path.isdir(os.path.join(out, "sections"))


def test_cli_incremental_update(small_pages_file, documents_small, tmp_path):
    """--streaming build on half the crawl, then --update folds in the
    other half; the updated graph gains that half's urls' triples."""
    from cosmos_ray.sources.pages import generate_pages_table

    pages = generate_pages_table(documents_small.slice(0, 60))
    half_a = str(tmp_path / "a.parquet")
    half_b = str(tmp_path / "b.parquet")
    pq.write_table(pages.slice(0, pages.num_rows // 2), half_a)
    pq.write_table(pages.slice(pages.num_rows // 2), half_b)
    out = str(tmp_path / "g")
    env = dict(os.environ, RAY_ADDRESS="local")

    base = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", half_a,
         "--output", out, "--streaming", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo", env=env,
    )
    assert base.returncode == 0, base.stderr[-2000:]
    before = json.loads(base.stdout.strip().splitlines()[-1])["triples_rows"]

    upd = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", half_b,
         "--output", out, "--update", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo", env=env,
    )
    assert upd.returncode == 0, upd.stderr[-2000:]
    after = json.loads(upd.stdout.strip().splitlines()[-1])["triples_rows"]
    assert after > before


def test_cli_streaming_from_warc(documents_small, tmp_path):
    """--input-format warc: the streaming build ingests raw ISO-28500
    shards directly (sources/warc.py)."""
    from cosmos_ray.sources.pages import generate_pages_table
    from cosmos_ray.sources.warc import write_warc_shard

    t = generate_pages_table(documents_small.slice(0, 60))
    rows = list(zip(t.column("url").to_pylist(),
                    [x.value for x in t.column("warc_ts")],
                    t.column("html").to_pylist()))
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    for k in range(2):
        (warc_dir / f"shard-{k}.warc").write_bytes(
            write_warc_shard(rows[k::2]))
    out = str(tmp_path / "out_warc")
    env = dict(os.environ, RAY_ADDRESS="local")
    res = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", str(warc_dir),
         "--output", out, "--streaming", "--num-cpus", "2",
         "--input-format", "warc"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["triples_rows"] > 0
    assert os.path.isdir(os.path.join(out, "triples"))


def test_cli_warc_requires_streaming(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", "x",
         "--output", str(tmp_path / "o"), "--input-format", "warc"],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert res.returncode != 0
    assert "requires --streaming" in res.stderr


def test_cli_queue_submit_and_drain(small_pages_file, tmp_path):
    """The service-queue surface: submit a job via --queue, run it via
    --drain-queue, poll its durable status file."""
    out = str(tmp_path / "qout")
    qdir = str(tmp_path / "queue")
    env = dict(os.environ, RAY_ADDRESS="local")
    sub = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", small_pages_file,
         "--output", out, "--streaming", "--queue", qdir],
        capture_output=True, text=True, timeout=120, cwd="/root/repo", env=env)
    assert sub.returncode == 0, sub.stderr[-2000:]
    job = json.loads(sub.stdout.strip().splitlines()[-1])
    assert job["state"] == "queued"
    drain = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--drain-queue", qdir,
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo", env=env)
    assert drain.returncode == 0, drain.stderr[-2000:]
    summary = json.loads(drain.stdout.strip().splitlines()[-1])
    assert summary["ran"] == 1 and summary["states"] == ["done"]
    assert os.path.isdir(os.path.join(out, "triples"))

    from cosmos_ray.state.jobqueue import JobQueue

    assert JobQueue(qdir).status(job["job_id"])["state"] == "done"


def test_cli_serve_http_job_lifecycle(small_pages_file, tmp_path):
    """The HTTP service surface end-to-end (cosmos_service analog):
    start `--serve` in a fresh process, POST a streaming job over HTTP,
    poll status to completion, fetch the result manifest, and verify
    the output tables landed on disk."""
    import time
    import urllib.error
    import urllib.request

    out = str(tmp_path / "sout")
    qdir = str(tmp_path / "squeue")
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.Popen(
        [sys.executable, "-m", "cosmos_ray.cli", "--serve", qdir,
         "--serve-port", "0", "--num-cpus", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo", env=env)
    try:
        line = proc.stdout.readline()
        base = json.loads(line)["serving"]

        def req(method, url, body=None):
            data = json.dumps(body).encode() if body is not None else None
            r = urllib.request.Request(url, data=data, method=method)
            if data is not None:
                r.add_header("Content-Type", "application/json")
            try:
                with urllib.request.urlopen(r, timeout=10) as resp:
                    return resp.status, json.loads(resp.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, sub = req("POST", f"{base}/process/", {
            "input": small_pages_file, "output": out, "streaming": True})
        assert code == 201, sub
        jid = sub["job_id"]
        deadline = time.time() + 240
        st = {}
        while time.time() < deadline:
            code, st = req("GET", f"{base}/process/{jid}/status")
            if st.get("state") in ("done", "failed"):
                break
            time.sleep(0.5)
        assert st.get("state") == "done", st
        code, res = req("GET", f"{base}/process/{jid}/result")
        assert code == 200 and res["result"]["ok"] is True
        assert os.path.isdir(os.path.join(out, "triples"))
        # identical params over HTTP -> cache hit on the same job
        code, sub2 = req("POST", f"{base}/process/", {
            "input": small_pages_file, "output": out, "streaming": True})
        assert code == 200 and sub2["cached"] and sub2["job_id"] == jid
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_warc_revisit_dedup_end_to_end(tmp_path):
    """--revisit-dedup on the WARC streaming path: the revisit-renewed
    OLD capture wins over the newer (vandalized) response, end to end
    through the CLI into the graph tables."""
    from cosmos_ray.sources.warc import write_warc_revisit, write_warc_shard

    old_html = (b"<html><body><p>Ada Lovelace founded Analytical Engines"
                b" in London.</p></body></html>")
    new_html = (b"<html><body><p>SPAM SPAM SPAM nothing here"
                b"</p></body></html>")
    shard = write_warc_shard([
        ("http://r/1", 1_000_000, old_html),
        ("http://r/1", 2_000_000, new_html),
    ])
    shard += write_warc_revisit(
        "http://r/1", 9_000_000, "http://r/1", 1_000_000, "sha1:D")
    p = tmp_path / "rv.warc"
    p.write_bytes(shard)
    out = str(tmp_path / "out")
    env = dict(os.environ, RAY_ADDRESS="local")
    res = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", str(p),
         "--output", out, "--streaming", "--input-format", "warc",
         "--revisit-dedup", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    import pyarrow.parquet as _pq
    import glob as _glob

    # streaming writes triples; read them to confirm the OLD content won
    tris = []
    for f in _glob.glob(os.path.join(out, "triples", "*.parquet")):
        tris.extend(_pq.read_table(f).to_pylist())
    assert any(t["subj"] == "Ada Lovelace" for t in tris), tris
    assert not any("SPAM" in (t["subj"] + t["obj"]) for t in tris)


def test_cli_revisit_dedup_requires_warc(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "cosmos_ray.cli", "--input", "x",
         "--output", str(tmp_path / "o"), "--streaming",
         "--revisit-dedup"],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert res.returncode != 0
    assert "requires --input-format warc" in res.stderr
