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
