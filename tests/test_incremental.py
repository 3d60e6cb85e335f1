"""Incremental KG refresh: folding crawl B into a graph built from
crawl A must equal the single-shot build over A ∪ B, and re-crawling
already-known urls must be idempotent."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

from cosmos_ray.pipelines.incremental import run_kg_update
from cosmos_ray.pipelines.kg import run_kg_streaming
from cosmos_ray.sources.pages import generate_pages_table

SF = "/root/testdata/sf0.001"
TABLES = ("triples", "entities", "adjacency")


def _table(path: str) -> pd.DataFrame:
    df = pq.read_table(path).to_pandas()
    for c in ("aliases", "types"):
        if c in df.columns:
            df[c] = df[c].map(lambda x: "|".join(x))
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _build(pages_tbl, out_dir):
    return run_kg_streaming(rd.from_arrow(pages_tbl), str(out_dir),
                            driver_threshold=0)


def test_update_equals_full_build(tmp_path):
    docs = pq.read_table(f"{SF}/documents.parquet")
    pages = generate_pages_table(docs, inject_faults=False)
    a = pages.slice(0, pages.num_rows // 2)
    b = pages.slice(pages.num_rows // 2)

    full_dir = tmp_path / "full"
    inc_dir = tmp_path / "inc"
    _build(pages, full_dir)
    _build(a, inc_dir)
    metrics = run_kg_update(str(inc_dir), rd.from_arrow(b), driver_threshold=0)
    assert metrics["triples_rows"] > 0

    for name in TABLES:
        want = _table(str(full_dir / name))
        got = _table(str(inc_dir / name))
        assert list(got.columns) == list(want.columns), name
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name


def test_recrawl_is_idempotent(tmp_path):
    docs = pq.read_table(f"{SF}/documents.parquet")
    pages = generate_pages_table(docs, inject_faults=False)
    out = tmp_path / "g"
    _build(pages, out)
    before = {n: _table(str(out / n)) for n in TABLES}

    # re-crawl a third of the urls with identical content: replacement
    # must leave every table exactly as it was
    recrawl = pages.slice(0, pages.num_rows // 3)
    run_kg_update(str(out), rd.from_arrow(recrawl), driver_threshold=0)
    for name in TABLES:
        pd.testing.assert_frame_equal(_table(str(out / name)), before[name],
                                      check_dtype=False)
