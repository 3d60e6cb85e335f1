"""Oracle-CTE parity: the DuckDB reconstruction of the synthetic corpus
(`queries/oracle_gen.py`) must equal the Python goldens
(`sources/pages.golden_corpus`) exactly — this is what makes the driver's
kg_* value-hash checks trustworthy. Pure DuckDB, no Ray."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from cosmos_ray.queries.oracle_gen import with_goldens


@pytest.fixture(scope="module")
def con(documents_small):
    c = duckdb.connect()
    c.register("documents", documents_small)
    return c


def test_blocks_cte_matches_golden_segments(con, golden_small):
    got = con.sql(
        with_goldens(" SELECT url, seg_id, tag, cls, text FROM blocks"
                     " ORDER BY url, seg_id")
    ).arrow()
    exp = golden_small["segments"].select(["url", "seg_id", "tag", "cls", "text"])
    exp = exp.sort_by([("url", "ascending"), ("seg_id", "ascending")])
    got = got.set_column(1, "seg_id", got.column("seg_id").cast(pa.int64()))
    exp = exp.set_column(1, "seg_id", exp.column("seg_id").cast(pa.int64()))
    assert got.equals(exp)


def test_facts_cte_matches_golden_triples(con, golden_small):
    got = con.sql(
        with_goldens(" SELECT DISTINCT url, subj, pred, obj FROM facts"
                     " ORDER BY url, subj, pred, obj")
    ).arrow()
    exp = golden_small["triples"].sort_by(
        [("url", "ascending"), ("subj", "ascending"),
         ("pred", "ascending"), ("obj", "ascending")]
    )
    assert got.equals(exp)


def test_facts_linking_matches_golden_mentions(con, golden_small):
    got = con.sql(
        with_goldens("""
, ends AS (
  SELECT s.canonical_id FROM facts f JOIN surf s ON s.surface = f.subj
  UNION ALL
  SELECT s.canonical_id FROM facts f JOIN surf s ON s.surface = f.obj
)
SELECT canonical_id, count(*) AS n_mentions FROM ends
GROUP BY canonical_id ORDER BY canonical_id
""")
    ).arrow()
    exp = golden_small["mention_counts"].sort_by([("canonical_id", "ascending")])
    assert got.column("canonical_id").equals(exp.column("canonical_id"))
    assert (
        got.column("n_mentions").to_pylist() == exp.column("n_mentions").to_pylist()
    )


def test_table_cells_golden(pages_small, documents_small):
    """Structured cell extraction recovers the planted 2x2 tables with
    exact (table_idx, row_idx, col_idx) structure."""
    import ray.data as rd

    from cosmos_ray.sources.pages import MALFORMED_MOD, MALFORMED_REM, _h
    from cosmos_ray.stages.tables import extract_table_cells

    cells = extract_table_cells(rd.from_arrow(pages_small)).to_pandas()
    doc_ids = documents_small.column("doc_id").to_pylist()
    expect_tables = [
        d for d in doc_ids
        if _h(d, 1) % 5 < 2 and d % MALFORMED_MOD != MALFORMED_REM
    ]
    # duplicate stale crawls (same url) emit cells twice here — the query
    # wrapper dedups via the dup plan; this stage-level golden dedups by url
    cells = cells.drop_duplicates(["url", "table_idx", "row_idx", "col_idx"])
    by_url = cells.groupby("url")
    assert len(by_url) == len(expect_tables)
    for d in expect_tables[:20]:
        url = f"https://web{d % 20}.example.org/p/{d}"
        g = by_url.get_group(url).sort_values(["row_idx", "col_idx"])
        assert g["table_idx"].tolist() == [0, 0, 0, 0]
        assert list(zip(g["row_idx"], g["col_idx"])) == [(0, 0), (0, 1), (1, 0), (1, 1)]
        m1, m2 = _h(d, 2) % 100, _h(d, 3) % 100
        assert g["cell_text"].tolist() == [
            "metric", "value", f"alpha score {m1}", f"beta score {m2}"
        ]


def test_table_cells_nested_and_malformed():
    """Parser handles nested tables, th cells, cells outside tr, and
    skips undecodable html."""
    import ray.data as rd

    from cosmos_ray.stages.tables import cells_batch

    html_ok = (
        b"<html><body><table><tr><th>a</th><td>b</td></tr>"
        b"<tr><td>c</td><td><table><tr><td>x</td></tr></table></td></tr>"
        b"</table><table><td>loose</td></table></body></html>"
    )
    batch = pa.table(
        {
            "url": pa.array(["u1", "u2"], pa.string()),
            "html": pa.array([html_ok, b"\xff\xfebroken"], pa.binary()),
        }
    )
    out = cells_batch(batch).to_pylist()
    assert all(r["url"] == "u1" for r in out)
    flat = [(r["table_idx"], r["row_idx"], r["col_idx"], r["cell_text"]) for r in out]
    assert (0, 0, 0, "a") in flat and (0, 0, 1, "b") in flat
    assert (0, 1, 0, "c") in flat
    assert (1, 0, 0, "x") in flat  # nested table gets its own idx
    assert (2, 0, 0, "loose") in flat  # lenient row-less cell
