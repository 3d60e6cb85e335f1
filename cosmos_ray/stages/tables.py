"""Structured table-content extraction: <table> -> (row, col, cell) rows.

Web analog of the reference's camelot/pdfplumber table parse, which emits
per-table cell dataframes with row/col indexes
(`htcosmos/make_parquet.py:786-815`); here the row/col structure comes
from the <tr>/<td|th> markup instead of visual lattice detection.

Shape: stateless vectorized-fanout ``map_batches`` over the raw pages
(1 page -> 0..N cell rows), same dead-letter posture as the main extract
stage (undecodable html rows are skipped — they are already captured by
the extract dead-letter path). Cell text goes through the same frozen
``normalize_text`` contract as block extraction.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

from cosmos_ray.stages.extract import _SKIP_TAGS, normalize_text

CELLS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("table_idx", pa.int32()),
        ("row_idx", pa.int32()),
        ("col_idx", pa.int32()),
        ("cell_text", pa.string()),
    ]
)


class _TableParser(HTMLParser):
    """Collect (table_idx, row_idx, col_idx, text) for every <td>/<th>
    cell, tracking <table>/<tr> nesting leniently (stdlib HTMLParser
    never raises on malformed markup). Nested tables get their own
    table_idx in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.cells: list[tuple[int, int, int, str]] = []
        self._n_tables = 0
        self._table_stack: list[dict] = []  # {idx, row, col, row_open}
        self._skip_depth = 0
        self._buf: list[str] | None = None

    def reset_state(self) -> None:
        self.reset()
        self.cells.clear()
        self._n_tables = 0
        self._table_stack.clear()
        self._skip_depth = 0
        self._buf = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "table":
            self._flush()
            self._table_stack.append(
                {"idx": self._n_tables, "row": -1, "col": 0, "row_open": False}
            )
            self._n_tables += 1
        elif tag == "tr" and self._table_stack:
            self._flush()
            t = self._table_stack[-1]
            t["row"] += 1
            t["col"] = 0
            t["row_open"] = True
        elif tag in ("td", "th") and self._table_stack:
            self._flush()
            t = self._table_stack[-1]
            if not t["row_open"]:  # lenient: cells outside <tr> open row 0
                t["row"] += 1
                t["col"] = 0
                t["row_open"] = True
            self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in ("td", "th"):
            self._flush()
        elif tag == "tr" and self._table_stack:
            self._flush()
            self._table_stack[-1]["row_open"] = False
        elif tag == "table" and self._table_stack:
            self._flush()
            self._table_stack.pop()

    def handle_data(self, data: str) -> None:
        if self._buf is not None and self._skip_depth == 0:
            self._buf.append(data)

    def _flush(self) -> None:
        if self._buf is not None and self._table_stack:
            t = self._table_stack[-1]
            text = normalize_text("".join(self._buf))
            if text:
                self.cells.append((t["idx"], t["row"], t["col"], text))
                t["col"] += 1
        self._buf = None


_PARSER: _TableParser | None = None


def parse_table_cells(raw: bytes) -> list[tuple[int, int, int, str]]:
    global _PARSER
    if _PARSER is None:
        _PARSER = _TableParser()
    p = _PARSER
    p.reset_state()
    p.feed(raw.decode("utf-8"))
    p.close()
    return list(p.cells)


def cells_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    o_url: list[str] = []
    o_t: list[int] = []
    o_r: list[int] = []
    o_c: list[int] = []
    o_x: list[str] = []
    for u, raw in zip(urls, htmls):
        try:
            cells = parse_table_cells(raw)
        except Exception:
            continue  # malformed html: the extract dead-letter path owns it
        for ti, ri, ci, text in cells:
            o_url.append(u)
            o_t.append(ti)
            o_r.append(ri)
            o_c.append(ci)
            o_x.append(text)
    return pa.table(
        {
            "url": pa.array(o_url, pa.string()),
            "table_idx": pa.array(o_t, pa.int32()),
            "row_idx": pa.array(o_r, pa.int32()),
            "col_idx": pa.array(o_c, pa.int32()),
            "cell_text": pa.array(o_x, pa.string()),
        },
        schema=CELLS_SCHEMA,
    )


def extract_table_cells(pages_ds, batch_size: int = 256):
    """pages (url, html, ...) -> one row per table cell. Small batch_size
    because input rows carry the wide html binary column."""
    return pages_ds.map_batches(cells_batch, batch_format="pyarrow", batch_size=batch_size)
