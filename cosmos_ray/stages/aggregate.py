"""Document-level aggregations: sections, full-document rollup,
caption<->object association, and equation<->label association.

Reference analogs:
- ``aggregate_sections``: per-pdf reading-order sort then split on
  Section Header rows, concatenating Body Text into each section
  (`ingest/process/aggregation/aggregate.py:115-190`);
- ``aggregate_pdf`` full-document rollup (`aggregate.py:213-229`);
- ``caption_associate``: greedy nearest-centroid caption->object
  matching per page (`aggregate.py:46-112`);
- ``aggregate_equations``: find ``(X.Y)``-pattern labels in the text
  layer near each equation and associate by nearest label midline
  (`aggregation/reaggregate_equations.py:13,61-120`), emitting the
  reference's ``_equations.parquet`` row shape (`aggregate.py:33-41`).

Shape: one hash shuffle keyed by url, executed as a coarse-bucket
groupby (per-group python overhead amortized; every url lands wholly in
one bucket). Reading order is ALWAYS recomputed inside the group from
(page_num, y, x) — block arrival order is never trusted under parallel
execution (SURVEY.md §7 hard part (c), reference `ocr/ocr.py:81`).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

SECTION_HEADERS = ("Title", "Section Header")
BODY_CLASSES = ("Body Text", "List Item", "Table", "Other")

SECTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("section_id", pa.int32()),
        ("section_header", pa.string()),
        ("section_header_page", pa.int32()),
        ("content", pa.string()),
        ("obj_seg_ids", pa.list_(pa.int32())),
        ("obj_pages", pa.list_(pa.int32())),
        ("obj_bbs", pa.list_(pa.list_(pa.float32(), 4))),
    ]
)

DOCS_ROLLUP_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("content", pa.string()),
        ("obj_pages", pa.list_(pa.int32())),
        ("obj_bbs", pa.list_(pa.list_(pa.float32(), 4))),
    ]
)


def _reading_order(g: pd.DataFrame, column_split: float | None = None) -> pd.DataFrame:
    """Per-document reading order. Single-column (default): (page, y, x).
    Multi-column (``column_split`` px, the reference export's ``x // 500``
    column-break heuristic, `parquet_to_json.py:42-94`): whole left
    column before right column within each page — (page, x-bin, y, x)."""
    bbs = g["bbox"].tolist()
    y1 = np.array([b[1] for b in bbs])
    x1 = np.array([b[0] for b in bbs])
    page = g["page_num"].to_numpy()
    if column_split:
        xbin = (x1 // column_split).astype(np.int64)
        order = np.lexsort((x1, y1, xbin, page))
    else:
        order = np.lexsort((x1, y1, page))
    return g.iloc[order]


def _sections_for_url(g: pd.DataFrame, column_split: float | None = None) -> list[dict]:
    g = _reading_order(g, column_split)
    url = g["url"].iloc[0]
    out: list[dict] = []
    cur: dict | None = None
    for r in g.itertuples(index=False):
        if r.cls in SECTION_HEADERS:
            if cur is not None:
                out.append(cur)
            cur = {
                "url": url,
                "section_id": len(out),
                "section_header": r.text,
                "section_header_page": int(r.page_num),
                "content": "",
                "obj_seg_ids": [],
                "obj_pages": [],
                "obj_bbs": [],
            }
        else:
            if cur is None:  # preamble before any header
                cur = {
                    "url": url,
                    "section_id": 0,
                    "section_header": "",
                    "section_header_page": 0,
                    "content": "",
                    "obj_seg_ids": [],
                    "obj_pages": [],
                    "obj_bbs": [],
                }
            cur["content"] = (cur["content"] + "\n" + r.text) if cur["content"] else r.text
            cur["obj_seg_ids"].append(int(r.seg_id))
            cur["obj_pages"].append(int(r.page_num))
            cur["obj_bbs"].append([float(v) for v in r.bbox])
    if cur is not None:
        out.append(cur)
    return out


# The reference export applies its column-break heuristic
# unconditionally (`parquet_to_json.py:42-94`, x // 500 on its page
# width); ours defaults to the synthetic 1920-px page midline. On
# single-column layouts every x-bin is identical, so the default is a
# no-op there — it only reorders genuinely two-column pages.
DEFAULT_COLUMN_SPLIT = 960.0


def aggregate_sections(segments_ds, num_buckets: int = 64,
                       column_split: float | None = DEFAULT_COLUMN_SPLIT):
    """classified segments -> sections table (grouped by url).
    ``column_split`` sets the multi-column reading-order break
    (``None`` disables — plain (page, y, x) order)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t.column("url").to_pylist(), dtype=object))
        return t.append_column("__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def build(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        rows: list[dict] = []
        for _, g in df.groupby("url", sort=False):
            rows.extend(_sections_for_url(g, column_split))
        if not rows:
            return SECTIONS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=SECTIONS_SCHEMA)

    return (
        segments_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(build, batch_format="pyarrow")
    )


def aggregate_documents(segments_ds, num_buckets: int = 64):
    """Full-document rollup: reading-order concat of every segment's text
    + collected pages/bboxes (reference `aggregate_pdf`)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t.column("url").to_pylist(), dtype=object))
        return t.append_column("__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def build(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        rows = []
        for url, g in df.groupby("url", sort=False):
            g = _reading_order(g, DEFAULT_COLUMN_SPLIT)
            rows.append(
                {
                    "url": url,
                    "content": "\n".join(g["text"].tolist()),
                    "obj_pages": [int(p) for p in g["page_num"]],
                    "obj_bbs": [[float(v) for v in b] for b in g["bbox"]],
                }
            )
        if not rows:
            return DOCS_ROLLUP_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=DOCS_ROLLUP_SCHEMA)

    return (
        segments_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(build, batch_format="pyarrow")
    )


def caption_associate(page_df: pd.DataFrame, caption_cls: str, object_cls: str) -> list[dict]:
    """Greedy nearest-centroid caption->object association within one
    page (reference `caption_associate`, `aggregate.py:46-112`): each
    caption claims the closest unclaimed object by squared centroid
    distance."""

    def centroid(b) -> tuple[float, float]:
        return ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)

    from cosmos_ray.functions.geometry import spatial_join_text

    captions = page_df[page_df["cls"] == caption_cls]
    objects = page_df[page_df["cls"] == object_cls]
    pool = [(int(r.seg_id), centroid(r.bbox), r.text, r.bbox) for r in objects.itertuples(index=False)]
    # J1 text pooling (`ocr/ocr.py:53-86`): per caption, the text of every
    # page line whose feathered box overlaps it, in (y2, x1) order — the
    # caption's surrounding context window
    if len(captions):
        cap_boxes = np.asarray([list(b) for b in captions["bbox"]], dtype=np.float64)
        line_boxes = np.asarray([list(b) for b in page_df["bbox"]], dtype=np.float64)
        pooled = spatial_join_text(
            cap_boxes, line_boxes, page_df["text"].tolist(), feather=150.0
        )
    else:
        pooled = []
    out = []
    for k, c in enumerate(captions.itertuples(index=False)):
        rec = {"caption_seg_id": int(c.seg_id), "caption_text": c.text,
               "object_seg_id": None, "object_text": None,
               "nearby_text": pooled[k]}
        if pool:
            cx, cy = centroid(c.bbox)
            dists = [((p[1][0] - cx) ** 2 + (p[1][1] - cy) ** 2) for p in pool]
            j = int(np.argmin(dists))
            seg_id, _, text, _ = pool.pop(j)
            rec["object_seg_id"] = seg_id
            rec["object_text"] = text
        out.append(rec)
    return out


def associate_captions(segments_ds, caption_cls: str = "Table Caption",
                       object_cls: str = "Table", num_buckets: int = 64):
    """Grouped caption association over (url, page): one output row per
    caption with its matched object (or nulls)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t.column("url").to_pylist(), dtype=object))
        return t.append_column("__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def build(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        rows = []
        for (url, page), g in df.groupby(["url", "page_num"], sort=False):
            for rec in caption_associate(g, caption_cls, object_cls):
                rec["url"] = url
                rec["page_num"] = int(page)
                rows.append(rec)
        schema = pa.schema(
            [
                ("caption_seg_id", pa.int32()),
                ("caption_text", pa.string()),
                ("object_seg_id", pa.int32()),
                ("object_text", pa.string()),
                ("nearby_text", pa.string()),
                ("url", pa.string()),
                ("page_num", pa.int32()),
            ]
        )
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pylist(rows, schema=schema)

    return (
        segments_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(build, batch_format="pyarrow")
    )


# the reference's equation-label pattern, r'[\(ð][1-9A-Z]+.?[0-9A-Za-z]*[\)Þ]'
# (`reaggregate_equations.py:13`; ð/Þ are pdfminer mis-decodings of parens)
_EQ_LABEL = re.compile(r"[\(ð][1-9A-Z]+\.?[0-9A-Za-z]*[\)Þ]")

# a label candidate must sit within this absolute-midline distance of the
# equation (two synthetic line pitches; the reference bounds its search to
# text lines near the expanded equation bbox)
_EQ_LABEL_MAX_DIST = 300.0

_PAGE_H_ABS = 1920.0

EQUATIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("equation_page", pa.int32()),
        ("equation_bb", pa.list_(pa.float32(), 4)),
        ("label", pa.string()),
        ("content", pa.string()),
        ("detect_score", pa.float32()),
    ]
)


def _equations_for_url(g: pd.DataFrame) -> list[dict]:
    """One document's equation rows with nearest-midline label
    association (`reaggregate_equations.py:61-75,86-120`)."""
    eqs = g[g["cls"] == "Equation"]
    if not len(eqs):
        return []
    url = g["url"].iloc[0]

    def midline(r) -> float:
        return float(r.page_num) * _PAGE_H_ABS + (r.bbox[1] + r.bbox[3]) / 2.0

    labels = [
        (midline(r), r.text)
        for r in g.itertuples(index=False)
        if r.cls != "Equation" and _EQ_LABEL.fullmatch(r.text.strip())
    ]
    out = []
    for r in eqs.itertuples(index=False):
        m = midline(r)
        label = None
        if labels:
            dists = [abs(lm - m) for lm, _ in labels]
            j = int(np.argmin(dists))
            if dists[j] <= _EQ_LABEL_MAX_DIST:
                label = labels[j][1]
        out.append(
            {
                "url": url,
                "equation_page": int(r.page_num),
                "equation_bb": [float(v) for v in r.bbox],
                "label": label,
                "content": r.text,
                "detect_score": float(r.score),
            }
        )
    return out


def aggregate_equations(segments_ds, num_buckets: int = 64):
    """classified segments -> equations table (G4): one row per Equation
    segment with its associated ``(X.Y)`` label (or null). Same
    coarse-bucket url shuffle as the other aggregations."""

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t.column("url").to_pylist(), dtype=object))
        return t.append_column("__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def build(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        rows: list[dict] = []
        for _, g in df.groupby("url", sort=False):
            rows.extend(_equations_for_url(g))
        if not rows:
            return EQUATIONS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=EQUATIONS_SCHEMA)

    return (
        segments_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(build, batch_format="pyarrow")
    )
