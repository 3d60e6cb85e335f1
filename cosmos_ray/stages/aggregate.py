"""Document-level aggregations: sections, full-document rollup, and
caption<->object association.

Reference analogs:
- ``aggregate_sections``: per-pdf reading-order sort then split on
  Section Header rows, concatenating Body Text into each section
  (`ingest/process/aggregation/aggregate.py:115-190`);
- ``aggregate_pdf`` full-document rollup (`aggregate.py:213-229`);
- ``caption_associate``: greedy nearest-centroid caption->object
  matching per page (`aggregate.py:46-112`).

Shape: one hash shuffle keyed by url, executed as a coarse-bucket
groupby (per-group python overhead amortized; every url lands wholly in
one bucket). Reading order is ALWAYS recomputed inside the group from
(page_num, y, x) — block arrival order is never trusted under parallel
execution (SURVEY.md §7 hard part (c), reference `ocr/ocr.py:81`).
"""

from __future__ import annotations

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


def _reading_order(g: pd.DataFrame) -> pd.DataFrame:
    bbs = g["bbox"].tolist()
    y1 = np.array([b[1] for b in bbs])
    x1 = np.array([b[0] for b in bbs])
    order = np.lexsort((x1, y1, g["page_num"].to_numpy()))
    return g.iloc[order]


def _sections_for_url(g: pd.DataFrame) -> list[dict]:
    g = _reading_order(g)
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


def aggregate_sections(segments_ds, num_buckets: int = 64):
    """classified segments -> sections table (grouped by url)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t.column("url").to_pylist(), dtype=object))
        return t.append_column("__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def build(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        rows: list[dict] = []
        for _, g in df.groupby("url", sort=False):
            rows.extend(_sections_for_url(g))
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
            g = _reading_order(g)
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

    captions = page_df[page_df["cls"] == caption_cls]
    objects = page_df[page_df["cls"] == object_cls]
    pool = [(int(r.seg_id), centroid(r.bbox), r.text, r.bbox) for r in objects.itertuples(index=False)]
    out = []
    for c in captions.itertuples(index=False):
        if not pool:
            out.append({"caption_seg_id": int(c.seg_id), "caption_text": c.text,
                        "object_seg_id": None, "object_text": None})
            continue
        cx, cy = centroid(c.bbox)
        dists = [((p[1][0] - cx) ** 2 + (p[1][1] - cy) ** 2) for p in pool]
        j = int(np.argmin(dists))
        seg_id, _, text, _ = pool.pop(j)
        out.append({"caption_seg_id": int(c.seg_id), "caption_text": c.text,
                    "object_seg_id": seg_id, "object_text": text})
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
