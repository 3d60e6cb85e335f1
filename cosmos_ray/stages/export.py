"""Export operators.

- ``export_docs_json``: parquet -> ordered per-document JSON (reference
  analog: `cosmos_service/src/util/parquet_to_json.py:12-104`, which
  re-orders rows by (page, column-bin, y) and groups by document).
- ``sliding_windows``: the reranker-corpus context splitter (reference
  `retrieval/retrieval/write_dataset.py:36-62`): overlapping word
  windows (default 256 words, stride 64) per document — a flat_map-style
  fan-out done as a vectorized-enough map_batches.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa


def export_docs_json(segments_ds, num_buckets: int = 64):
    """-> (url, json) with segments ordered by (page_num, y-bin, x) —
    reading order recomputed in-group, never trusted from arrival order."""

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t.column("url").to_pylist(), dtype=object))
        return t.append_column("__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def build(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        urls, payloads = [], []
        for url, g in df.groupby("url", sort=False):
            bbs = g["bbox"].tolist()
            y1 = np.array([b[1] for b in bbs])
            x1 = np.array([b[0] for b in bbs])
            xbin = (x1 // 500).astype(np.int64)
            order = np.lexsort((y1, xbin, g["page_num"].to_numpy()))
            g = g.iloc[order]
            payloads.append(
                json.dumps(
                    [
                        {
                            "seg_id": int(r.seg_id),
                            "page": int(r.page_num),
                            "cls": r.cls,
                            "text": r.text,
                        }
                        for r in g.itertuples(index=False)
                    ],
                    ensure_ascii=False,
                )
            )
            urls.append(url)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "json": pa.array(payloads, pa.string())})

    return (
        segments_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(build, batch_format="pyarrow")
    )


def sliding_windows(docs_ds, window: int = 256, stride: int = 64,
                    id_col: str = "doc_id", text_col: str = "text"):
    """1 doc -> N overlapping word windows: (id, window_id, window_text).
    The reranker-corpus generator shape (S11)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        o_id, o_w, o_t = [], [], []
        for did, text in zip(ids, texts):
            words = text.split()
            if not words:
                continue
            starts = range(0, max(1, len(words) - window + stride), stride)
            for wi, s in enumerate(starts):
                chunk = words[s : s + window]
                if not chunk:
                    break
                o_id.append(did)
                o_w.append(wi)
                o_t.append(" ".join(chunk))
                if s + window >= len(words):
                    break
        return pa.table(
            {
                id_col: pa.array(o_id),
                "window_id": pa.array(o_w, pa.int32()),
                "window_text": pa.array(o_t, pa.string()),
            }
        )

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )
