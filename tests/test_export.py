"""JSON export ordering + sliding-window splitter + embedder."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from cosmos_ray.functions.embed import HashingEmbedder, embed_documents
from cosmos_ray.stages.export import export_docs_json, sliding_windows


def test_export_json_reading_order(kg_small, golden_small):
    out = {r["url"]: json.loads(r["json"]) for r in export_docs_json(kg_small.segments).take_all()}
    want = {}
    for r in golden_small["segments"].to_pylist():
        want.setdefault(r["url"], []).append(r)
    assert set(out) == set(want)
    for url, rows in want.items():
        rows.sort(key=lambda r: r["seg_id"])
        got = out[url]
        # single-column synthetic layout => json order == seg_id order
        assert [g["seg_id"] for g in got] == [r["seg_id"] for r in rows]
        assert [g["text"] for g in got] == [r["text"] for r in rows]
        assert [g["cls"] for g in got] == [r["cls"] for r in rows]


def test_sliding_windows_cover_text():
    docs = pa.table({"doc_id": [1], "text": [" ".join(f"w{i}" for i in range(300))]})
    wins = sliding_windows(rd.from_arrow(docs), window=256, stride=64).take_all()
    assert len(wins) == 2  # starts at 0 and 64 (64+256 >= 300)
    assert wins[0]["window_text"].split()[0] == "w0"
    assert wins[1]["window_text"].split()[0] == "w64"
    assert wins[1]["window_text"].split()[-1] == "w299"
    # short doc -> exactly one window
    short = pa.table({"doc_id": [2], "text": ["a b c"]})
    wins2 = sliding_windows(rd.from_arrow(short), window=256, stride=64).take_all()
    assert len(wins2) == 1 and wins2[0]["window_text"] == "a b c"


def test_embedder_deterministic_and_normalized(documents_small):
    ds = rd.from_arrow(documents_small)
    a = {r["doc_id"]: r["embedding"] for r in embed_documents(ds).take_all()}
    b = {r["doc_id"]: r["embedding"] for r in embed_documents(ds).take_all()}
    assert a == b
    v = np.array(next(iter(a.values())))
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # embeddings feed similarity search: same text => cosine 1
    e = HashingEmbedder()
    assert np.allclose(e.embed_text("spark join data"), e.embed_text("spark join data"))
