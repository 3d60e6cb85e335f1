"""Crawl-interchange source formats beyond parquet: JSONL (the
Dolma / Common-Crawl-extract interchange format) and CSV. Thin,
schema-normalizing wrappers over Ray Data's native readers — reads
stay distributed (one task per file/shard) and the normalization is a
zero-copy-friendly arrow ``map_batches``, so a user can point the same
pipelines at a JSONL crawl dump instead of parquet without any other
change. Reference analog: the directory-scan ingestion entry
(`cosmos/ingestion/ingest/ingest.py` pdf directory walk) generalized
to record formats."""

from __future__ import annotations

import pyarrow as pa


_DOC_TYPES: dict[str, pa.DataType] = {
    "doc_id": pa.int64(),
    "text": pa.string(),
    "lang": pa.string(),
    "source": pa.string(),
    "n_chars": pa.int64(),
}


def _normalize(t: pa.Table, required: tuple[str, ...]) -> pa.Table:
    """Project to the documents schema: cast known columns to their
    canonical types, add missing optional columns as nulls, keep column
    order stable. Raises on a missing REQUIRED column (bad dump)."""
    for c in required:
        if c not in t.column_names:
            raise ValueError(f"jsonl/csv source missing required column {c!r}")
    cols = {}
    for name, typ in _DOC_TYPES.items():
        if name in t.column_names:
            cols[name] = t.column(name).cast(typ)
        elif name not in required:
            cols[name] = pa.nulls(len(t), typ)
    return pa.table(cols)


def read_jsonl_docs(path: str, required: tuple[str, ...] = ("doc_id", "text")):
    """Distributed JSONL reader -> the canonical documents schema."""
    import ray.data as rd

    return rd.read_json(path).map_batches(
        lambda t: _normalize(t, required), batch_format="pyarrow")


def read_csv_docs(path: str, required: tuple[str, ...] = ("doc_id", "text")):
    """Distributed CSV reader -> the canonical documents schema."""
    import ray.data as rd

    return rd.read_csv(path).map_batches(
        lambda t: _normalize(t, required), batch_format="pyarrow")
