"""Typed Arrow schemas for every logical table at stage boundaries.

The reference accretes dict keys stage by stage and lets pandas infer the
final Parquet schema (Cosmos `ingest/ingest.py:188-206`, `process_page.py:42-51`);
here every Dataset boundary is an explicit ``pyarrow.Schema`` so blocks are
zero-copy Arrow end to end and schema drift is an error, not a surprise.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- input
# Authoritative input shape (BASELINE.json input_hint): Common-Crawl-style
# web pages.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # may be empty -> pipeline extracts from html
        ("lang", pa.string()),
    ]
)

# ---------------------------------------------------------------- documents
# Output of the extraction stage: one row per url with the byte-identical
# extracted text (reference analog: pdfminer text layer + ftfy,
# `ingest/utils/pdf_extractor.py:26-84`, `normalize_text.py:19-28`).
DOCUMENTS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("n_blocks", pa.int32()),
        ("error", pa.string()),  # non-null => dead-letter row
    ]
)

# ---------------------------------------------------------------- segments
# One row per typed block, exploded from each page (reference analog: the
# per-object rows of the main output table, `ingest/ingest.py:188-206`).
# `classes`/`scores` follow the reference's descending (score, cls) ranking
# contract (`detection/src/torch_model/inference/inference.py:44-55`);
# `cls`/`score` are the argmax after postprocessing
# (`postprocess_cls`/`postprocess_score` analog).
SEGMENTS = pa.schema(
    [
        ("url", pa.string()),
        ("page_num", pa.int32()),
        ("seg_id", pa.int32()),  # reading order within url
        ("tag", pa.string()),  # raw structural hint from the parser
        ("text", pa.string()),
        ("bbox", pa.list_(pa.float32(), 4)),
        ("classes", pa.list_(pa.string())),
        ("scores", pa.list_(pa.float32())),
        ("cls", pa.string()),
        ("score", pa.float32()),
    ]
)

# ---------------------------------------------------------------- sections
# Reference analog: `_sections.parquet` (`aggregate.py:159-174`).
SECTIONS = pa.schema(
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

# ---------------------------------------------------------------- triples
# OpenIE-style edges (reference analog: the (entity, relation, object)
# edges Cosmos materializes into its ES join index,
# `elastic_retriever.py:74-90`).
TRIPLES_RAW = pa.schema(
    [
        ("url", pa.string()),
        ("seg_id", pa.int32()),
        ("sent_id", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conf", pa.float32()),
    ]
)

TRIPLES = pa.schema(  # after per-url exact dedup
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conf", pa.float32()),
        ("n_mentions", pa.int64()),
    ]
)

# ---------------------------------------------------------------- mentions
# One row per (surface form occurrence) with linking result (reference
# analog: `ents_linked` / `ents_unlinked` columns, `link.py:24-43`).
MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("surface", pa.string()),
        ("canonical_id", pa.string()),  # "" => unlinked
        ("link_score", pa.float32()),
        ("role", pa.string()),  # subj | obj
        ("pred", pa.string()),
    ]
)

# ---------------------------------------------------------------- entities
# Reference analog: `_entities.parquet` (`link.py:60-67,113-117`).
ENTITIES = pa.schema(
    [
        ("canonical_id", pa.string()),
        ("name", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("types", pa.list_(pa.string())),
        ("description", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)

# ---------------------------------------------------------------- adjacency
# The canonical graph: reference analog is the ES parent/child
# entity<->object Join index (`elastic_retriever.py:74-90,116-141`)
# materialized as a Parquet adjacency list.
ADJACENCY = pa.schema(
    [
        ("src_entity", pa.string()),
        ("dst_entity", pa.string()),
        ("pred", pa.string()),
        ("weight", pa.int64()),
    ]
)

# ---------------------------------------------------------------- dead letter
DEAD_LETTER = pa.schema(
    [
        ("url", pa.string()),
        ("stage", pa.string()),
        ("error", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast/reorder a table's columns to exactly ``schema`` (raises on
    missing columns)."""
    cols = [table.column(name).cast(schema.field(name).type) for name in schema.names]
    return pa.table(cols, schema=schema)
