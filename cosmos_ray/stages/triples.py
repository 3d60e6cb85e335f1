"""OpenIE-style (subj, pred, obj) triple extraction over segment text.

Stands where Cosmos emits (entity, relation, object) edges into its ES
join index (`retrieval/retrieval/elastic_retriever.py:74-90`): per
sentence, a closed-lexicon SVO pattern match. Stateless ``map_batches``
fan-out (1 segment row -> 0..N triple rows) — embarrassingly parallel,
no shuffle (SURVEY.md §7 step 5).

The predicate lexicon is the public extraction contract; the pattern is
compiled once per worker process at import time and longest-predicate-
first so "partnered with" wins over any prefix.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from cosmos_ray.sources.pages import PREDICATES

# longest-first alternation so multi-word predicates match atomically
_PRED_ALT = "|".join(re.escape(p) for p in sorted(PREDICATES, key=len, reverse=True))
# A sentence "<Subj> <pred> <Obj>." where subj/obj are Titlecase token runs.
SVO_RE = re.compile(
    rf"(?P<subj>(?:[A-Z][A-Za-z0-9]*)(?: [A-Z][A-Za-z0-9]*)*)\s+"
    rf"(?P<pred>{_PRED_ALT})\s+"
    rf"(?P<obj>(?:[A-Z][A-Za-z0-9]*)(?: [A-Z][A-Za-z0-9]*)*)"
)
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")

TRIPLES_RAW_SCHEMA = pa.schema(
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


def extract_triples_from_text(text: str) -> list[tuple[int, str, str, str]]:
    """-> [(sent_id, subj, pred, obj)] for one segment's text."""
    out = []
    for si, sent in enumerate(_SENT_SPLIT.split(text)):
        for m in SVO_RE.finditer(sent):
            out.append((si, m.group("subj"), m.group("pred"), m.group("obj")))
    return out


def triples_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # vectorized prefilter: a segment without any predicate substring
    # cannot yield an SVO match — the RE2 scan skips the (dominant)
    # prose segments before the python finditer runs
    batch = batch.filter(pc.match_substring_regex(batch.column("text"), _PRED_ALT))
    urls = batch.column("url").to_pylist()
    seg_ids = batch.column("seg_id").to_pylist()
    texts = batch.column("text").to_pylist()
    o_url, o_seg, o_sent, o_s, o_p, o_o = [], [], [], [], [], []
    for u, sid, t in zip(urls, seg_ids, texts):
        if not t:
            continue
        for sent_id, s, p, o in extract_triples_from_text(t):
            o_url.append(u)
            o_seg.append(sid)
            o_sent.append(sent_id)
            o_s.append(s)
            o_p.append(p)
            o_o.append(o)
    return pa.table(
        {
            "url": pa.array(o_url, pa.string()),
            "seg_id": pa.array(o_seg, pa.int32()),
            "sent_id": pa.array(o_sent, pa.int32()),
            "subj": pa.array(o_s, pa.string()),
            "pred": pa.array(o_p, pa.string()),
            "obj": pa.array(o_o, pa.string()),
            "conf": pa.array(np.full(len(o_s), 0.95, np.float32)),
        },
        schema=TRIPLES_RAW_SCHEMA,
    )


def extract_triples(segments, batch_size: int = 4096):
    """classified segments -> raw triples (surface forms, with dupes)."""
    return segments.map_batches(triples_batch, batch_format="pyarrow", batch_size=batch_size)
