"""At-rest byte-trigram index for substring (LIKE '%needle%') search.

The pg_trgm analog for a parquet corpus, completing the at-rest index
family next to the token-level BM25 index (`functions/retrieval.py:
build_text_index`): full-text SUBSTRING predicates normally force a
whole-corpus scan; here the corpus is written once into hash file
parts and a posting table maps each distinct BYTE trigram to the file
parts containing it. A query reads only its own trigrams' posting
buckets, intersects their part sets (a part can match only if it
contains EVERY trigram of the needle — superset guarantee), then
scans just the candidate parts with a vectorized residual
`match_substring`. Results are EXACT; pruning is the only
approximation and errs strictly on the side of reading more.

Byte trigrams (of the raw UTF-8) rather than character trigrams keep
the superset property alignment-free for any input. Trigram
extraction is vectorized: texts join on a double-NUL separator, one
`sliding_window_view` over the byte buffer packs each window into an
int32, windows containing NUL (the separator) drop out, and per-doc
dedup is one `np.unique` over (doc, gram) composite keys.

Layout:
    out_dir/files/fpart=K/*.parquet    the corpus, hash-partitioned
    out_dir/grams/gbucket=B/*.parquet  distinct (gram, fpart) postings
    out_dir/meta.json

Scale shape: postings are DISTINCT (gram, part) pairs — bounded by
(distinct trigrams x parts), not corpus size; the build is one
streaming pass + one distinct groupby; the query-side driver state is
the candidate part list (file-count bounded).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["build_trigram_index", "substring_search"]

_SEP = b"\x00\x00"


def _byte_trigrams_packed(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_idx, gram_int32) of the DISTINCT byte trigrams per text,
    vectorized across the whole batch."""
    bufs = [t.encode("utf-8") for t in texts]
    if not bufs:
        return (np.empty(0, np.int64), np.empty(0, np.int32))
    joined = _SEP.join(bufs)
    b = np.frombuffer(joined, np.uint8)
    if len(b) < 3:
        return (np.empty(0, np.int64), np.empty(0, np.int32))
    w = np.lib.stride_tricks.sliding_window_view(b, 3)
    gram = (w[:, 0].astype(np.int32) << 16) | \
        (w[:, 1].astype(np.int32) << 8) | w[:, 2].astype(np.int32)
    valid = (w != 0).all(axis=1)
    # window start byte -> doc index: doc d owns its own bytes plus the
    # separator after it; windows starting there contain NUL and drop
    lens = np.array([len(x) for x in bufs], np.int64)
    doc = np.repeat(np.arange(len(bufs)), lens + len(_SEP))[: len(gram)]
    doc, gram = doc[valid], gram[valid]
    key = doc.astype(np.int64) * (1 << 24) + gram.astype(np.int64)
    uniq = np.unique(key)
    return (uniq >> 24, (uniq & 0xFFFFFF).astype(np.int32))


def _gbucket(gram: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((gram.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(num_buckets)).astype(np.int64)


def build_trigram_index(docs_ds, out_dir: str, num_parts: int = 16,
                        num_buckets: int = 16, id_col: str = "doc_id",
                        text_col: str = "text") -> dict:
    """Write the corpus into ``num_parts`` hash file-parts plus the
    distinct (gram, fpart) posting table. One streaming pass + one
    distinct groupby."""
    from ray.data.aggregate import Count

    os.makedirs(out_dir, exist_ok=True)

    def with_part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "fpart", pa.array((ids % num_parts).astype(np.int64)))

    corpus = docs_ds.map_batches(with_part, batch_format="pyarrow")
    corpus.write_parquet(os.path.join(out_dir, "files"),
                         partition_cols=["fpart"])

    def postings(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        doc, gram = _byte_trigrams_packed(t.column(text_col).to_pylist())
        fpart = (ids[doc] % num_parts).astype(np.int64)
        key = gram.astype(np.int64) * num_parts + fpart
        uniq = np.unique(key)
        g = (uniq // num_parts).astype(np.int32)
        return pa.table({
            "gram": pa.array(g),
            "fpart": pa.array(uniq % num_parts, pa.int64()),
            "gbucket": pa.array(_gbucket(g, num_buckets))})

    (docs_ds.select_columns([id_col, text_col])
     .map_batches(postings, batch_format="pyarrow")
     .groupby(["gbucket", "gram", "fpart"])
     .aggregate(Count(alias_name="__n")).drop_columns(["__n"])
     .write_parquet(os.path.join(out_dir, "grams"),
                    partition_cols=["gbucket"]))
    meta = {"num_parts": num_parts, "num_buckets": num_buckets,
            "id_col": id_col, "text_col": text_col}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def candidate_parts(index_dir: str, needle: str) -> list[int]:
    """File parts that can possibly contain ``needle``: intersection of
    the needle's trigram posting part-sets (all parts when the needle
    is shorter than one trigram)."""
    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    _, grams = _byte_trigrams_packed([needle])
    if len(grams) == 0:
        return list(range(meta["num_parts"]))
    want = np.unique(grams)
    parts: set[int] | None = None
    for gb in np.unique(_gbucket(want, meta["num_buckets"])):
        files = glob.glob(os.path.join(index_dir, "grams",
                                       f"gbucket={gb}", "*.parquet"))
        if files:
            t = pa.concat_tables([pq.read_table(f, columns=["gram", "fpart"])
                                  for f in files])
        else:
            t = pa.table({"gram": pa.array([], pa.int32()),
                          "fpart": pa.array([], pa.int64())})
        g = t.column("gram").to_numpy(zero_copy_only=False)
        p = t.column("fpart").to_numpy(zero_copy_only=False)
        for gram in want[_gbucket(want, meta["num_buckets"]) == gb]:
            s = set(p[g == gram].tolist())
            parts = s if parts is None else (parts & s)
            if not parts:
                return []
    return sorted(parts or [])


def substring_search(index_dir: str, needle: str):
    """-> Dataset of corpus rows whose text CONTAINS ``needle``
    (case-sensitive), reading ONLY the candidate file parts. Exact:
    the residual `match_substring` runs on every candidate row."""
    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    parts = candidate_parts(index_dir, needle)
    files = [f for p in parts for f in sorted(glob.glob(
        os.path.join(index_dir, "files", f"fpart={p}", "*.parquet")))]
    text_col = meta["text_col"]
    if not files:
        return rd.from_arrow(pa.table({meta["id_col"]: pa.array([], pa.int64())}))

    def residual(t: pa.Table) -> pa.Table:
        keep = pc.match_substring(t.column(text_col), needle)
        return t.filter(keep).select([meta["id_col"]])

    return rd.read_parquet(files).map_batches(residual, batch_format="pyarrow")
