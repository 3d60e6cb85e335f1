"""Data-selection operators for training-corpus curation: DSIR
(Data Selection with Importance Resampling, Xie et al. 2023,
arXiv:2302.03169) hashed-ngram importance weights.

The reference pipeline has no data-selection stage — this belongs to
the training-data operator family layered on top of the KG engine
(SURVEY.md §2.9-level scalar/corpus functions). The contract is
deliberately SQL-replayable so the driver's DuckDB oracle verifies it
value-for-value: bigram buckets are ``md5_number_upper(tok1||' '||tok2)
% num_buckets`` (little-endian upper-64 of the md5 digest), the target
and raw bucket distributions are add-one smoothed, and the per-doc
weight is the sum of per-bigram-occurrence log-likelihood ratios.

Scale shape (100 TB): two streaming passes. Pass 1 moves at most
``num_buckets`` partial rows per batch through one small groupby — the
corpus text itself is never shuffled. The reduced (bucket, counts)
model table is ``num_buckets`` rows by construction (driver-bounded,
model-sized: the same class of pull as the NB classifier / bigram-LM
model tables), broadcast once via ``ray.put``. Pass 2 is a stateless
vectorized ``map_batches`` scoring every doc against the broadcast
log-ratio vector.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# per-process bigram -> bucket memo (hot bigrams repeat heavily across
# batches; capped so a huge vocabulary can't grow a worker's heap)
_BUCKET_CACHE: dict[str, int] = {}
_BUCKET_CACHE_CAP = 1_000_000


def _hash_bucket(s: str, num_buckets: int) -> int:
    """DuckDB ``md5_number_upper(s) % num_buckets`` parity: first 8
    digest bytes, little-endian."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little") % num_buckets


def _bigram_buckets(text_col, num_buckets: int):
    """(doc_idx, bucket) int64 arrays for every sequential whitespace
    bigram in the batch. Token split + concat are vectorized (arrow /
    pandas C kernels); md5 runs once per UNIQUE bigram per batch with a
    per-process memo."""
    toks = pc.split_pattern(text_col, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks).to_pandas()
    if len(flat) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    same = doc_idx[:-1] == doc_idx[1:]
    left = flat.iloc[:-1].reset_index(drop=True)[same]
    right = flat.iloc[1:].reset_index(drop=True)[same]
    bigrams = (left + " " + right).to_numpy()
    docs = doc_idx[:-1][same]
    uniq, inv = np.unique(bigrams, return_inverse=True)
    if len(_BUCKET_CACHE) > _BUCKET_CACHE_CAP:
        _BUCKET_CACHE.clear()
    ub = np.empty(len(uniq), np.int64)
    for i, s in enumerate(uniq):
        v = _BUCKET_CACHE.get(s)
        if v is None:
            v = _hash_bucket(s, num_buckets)
            _BUCKET_CACHE[s] = v
        ub[i] = v
    return docs, ub[inv]


def dsir_weights(docs_ds, num_buckets: int = 1024, target_col: str = "lang",
                 target_value: str = "en", id_col: str = "doc_id",
                 text_col: str = "text"):
    """Per-document DSIR importance weight: ``sum over bigram
    occurrences of log p_target(bucket) - log p_raw(bucket)`` where the
    target distribution is estimated from docs with
    ``target_col == target_value`` and the raw distribution from the
    whole corpus, both add-one smoothed over ``num_buckets`` hashed
    bigram buckets. Docs with fewer than two tokens get weight 0.

    Returns a Dataset ``(doc_id, dsir_weight)`` with the weight rounded
    half-away-from-zero to 6 decimals (DuckDB ``round()`` parity).
    """
    import ray

    B = int(num_buckets)

    def partials(t: pa.Table) -> pa.Table:
        docs, buckets = _bigram_buckets(t.column(text_col), B)
        raw = np.bincount(buckets, minlength=B)
        is_tgt = pc.fill_null(
            pc.equal(t.column(target_col), target_value), False
        ).to_numpy(zero_copy_only=False).astype(bool)
        tgt = np.bincount(buckets[is_tgt[docs]], minlength=B)
        nz = (raw > 0) | (tgt > 0)
        return pa.table({
            "bucket": pa.array(np.nonzero(nz)[0], pa.int64()),
            "n_raw": pa.array(raw[nz], pa.int64()),
            "n_tgt": pa.array(tgt[nz], pa.int64()),
        })

    counts = (
        docs_ds.select_columns([text_col, target_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["n_raw", "n_tgt"])
    )
    # model-sized reduce: <= num_buckets rows by construction (the same
    # bounded-pull class as the NB / bigram-LM model tables)
    n_raw = np.zeros(B, np.float64)
    n_tgt = np.zeros(B, np.float64)
    for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        idx = b.column("bucket").to_numpy(zero_copy_only=False)
        n_raw[idx] += b.column("sum(n_raw)").to_numpy(zero_copy_only=False)
        n_tgt[idx] += b.column("sum(n_tgt)").to_numpy(zero_copy_only=False)
    log_ratio = (np.log(n_tgt + 1.0) - np.log(n_tgt.sum() + B)) - (
        np.log(n_raw + 1.0) - np.log(n_raw.sum() + B)
    )
    lw_ref = ray.put(log_ratio)

    def score(t: pa.Table) -> pa.Table:
        lw = ray.get(lw_ref)  # plasma-cached per worker, zero-copy
        docs, buckets = _bigram_buckets(t.column(text_col), B)
        per_doc = np.bincount(docs, weights=lw[buckets], minlength=t.num_rows)
        return pa.table({
            id_col: t.column(id_col),
            "dsir_weight": pc.round(pa.array(per_doc, pa.float64()), 6,
                                    round_mode="half_towards_infinity"),
        })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
