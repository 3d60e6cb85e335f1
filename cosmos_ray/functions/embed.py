"""Deterministic document embeddings + corpus-level representation stats.

Reference analogs: the FastText skipgram trainer over the whole corpus
(`process/representation_learning/compute_word_vecs.py:4-11`, a global
reduce) and the SPECTER section embedder (`scripts/get_specter_vector.py`
— a GPU actor-pool map). No torch/fasttext in this container, so the
embedder is a feature-hashing bag-of-words projection: public, model-
free, deterministic, and the Ray-side shape (actor pool holding the
projection state, batched matrix math, list<float> output column) is the
real contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _token_hash(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")


class HashingEmbedder:
    """Actor-pool embedder: token feature-hashing into ``dim`` buckets
    with +/- sign hashing, l2-normalized. State (nothing heavy here, but
    the slot is where real model weights live) built once per actor.
    Token md5s come from the shared per-worker cache; the bucket/sign
    accumulation is one vectorized bincount per doc."""

    def __init__(self, dim: int = 64) -> None:
        self.dim = dim

    def embed_text(self, text: str) -> np.ndarray:
        from cosmos_ray.functions.dedup import _TOKEN_HASHES

        toks = text.split()
        if not toks:
            return np.zeros(self.dim, dtype=np.float64)
        th = _TOKEN_HASHES.hashes(toks)
        sign = 1.0 - 2.0 * (th >> np.uint64(63)).astype(np.float64)
        v = np.bincount(
            (th % np.uint64(self.dim)).astype(np.int64), weights=sign,
            minlength=self.dim,
        )
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        vecs = [self.embed_text(t).astype(np.float32).tolist() for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )


def embed_documents(docs_ds, dim: int = 64, concurrency: int | tuple = (1, 4)):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        HashingEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )


def corpus_vocab(docs_ds, min_count: int = 2):
    """Global reduce: corpus token counts (the compute_word_vecs corpus
    pass, G8) — batch-local count then one small groupby-sum."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # Single-space split (keeps empties), matching the DuckDB oracle's
        # string_split(text, ' ') exactly — python str.split() (any-ws run)
        # silently diverges on tabs/newlines/double spaces.
        import pyarrow.compute as pc

        toks = pc.list_flatten(pc.split_pattern(t.column("text"), " "))
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    agg = (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="count"))
    )
    import pyarrow.compute as pc

    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("count"), pa.scalar(min_count))),
        batch_format="pyarrow",
    )


def train_word_vectors(docs_ds, dim: int = 32, vocab_size: int = 1024,
                       window: int = 2, min_count: int = 2):
    """Corpus word vectors (D6 — the FastText skipgram trainer over the
    whole corpus, `compute_word_vecs.py:4-11`). No fasttext/torch in this
    container, so the trainer is PPMI + truncated SVD over the global
    co-occurrence matrix — public and deterministic (SVD of the shifted
    PMI matrix approximates skipgram factorization; Levy & Goldberg,
    NeurIPS 2014) — while keeping the reference's global-reduce shape:

    1. vocab: ``corpus_vocab`` global token counts -> top ``vocab_size``
       tokens with count >= ``min_count`` (deterministic order:
       count desc, token asc);
    2. co-occurrence: broadcast token->id map; each batch emits sparse
       (pair_id, n) partials for token pairs within +-``window``
       (vectorized id pairing + np.unique) -> one groupby-sum exchange
       moving pair partials only;
    3. factorize: the bounded (V x V) count matrix -> PPMI -> numpy SVD
       on the driver (model-sized, not corpus-sized);

    Returns a Dataset (token, vector: list<float>[dim])."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    vocab_rows = sorted(
        corpus_vocab(docs_ds, min_count=min_count).take_all(),
        key=lambda r: (-r["count"], r["token"]),
    )[:vocab_size]
    vocab = [r["token"] for r in vocab_rows]
    if not vocab:
        return rd.from_arrow(
            pa.table({"token": pa.array([], pa.string()),
                      "vector": pa.array([], pa.list_(pa.float32()))})
        )
    tok2id = {t: i for i, t in enumerate(vocab)}
    v = len(vocab)
    tok_ref = ray.put(tok2id)

    def cooc_partial(t: pa.Table) -> pa.Table:
        t2i = ray.get(tok_ref)
        keys: list[np.ndarray] = []
        for text in t.column("text").to_pylist():
            ids = np.array([t2i.get(w, -1) for w in text.split(" ")], dtype=np.int64)
            for off in range(1, window + 1):
                a, b = ids[:-off], ids[off:]
                ok = (a >= 0) & (b >= 0)
                if ok.any():
                    # symmetric: count both directions
                    keys.append(a[ok] * v + b[ok])
                    keys.append(b[ok] * v + a[ok])
        if not keys:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({"pair": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))})

    pairs = (
        docs_ds.select_columns(["text"])
        .map_batches(cooc_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # bounded by V^2 rows — model state, not corpus state

    C = np.zeros((v, v), dtype=np.float64)
    for r in pairs:
        C[r["pair"] // v, r["pair"] % v] = r["n"]
    total = C.sum()
    if total == 0:
        vecs = np.zeros((v, dim), dtype=np.float32)
    else:
        pw = C.sum(axis=1, keepdims=True) / total
        pc_ = C.sum(axis=0, keepdims=True) / total
        with np.errstate(divide="ignore", invalid="ignore"):
            pmi = np.log((C / total) / np.maximum(pw @ pc_, 1e-300))
        ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
        u, s, _ = np.linalg.svd(ppmi, full_matrices=False)
        d = min(dim, len(s))
        vecs = (u[:, :d] * np.sqrt(s[:d])).astype(np.float32)
        if d < dim:
            vecs = np.pad(vecs, ((0, 0), (0, dim - d)))
    return rd.from_arrow(
        pa.table(
            {
                "token": pa.array(vocab, pa.string()),
                "vector": pa.array([row.tolist() for row in vecs],
                                   pa.list_(pa.float32())),
            }
        )
    )


def hash_embed_weights(docs_ds, dim: int = 64):
    """The hashing embedder's exact core in long form: one row per
    (doc_id, bucket) touched by at least one token, ``weight`` = the
    signed token count (sum of +/-1 sign hashes) — an INTEGER, so the
    DuckDB oracle (md5_number_upper == the engine's digest[:8]
    little-endian token hash) matches bit-for-bit with zero float risk.
    `HashingEmbedder`'s embedding is exactly these weights l2-normalized
    (tied together in tests/test_embed_vectors.py)."""
    from cosmos_ray.functions.dedup import _TOKEN_HASHES

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        toks, owner = [], []
        for i, x in enumerate(texts):
            ws = x.split()
            toks.extend(ws)
            owner.extend([i] * len(ws))
        if not toks:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.int64())})
        th = _TOKEN_HASHES.hashes(toks)
        sign = 1 - 2 * (th >> np.uint64(63)).astype(np.int64)
        bucket = (th % np.uint64(dim)).astype(np.int64)
        key = np.asarray(owner, np.int64) * dim + bucket
        uniq, inv = np.unique(key, return_inverse=True)
        w = np.bincount(inv, weights=sign).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[uniq // dim], pa.int64()),
            "bucket": pa.array(uniq % dim, pa.int64()),
            "weight": pa.array(w, pa.int64()),
        })

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")
