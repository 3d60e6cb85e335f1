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
    the slot is where real model weights live) built once per actor."""

    def __init__(self, dim: int = 64) -> None:
        self.dim = dim

    def embed_text(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        for tok in text.split():
            h = _token_hash(tok)
            v[h % self.dim] += 1.0 if (h >> 63) & 1 == 0 else -1.0
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
