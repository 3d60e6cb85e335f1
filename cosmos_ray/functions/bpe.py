"""BPE tokenizer training and encoding over the corpus.

The reference ships pretrained BERT vocabularies with its QA / rerank
models (`cosmos/retrieval/retrieval/bert_reranker`,
`cosmos/extraction/extraction/qa_extractor.py:15-61`); a from-scratch
engine for training-data pipelines needs the *trainer* side too. This
is the classic subword-merge procedure (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"; GPT-2-style
byte-level rank encoding at apply time).

Scale shape — the standard one for 100 TB corpora:
- pass 1 (distributed): word frequencies. Per-batch partial counts mean
  the exchange carries one row per DISTINCT word per batch, never one
  per token; a top-K sort bounds the table (heavy-hitter truncation is
  how production trainers bound memory too).
- driver (model-sized): the merge loop runs over the (word, count)
  table — its cost depends on vocabulary size only, independent of
  corpus size, so it is correctly driver work (same argument as the
  word-vector SVD in `functions/embed.py`).
- pass 2 (distributed): encoding is an actor-pool `map_batches` stage;
  the merge ranks are broadcast once via ``ray.put`` and each actor
  memoizes word → token-count across batches (state in ``__init__``,
  per the stateful-stage pattern).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# pre-tokenizer: letter runs, digit runs, single punctuation — the same
# family as textops._BPE_RE, applied to lowercased text.
_PRETOK_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")

_EOW = "</w>"  # end-of-word symbol so merges can't cross word ends


def word_freq_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Partial (word, n) counts for one batch — the combiner that keeps
    the exchange bounded by distinct-word count."""
    counts: dict[str, int] = {}
    for x in t.column(text_col).to_pylist():
        for w in _PRETOK_RE.findall(x.lower()):
            counts[w] = counts.get(w, 0) + 1
    if not counts:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return pa.table({"word": pa.array(list(counts), pa.string()),
                     "n": pa.array(list(counts.values()), pa.int64())})


def word_frequencies(docs_ds, text_col: str = "text", top_k: int | None = None):
    """Distributed (word, n) frequency table, optionally truncated to the
    ``top_k`` heaviest words (ties broken by word asc, deterministic)."""
    from ray.data.aggregate import Sum

    freq = (docs_ds.select_columns([text_col])
            .map_batches(lambda t: word_freq_batch(t, text_col),
                         batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))
    if top_k is not None:
        freq = freq.sort(["n", "word"], descending=[True, False]).limit(top_k)
    return freq


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] = pairs.get(p, 0) + n
    return pairs


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out, i, merged = [], 0, pair[0] + pair[1]
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_from_freqs(freq_df: pd.DataFrame, num_merges: int = 200):
    """Classic merge loop over a (word, n) table. Deterministic: the
    most-frequent pair wins, ties broken lexicographically. Returns the
    ordered merge list [(left, right), ...] (rank = list index)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in zip(freq_df["word"].tolist(), freq_df["n"].tolist()):
        syms = tuple(w) + (_EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(n)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best_n = max(pairs.values())
        pair = min(p for p, n in pairs.items() if n == best_n)
        merges.append(pair)
        vocab = {_merge_word(s, pair): n for s, n in vocab.items()}
    return merges


def train_bpe(docs_ds, num_merges: int = 200, top_k_words: int = 1_000_000,
              text_col: str = "text"):
    """Distributed word counting + driver merge loop -> merge list."""
    freq = word_frequencies(docs_ds, text_col=text_col, top_k=top_k_words)
    return train_bpe_from_freqs(freq.to_pandas(), num_merges=num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in rank order (GPT-2-style): repeatedly merge the
    lowest-rank adjacent pair present."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool encoder: merge ranks deserialized once per actor, word
    encodings memoized across batches. Emits (doc_id, n_bpe_tokens)."""

    def __init__(self, merges_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        merges = ray.get(merges_ref) if hasattr(merges_ref, "hex") else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.id_col, self.text_col = id_col, text_col
        self.cache: dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            n = len(encode_word(w, self.ranks))
            self.cache[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        out = np.empty(len(t), dtype=np.int64)
        texts = t.column(self.text_col).to_pylist()
        for i, x in enumerate(texts):
            out[i] = sum(self._word_len(w) for w in _PRETOK_RE.findall(x.lower()))
        return pa.table({self.id_col: t.column(self.id_col),
                         "n_bpe_tokens": pa.array(out, pa.int64())})


def bpe_token_counts(docs_ds, merges, concurrency: int | tuple = (1, 4),
                     id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_bpe_tokens) under a trained merge list — broadcast the
    ranks once, encode in an actor pool."""
    import ray

    merges_ref = ray.put(list(merges))
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        BpeEncoder, fn_constructor_kwargs={"merges_ref": merges_ref,
                                           "id_col": id_col,
                                           "text_col": text_col},
        concurrency=concurrency, batch_format="pyarrow")
