"""QA span extraction + cross-encoder reranking, batch form.

Reference analogs (serving-side there, batch actor pools here):
- BERT SQuAD-style span extraction with the model held in worker state
  and a per-call (question, context) batch
  (`extraction/extraction/qa_extractor.py:15-61`, plugin L50-56);
- BERT-Large MS-Marco cross-encoder reranking of retrieved candidates,
  sorted by score then truncated (`retrieval/retrieval/bert_reranker/
  inference.py:13-45`, O6 sort at L42-44).

No torch in this container, so deterministic model stand-ins keep the
*contract* real: state compiled once per actor in ``__init__``; batched
scoring in ``__call__``; span output = (answer, answer_start, answer_end,
score) exactly like extractive QA; rerank output = candidates re-scored
and globally sorted top-k.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


class QaExtractor:
    """Extractive QA: the 'model' compiles the question into a span
    pattern once per actor. Supported question shape: ``what <pred>s?``
    over SVO-ish text — the answer span is the subject of the first
    ``<subj> <pred> <obj>`` occurrence in the context."""

    def __init__(self, question: str, text_col: str = "text") -> None:
        m = re.match(r"what ([a-z]+)s\?$", question.strip().lower())
        if not m:
            raise ValueError(f"unsupported question shape: {question!r}")
        self.pred = m.group(1)
        self.re_span = re.compile(rf"([a-z]+) {re.escape(self.pred)} [a-z]+")
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ans: list[str | None] = []
        starts: list[int | None] = []
        ends: list[int | None] = []
        scores: list[float | None] = []
        for t in texts:
            m = self.re_span.search(t)
            if m is None:
                ans.append(None)
                starts.append(None)
                ends.append(None)
                scores.append(None)
            else:
                ans.append(m.group(1))
                starts.append(m.start(1))
                ends.append(m.end(1))
                scores.append(1.0)
        out = batch.drop_columns([self.text_col])
        out = out.append_column("answer", pa.array(ans, pa.string()))
        out = out.append_column("answer_start", pa.array(starts, pa.int64()))
        out = out.append_column("answer_end", pa.array(ends, pa.int64()))
        return out.append_column("qa_score", pa.array(scores, pa.float64()))


def answer_questions(contexts_ds, question: str, text_col: str = "text",
                     concurrency: int | tuple = (1, 4), batch_size: int = 2048):
    """Actor-pool QA over a context column (D4): one answer span (or
    nulls) per row."""
    return contexts_ds.map_batches(
        QaExtractor,
        fn_constructor_kwargs={"question": question, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class OverlapReranker:
    """Cross-encoder stand-in: score(query, candidate) = |query-token ∩
    candidate-token| / sqrt(|candidate-token|), with the query tokenized
    once per actor (the 'model state'). Deterministic, vectorizable, and
    rank-shaped exactly like the reference's cross-encoder scores."""

    def __init__(self, query: str, text_col: str = "text") -> None:
        self.q_tokens = frozenset(query.lower().split())
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        scores = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = t.lower().split()
            if not toks:
                scores[i] = 0.0
                continue
            hit = sum(1 for tok in toks if tok in self.q_tokens)
            scores[i] = hit / np.sqrt(len(toks))
        return batch.append_column(
            "rerank_score", pa.array(np.round(scores, 6), pa.float64())
        )


def rerank_topk(candidates_ds, query: str, k: int = 10, text_col: str = "text",
                tiebreak_cols: list[str] | None = None,
                concurrency: int | tuple = (1, 4), batch_size: int = 4096):
    """Re-score candidates against ``query`` and return the global top-k
    by score (O6 rerank sort, `bert_reranker/inference.py:42-44`):
    per-batch scoring in the actor pool, then a distributed sample-sort +
    limit — the score matrix never lands on the driver."""
    scored = candidates_ds.map_batches(
        OverlapReranker,
        fn_constructor_kwargs={"query": query, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
    tiebreak_cols = tiebreak_cols or []
    keys = ["rerank_score"] + tiebreak_cols
    desc = [True] + [False] * len(tiebreak_cols)
    return scored.sort(keys, descending=desc).limit(k)
