"""End-to-end training-data curation pipeline — the composed pass a
100-TB corpus actually runs before tokenization: exact dedup → quality
gate → language gate → token annotation → per-source stratified
sample. Every stage reuses a first-class operator from this repo, and
the whole composition stays one lazy streaming Dataset chain (nothing
materializes the corpus; the only driver state is the winner-id
broadcast guard inside the semi-join).

The full composition is DuckDB-replayable (each stage's contract is
already oracle-checked on its own), so the driver verifies the entire
pipeline value-for-value — see SQL_CURATE_DOCS in driver_queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cosmos_ray.functions.textops import _LANG_CUES, STOPWORDS


def _quality_mask(t: pa.Table) -> np.ndarray:
    """Vectorized quality-gate mask (same formula as
    quality_score_batch's keep flag): >= 10 whitespace tokens and
    stopword ratio <= 0.5."""
    toks = pc.split_pattern(t.column("text"), " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS))
    idx = np.repeat(np.arange(len(lens)), lens)
    stops = np.bincount(idx, weights=is_stop.to_numpy(zero_copy_only=False)
                        .astype(np.float64), minlength=len(lens))
    return (lens >= 10) & (stops / np.maximum(lens, 1) <= 0.5)


def _quality_keep(t: pa.Table) -> pa.Table:
    return t.filter(pa.array(_quality_mask(t)))


class _LangGate:
    """Actor-pool language gate: cue profiles compiled once per actor;
    keeps only rows whose argmax language (first-wins ties, 'und' when
    all cues miss) equals ``lang`` and annotates ``lang_pred``."""

    def __init__(self, lang: str = "en") -> None:
        self.lang = lang
        self.profiles = {k: tuple(v) for k, v in _LANG_CUES.items()}

    def mask(self, texts: pd.Series) -> np.ndarray:
        """Boolean mask: argmax language == self.lang (first-wins
        ties, 'und' when all cues miss)."""
        texts = texts.str.lower()
        lens = texts.str.len().to_numpy().clip(min=1)
        best_lang = np.full(len(texts), "und", dtype=object)
        best_score = np.zeros(len(texts))
        for lang, cues in self.profiles.items():
            score = np.zeros(len(texts))
            for c in cues:
                score += texts.str.count(c, flags=0).to_numpy()
            score = score / lens
            better = score > best_score
            best_lang[better] = lang
            best_score[better] = score[better]
        return best_lang == self.lang

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[self.mask(batch["text"])].copy()
        out["lang_pred"] = self.lang
        return out


def curate_documents(docs_ds, lang: str = "en", per_source: int = 20,
                     concurrency: int | tuple = (1, 4)):
    """-> (doc_id, source, lang_pred, n_tokens): deduped, quality- and
    language-gated, per-source stratified sample of ``per_source``.

    Stage order matters for the exchanges: dedup winners are computed on
    (text, id) only; quality+language run BEFORE the semi-join so the
    join's big side is already thinned; text is dropped the moment the
    last text-consuming stage has run."""
    from cosmos_ray.functions.dedup import hashed_winner_ids
    from cosmos_ray.queries.relational import semi_join_ds, stratified_sample

    # digest-only dedup exchange: only (md5, id) shuffles, never text
    winners = hashed_winner_ids(docs_ds, text_col="text", id_col="doc_id")

    thinned = (
        docs_ds.select_columns(["doc_id", "text", "source"])
        .map_batches(_quality_keep, batch_format="pyarrow")
        .map_batches(_LangGate, fn_constructor_kwargs={"lang": lang},
                     batch_format="pandas", concurrency=concurrency,
                     batch_size=4096)
    )
    kept = semi_join_ds(thinned, winners, key_col="doc_id", big_key="doc_id")

    def annotate(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "lang_pred": t.column("lang_pred"),
            "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
        })

    annotated = kept.map_batches(annotate, batch_format="pyarrow")
    return stratified_sample(annotated, group_col="source", n=per_source,
                             id_col="doc_id")
