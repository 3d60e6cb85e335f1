"""N-gram language-model training and perplexity scoring — the
model-based quality-filter family (score web documents against a
corpus-trained LM; low-probability docs are gibberish/boilerplate).
The reference's model-scoring stages (QA / rerank,
`cosmos/extraction/extraction/qa_extractor.py`,
`retrieval/bert_reranker`) are the pattern source: state loaded once
per worker, batched scoring.

Scale shape:
- training (distributed): unigram and bigram counts via per-batch
  combiners — the exchange carries one row per DISTINCT (bi)gram per
  batch, never one per token. ``vocab_size`` truncates to the heaviest
  unigrams (OOV folds to a shared bucket) so the model stays bounded on
  an open-vocabulary crawl; the count tables are then model-sized and
  correctly live on the driver.
- scoring (distributed): the count dicts are broadcast once via
  ``ray.put``; each batch vectorizes lookup (pandas ``Series.map`` — a
  C hash join) and per-doc reduction (``np.bincount``). Add-alpha
  smoothing: p(w2|w1) = (c12 + a) / (c1 + a·V).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _token_arrays(t: pa.Table, text_col: str):
    """(doc_index_per_bigram, w1, w2) flat numpy arrays for one batch."""
    toks = pc.split_pattern(t.column(text_col), " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    # bigram positions: within each doc, indices [start, start+len-1)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    n_bi = np.maximum(lens - 1, 0)
    if n_bi.sum() == 0:
        e = np.array([], dtype=np.int64)
        return e, flat[:0], flat[:0], n_bi
    doc_idx = np.repeat(np.arange(len(lens)), n_bi)
    first = np.concatenate([np.arange(s, s + k) for s, k in zip(starts, n_bi) if k])
    return doc_idx, flat[first], flat[first + 1], n_bi


def _count_batch(t: pa.Table, text_col: str) -> pa.Table:
    _, w1, w2, _ = _token_arrays(t, text_col)
    toks = pc.list_flatten(pc.split_pattern(t.column(text_col), " "))
    uni = pd.Series(toks.to_numpy(zero_copy_only=False)).value_counts()
    bi = pd.DataFrame({"w1": w1, "w2": w2}).groupby(["w1", "w2"], sort=False).size()
    # union the two count kinds in one row stream: w2 == " " marks
    # unigrams — a " "-split token can never contain a space (Ray's
    # sort-based groupby can't shuffle a null key, so no null sentinel)
    u = pa.table({"w1": pa.array(uni.index.astype(str)),
                  "w2": pa.array([" "] * len(uni), pa.string()),
                  "n": pa.array(uni.to_numpy(), pa.int64())})
    b = pa.table({"w1": pa.array(bi.index.get_level_values(0).astype(str)),
                  "w2": pa.array(bi.index.get_level_values(1).astype(str)),
                  "n": pa.array(bi.to_numpy(), pa.int64())})
    return pa.concat_tables([u, b])


def train_bigram_lm(docs_ds, text_col: str = "text",
                    vocab_size: int | None = None) -> dict:
    """-> {'uni': {w: c}, 'bi': {(w1, w2): c}, 'V': vocab size}.
    One distributed groupby carries both count kinds; the result is
    model-sized (bounded by vocab² in the worst case, by ``vocab_size``
    when set)."""
    from ray.data.aggregate import Sum

    counts = (docs_ds.select_columns([text_col])
              .map_batches(lambda t: _count_batch(t, text_col),
                           batch_format="pyarrow")
              .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    is_uni = counts["w2"] == " "
    uni = dict(zip(counts.loc[is_uni, "w1"], counts.loc[is_uni, "n"].astype(int)))
    if vocab_size is not None and len(uni) > vocab_size:
        kept = set(sorted(uni, key=lambda w: (-uni[w], w))[:vocab_size])
        uni = {w: c for w, c in uni.items() if w in kept}
    bdf = counts.loc[~is_uni]
    bi = {}
    for w1, w2, n in zip(bdf["w1"], bdf["w2"], bdf["n"]):
        if w1 in uni and w2 in uni:
            bi[(w1, w2)] = int(n)
    return {"uni": uni, "bi": bi, "V": len(uni)}


class PerplexityScorer:
    """Actor-pool scorer: model deserialized once per actor; per-batch
    lookup is a vectorized hash join."""

    def __init__(self, lm_ref, alpha: float = 1.0, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        lm = ray.get(lm_ref) if hasattr(lm_ref, "hex") else lm_ref
        self.uni = lm["uni"]
        self.bi = {f"{a} {b}": c for (a, b), c in lm["bi"].items()}
        self.V = lm["V"]
        self.alpha, self.text_col, self.id_col = alpha, text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_idx, w1, w2, n_bi = _token_arrays(t, self.text_col)
        a, V = self.alpha, self.V
        if len(w1):
            # " " joins are collision-free: a " "-split token cannot
            # contain a space (and \x00 separators get truncated by
            # numpy U-dtype strings — learned the hard way)
            keys = pd.Series(w1, dtype=object) + " " + pd.Series(w2, dtype=object)
            c12 = keys.map(self.bi).fillna(0.0).to_numpy(dtype=np.float64)
            c1 = pd.Series(w1).map(self.uni).fillna(0.0).to_numpy(dtype=np.float64)
            lp = np.log((c12 + a) / (c1 + a * V))
            lp_doc = np.bincount(doc_idx, weights=lp, minlength=len(t))
        else:
            lp_doc = np.zeros(len(t))
        n = n_bi.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.where(n > 0, np.exp(-lp_doc / np.maximum(n, 1)), np.nan)
        return pa.table({
            self.id_col: t.column(self.id_col),
            "n_bigrams": pa.array(n_bi.astype(np.int64), pa.int64()),
            "logprob": pc.round(pa.array(np.where(n > 0, lp_doc, np.nan),
                                         pa.float64()), 6,
                                round_mode="half_towards_infinity"),
            "ppl": pc.round(pa.array(ppl, pa.float64()), 6,
                            round_mode="half_towards_infinity"),
        })


def perplexity_scores(docs_ds, lm: dict | None = None, alpha: float = 1.0,
                      concurrency: int | tuple = (1, 4), text_col: str = "text",
                      id_col: str = "doc_id"):
    """Train-on-corpus / score-each-doc quality pass (or score against a
    provided ``lm``). -> (doc_id, n_bigrams, logprob, ppl)."""
    import ray

    if lm is None:
        lm = train_bigram_lm(docs_ds, text_col=text_col)
    lm_ref = ray.put(lm)
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"lm_ref": lm_ref, "alpha": alpha,
                               "text_col": text_col, "id_col": id_col},
        concurrency=concurrency, batch_format="pyarrow")
