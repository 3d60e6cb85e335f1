"""Multinomial Naive Bayes text classification — the trainable
quality / language / domain filter of the curation family (the shape
CCNet-style pipelines use for fastText quality classifiers), chosen
count-based so BOTH halves are exactly replayable in SQL:

- training (distributed): one groupby over per-batch (label, token,
  count) combiners — the exchange carries one row per DISTINCT
  (label, token) per batch, never one per token instance; the folded
  count table is model-sized and lives on the driver (the
  `lm.train_bigram_lm` shape).
- scoring (distributed): the log-likelihood tables are broadcast once
  via ``ray.put``; each batch does one vectorized ``Series.map`` hash
  join per class plus a ``bincount`` per-doc reduction (the
  `lm.PerplexityScorer` shape).

Add-alpha smoothing: p(w|c) = (n_wc + a) / (n_c + a·V) with V = the
corpus-wide distinct-token count; unseen tokens use n_wc = 0 (never
OOV-dropped, so engine and oracle agree on every token). The argmax is
taken over 6dp-ROUNDED per-class scores with lowest-label tie-break —
the same convention the SQL oracle can express, so accumulation-order
float drift cannot flip predictions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def train_naive_bayes(docs_ds, label_col: str = "lang",
                      text_col: str = "text", alpha: float = 1.0) -> dict:
    """-> {'labels': [...], 'prior': {c: logp}, 'lik': {c: {w: logp}},
    'floor': {c: logp for unseen w}, 'V': int, 'alpha': a}."""
    from ray.data.aggregate import Sum

    def count_batch(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        labels = np.repeat(
            np.asarray(t.column(label_col).to_pylist(), dtype=object), lens)
        g = (pd.DataFrame({"c": labels, "w": flat})
             .groupby(["c", "w"], sort=False).size())
        tok = pa.table({"c": pa.array(g.index.get_level_values(0).astype(str)),
                        "w": pa.array(g.index.get_level_values(1).astype(str)),
                        "n": pa.array(g.to_numpy(), pa.int64())})
        # per-label doc counts ride the same stream: w == " " marks them
        # (a " "-split token can never contain a space)
        dc = (pd.Series(t.column(label_col).to_pylist()).value_counts())
        doc = pa.table({"c": pa.array(dc.index.astype(str)),
                        "w": pa.array([" "] * len(dc), pa.string()),
                        "n": pa.array(dc.to_numpy(), pa.int64())})
        return pa.concat_tables([tok, doc])

    counts = (docs_ds.select_columns([label_col, text_col])
              .map_batches(count_batch, batch_format="pyarrow")
              .groupby(["c", "w"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    is_doc = counts["w"] == " "
    nd = dict(zip(counts.loc[is_doc, "c"], counts.loc[is_doc, "n"].astype(int)))
    total_docs = sum(nd.values())
    tok = counts.loc[~is_doc]
    V = tok["w"].nunique()
    labels = sorted(nd)
    prior = {c: float(np.log(nd[c] / total_docs)) for c in labels}
    lik: dict[str, dict[str, float]] = {}
    floor: dict[str, float] = {}
    for c in labels:
        sub = tok[tok["c"] == c]
        tc = int(sub["n"].sum())
        denom = tc + alpha * V
        lik[c] = dict(zip(sub["w"],
                          np.log((sub["n"].to_numpy(np.float64) + alpha) / denom)))
        floor[c] = float(np.log(alpha / denom))
    return {"labels": labels, "prior": prior, "lik": lik, "floor": floor,
            "V": int(V), "alpha": alpha}


class NaiveBayesScorer:
    """Actor-pool scorer: model deserialized once per actor."""

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        m = ray.get(model_ref) if hasattr(model_ref, "hex") else model_ref
        self.m = m
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = self.m
        toks = pc.split_pattern(t.column(self.text_col), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pd.Series(pc.list_flatten(toks).to_numpy(zero_copy_only=False),
                         dtype=object)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        scores = np.empty((len(t), len(m["labels"])), np.float64)
        for j, c in enumerate(m["labels"]):
            lp = flat.map(m["lik"][c]).fillna(m["floor"][c]).to_numpy(np.float64)
            scores[:, j] = m["prior"][c] + np.bincount(
                doc_idx, weights=lp, minlength=len(t))
        r = np.round(scores, 6)
        best = np.argmax(r, axis=1)  # ties -> lowest label index
        return pa.table({
            self.id_col: t.column(self.id_col),
            "pred": pa.array([m["labels"][b] for b in best], pa.string()),
            "score": pa.array(r[np.arange(len(t)), best], pa.float64()),
        })


def naive_bayes_predict(docs_ds, model: dict | None = None,
                        label_col: str = "lang", text_col: str = "text",
                        id_col: str = "doc_id",
                        concurrency: int | tuple = (1, 4)):
    """Train-on-corpus (or score against a provided ``model``) ->
    (doc_id, pred, score)."""
    import ray

    if model is None:
        model = train_naive_bayes(docs_ds, label_col=label_col,
                                  text_col=text_col)
    ref = ray.put(model)
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        NaiveBayesScorer,
        fn_constructor_kwargs={"model_ref": ref, "text_col": text_col,
                               "id_col": id_col},
        concurrency=concurrency, batch_format="pyarrow")
