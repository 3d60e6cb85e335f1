"""Bigram-LM gates: hand-computed smoothed probabilities, short-doc
conventions, OOV scoring against a foreign model."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


def test_train_counts_exact():
    from cosmos_ray.functions.lm import train_bigram_lm

    lm = train_bigram_lm(_docs(["a b a b", "b a"]))
    assert lm["uni"] == {"a": 3, "b": 3}
    assert lm["V"] == 2
    assert lm["bi"] == {("a", "b"): 2, ("b", "a"): 2}


def test_perplexity_hand_value():
    from cosmos_ray.functions.lm import perplexity_scores

    # corpus "a b a b" alone: uni a=2 b=2, V=2, bi (a,b)=2 (b,a)=1
    df = perplexity_scores(_docs(["a b a b"]), concurrency=1).to_pandas()
    p_ab = (2 + 1) / (2 + 2)   # 0.75
    p_ba = (1 + 1) / (2 + 2)   # 0.5
    lp = 2 * math.log(p_ab) + math.log(p_ba)
    assert df["n_bigrams"].tolist() == [3]
    assert abs(df["logprob"][0] - round(lp, 6)) < 2e-6
    assert abs(df["ppl"][0] - round(math.exp(-lp / 3), 6)) < 2e-6


def test_short_doc_is_nan():
    from cosmos_ray.functions.lm import perplexity_scores

    df = perplexity_scores(_docs(["only", "two words"]),
                           concurrency=1).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert df["n_bigrams"].tolist() == [0, 1]
    assert np.isnan(df["logprob"][0]) and np.isnan(df["ppl"][0])
    assert not np.isnan(df["ppl"][1])


def test_oov_scores_against_foreign_model():
    from cosmos_ray.functions.lm import perplexity_scores, train_bigram_lm

    lm = train_bigram_lm(_docs(["a b a b"]))
    df = perplexity_scores(_docs(["z q"]), lm=lm, concurrency=1).to_pandas()
    # c12=0, c1=0 -> p = 1/(0 + 1*2) = 0.5
    assert abs(df["logprob"][0] - round(math.log(0.5), 6)) < 2e-6


def test_vocab_truncation_bounds_model():
    from cosmos_ray.functions.lm import train_bigram_lm

    lm = train_bigram_lm(_docs(["a a a b b c"]), vocab_size=2)
    assert set(lm["uni"]) == {"a", "b"}
    assert lm["V"] == 2
    assert all(w1 in lm["uni"] and w2 in lm["uni"] for w1, w2 in lm["bi"])


# ----------------------------------------------------------- naive bayes

class TestNaiveBayes:
    def _corpus(self):
        rows = []
        for i in range(30):
            rows.append({"doc_id": i, "lang": "aa",
                         "text": f"apple apfel apples fruit{i % 5} apple"})
            rows.append({"doc_id": 100 + i, "lang": "bb",
                         "text": f"banane banana bananas obst{i % 5} banane"})
        return pa.Table.from_pylist(rows)

    def test_separable_corpus_perfect_train_accuracy(self):
        from cosmos_ray.functions.classify import naive_bayes_predict

        tbl = self._corpus()
        out = naive_bayes_predict(rd.from_arrow(tbl)).to_pandas()
        truth = {r["doc_id"]: r["lang"] for r in tbl.to_pylist()}
        assert len(out) == tbl.num_rows
        assert all(truth[d] == p for d, p in zip(out["doc_id"], out["pred"]))

    def test_model_transfers_to_unseen_docs(self):
        from cosmos_ray.functions.classify import (
            naive_bayes_predict,
            train_naive_bayes,
        )

        model = train_naive_bayes(rd.from_arrow(self._corpus()))
        new = pa.Table.from_pylist([
            {"doc_id": 900, "text": "apple apple unseen fruit"},
            {"doc_id": 901, "text": "banana banane unseen obst"},
        ])
        out = naive_bayes_predict(rd.from_arrow(new), model=model) \
            .to_pandas().set_index("doc_id")
        assert out.loc[900, "pred"] == "aa"
        assert out.loc[901, "pred"] == "bb"

    def test_tie_breaks_to_lowest_label(self):
        from cosmos_ray.functions.classify import naive_bayes_predict

        # perfectly symmetric classes: every class score identical
        tbl = pa.Table.from_pylist([
            {"doc_id": 1, "lang": "zz", "text": "x y"},
            {"doc_id": 2, "lang": "aa", "text": "x y"},
        ])
        out = naive_bayes_predict(rd.from_arrow(tbl)).to_pandas()
        assert set(out["pred"]) == {"aa"}

    def test_deterministic(self):
        from cosmos_ray.functions.classify import naive_bayes_predict

        ds = rd.from_arrow(self._corpus())
        a = sorted(map(tuple, naive_bayes_predict(ds).to_pandas().values.tolist()))
        b = sorted(map(tuple, naive_bayes_predict(ds).to_pandas().values.tolist()))
        assert a == b
