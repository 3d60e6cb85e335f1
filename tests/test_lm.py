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
