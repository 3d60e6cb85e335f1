"""BPE trainer/encoder gates: exact agreement with an independent
pure-python reference implementation (written differently: regex-based
pair merge, collections.Counter counting), classic-fixture merges, and
distributed/driver agreement."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import ray.data as rd


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


# ---------------------------------------------------------------- reference
# Independent implementation in the style of the original Sennrich
# subword-nmt script: space-joined symbol strings + regex substitution.

def _ref_train(word_counts: Counter, num_merges: int):
    vocab = Counter()
    for w, n in word_counts.items():
        vocab[" ".join(list(w) + ["</w>"])] += n
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for word, n in vocab.items():
            syms = word.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        top = max(pairs.values())
        pair = sorted(p for p, n in pairs.items() if n == top)[0]
        merges.append(pair)
        pat = re.compile(r"(?<!\S)" + re.escape(" ".join(pair)) + r"(?!\S)")
        vocab = Counter({pat.sub("".join(pair), w): n for w, n in vocab.items()})
    return merges


def _ref_encode(word: str, merges) -> list[str]:
    syms = " ".join(list(word) + ["</w>"])
    for pair in merges:
        pat = re.compile(r"(?<!\S)" + re.escape(" ".join(pair)) + r"(?!\S)")
        syms = pat.sub("".join(pair), syms)
    return syms.split(" ")


_PRETOK = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")


def _ref_word_counts(texts) -> Counter:
    c = Counter()
    for x in texts:
        c.update(_PRETOK.findall(x.lower()))
    return c


# ------------------------------------------------------------------- gates

CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest west west",
    "the lowest of the low, and the newest of the new!",
]


def test_trainer_matches_independent_reference():
    from cosmos_ray.functions.bpe import train_bpe

    got = train_bpe(_docs(CORPUS), num_merges=40)
    want = _ref_train(_ref_word_counts(CORPUS), 40)
    assert got == [tuple(p) for p in want]


def test_classic_fixture_first_merges():
    """On the low/lower/newest/widest corpus the first merges must build
    'est</w>' and 'low' — the canonical walkthrough result."""
    from cosmos_ray.functions.bpe import train_bpe

    merges = train_bpe(_docs(CORPUS), num_merges=6)
    built = {a + b for a, b in merges}
    assert "est</w>" in built
    assert "low" in built


def test_rank_encode_agrees_with_sequential_reference():
    """GPT-2-style lowest-rank-first application must give the same final
    segmentation as applying merges sequentially over the whole word
    (true for merge lists produced by this trainer on its own corpus)."""
    from cosmos_ray.functions.bpe import encode_word, train_bpe

    merges = train_bpe(_docs(CORPUS), num_merges=40)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in sorted(_ref_word_counts(CORPUS)):
        assert encode_word(w, ranks) == _ref_encode(w, merges), w


def test_distributed_token_counts():
    from cosmos_ray.functions.bpe import bpe_token_counts, train_bpe

    ds = _docs(CORPUS)
    merges = train_bpe(ds, num_merges=20)
    got = bpe_token_counts(ds, merges, concurrency=2).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = []
    for x in CORPUS:
        want.append(sum(len(_ref_encode(w, merges))
                        for w in _PRETOK.findall(x.lower())))
    assert got["n_bpe_tokens"].tolist() == want


def test_word_frequencies_top_k_deterministic():
    from cosmos_ray.functions.bpe import word_frequencies

    df = word_frequencies(_docs(CORPUS), top_k=3).to_pandas()
    ref = _ref_word_counts(CORPUS)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(df["word"], df["n"])) == want
