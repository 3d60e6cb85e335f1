"""Word-vector trainer (D6): PPMI+SVD over the distributed co-occurrence
reduce — determinism, shape, and distributional-similarity semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from cosmos_ray.functions.embed import train_word_vectors


def _crafted_corpus() -> pa.Table:
    """cat and dog appear in IDENTICAL contexts; rock appears in a
    disjoint context — distributional similarity must rank
    cosine(cat, dog) far above cosine(cat, rock)."""
    rows = []
    i = 0
    for animal in ("cat", "dog"):
        for _ in range(30):
            rows.append({"doc_id": i, "text": f"the {animal} sat on the warm mat"})
            i += 1
    for _ in range(30):
        rows.append({"doc_id": i, "text": "igneous rock formed under deep pressure"})
        i += 1
    return pa.Table.from_pylist(rows)


def _vec_map(ds):
    return {r["token"]: np.array(r["vector"]) for r in ds.take_all()}


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0


def test_word_vectors_distributional_similarity():
    vecs = _vec_map(train_word_vectors(rd.from_arrow(_crafted_corpus()),
                                       dim=8, vocab_size=64, min_count=2))
    assert {"cat", "dog", "rock", "the", "mat"} <= set(vecs)
    assert all(len(v) == 8 for v in vecs.values())
    sim_catdog = _cos(vecs["cat"], vecs["dog"])
    sim_catrock = _cos(vecs["cat"], vecs["rock"])
    assert sim_catdog > 0.9, sim_catdog
    assert sim_catdog > sim_catrock + 0.3, (sim_catdog, sim_catrock)


def test_word_vectors_deterministic_and_bounded():
    t = _crafted_corpus()
    a = _vec_map(train_word_vectors(rd.from_arrow(t), dim=8, vocab_size=4))
    b = _vec_map(train_word_vectors(rd.from_arrow(t), dim=8, vocab_size=4))
    assert set(a) == set(b) and len(a) == 4  # vocab_size respected
    for k in a:
        assert np.array_equal(a[k], b[k])


def test_word_vectors_corpus_runs(documents_small):
    ds = train_word_vectors(
        rd.from_arrow(documents_small).select_columns(["doc_id", "text"]),
        dim=16, vocab_size=128,
    )
    rows = ds.take_all()
    assert 0 < len(rows) <= 128  # bounded by corpus vocab (31 at sf0.001)
    assert all(len(r["vector"]) == 16 for r in rows)
