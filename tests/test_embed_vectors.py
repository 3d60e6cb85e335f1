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


class TestDistributedPCA:
    @staticmethod
    def _data(n=300, dim=16, seed=5):
        rng = np.random.default_rng(seed)
        # anisotropic: a few dominant directions so PCs are well-separated
        basis = rng.normal(size=(dim, dim))
        scales = np.linspace(3.0, 0.1, dim)
        X = rng.normal(size=(n, dim)) * scales @ basis
        return X

    def test_fit_matches_numpy_replay(self, ray_session):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.functions.stats import pca_fit

        X = self._data()
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(X)), pa.int64()),
            "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
        })).repartition(7)
        m = pca_fit(ds, dim=X.shape[1], k=4)

        mu = X.mean(axis=0)
        cov = (X.T @ X) / len(X) - np.outer(mu, mu)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:4]
        comps = v[:, order].T
        for i in range(4):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        assert np.allclose(m["mean"], mu, atol=1e-9)
        assert np.allclose(m["components"], comps, atol=1e-7)
        assert np.allclose(m["explained_var"], w[order], atol=1e-9)
        # components orthonormal, variances descending
        assert np.allclose(m["components"] @ m["components"].T,
                           np.eye(4), atol=1e-9)
        assert (np.diff(m["explained_var"]) <= 1e-12).all()

    def test_transform_projects_consistently(self, ray_session):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.functions.stats import pca_fit, pca_transform

        X = self._data(n=120)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(X)), pa.int64()),
            "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
        }))
        m = pca_fit(ds, dim=X.shape[1], k=3)
        got = (pca_transform(ds, m).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        want = np.round((X - m["mean"]) @ m["components"].T, 6)
        for i in range(3):
            assert np.allclose(got[f"pc_{i}"].to_numpy(), want[:, i],
                               atol=1e-9)


def test_pca_moments_numpy_replay(ray_session):
    """pca_moments (the ★ oracle for PCA's distributed half) must equal
    the plain numpy replay of the quantized scatter accumulation —
    integer-exact, partition-count-independent."""
    from cosmos_ray.queries.driver_queries import q_pca_moments

    got = q_pca_moments("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq

    X = np.asarray(
        pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        .column("embedding").to_pylist(), dtype=np.float64)
    Q = np.floor(X * 1048576.0 + 0.5).astype(np.int64)
    s = Q.sum(axis=0)
    ss = Q.T @ Q
    iu, ju = np.triu_indices(X.shape[1])
    assert len(got) == len(iu)
    g = got.sort_values(["i", "j"]).reset_index(drop=True)
    assert (g["n"] == len(X)).all()
    assert (g["s_i"].to_numpy() == s[iu]).all()
    assert (g["s_j"].to_numpy() == s[ju]).all()
    assert (g["sxx"].to_numpy() == ss[iu, ju]).all()


def test_hash_embed_weights_normalize_to_embedder(documents_small):
    """The oracle-checked long-form weights, l2-normalized per doc, must
    equal HashingEmbedder's embedding exactly — tying embed_docs
    (rows-only) to hash_embed_long's DuckDB-verified core."""
    from cosmos_ray.functions.embed import embed_documents, hash_embed_weights

    ds = rd.from_arrow(documents_small).select_columns(["doc_id", "text"])
    w = hash_embed_weights(ds).to_pandas()
    emb = {r["doc_id"]: np.asarray(r["embedding"], np.float64)
           for r in embed_documents(ds).take_all()}
    for doc_id, g in w.groupby("doc_id"):
        v = np.zeros(64)
        v[g["bucket"].to_numpy()] = g["weight"].to_numpy().astype(np.float64)
        n = np.linalg.norm(v)
        expect = (v / n if n > 0 else v).astype(np.float32)
        assert np.allclose(emb[doc_id], expect, atol=1e-7), doc_id
