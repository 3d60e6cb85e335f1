"""ANN similarity search: brute-force exactness vs numpy, IVF recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from cosmos_ray.functions import similarity

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _load():
    t = pq.read_table(EMB)
    ids = np.asarray(t.column("vec_id").to_pylist())
    V = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    return t, ids, V


def test_brute_force_matches_numpy():
    t, ids, V = _load()
    q = V[:3]
    got = similarity.brute_force_topk(rd.from_arrow(t), q, k=5).take_all()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = Vn @ qn.T
    for qi in range(3):
        want_top = set(ids[np.argsort(-sims[:, qi])[:5]].tolist())
        got_top = {r["vec_id"] for r in got if r["query_id"] == qi}
        assert got_top == want_top
        # rank 1 must be the query vector itself (cosine 1.0)
        r1 = [r for r in got if r["query_id"] == qi and r["rank"] == 1][0]
        assert abs(r1["cosine"] - 1.0) < 1e-6


def test_ivf_recall_vs_brute_force():
    t, ids, V = _load()
    q = V[5:10]
    ds = rd.from_arrow(t)
    exact = similarity.brute_force_topk(ds, q, k=10).take_all()
    approx = similarity.ivf_topk(ds, q, k=10, n_centroids=8, nprobe=4).take_all()
    recall_num = recall_den = 0
    for qi in range(5):
        want = {r["vec_id"] for r in exact if r["query_id"] == qi}
        got = {r["vec_id"] for r in approx if r["query_id"] == qi}
        recall_num += len(want & got)
        recall_den += len(want)
    recall = recall_num / recall_den
    assert recall >= 0.6, f"IVF recall {recall}"


def test_ivf_index_partition_pruning(tmp_path):
    """Index/query split: the on-disk index is hive-partitioned by cell
    and a query touches only its nprobe cells' directories; recall vs
    brute force stays high."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.functions.similarity import (
        brute_force_topk,
        build_ivf_index,
        ivf_query_index,
    )

    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(400, 16))
    tbl = pa.table(
        {"vec_id": pa.array(range(400), pa.int64()),
         "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64()))}
    )
    idx_dir = str(tmp_path / "ivf")
    C = build_ivf_index(rd.from_arrow(tbl), idx_dir, n_centroids=8, seed=3)
    assert C.shape[0] == 8
    cell_dirs = glob.glob(os.path.join(idx_dir, "cell=*"))
    assert len(cell_dirs) >= 4  # corpus spread over several cells

    q = vecs[7:8]
    got = {r["vec_id"] for r in ivf_query_index(idx_dir, q, k=10, nprobe=4).take_all()}
    want = {r["vec_id"] for r in brute_force_topk(rd.from_arrow(tbl), q, k=10).take_all()}
    assert 7 in got  # the query vector itself is its own nearest neighbor
    assert len(got & want) >= 7, f"recall too low: {len(got & want)}/10"


def test_kmeans_matches_numpy_lloyds():
    """Full replay of kmeans_fit in numpy: identical seeded init,
    identical update rule -> identical assignments and centroids."""
    from cosmos_ray.queries.relational import seeded_sample

    t, ids, V = _load()
    ds = rd.from_arrow(t)
    assigns, C = similarity.kmeans_fit(ds, k=4, iters=3, seed=7)
    got = assigns.to_pandas().sort_values("vec_id").reset_index(drop=True)

    # replay: same sample-based init (seeded_sample is engine-side but
    # deterministic, so reuse it), same Lloyd's updates over ALL vectors
    sample = seeded_sample(rd.from_arrow(t), max(4 * 32, 256), seed=7).to_pandas()
    X0 = np.asarray(sample["embedding"].tolist(), dtype=np.float64)
    rng = np.random.RandomState(7)
    Cr = X0[rng.choice(len(X0), size=4, replace=False)].copy()
    order = np.argsort(ids)
    X = V[order]
    for _ in range(3):
        d = (Cr * Cr).sum(1)[None, :] - 2.0 * (X @ Cr.T)
        a = np.argmin(d, axis=1)
        for c in range(4):
            if (a == c).any():
                Cr[c] = X[a == c].mean(axis=0)
    assert np.allclose(C, Cr, atol=1e-9)
    d = (Cr * Cr).sum(1)[None, :] - 2.0 * (X @ Cr.T)
    want = np.argmin(d, axis=1)
    assert got["cluster"].to_numpy().tolist() == want.tolist()
    assert got["vec_id"].to_numpy().tolist() == ids[order].tolist()


def test_kmeans_empty_cluster_keeps_centroid():
    import pyarrow as pa

    # 10 identical points, k=3: two clusters never win a point
    tbl = pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([[1.0, 2.0]] * 10, pa.list_(pa.float32())),
    })
    assigns, C = similarity.kmeans_fit(rd.from_arrow(tbl), k=3, iters=2, seed=1)
    df = assigns.to_pandas()
    assert df["cluster"].nunique() == 1  # all points in one cluster
    assert C.shape == (3, 2) and np.isfinite(C).all()


class TestScalarQuantization:
    def _emb(self, n=400, dim=32, seed=11):
        rng = np.random.RandomState(seed)
        X = rng.normal(size=(n, dim))
        return X, rd.from_arrow(pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([x.tolist() for x in X],
                                  pa.list_(pa.float64()))}))

    def test_roundtrip_error_bounded(self):
        from cosmos_ray.functions.similarity import (
            fit_quantizer,
            quantize_embeddings,
        )

        X, ds = self._emb()
        q = fit_quantizer(ds)
        codes = (quantize_embeddings(ds, q).to_pandas()
                 .sort_values("vec_id"))
        Xq = q["min"] + np.asarray(codes["qvec"].tolist(), np.float64) * q["scale"]
        # reconstruction error per coordinate <= half a quantization step
        assert (np.abs(Xq - X) <= q["scale"] / 2 + 1e-12).all()

    def test_quantized_recall(self):
        from cosmos_ray.functions.similarity import (
            brute_force_topk,
            fit_quantizer,
            quantize_embeddings,
            quantized_topk,
        )

        X, ds = self._emb()
        rng = np.random.RandomState(5)
        Q = rng.normal(size=(4, X.shape[1]))
        exact = brute_force_topk(ds, Q, k=10).to_pandas()
        q = fit_quantizer(ds)
        qds = quantize_embeddings(ds, q).materialize()
        approx = quantized_topk(qds, q, Q, k=10).to_pandas()
        recalls = []
        for qi in range(4):
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            recalls.append(len(e & a) / 10)
        assert np.mean(recalls) >= 0.85, recalls

    def test_fit_merge_matches_global(self):
        from cosmos_ray.functions.similarity import fit_quantizer

        X, ds = self._emb()
        q = fit_quantizer(ds)
        assert np.allclose(q["min"], X.min(axis=0))
        assert np.allclose(q["min"] + 255 * q["scale"], X.max(axis=0))


class TestKnnJoin:
    def test_matches_per_row_brute_force(self):
        import numpy as np
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.functions.similarity import brute_force_topk, knn_join

        rng = np.random.RandomState(11)
        V = rng.randn(40, 8)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(V.tolist()),
        }))
        left = ds.filter(expr="vec_id < 6")
        got = (knn_join(left, ds, k=3, exclude_self=True, slab=4)
               .to_pandas().sort_values(["left_id", "rank"])
               .reset_index(drop=True))
        # reference: per-left brute force with the self row masked
        for lid in range(6):
            ref = brute_force_topk(ds, V[lid:lid + 1], k=4).to_pandas()
            ref = ref[ref["vec_id"] != lid].head(3)
            sub = got[got["left_id"] == lid]
            assert sub["vec_id"].tolist() == ref["vec_id"].tolist()
            assert sub["cosine"].tolist() == ref["cosine"].tolist()
            assert sub["rank"].tolist() == [1, 2, 3]

    def test_self_kept_when_not_excluded(self):
        import numpy as np
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.functions.similarity import knn_join

        V = np.eye(5)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array(V.tolist()),
        }))
        got = knn_join(ds.filter(expr="vec_id == 0"), ds, k=1).to_pandas()
        assert got["vec_id"].tolist() == [0]  # self is the nearest
        assert got["cosine"].iloc[0] == 1.0


class TestProductQuantization:
    def test_encode_shape_and_determinism(self):
        t, ids, V = _load()
        ds = rd.from_arrow(t)
        b1 = similarity.pq_fit(ds, m=4, ks=16, seed=31)
        b2 = similarity.pq_fit(ds, m=4, ks=16, seed=31)
        assert b1.shape == (4, 16, V.shape[1] // 4)
        assert np.array_equal(b1, b2)
        codes = similarity.pq_encode(ds, b1).take_all()
        assert len(codes) == len(ids)
        assert all(len(r["pq_code"]) == 4 for r in codes)
        assert all(0 <= c < 16 for r in codes for c in r["pq_code"])

    def test_adc_matches_numpy_reconstruction(self):
        """ADC top-k must equal exact L2 search over the RECONSTRUCTED
        (decoded) vectors — ADC is exact w.r.t. the codes."""
        t, ids, V = _load()
        ds = rd.from_arrow(t)
        B = similarity.pq_fit(ds, m=4, ks=16, seed=31)
        code_rows = similarity.pq_encode(ds, B).take_all()
        by_id = {r["vec_id"]: r["pq_code"] for r in code_rows}
        sub = V.shape[1] // 4
        R = np.stack([
            np.concatenate([B[j][by_id[i][j]] for j in range(4)])
            for i in ids
        ])
        q = V[:3]
        got = similarity.pq_topk(similarity.pq_encode(ds, B), B, q, k=5).take_all()
        for qi in range(3):
            d = ((R - q[qi]) ** 2).sum(axis=1)
            want = set(ids[np.lexsort((ids, d))[:5]].tolist())
            g = {r["vec_id"] for r in got if r["query_id"] == qi}
            assert g == want
            # scores match the reconstruction distances
            for r in got:
                if r["query_id"] == qi:
                    i = int(np.where(ids == r["vec_id"])[0][0])
                    assert abs(r["adc"] - d[i]) < 1e-4

    def test_pq_recall_vs_exact_l2(self):
        """Recall of ADC top-10 against EXACT L2 top-10 (numpy) — the
        apples-to-apples gate (ADC approximates L2; cosine top-k is a
        different ranking on unnormalized vectors)."""
        t, ids, V = _load()
        ds = rd.from_arrow(t)
        q = V[5:10]
        B = similarity.pq_fit(ds, m=16, ks=64, seed=31)
        approx = similarity.pq_topk(similarity.pq_encode(ds, B), B, q, k=10).take_all()
        num = den = 0
        for qi in range(5):
            d = ((V - q[qi]) ** 2).sum(axis=1)
            want = set(ids[np.lexsort((ids, d))[:10]].tolist())
            got = {r["vec_id"] for r in approx if r["query_id"] == qi}
            num += len(want & got)
            den += len(want)
        assert num / den >= 0.45, f"PQ recall {num/den}"


def test_ivf_index_append_incremental(tmp_path):
    """append_ivf_index: new vectors fold into the existing cell layout
    with the frozen quantizer; queries over the appended index find
    appended vectors and old files are never rewritten."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.functions.similarity import (append_ivf_index,
                                                 build_ivf_index,
                                                 ivf_query_index)

    rng = np.random.RandomState(9)
    vecs = rng.normal(size=(300, 16))

    def tbl(lo, hi):
        return pa.table({
            "vec_id": pa.array(range(lo, hi), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs[lo:hi]],
                                  pa.list_(pa.float64()))})

    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(rd.from_arrow(tbl(0, 200)), idx_dir, n_centroids=8,
                    seed=3)
    before = sorted(glob.glob(os.path.join(idx_dir, "cell=*", "*.parquet")))
    n = append_ivf_index(rd.from_arrow(tbl(200, 300)), idx_dir)
    assert n == 100
    after = sorted(glob.glob(os.path.join(idx_dir, "cell=*", "*.parquet")))
    # append-only: every pre-append file survives untouched
    assert set(before) <= set(after) and len(after) > len(before)

    # a query AT an appended vector finds it (it lives in its own cell)
    got = {r["vec_id"] for r in
           ivf_query_index(idx_dir, vecs[250:251], k=5, nprobe=4)
           .take_all()}
    assert 250 in got
