"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  matrix once via ``ray.put``; each batch does one float64 matmul against
  it; per-batch local top-k partials are merged in a tiny final reduce.
  This is the baseline and the oracle for the approximate variant.
- ``ivf_topk``: the scale path — k-means-style coarse quantizer
  (deterministic seeded centroids trained on a sample), each vector
  assigned to its nearest centroid at index time; queries probe only the
  ``nprobe`` nearest centroid partitions.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _as_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float64)


def brute_force_topk(emb_ds, query_vecs: np.ndarray, k: int = 10,
                     exclude_ids: np.ndarray | None = None):
    """-> Dataset (query_id, vec_id, cosine, rank). Exact; per-batch
    partial top-k (k rows per query per batch cross the shuffle, not the
    full score matrix). ``exclude_ids[qi]`` (optional, aligned with the
    query rows) removes that vec_id from query qi's candidates — the
    self-match mask for ``knn_join``."""
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    excl = None if exclude_ids is None else np.asarray(exclude_ids, np.int64)
    q_ref = ray.put((qn, excl))

    class Scorer:
        def __init__(self, q_ref=None) -> None:
            self.q, self.excl = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            V = _as_matrix(batch.column("embedding"))
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ self.q.T  # (n, nq)
            o_q, o_id, o_s = [], [], []
            for qi in range(sims.shape[1]):
                col = sims[:, qi]
                if self.excl is not None:
                    col = np.where(ids == self.excl[qi], -np.inf, col)
                top = np.argsort(-col, kind="stable")[:k]
                o_q.extend([qi] * len(top))
                o_id.extend(ids[top].tolist())
                o_s.extend(col[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(o_q, pa.int32()),
                    "vec_id": pa.array(o_id, pa.int64()),
                    "cosine": pa.array(o_s, pa.float64()),
                }
            )

    partials = emb_ds.map_batches(
        Scorer,
        fn_constructor_kwargs={"q_ref": q_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=4096,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g[np.isfinite(g["cosine"].to_numpy())]  # masked self-matches
        top = heapq.nsmallest(k, g.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id))
        return pd.DataFrame(
            {
                "query_id": [r.query_id for r in top],
                "vec_id": [r.vec_id for r in top],
                "cosine": [round(r.cosine, 6) for r in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def knn_join(left_ds, right_ds, k: int = 3, exclude_self: bool = False,
             slab: int = 4096, left_id_col: str = "vec_id"):
    """Similarity join: for every LEFT row, its ``k`` nearest RIGHT rows
    by cosine -> (left_id, vec_id, cosine, rank).

    Scale shape: the left side is consumed in driver slabs of ``slab``
    rows (bounded memory — never the whole left at once); each slab
    broadcasts one query matrix via ``ray.put`` and the RIGHT side
    streams through the partial-top-k scorer (k rows per query per batch
    cross the exchange, never the score matrix). Total work is
    ceil(|L|/slab) streaming passes over the right side — the standard
    block-nested-loop kNN-join decomposition; for very large lefts,
    build an at-rest IVF index over the right side instead
    (`build_ivf_index`) and probe per slab."""
    import ray.data as rd

    parts = []
    for batch in left_ds.select_columns([left_id_col, "embedding"]).iter_batches(
            batch_size=slab, batch_format="pyarrow"):
        lids = np.asarray(batch.column(left_id_col).to_pylist(), dtype=np.int64)
        Q = _as_matrix(batch.column("embedding"))
        res = brute_force_topk(right_ds, Q, k=k,
                               exclude_ids=lids if exclude_self else None)

        def remap(t: pa.Table, lids=lids) -> pa.Table:
            qi = t.column("query_id").to_numpy()
            return pa.table({
                "left_id": pa.array(lids[qi], pa.int64()),
                "vec_id": t.column("vec_id"),
                "cosine": t.column("cosine"),
                "rank": t.column("rank").cast(pa.int64()),
            })

        parts.append(res.map_batches(remap, batch_format="pyarrow"))
    if not parts:
        return rd.from_arrow(pa.table({
            "left_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64())}))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _seeded_centroids(emb_ds, n_centroids: int, seed: int, sample_n: int = 2048, iters: int = 5) -> np.ndarray:
    """Deterministic mini k-means on a seeded UNIFORM random sample
    (``random_sample``, O7) — a head/limit sample would be order-biased
    toward whatever vectors happen to come first. The coarse quantizer is
    tiny model state, trained once, broadcast everywhere."""
    from cosmos_ray.queries.relational import seeded_sample

    sample = seeded_sample(emb_ds, sample_n, seed=seed).to_pandas()
    X = np.asarray(sample["embedding"].tolist(), dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            pts = X[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_topk(emb_ds, query_vecs: np.ndarray, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, seed: int = 23):
    """Approximate cosine top-k: probe only the ``nprobe`` closest
    centroid partitions per query. Recall is tested against
    ``brute_force_topk`` (tests/test_similarity.py)."""
    C = _seeded_centroids(emb_ds, n_centroids, seed)
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    allowed = [set(row.tolist()) for row in probe]
    state_ref = ray.put((C, qn, allowed))

    class Scorer:
        def __init__(self, state_ref=None) -> None:
            self.C, self.q, self.allowed = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            V = _as_matrix(batch.column("embedding"))
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(Vn @ self.C.T, axis=1)
            o_q, o_id, o_s = [], [], []
            for qi in range(self.q.shape[0]):
                mask = np.isin(cell, list(self.allowed[qi]))
                if not mask.any():
                    continue
                col = Vn[mask] @ self.q[qi]
                sub_ids = ids[mask]
                top = np.argsort(-col, kind="stable")[:k]
                o_q.extend([qi] * len(top))
                o_id.extend(sub_ids[top].tolist())
                o_s.extend(col[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(o_q, pa.int32()),
                    "vec_id": pa.array(o_id, pa.int64()),
                    "cosine": pa.array(o_s, pa.float64()),
                }
            )

    partials = emb_ds.map_batches(
        Scorer,
        fn_constructor_kwargs={"state_ref": state_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=4096,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        top = heapq.nsmallest(k, g.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id))
        return pd.DataFrame(
            {
                "query_id": [r.query_id for r in top],
                "vec_id": [r.vec_id for r in top],
                "cosine": [round(r.cosine, 6) for r in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------- IVF index at rest

def build_ivf_index(emb_ds, out_dir: str, n_centroids: int = 16, seed: int = 23):
    """Index-time half of IVF: train the coarse quantizer on a seeded
    uniform sample, assign every vector to its nearest centroid, and
    write the corpus partitioned BY CELL (hive layout ``cell=K/``) —
    queries then read only their probed cells' files (partition pruning,
    the disk analog of nprobe). Returns the centroid matrix; persist it
    next to the index (``centroids.npy``)."""
    import os

    import pyarrow as pa

    C = _seeded_centroids(emb_ds, n_centroids, seed)
    c_ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        V = _as_matrix(batch.column("embedding"))
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        cell = np.argmax(Vn @ cm.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cell))

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    assigned.write_parquet(out_dir, partition_cols=["cell"])
    np.save(os.path.join(out_dir, "centroids.npy"), C)
    return C


def append_ivf_index(emb_ds, index_dir: str) -> int:
    """Fold NEW vectors into an existing at-rest IVF index: assign them
    with the index's OWN persisted centroids (the quantizer is frozen at
    build time — the standard IVF maintenance contract) and append
    uniquely-named files into the same ``cell=K/`` partitions. Existing
    files are never rewritten, so the append is safe while readers
    query (the `append_minhash_index` maintenance convention). Returns
    the number of vectors appended."""
    import os

    import pyarrow as pa

    assert os.path.exists(os.path.join(index_dir, "centroids.npy")), \
        "append target must be an existing build_ivf_index directory"
    C = np.load(os.path.join(index_dir, "centroids.npy"))
    c_ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        V = _as_matrix(batch.column("embedding"))
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        cell = np.argmax(Vn @ cm.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cell))

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow") \
        .materialize()
    assigned.write_parquet(index_dir, partition_cols=["cell"])
    return assigned.count()


def ivf_query_index(index_dir: str, query_vecs: np.ndarray, k: int = 10,
                    nprobe: int = 4):
    """Query-time half: load the (tiny) centroid matrix, pick the
    ``nprobe`` nearest cells per query, and ``read_parquet`` ONLY those
    cells' directories — the scan never touches the other partitions.
    Returns the same (query_id, vec_id, cosine, rank) dataset shape as
    ``brute_force_topk``."""
    import glob
    import os

    import ray.data as rd

    C = np.load(os.path.join(index_dir, "centroids.npy"))
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]
    cells = sorted({int(c) for row in probe for c in row})
    paths = [p for c in cells for p in glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet"))]
    if not paths:
        import pyarrow as pa

        return rd.from_arrow(pa.table({"query_id": pa.array([], pa.int32()),
                                       "vec_id": pa.array([], pa.int64()),
                                       "cosine": pa.array([], pa.float64()),
                                       "rank": pa.array([], pa.int64())}))
    ds = rd.read_parquet(paths, columns=["vec_id", "embedding"])
    return brute_force_topk(ds, query_vecs, k=k)


def kmeans_fit(emb_ds, k: int = 8, iters: int = 10, seed: int = 7,
               replayable: bool = False):
    """Full-corpus distributed Lloyd's k-means -> (assignments Dataset
    (vec_id, cluster), centroids ndarray (k, dim)).

    Scale shape (parameter-server-lite): centroids are model-sized state
    broadcast per iteration (`ray.put` once, read in every task); each
    batch assigns via one matmul and emits k partial rows (count +
    coordinate sums) — the exchange per iteration is batches x k x dim,
    independent of corpus size; the driver folds partials and updates
    centroids. Init is the deterministic sample-trained mini k-means
    (`_seeded_centroids` denormalized to raw space is skipped — raw
    Euclidean Lloyd's re-inits from the seeded uniform sample directly).
    Empty clusters keep their previous centroid. Assignment ties break
    to the lowest cluster index (np.argmin).

    ``replayable=True`` pins a SQL-replayable configuration (the
    `centroid_assign` trick applied per Lloyd iteration): init =
    embeddings of vec_id 0..k-1 (cluster id == seed vec_id), centroids
    rounded to 6dp after every update, assignment by FULL squared
    distance rounded to 6dp (ties -> lowest cluster) — every iteration
    then computes over identical values in the engine and in a DuckDB
    unrolled-CTE oracle. Same exchanges, same semantics; use the
    default mode when oracle parity is not required."""
    import ray.data as rd

    from cosmos_ray.queries.relational import seeded_sample

    if replayable:
        first = emb_ds.filter(expr=f"vec_id < {k}").to_pandas()
        first = first.sort_values("vec_id")
        C = np.asarray(first["embedding"].tolist(), dtype=np.float64).copy()
    else:
        sample = seeded_sample(emb_ds, max(k * 32, 256), seed=seed).to_pandas()
        X0 = np.asarray(sample["embedding"].tolist(), dtype=np.float64)
        rng = np.random.RandomState(seed)
        C = X0[rng.choice(len(X0), size=min(k, len(X0)), replace=False)].copy()

    def assign_partials(t: pa.Table, _c_ref) -> pa.Table:
        C = ray.get(_c_ref)
        X = _as_matrix(t.column("embedding"))
        if replayable:
            d = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
        else:
            # argmin ||x-c||^2 = argmin (||c||^2 - 2 c.x); row-wise exact
            d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        a = np.argmin(d, axis=1)
        rows = {"cluster": [], "n": [], "s": []}
        for c in range(len(C)):
            m = a == c
            rows["cluster"].append(c)
            rows["n"].append(int(m.sum()))
            rows["s"].append(X[m].sum(axis=0).tolist() if m.any()
                             else np.zeros(X.shape[1]).tolist())
        return pa.table({
            "cluster": pa.array(rows["cluster"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "s": pa.array(rows["s"], pa.list_(pa.float64())),
        })

    for _ in range(iters):
        c_ref = ray.put(C)
        counts = np.zeros(len(C), np.int64)
        sums = np.zeros_like(C)
        part = emb_ds.select_columns(["embedding"]).map_batches(
            lambda t, _r=c_ref: assign_partials(t, _r), batch_format="pyarrow")
        for b in part.iter_batches(batch_format="pyarrow"):
            cl = b.column("cluster").to_numpy(zero_copy_only=False)
            # np.add.at, NOT +=: one iter_batches batch can coalesce
            # several task outputs, so `cl` carries duplicate cluster
            # indices — fancy-indexed += silently drops all but one
            np.add.at(counts, cl,
                      b.column("n").to_numpy(zero_copy_only=False))
            np.add.at(sums, cl,
                      np.asarray(b.column("s").to_pylist(), dtype=np.float64))
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz, None]
        if replayable:
            C = np.round(C, 6)

    c_ref = ray.put(C)

    def final_assign(t: pa.Table, _r=c_ref) -> pa.Table:
        C = ray.get(_r)
        X = _as_matrix(t.column("embedding"))
        if replayable:
            d = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
        else:
            d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "cluster": pa.array(np.argmin(d, axis=1).astype(np.int64)),
        })

    assigns = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        final_assign, batch_format="pyarrow")
    return assigns, C


# ------------------------------------------------- scalar quantization

def fit_quantizer(emb_ds) -> dict:
    """Per-dimension (min, max) for int8 scalar quantization — the
    memory side of ANN at rest (a float32 corpus stores 4x smaller as
    uint8 codes, which is what keeps a 100-TB embedding table in the
    object store's working set). Distributed combiner: each batch emits
    ONE row of per-dim mins + maxes; the driver folds (exchange
    independent of corpus size)."""

    def partial(t: pa.Table) -> pa.Table:
        X = _as_matrix(t.column("embedding"))
        return pa.table({
            "mn": pa.array([X.min(axis=0).tolist()], pa.list_(pa.float64())),
            "mx": pa.array([X.max(axis=0).tolist()], pa.list_(pa.float64())),
        })

    mn = mx = None
    for b in emb_ds.select_columns(["embedding"]).map_batches(
            partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for lo, hi in zip(b.column("mn").to_pylist(), b.column("mx").to_pylist()):
            lo, hi = np.asarray(lo), np.asarray(hi)
            mn = lo if mn is None else np.minimum(mn, lo)
            mx = hi if mx is None else np.maximum(mx, hi)
    scale = np.maximum(mx - mn, 1e-12) / 255.0
    return {"min": mn, "scale": scale}


def quantize_embeddings(emb_ds, q: dict):
    """(vec_id, embedding) -> (vec_id, qvec: list<uint8>) with
    code = round((x - min) / scale), clipped to [0, 255]."""
    import ray

    q_ref = ray.put(q)

    def f(t: pa.Table, _r=q_ref) -> pa.Table:
        import ray as _ray

        qq = _ray.get(_r)
        X = _as_matrix(t.column("embedding"))
        codes = np.clip(np.round((X - qq["min"]) / qq["scale"]), 0, 255
                        ).astype(np.uint8)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "qvec": pa.array([c.tolist() for c in codes],
                             pa.list_(pa.uint8())),
        })

    return emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        f, batch_format="pyarrow")


def quantized_topk(q_ds, q: dict, query_vecs: np.ndarray, k: int = 10):
    """Brute-force cosine top-k over the QUANTIZED corpus: each batch
    dequantizes (x̂ = min + code·scale) and runs the same partial-top-k
    matmul as `brute_force_topk` — same output shape, 4x less data at
    rest, recall gated in tests."""
    import ray

    import ray.data as rd

    q_ref = ray.put(q)

    def deq(t: pa.Table, _r=q_ref) -> pa.Table:
        import ray as _ray

        qq = _ray.get(_r)
        codes = np.asarray(t.column("qvec").to_pylist(), dtype=np.float64)
        X = qq["min"] + codes * qq["scale"]
        return pa.table({
            "vec_id": t.column("vec_id"),
            "embedding": pa.array([x.tolist() for x in X],
                                  pa.list_(pa.float64())),
        })

    deq_ds = q_ds.map_batches(deq, batch_format="pyarrow")
    return brute_force_topk(deq_ds, query_vecs, k=k)


def pq_fit(emb_ds, m: int = 4, ks: int = 16, seed: int = 31,
           sample_n: int = 2048, iters: int = 8) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., PAMI 2011): split
    the d dims into ``m`` contiguous subspaces and k-means each
    subspace's sample independently -> (m, ks, d/m) float64. Trained on
    ONE seeded uniform sample (same discipline as `_seeded_centroids` —
    a head sample would be order-biased); the codebooks are tiny model
    state (m*ks*d/m floats), broadcast everywhere, never reshipped per
    batch. Deterministic: fixed seed, fixed iteration count, stable
    argmin ties."""
    from cosmos_ray.queries.relational import seeded_sample

    sample = seeded_sample(emb_ds, sample_n, seed=seed).to_pandas()
    X = np.asarray(sample["embedding"].tolist(), dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ks, sub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        C = S[rng.choice(len(S), size=min(ks, len(S)), replace=False)].copy()
        for _ in range(iters):
            # squared-L2 assignment via the expanded form — one matmul
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                pts = S[assign == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        if len(C) < ks:  # degenerate tiny sample: pad by repeating
            C = np.vstack([C, np.repeat(C[-1:], ks - len(C), axis=0)])
        books[j] = C
    return books


def pq_encode(emb_ds, codebooks: np.ndarray):
    """(vec_id, embedding) -> (vec_id, pq_code: list<uint8>): per
    subspace, the index of the nearest codeword by squared L2. d float32
    dims compress to m bytes per vector (d/m * 4x smaller than SQ's 1
    byte/dim) — the at-rest form that keeps a 100-TB embedding corpus
    inside the object store's working set. Fully vectorized: one matmul
    per subspace per batch."""
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def enc(t: pa.Table, _r=ref) -> pa.Table:
        B = ray.get(_r)
        m, ks, sub = B.shape
        X = _as_matrix(t.column("embedding"))
        codes = np.empty((len(X), m), dtype=np.uint8)
        for j in range(m):
            S = X[:, j * sub:(j + 1) * sub]
            C = B[j]
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "pq_code": pa.array([c.tolist() for c in codes], pa.list_(pa.uint8())),
        })

    return emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        enc, batch_format="pyarrow")


def pq_topk(code_ds, codebooks: np.ndarray, query_vecs: np.ndarray,
            k: int = 10):
    """Asymmetric-distance (ADC) top-k over PQ codes: per query,
    precompute the (m, ks) lookup table of squared L2 between the raw
    query subvector and every codeword, then each batch's score is m
    table lookups summed — no decode, no matmul against the corpus.
    Output shape matches `brute_force_topk` ((query_id, vec_id, adc,
    rank), ascending distance); per-batch partial top-k means k rows per
    query per batch cross the exchange, never the score matrix. Recall
    vs exact search is gated in tests."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, ks, sub = B.shape
    Q = np.asarray(query_vecs, dtype=np.float64)
    # LUT[qi, j, c] = ||Q[qi, sub_j] - B[j, c]||^2
    lut = np.empty((len(Q), m, ks), dtype=np.float64)
    for j in range(m):
        diff = Q[:, None, j * sub:(j + 1) * sub] - B[j][None, :, :]
        lut[:, j, :] = (diff * diff).sum(axis=2)
    ref = ray.put(lut)

    class Scorer:
        def __init__(self, ref=None) -> None:
            self.lut = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
            codes = np.asarray(t.column("pq_code").to_pylist(), dtype=np.int64)
            n = len(ids)
            o_q, o_id, o_s = [], [], []
            cols = np.arange(m)
            for qi in range(self.lut.shape[0]):
                d = self.lut[qi][cols[None, :], codes].sum(axis=1)  # (n,)
                top = np.lexsort((ids, d))[:k]
                o_q.extend([qi] * len(top))
                o_id.extend(ids[top].tolist())
                o_s.extend(d[top].tolist())
            return pa.table({
                "query_id": pa.array(o_q, pa.int32()),
                "vec_id": pa.array(o_id, pa.int64()),
                "adc": pa.array(o_s, pa.float64()),
            })

    partials = code_ds.map_batches(
        Scorer, fn_constructor_kwargs={"ref": ref},
        batch_format="pyarrow", concurrency=(1, 4), batch_size=4096)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        top = heapq.nsmallest(
            k, g.itertuples(index=False), key=lambda r: (r.adc, r.vec_id))
        return pd.DataFrame({
            "query_id": [r.query_id for r in top],
            "vec_id": [r.vec_id for r in top],
            "adc": [round(r.adc, 6) for r in top],
            "rank": list(range(1, len(top) + 1)),
        })

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
