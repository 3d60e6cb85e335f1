"""Unit gates for graph analytics (PageRank, degree), the HLL distinct
sketch, the hopping-window aggregate and per-group heavy hitters."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _edges(rows):
    s, d, w = zip(*rows)
    return rd.from_arrow(pa.table({
        "src_entity": pa.array(s),
        "dst_entity": pa.array(d),
        "weight": pa.array(w, pa.int64()),
    }))


EDGE_ROWS = [("a", "b", 1), ("a", "c", 2), ("b", "c", 1), ("c", "a", 1),
             ("c", "d", 3), ("d", "a", 1), ("e", "a", 2)]


def _numpy_pagerank(rows, iters, damping=0.85):
    nodes = sorted({x for s, d, _ in rows for x in (s, d)})
    m = {e: i for i, e in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in rows:
        W[m[s], m[d]] += w
    outw = W.sum(1)
    r = np.full(n, 1 / n)
    for _ in range(iters):
        share = np.where(outw > 0, r / np.where(outw > 0, outw, 1), 0)
        r = (1 - damping) / n + damping * (W.T @ share + r[outw == 0].sum() / n)
    return nodes, np.round(r, 6)


class TestPageRank:
    def test_matches_numpy_power_iteration(self):
        from cosmos_ray.functions.graph import pagerank

        df = pagerank(_edges(EDGE_ROWS), iters=10).to_pandas()
        df = df.sort_values("entity").reset_index(drop=True)
        nodes, want = _numpy_pagerank(EDGE_ROWS, iters=10)
        assert df["entity"].tolist() == nodes
        assert df["rank"].tolist() == want.tolist()
        assert abs(df["rank"].sum() - 1.0) < 1e-4

    def test_joined_fallback_agrees_with_broadcast(self):
        from cosmos_ray.functions.graph import pagerank

        fast = pagerank(_edges(EDGE_ROWS), iters=5).to_pandas()
        slow = pagerank(_edges(EDGE_ROWS), iters=5, broadcast_cap=0).to_pandas()
        f = fast.sort_values("entity").reset_index(drop=True)
        s = slow.sort_values("entity").reset_index(drop=True)
        assert f["entity"].tolist() == s["entity"].tolist()
        assert np.allclose(f["rank"], s["rank"], atol=2e-6)

    def test_dangling_mass_conserved(self):
        from cosmos_ray.functions.graph import pagerank

        # 'sink' has no out-edges: ranks must still sum to ~1
        df = pagerank(_edges([("x", "sink", 1), ("y", "sink", 1)]),
                      iters=10).to_pandas()
        assert abs(df["rank"].sum() - 1.0) < 1e-4


def _numpy_ppr(rows, seeds, iters, damping=0.85):
    nodes = sorted({x for s, d, _ in rows for x in (s, d)})
    m = {e: i for i, e in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in rows:
        W[m[s], m[d]] += w
    outw = W.sum(1)
    v = np.zeros(n)
    for s in seeds:
        v[m[s]] = 1.0 / len(seeds)
    r = v.copy()
    for _ in range(iters):
        share = np.where(outw > 0, r / np.where(outw > 0, outw, 1), 0)
        r = (1 - damping) * v + damping * (W.T @ share + r[outw == 0].sum() * v)
    return nodes, np.round(r, 6)


class TestPersonalizedPageRank:
    def test_matches_numpy_restart_iteration(self):
        from cosmos_ray.functions.graph import pagerank

        df = pagerank(_edges(EDGE_ROWS), iters=10, seeds=["a"]).to_pandas()
        df = df.sort_values("entity").reset_index(drop=True)
        nodes, want = _numpy_ppr(EDGE_ROWS, ["a"], iters=10)
        assert df["entity"].tolist() == nodes
        assert np.allclose(df["rank"], want, atol=2e-6)
        assert abs(df["rank"].sum() - 1.0) < 1e-4

    def test_seed_concentrates_mass(self):
        from cosmos_ray.functions.graph import pagerank

        ppr = pagerank(_edges(EDGE_ROWS), iters=10, seeds=["a"]).to_pandas()
        uni = pagerank(_edges(EDGE_ROWS), iters=10).to_pandas()
        pa_ = ppr.set_index("entity")["rank"]
        ua = uni.set_index("entity")["rank"]
        assert pa_["a"] > ua["a"]  # restart mass concentrates at the seed
        assert pa_["e"] == 0.0  # nothing walks INTO e: zero personalized mass

    def test_joined_fallback_agrees_with_broadcast(self):
        from cosmos_ray.functions.graph import pagerank

        fast = pagerank(_edges(EDGE_ROWS), iters=5, seeds=["a"]).to_pandas()
        slow = pagerank(_edges(EDGE_ROWS), iters=5, seeds=["a"],
                        broadcast_cap=0).to_pandas()
        f = fast.sort_values("entity").reset_index(drop=True)
        s = slow.sort_values("entity").reset_index(drop=True)
        assert f["entity"].tolist() == s["entity"].tolist()
        assert np.allclose(f["rank"], s["rank"], atol=2e-6)

    def test_unknown_seed_raises(self):
        import pytest as _pytest

        from cosmos_ray.functions.graph import pagerank

        with _pytest.raises(ValueError):
            pagerank(_edges(EDGE_ROWS), iters=2, seeds=["zzz"]).to_pandas()


class TestDegree:
    def test_counts_and_weights(self):
        from cosmos_ray.functions.graph import degree_centrality

        df = (degree_centrality(_edges(EDGE_ROWS)).to_pandas()
              .set_index("entity").sort_index())
        assert df.loc["a", "out_degree"] == 2 and df.loc["a", "in_degree"] == 3
        assert df.loc["c", "out_weight"] == 4.0 and df.loc["c", "in_weight"] == 3.0
        assert df.loc["e", "in_degree"] == 0 and df.loc["e", "out_weight"] == 2.0

    def test_parallel_edges_collapse(self):
        from cosmos_ray.functions.graph import degree_centrality

        df = (degree_centrality(_edges([("a", "b", 1), ("a", "b", 4)]))
              .to_pandas().set_index("entity"))
        assert df.loc["a", "out_degree"] == 1  # distinct neighbour
        assert df.loc["a", "out_weight"] == 5.0


class TestHLL:
    def test_error_bound(self):
        from cosmos_ray.functions.sketch import hll_count

        n = 20_000
        ds = rd.from_arrow(pa.table({
            "v": pa.array([f"user-{i % 7_000}" for i in range(n)])}))
        est = hll_count(ds, "v", p=12)
        assert abs(est - 7_000) / 7_000 < 0.05  # ~3 std of 1.04/sqrt(4096)

    def test_merge_equals_single_pass(self):
        from cosmos_ray.functions.sketch import _hash64, _hll_estimate, _hll_partial

        vals = pa.array([f"k{i}" for i in range(5000)])
        whole = _hll_partial(_hash64(vals), 10)
        a = _hll_partial(_hash64(vals.slice(0, 2500)), 10)
        b = _hll_partial(_hash64(vals.slice(2500)), 10)
        assert np.array_equal(np.maximum(a, b), whole)
        assert abs(_hll_estimate(whole) - 5000) / 5000 < 0.1

    def test_int_column(self):
        from cosmos_ray.functions.sketch import hll_count

        ds = rd.from_arrow(pa.table({"v": pa.array(range(1000), pa.int64())}))
        assert abs(hll_count(ds, "v", p=12) - 1000) / 1000 < 0.05


class TestKMV:
    def test_exact_below_k(self):
        from cosmos_ray.functions.sketch import kmv_distinct

        ds = rd.from_arrow(pa.table({
            "g": pa.array(["a"] * 90 + ["b"] * 30),
            "v": pa.array([i % 30 for i in range(90)] + list(range(30)),
                          pa.int64()),
        }))
        df = (kmv_distinct(ds, ["g"], "v", k=64).to_pandas()
              .set_index("g")["n_distinct_est"])
        assert df["a"] == 30.0  # < k distinct -> exact, duplicates collapse
        assert df["b"] == 30.0

    def test_estimator_error_bound(self):
        from cosmos_ray.functions.sketch import kmv_distinct

        n = 5_000
        ds = rd.from_arrow(pa.table({
            "g": pa.array(["x"] * (2 * n)),
            "v": pa.array([i % n for i in range(2 * n)], pa.int64()),
        }))
        est = kmv_distinct(ds, ["g"], "v", k=256).to_pandas()[
            "n_distinct_est"].iloc[0]
        # KMV std ~ n/sqrt(k-2); allow 4 sigma
        assert abs(est - n) < 4 * n / np.sqrt(254)

    def test_batch_split_invariant(self):
        """k-min merge over batch partials must equal the single-batch
        sketch (the mergeability the exchange relies on)."""
        from cosmos_ray.functions.sketch import kmv_distinct

        vals = [f"u{i % 700}" for i in range(4000)]
        t = pa.table({"g": pa.array(["s"] * 4000), "v": pa.array(vals)})
        one = kmv_distinct(rd.from_arrow(t), ["g"], "v", k=64).to_pandas()
        many = kmv_distinct(
            rd.from_arrow(t).repartition(13), ["g"], "v", k=64).to_pandas()
        assert one["n_distinct_est"].iloc[0] == many["n_distinct_est"].iloc[0]


class TestHoppingWindow:
    def test_hand_windows(self):
        from cosmos_ray.functions.windows import hopping_window

        base = 900_000_000 * 1_888_889  # µs, multiple of the hop
        ts = pa.array([base + 10, base + 950_000_000], pa.timestamp("us"))
        ds = rd.from_arrow(pa.table({"ts": ts, "value": pa.array([1.0, 2.0])}))
        df = (hopping_window(ds, window_s=3600, hop_s=900).to_pandas()
              .sort_values("window_start_us").reset_index(drop=True))
        # each event is in exactly window/hop = 4 windows
        assert df["n_events"].sum() == 8
        # the window starting at base covers both events
        both = df[df["window_start_us"] == base]
        assert both["n_events"].tolist() == [2]
        assert both["sum_value"].tolist() == [3.0]
        # latest window containing event 2 starts at its own hop slot
        last = df["window_start_us"].max()
        assert last == base + 900_000_000


class TestTopTerms:
    def test_counts_and_tiebreak(self):
        from cosmos_ray.functions.textops import top_terms_per_group

        ds = rd.from_arrow(pa.table({
            "lang": pa.array(["en", "en", "de"]),
            "text": pa.array(["b a b c", "a c c", "x y x"]),
        }))
        df = (top_terms_per_group(ds, k=2).to_pandas()
              .sort_values(["lang", "rank"]).reset_index(drop=True))
        en = df[df["lang"] == "en"]
        # counts: a=2 b=2 c=3 -> c(3) first, then tie a/b broken by token asc
        assert en[["token", "n", "rank"]].values.tolist() == [
            ["c", 3, 1], ["a", 2, 2]]
        de = df[df["lang"] == "de"]
        assert de[["token", "n", "rank"]].values.tolist() == [
            ["x", 2, 1], ["y", 1, 2]]


def _ent_edges(pairs):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src_entity": pa.array([a for a, _ in pairs]),
        "dst_entity": pa.array([b for _, b in pairs]),
    }))


def test_link_prediction_hand_graph():
    from cosmos_ray.functions.graph import link_prediction

    # square a-b-c-d-a: non-edge diagonals (a,c) and (b,d) each share
    # two degree-2 neighbors -> cn=2, aa=2/ln(2); edges themselves
    # (e.g. a-b, sharing no neighbor here) must not appear
    edges = pd.DataFrame({
        "src_entity": ["a", "b", "c", "d"],
        "dst_entity": ["b", "c", "d", "a"],
    })
    out = link_prediction(rd.from_pandas(edges), k=10).to_pandas()
    got = {(r.node_a, r.node_b): (r.cn, r.aa) for r in out.itertuples()}
    want_aa = round(2 / np.log(2), 6)
    assert got == {("a", "c"): (2, want_aa), ("b", "d"): (2, want_aa)}


def test_connected_components_driver_and_distributed_agree():
    from cosmos_ray.functions.graph import connected_components

    # two components: {A,B,C} (chain) and {X,Y}; D isolated via self-edge
    pairs = [("B", "A"), ("B", "C"), ("X", "Y"), ("D", "D")]
    want = {"A": "A", "B": "A", "C": "A", "X": "X", "Y": "X", "D": "D"}
    for cap in (2_000_000, 0):  # driver union-find, then distributed fixpoint
        df = connected_components(_ent_edges(pairs), cap_rows=cap).to_pandas()
        got = dict(zip(df["entity"], df["component"]))
        assert got == want, (cap, got)


def test_k_hop_neighborhood_hops_and_direction():
    from cosmos_ray.functions.graph import k_hop_neighborhood

    # path A -> B -> C -> D
    pairs = [("A", "B"), ("B", "C"), ("C", "D")]
    df = k_hop_neighborhood(_ent_edges(pairs), ["A"], k=2).to_pandas()
    got = dict(zip(df["entity"], df["hops"]))
    assert got == {"A": 0, "B": 1, "C": 2}
    # directed from C: only D reachable
    df = k_hop_neighborhood(_ent_edges(pairs), ["C"], k=2,
                            directed=True).to_pandas()
    got = dict(zip(df["entity"], df["hops"]))
    assert got == {"C": 0, "D": 1}


def test_kg_diff_statuses():
    import pyarrow as pa
    import ray.data as rd

    from cosmos_ray.pipelines.incremental import kg_diff

    def tri(rows):
        return rd.from_arrow(pa.table({
            "subj": pa.array([r[0] for r in rows]),
            "pred": pa.array([r[1] for r in rows]),
            "obj": pa.array([r[2] for r in rows]),
        }))

    old = tri([("a", "p", "x"), ("b", "p", "y"), ("b", "p", "y")])  # dup kept once
    new = tri([("a", "p", "x"), ("c", "p", "z")])
    df = kg_diff(old, new).to_pandas().sort_values(["subj"]).reset_index(drop=True)
    assert list(zip(df["subj"], df["status"])) == [("b", "removed"), ("c", "added")]


class TestHistogramQuantiles:
    def _ds(self, vals, keys=None):
        keys = keys or ["k"] * len(vals)
        return rd.from_arrow(pa.table({
            "k": pa.array(keys), "v": pa.array(vals, pa.float64())}))

    def test_within_one_bin_of_exact(self):
        from cosmos_ray.functions.sketch import histogram_quantiles

        rng = np.random.RandomState(7)
        vals = rng.uniform(0, 900, size=20_000)
        out = histogram_quantiles(self._ds(vals.tolist()), ["k"], "v",
                                  lo=0.0, hi=1024.0, nbins=256).to_pandas()
        w = 1024.0 / 256
        for _, r in out.iterrows():
            exact = np.quantile(vals, r["q"])
            assert abs(r["approx_value"] - exact) <= w + 1e-9, (r["q"], exact)

    def test_bin_edge_convention_exact_on_grid(self):
        """Values already on bin edges reproduce the exact quantile."""
        from cosmos_ray.functions.sketch import histogram_quantiles

        vals = [4.0 * i for i in range(100)]  # one value per bin
        out = (histogram_quantiles(self._ds(vals), ["k"], "v",
                                   lo=0.0, hi=1024.0, nbins=256)
               .to_pandas().set_index("q"))
        # ceil(0.5*100)=50th ordered value = 4*49
        assert out.loc[0.5, "approx_value"] == 4.0 * 49
        assert out.loc[0.99, "approx_value"] == 4.0 * 98

    def test_hot_key_and_multi_key(self):
        """A key with 100x the rows of another: both get correct rows and
        the exchange stays bounded (sketch never groups raw values)."""
        from cosmos_ray.functions.sketch import histogram_quantiles

        hot = [float(i % 800) for i in range(10_000)]
        cold = [100.0] * 100
        ds = self._ds(hot + cold, keys=["hot"] * len(hot) + ["cold"] * len(cold))
        out = histogram_quantiles(ds, ["k"], "v", lo=0.0, hi=1024.0,
                                  nbins=256).to_pandas()
        assert set(out["k"]) == {"hot", "cold"}
        cold_rows = out[out["k"] == "cold"]
        assert (cold_rows["approx_value"] == 100.0).all()


class TestCountMin:
    def test_overcount_only_and_bounded(self):
        from cosmos_ray.functions.sketch import cms_build, cms_estimate

        n = 30_000
        vals = [f"k{i % 500}" for i in range(n)]  # 500 keys x 60 each
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
        grid = cms_build(ds, "v", width=2048, depth=4)
        assert grid.sum() == n * 4
        keys = [f"k{i}" for i in range(500)]
        est = cms_estimate(grid, keys)
        assert (est >= 60).all()  # never undercounts
        # the e*n/width overcount bound holds per key with probability
        # 1 - 2^-depth = 93.75%; allow the expected tail across 500 keys
        bound = 60 + np.e * n / 2048
        assert (est > bound).mean() <= 0.0625, est[est > bound]

    def test_merge_equals_single_pass(self):
        from cosmos_ray.functions.sketch import cms_build

        vals = [f"u{i % 97}" for i in range(8000)]
        whole = cms_build(rd.from_arrow(pa.table({"v": pa.array(vals)})), "v")
        a = cms_build(rd.from_arrow(pa.table({"v": pa.array(vals[:4000])})), "v")
        b = cms_build(rd.from_arrow(pa.table({"v": pa.array(vals[4000:])})), "v")
        assert np.array_equal(a + b, whole)

    def test_int_column(self):
        from cosmos_ray.functions.sketch import cms_build, cms_estimate

        ds = rd.from_arrow(pa.table({"v": pa.array([1, 1, 1, 2, 2, 9],
                                                   pa.int64())}))
        grid = cms_build(ds, "v", width=64, depth=4)
        est = cms_estimate(grid, np.array([1, 2, 9], dtype=np.int64))
        assert (est >= np.array([3, 2, 1])).all()


class TestTriangleCount:
    @staticmethod
    def _edges(pairs):
        s, d = zip(*pairs) if pairs else ((), ())
        return rd.from_arrow(pa.table({
            "src_entity": pa.array(s, pa.int64()),
            "dst_entity": pa.array(d, pa.int64()),
        }))

    def _count(self, pairs):
        from cosmos_ray.functions.graph import triangle_count

        return triangle_count(self._edges(pairs)).take_all()[0]["triangles"]

    def test_k4_has_four_triangles(self):
        pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
        assert self._count(pairs) == 4

    def test_duplicates_reverses_selfloops_collapsed(self):
        pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
        assert self._count(pairs) == 1

    def test_square_no_triangle(self):
        assert self._count([(1, 2), (2, 3), (3, 4), (4, 1)]) == 0

    def test_string_node_ids(self):
        from cosmos_ray.functions.graph import triangle_count

        ds = rd.from_arrow(pa.table({
            "src_entity": pa.array(["x", "y", "z", "x"]),
            "dst_entity": pa.array(["y", "z", "x", "w"]),
        }))
        assert triangle_count(ds).take_all()[0]["triangles"] == 1

    def test_empty(self):
        assert self._count([]) == 0


class TestTableChecksum:
    def test_order_insensitive_and_sensitive_to_content(self):
        from cosmos_ray.functions.sketch import table_checksum

        t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["a", "b", "c"])})
        a = table_checksum(rd.from_arrow(t), ["id", "text"]).take_all()[0]
        # same rows, different block order/partitioning
        shuf = rd.from_arrow(t).repartition(3).random_shuffle(seed=5)
        b = table_checksum(shuf, ["id", "text"]).take_all()[0]
        assert a == b and a["n_rows"] == 3
        # one changed byte changes the checksum
        t2 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                       "text": pa.array(["a", "b", "C"])})
        c = table_checksum(rd.from_arrow(t2), ["id", "text"]).take_all()[0]
        assert c["checksum"] != a["checksum"]


class TestKCore:
    def test_cycle_with_tail_multi_round_peel(self):
        # 4-cycle a-b-c-d + tail d-e-f-g: k=2 core is exactly the cycle,
        # and the tail peels one node per round (3 rounds to converge)
        rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "a", 1),
                ("d", "e", 1), ("e", "f", 1), ("f", "g", 1)]
        from cosmos_ray.functions.graph import k_core

        out = k_core(_edges(rows), k=2).to_pandas()
        assert sorted(out["entity"]) == ["a", "b", "c", "d"]
        assert set(out["degree"]) == {2}

    def test_pure_path_empties(self):
        rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
        from cosmos_ray.functions.graph import k_core

        assert k_core(_edges(rows), k=2).count() == 0

    def test_k1_keeps_all_nonisolated(self):
        from cosmos_ray.functions.graph import k_core

        out = k_core(_edges(EDGE_ROWS), k=1).to_pandas()
        assert sorted(out["entity"]) == ["a", "b", "c", "d", "e"]


class TestHeavyHitters:
    def test_exact_vs_full_count(self):
        # heavy token split so NO single small batch is individually
        # dominated by it — the pigeonhole union must still catch it
        texts = (["hot cold"] * 40) + ["hot rare%d x y z" % i for i in range(20)]
        docs = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(8)
        from collections import Counter

        from cosmos_ray.functions.sketch import heavy_hitters

        exact = Counter(t for x in texts for t in x.split(" "))
        n = sum(exact.values())
        phi = 0.05
        want = {t: c for t, c in exact.items() if c >= phi * n}
        out = heavy_hitters(docs, phi=phi).to_pandas()
        got = dict(zip(out["token"], out["cnt"]))
        assert got == want
        assert np.allclose(out["frac"], [got[t] / n for t in out["token"]],
                           atol=1e-6)

    def test_empty_and_no_hitters(self):
        from cosmos_ray.functions.sketch import heavy_hitters

        docs = rd.from_arrow(pa.table({"text": pa.array(
            ["u%d" % i for i in range(100)])}))
        # every token unique -> nothing reaches phi=0.05
        assert heavy_hitters(docs, phi=0.05).count() == 0


def _numpy_hits(rows, iters):
    nodes = sorted({x for s, d, _ in rows for x in (s, d)})
    m = {e: i for i, e in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in rows:
        W[m[s], m[d]] += w

    def l2(v):
        nrm = np.sqrt((v * v).sum())
        return v / nrm if nrm > 0 else v

    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = l2(W.T @ h)
        h = l2(W @ a)
    return nodes, np.round(h, 6), np.round(a, 6)


class TestHits:
    def test_matches_numpy_alternating_power(self):
        from cosmos_ray.functions.graph import hits

        df = hits(_edges(EDGE_ROWS), iters=10).to_pandas()
        df = df.sort_values("entity").reset_index(drop=True)
        nodes, h, a = _numpy_hits(EDGE_ROWS, iters=10)
        assert df["entity"].tolist() == nodes
        assert np.allclose(df["hub"], h, atol=2e-6)
        assert np.allclose(df["authority"], a, atol=2e-6)
        # L2 norms ~1
        assert abs(np.square(df["hub"]).sum() - 1.0) < 1e-4
        assert abs(np.square(df["authority"]).sum() - 1.0) < 1e-4

    def test_joined_fallback_agrees_with_broadcast(self):
        from cosmos_ray.functions.graph import hits

        fast = hits(_edges(EDGE_ROWS), iters=5).to_pandas()
        slow = hits(_edges(EDGE_ROWS), iters=5, broadcast_cap=0).to_pandas()
        f = fast.sort_values("entity").reset_index(drop=True)
        s = slow.sort_values("entity").reset_index(drop=True)
        assert f["entity"].tolist() == s["entity"].tolist()
        assert np.allclose(f["hub"], s["hub"], atol=2e-6)
        assert np.allclose(f["authority"], s["authority"], atol=2e-6)

    def test_sink_and_source_zero_scores(self):
        from cosmos_ray.functions.graph import hits

        # 'src0' has no in-edges -> authority 0; 'sink' no out -> hub 0
        df = hits(_edges([("src0", "sink", 1)]), iters=3).to_pandas()
        d = df.set_index("entity")
        assert d.loc["src0", "authority"] == 0.0
        assert d.loc["sink", "hub"] == 0.0
        assert d.loc["src0", "hub"] == 1.0
        assert d.loc["sink", "authority"] == 1.0


class TestClusteringCoefficient:
    def test_matches_hand_computed(self):
        from cosmos_ray.functions.graph import clustering_coefficient

        # undirected simple graph: {a,b},{a,c},{b,c},{c,d},{a,d},{a,e}
        # triangles: {a,b,c}, {a,c,d}
        df = clustering_coefficient(_edges(EDGE_ROWS)).to_pandas()
        d = df.set_index("entity").sort_index()
        assert d["degree"].to_dict() == {"a": 4, "b": 2, "c": 3, "d": 2,
                                         "e": 1}
        assert d["triangles"].to_dict() == {"a": 2, "b": 1, "c": 2, "d": 1,
                                            "e": 0}
        assert d["cc"].to_dict() == {"a": 0.333333, "b": 1.0, "c": 0.666667,
                                     "d": 1.0, "e": 0.0}

    def test_triangle_free_graph_all_zero(self):
        from cosmos_ray.functions.graph import clustering_coefficient

        df = clustering_coefficient(
            _edges([("x", "y", 1), ("y", "z", 1)])).to_pandas()
        assert (df["cc"] == 0.0).all()
        assert (df["triangles"] == 0).all()


class TestBetweenness:
    def test_path_graph_exact(self):
        from cosmos_ray.functions.graph import betweenness_sampled

        edges = pa.table({"src_entity": [0, 1, 2, 3],
                          "dst_entity": [1, 2, 3, 4]})
        out = (betweenness_sampled(rd.from_arrow(edges), k_sources=5,
                                   max_depth=8, topn=5).to_pandas()
               .set_index("entity"))
        # all 5 sources sampled -> exact betweenness of the path P5
        assert out.loc[2, "betweenness"] == 4.0
        assert out.loc[1, "betweenness"] == 3.0
        assert out.loc[3, "betweenness"] == 3.0
        assert out.loc[0, "betweenness"] == 0.0

    def test_star_graph_center_dominates(self):
        from cosmos_ray.functions.graph import betweenness_sampled

        # star: center 0, leaves 1..5; center betweenness = C(5,2) = 10
        edges = pa.table({"src_entity": [0] * 5,
                          "dst_entity": [1, 2, 3, 4, 5]})
        out = (betweenness_sampled(rd.from_arrow(edges), k_sources=6,
                                   max_depth=4, topn=6).to_pandas()
               .set_index("entity"))
        assert out.loc[0, "betweenness"] == 10.0
        for leaf in range(1, 6):
            assert out.loc[leaf, "betweenness"] == 0.0

    def test_two_shortest_paths_split_credit(self):
        from cosmos_ray.functions.graph import betweenness_sampled

        # diamond 0-1-3, 0-2-3: nodes 1 and 2 each carry half of the
        # single 0<->3 dependency => betweenness 0.5 each
        edges = pa.table({"src_entity": [0, 0, 1, 2],
                          "dst_entity": [1, 2, 3, 3]})
        out = (betweenness_sampled(rd.from_arrow(edges), k_sources=4,
                                   max_depth=4, topn=4).to_pandas()
               .set_index("entity"))
        # by symmetry EVERY C4 node carries 0.5 (each opposite pair's
        # two shortest paths split through the other two nodes)
        for v in range(4):
            assert out.loc[v, "betweenness"] == 0.5

    def test_sampled_subset_matches_restricted_direct(self):
        from cosmos_ray.functions.graph import betweenness_sampled

        # cycle C6; sources restricted to {0, 1}: compute the direct
        # Brandes dependency sums for those two sources only
        n = 6
        edges = pa.table({"src_entity": list(range(n)),
                          "dst_entity": [(i + 1) % n for i in range(n)]})
        out = (betweenness_sampled(rd.from_arrow(edges), k_sources=2,
                                   max_depth=6, topn=6).to_pandas()
               .set_index("entity"))

        def brandes_from(s):
            import collections
            adj = collections.defaultdict(list)
            for i in range(n):
                adj[i].append((i + 1) % n)
                adj[(i + 1) % n].append(i)
            dist = {s: 0}
            sigma = {s: 1.0}
            order = [s]
            q = [s]
            while q:
                v = q.pop(0)
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        q.append(w)
                        order.append(w)
                        sigma[w] = 0.0
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
            delta = {v: 0.0 for v in order}
            for w in reversed(order):
                for v in adj[w]:
                    if dist.get(v, -9) == dist[w] - 1:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            return {v: d for v, d in delta.items() if v != s}

        want = {}
        for s in (0, 1):
            for v, d in brandes_from(s).items():
                want[v] = want.get(v, 0.0) + d
        for v in range(n):
            assert abs(out.loc[v, "betweenness"]
                       - round(want.get(v, 0.0) / 2.0, 6)) < 2e-6


class TestCloseness:
    def test_path_graph_exact(self):
        from cosmos_ray.functions.graph import closeness_sampled

        # path 0-1-2-3-4: from node 0, d = 1,2,3,4 -> C = 1 + 1/2 + 1/3 + 1/4
        edges = pa.table({"src_entity": pa.array([0, 1, 2, 3], pa.int64()),
                          "dst_entity": pa.array([1, 2, 3, 4], pa.int64()),
                          "weight": pa.array([1, 1, 1, 1], pa.int64())})
        out = (closeness_sampled(rd.from_arrow(edges), k_sources=5,
                                 max_depth=4)
               .to_pandas().set_index("entity"))
        assert len(out) == 5
        assert out.loc[0, "n_reached"] == 4
        # lcm-scaled integer sum divided once: (12 + 6 + 4 + 3) / 12
        assert out.loc[0, "closeness"] == 25 / 12
        # middle node reaches everything within 2 hops
        assert out.loc[2, "closeness"] == 1 + 1 + 1 / 2 + 1 / 2
        assert out.loc[2, "n_reached"] == 4

    def test_hop_bound_truncates(self):
        from cosmos_ray.functions.graph import closeness_sampled

        # path 0-1-2-3: depth 1 sees only direct neighbours
        edges = pa.table({"src_entity": pa.array([0, 1, 2], pa.int64()),
                          "dst_entity": pa.array([1, 2, 3], pa.int64()),
                          "weight": pa.array([1, 1, 1], pa.int64())})
        out = (closeness_sampled(rd.from_arrow(edges), k_sources=4,
                                 max_depth=1)
               .to_pandas().set_index("entity"))
        assert out["n_reached"].tolist() == [1, 2, 2, 1]
        assert out["closeness"].tolist() == [1.0, 2.0, 2.0, 1.0]

    def test_disconnected_and_duplicate_edges(self):
        from cosmos_ray.functions.graph import closeness_sampled

        # two components {a,b}, {c,d,e}; duplicate + reversed + self edges
        # must collapse to the simple graph
        edges = pa.table({
            "src_entity": pa.array(["a", "b", "a", "c", "d", "e", "c"]),
            "dst_entity": pa.array(["b", "a", "a", "d", "e", "c", "c"]),
            "weight": pa.array([1, 5, 2, 1, 1, 1, 9], pa.int64())})
        out = (closeness_sampled(rd.from_arrow(edges), k_sources=3,
                                 max_depth=4)
               .to_pandas().set_index("entity"))
        assert sorted(out.index) == ["a", "b", "c"]
        assert out.loc["a", "n_reached"] == 1 and out.loc["a", "closeness"] == 1.0
        # c-d-e is a triangle: both d and e at distance 1
        assert out.loc["c", "n_reached"] == 2 and out.loc["c", "closeness"] == 2.0


class TestLabelPropagation:
    """`graph.label_propagation` — deterministic synchronous LPA vs a
    direct sequential replay of the same rule."""

    @staticmethod
    def _replay(pairs, rounds):
        # inclusive neighbor sets of the distinct simple graph
        und = {}
        for a, b in pairs:
            if a == b:
                continue
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
        lbl = {v: v for v in und}
        for _ in range(rounds):
            new = {}
            for v, nbrs in und.items():
                counts = {}
                for u in nbrs:
                    counts[lbl[u]] = counts.get(lbl[u], 0) + 1
                best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
                new[v] = best[0][0]
            lbl = new
        return lbl

    def _check(self, pairs, rounds=4):
        from cosmos_ray.functions.graph import label_propagation

        rows = [(a, b, 1) for a, b in pairs]
        got = label_propagation(_edges(rows), rounds=rounds).to_pandas()
        want = self._replay(pairs, rounds)
        assert dict(zip(got["entity"], got["community"])) == want

    def test_two_triangles_with_bridge_split(self, ray_session):
        pairs = [("a", "b"), ("b", "c"), ("c", "a"),
                 ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")]
        self._check(pairs)
        # and the labels actually separate the two triangles
        from cosmos_ray.functions.graph import label_propagation

        got = label_propagation(
            _edges([(a, b, 1) for a, b in pairs]), rounds=4).to_pandas()
        lbl = dict(zip(got["entity"], got["community"]))
        assert lbl["a"] == lbl["b"]
        assert lbl["x"] == lbl["y"] == lbl["z"]

    def test_clique_converges_to_min_label(self, ray_session):
        nodes = ["p", "q", "r", "s"]
        pairs = [(a, b) for i, a in enumerate(nodes)
                 for b in nodes[i + 1:]]
        self._check(pairs)
        from cosmos_ray.functions.graph import label_propagation

        got = label_propagation(
            _edges([(a, b, 1) for a, b in pairs]), rounds=4).to_pandas()
        assert set(got["community"]) == {"p"}

    def test_duplicate_and_reverse_edges_collapse(self, ray_session):
        pairs = [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")]
        self._check(pairs)

    def test_disconnected_components_stay_separate(self, ray_session):
        pairs = [("a", "b"), ("c", "d")]
        self._check(pairs, rounds=3)


class TestModularity:
    """`graph.modularity` — Newman Q decomposition vs hand-computed
    values, with duplicate/reverse/self edges collapsing first."""

    def test_two_triangles_bridge_hand_values(self, ray_session):
        from cosmos_ray.functions.graph import (label_propagation,
                                                modularity)

        pairs = [("a", "b"), ("b", "c"), ("c", "a"),
                 ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")]
        edges = _edges([(a, b, 1) for a, b in pairs])
        out = (modularity(edges, label_propagation(edges, rounds=4))
               .to_pandas().set_index("community"))
        # m=7; two communities, each 3 intra edges, degree sum 7
        assert len(out) == 2
        assert out["intra_edges"].tolist() == [3, 3]
        assert out["degree_sum"].tolist() == [7, 7]
        q = 3 / 7 - (7 / 14.0) ** 2
        assert out["modularity"].tolist() == [q, q]
        assert abs(out["modularity"].sum() - 5 / 14) < 1e-12

    def test_single_community_q_zero(self, ray_session):
        # whole graph in one community: Q = m/m - (2m/2m)^2 = 0
        from cosmos_ray.functions.graph import (label_propagation,
                                                modularity)

        pairs = [("p", "q"), ("q", "r"), ("r", "p"), ("p", "q"),
                 ("q", "p"), ("p", "p")]
        edges = _edges([(a, b, 1) for a, b in pairs])
        out = (modularity(edges, label_propagation(edges, rounds=4))
               .to_pandas())
        assert len(out) == 1
        assert out.loc[0, "intra_edges"] == 3  # simple graph collapses
        assert out.loc[0, "degree_sum"] == 6
        assert out.loc[0, "modularity"] == 0.0

    def test_inter_community_only_negative_q(self, ray_session):
        # force a partition by hand: star center vs leaves has no
        # intra edges anywhere -> every Q_c < 0, sum < 0
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.functions.graph import modularity

        edges = _edges([("c", "l1", 1), ("c", "l2", 1), ("c", "l3", 1)])
        labels = rd.from_arrow(pa.table({
            "entity": pa.array(["c", "l1", "l2", "l3"]),
            "community": pa.array(["hub", "leaf", "leaf", "leaf"])}))
        out = modularity(edges, labels).to_pandas().set_index("community")
        assert out.loc["hub", "intra_edges"] == 0
        assert out.loc["hub", "degree_sum"] == 3
        assert out.loc["leaf", "degree_sum"] == 3
        assert (out["modularity"] < 0).all()


def test_kmv_rollup_equals_direct_coarse_sketch(ray_session):
    """Merging fine-grain KMV sketches must reproduce the direct
    coarse-grain sketch bit-for-bit (min-k of union == head-k of the
    union of per-part min-k sets)."""
    import pyarrow as pa

    import ray.data as rd

    from cosmos_ray.functions.sketch import (kmv_distinct, kmv_rollup,
                                             kmv_sketch_table)

    n = 3000
    coarse = [i % 3 for i in range(n)]
    fine = [i % 12 for i in range(n)]
    vals = [i % 700 for i in range(n)]  # >k distinct per coarse group
    ds = rd.from_arrow(pa.table({
        "coarse": pa.array(coarse, pa.int64()),
        "fine": pa.array(fine, pa.int64()),
        "v": pa.array(vals, pa.int64())}))
    rolled = (kmv_rollup(kmv_sketch_table(ds, ["coarse", "fine"], "v", k=64),
                         ["coarse"], k=64)
              .to_pandas().sort_values("coarse").reset_index(drop=True))
    direct = (kmv_distinct(ds, ["coarse"], "v", k=64)
              .to_pandas().sort_values("coarse").reset_index(drop=True))
    assert rolled["coarse"].tolist() == direct["coarse"].tolist()
    assert rolled["n_distinct_est"].tolist() == direct["n_distinct_est"].tolist()
