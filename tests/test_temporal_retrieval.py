"""Unit gates for the temporal join operators (as-of, range-count),
BM25 retrieval and the stratified sampler — synthetic fixtures exercise
the edge cases the sf parity gate can't reach (ties, no-match rows,
empty sides, degenerate windows)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _events(rows):
    """rows: list of (event_id, user_id, ts_us)."""
    eid, uid, ts = zip(*rows) if rows else ((), (), ())
    return rd.from_arrow(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
    }))


def _sorted_df(ds, cols):
    df = ds.to_pandas()
    return df.sort_values(cols, kind="stable").reset_index(drop=True)


class TestAsofJoin:
    def test_backward_match_and_ties(self):
        from cosmos_ray.functions.temporal import asof_join

        left = _events([(10, 1, 1000), (11, 1, 2000), (12, 2, 500)])
        # user 1: two signups at the SAME ts 1000 (ids 3,4 -> max id 4
        # wins), one later at 1500; user 2: nothing before 500
        right = _events([(3, 1, 1000), (4, 1, 1000), (5, 1, 1500)])
        df = _sorted_df(asof_join(left, right, key="user_id"), ["event_id"])
        assert df["event_id"].tolist() == [10, 11, 12]
        # exact-match allowed, tie -> larger right id
        assert df["matched_event_id"].tolist()[:2] == [4, 5]
        assert pd.isna(df["matched_event_id"].iloc[2])
        assert df["lag_us"].tolist()[:2] == [0, 500]

    def test_empty_right_side(self):
        from cosmos_ray.functions.temporal import asof_join

        left = _events([(1, 7, 100)])
        right = _events([])
        df = asof_join(left, right, key="user_id").to_pandas()
        assert len(df) == 1 and pd.isna(df["matched_event_id"].iloc[0])

    def test_key_isolation(self):
        from cosmos_ray.functions.temporal import asof_join

        # user 2's earlier event must NEVER match user 1's row
        left = _events([(1, 1, 5000)])
        right = _events([(2, 2, 1000)])
        df = asof_join(left, right, key="user_id").to_pandas()
        assert pd.isna(df["matched_event_id"].iloc[0])


class TestRangeCountJoin:
    def test_window_boundaries(self):
        from cosmos_ray.functions.temporal import range_count_join

        left = _events([(1, 1, 1000)])
        # window (1000, 1000+hi]: anchor itself excluded, horizon included
        right = _events([(2, 1, 1000), (3, 1, 1001), (4, 1, 1000 + 50),
                         (5, 1, 1000 + 51), (6, 2, 1010)])
        df = range_count_join(left, right, key="user_id", lo_us=0, hi_us=50,
                              count_col="n").to_pandas()
        assert df["n"].tolist() == [2]  # ids 3 and 4 only

    def test_inclusive_lo(self):
        from cosmos_ray.functions.temporal import range_count_join

        left = _events([(1, 1, 1000)])
        right = _events([(2, 1, 1000)])
        df = range_count_join(left, right, key="user_id", lo_us=0, hi_us=50,
                              exclusive_lo=False, count_col="n").to_pandas()
        assert df["n"].tolist() == [1]

    def test_left_only_keys_kept_with_zero(self):
        from cosmos_ray.functions.temporal import range_count_join

        left = _events([(1, 9, 100)])
        right = _events([(2, 8, 120)])
        df = range_count_join(left, right, key="user_id",
                              count_col="n").to_pandas()
        assert df["n"].tolist() == [0]


class TestBM25:
    @staticmethod
    def _docs(texts):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }))

    def test_ranking_matches_hand_bm25(self):
        from cosmos_ray.functions.retrieval import bm25_topk

        texts = ["data data data pad", "data pad pad pad", "pad pad pad pad",
                 "spark data pad pad"]
        df = bm25_topk(self._docs(texts), "spark data", k=4).to_pandas()

        # hand replay (Lucene idf, k1=1.2, b=0.75)
        toks = [t.split() for t in texts]
        n, avgdl = len(texts), sum(len(t) for t in toks) / len(texts)
        want = []
        for i, tk in enumerate(toks):
            s = 0.0
            for term in sorted({"spark", "data"}):
                dfreq = sum(term in t for t in toks)
                tf = tk.count(term)
                idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
                s += idf * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * len(tk) / avgdl)))
            want.append((round(s, 6), i))
        order = [i for _, i in sorted(want, key=lambda p: (-p[0], p[1]))]
        assert df["doc_id"].tolist() == order
        for got, (w, i) in zip(df.sort_values("doc_id")["bm25"], sorted(want, key=lambda p: p[1])):
            assert got == pytest.approx(w, abs=1e-9)

    def test_absent_term_scores_zero_contribution(self):
        from cosmos_ray.functions.retrieval import bm25_topk

        df = bm25_topk(self._docs(["alpha beta", "beta gamma"]),
                       "zzz_not_there", k=2).to_pandas()
        assert df["bm25"].tolist() == [0.0, 0.0]

    def test_index_at_rest_matches_from_scratch(self, tmp_path):
        """The at-rest inverted index must reproduce bm25_topk
        BIT-identically (fixed-order float sums on both paths), while
        reading only the query terms' tbucket partitions."""
        import glob

        from cosmos_ray.functions.retrieval import (
            _term_buckets,
            bm25_query_index,
            bm25_topk,
            build_text_index,
        )

        texts = ["data data data pad", "data pad pad pad", "pad pad pad pad",
                 "spark data pad pad", "spark spark engine", "engine pad data"]
        idx = str(tmp_path / "txtidx")
        meta = build_text_index(self._docs(texts), idx, num_buckets=8)
        assert meta["n_docs"] == 6 and meta["sum_dl"] == sum(
            len(t.split()) for t in texts)
        # hive layout exists and query terms map to a strict subset
        assert glob.glob(f"{idx}/tbucket=*/*.parquet")
        terms = np.array(sorted({"spark", "data"}))
        hit_buckets = set(_term_buckets(terms, 8).tolist())
        all_buckets = {int(p.split("tbucket=")[1].split("/")[0])
                       for p in glob.glob(f"{idx}/tbucket=*/*.parquet")}
        assert hit_buckets <= all_buckets

        got = (bm25_query_index(idx, "spark data", k=4).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = (bm25_topk(self._docs(texts), "spark data", k=4).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["bm25"].tolist() == want["bm25"].tolist()  # bitwise

    def test_index_query_missing_terms(self, tmp_path):
        from cosmos_ray.functions.retrieval import (
            bm25_query_index,
            build_text_index,
        )

        idx = str(tmp_path / "txtidx2")
        build_text_index(self._docs(["alpha beta", "beta gamma"]), idx,
                         num_buckets=4)
        got = bm25_query_index(idx, "alpha zzz_not_there", k=2).to_pandas()
        # only the doc containing 'alpha' is retrievable from postings
        assert got["doc_id"].tolist() == [0]
        assert got["bm25"].iloc[0] > 0


class TestStratifiedSample:
    def test_exact_membership_and_determinism(self):
        from cosmos_ray.queries.relational import stratified_sample

        ids = np.arange(100)
        langs = np.where(ids % 3 == 0, "en", np.where(ids % 3 == 1, "de", "fr"))
        ds = lambda: rd.from_arrow(pa.table({  # noqa: E731
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs.tolist()),
        }))
        out1 = _sorted_df(stratified_sample(ds(), "lang", 4, "doc_id"),
                          ["lang", "doc_id"])
        out2 = _sorted_df(stratified_sample(ds(), "lang", 4, "doc_id"),
                          ["lang", "doc_id"])
        assert out1.equals(out2)
        assert out1.groupby("lang").size().tolist() == [4, 4, 4]
        # membership = first n under md5 order, replayed by hand
        for lang in ("en", "de", "fr"):
            members = sorted(
                (i for i in ids.tolist() if langs[i] == lang),
                key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
            )[:4]
            assert sorted(out1[out1["lang"] == lang]["doc_id"]) == sorted(members)

    def test_small_group_returned_whole(self):
        from cosmos_ray.queries.relational import stratified_sample

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "lang": pa.array(["xx", "xx"]),
        }))
        df = stratified_sample(ds, "lang", 5, "doc_id").to_pandas()
        assert sorted(df["doc_id"]) == [1, 2]


class TestCohortRetention:
    def test_hand_cohorts(self):
        """Two users, hand-computed cohorts and offsets; duplicate events
        within a day count once."""
        import pandas as pd

        from cosmos_ray.functions.windows import cohort_retention

        D = 86_400_000_000  # one epoch-day in microseconds
        rows = [
            # user 1: first day 10, active 10, 11, 13 (day 10 twice)
            {"user_id": 1, "ts": 10 * D + 5},
            {"user_id": 1, "ts": 10 * D + 999},
            {"user_id": 1, "ts": 11 * D + 1},
            {"user_id": 1, "ts": 13 * D + 1},
            # user 2: first day 11, active 11, 13
            {"user_id": 2, "ts": 11 * D + 7},
            {"user_id": 2, "ts": 13 * D + 2},
        ]
        t = pa.table({
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows],
                           pa.timestamp("us")),
        })
        out = (cohort_retention(rd.from_arrow(t)).to_pandas()
               .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True))
        exp = pd.DataFrame({
            "cohort_day": [10, 10, 10, 11, 11],
            "day_offset": [0, 1, 3, 0, 2],
            "n_users": [1, 1, 1, 1, 1],
        })
        assert out.astype("int64").values.tolist() == exp.values.tolist()


class TestRrfFuse:
    def test_hand_fusion(self):
        """Two 3-item lists with one shared doc: shared doc's fused score
        is the sum of both reciprocal ranks and wins."""
        from cosmos_ray.functions.retrieval import rrf_fuse

        a = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                                    "s": pa.array([9.0, 8.0, 7.0])}))
        b = rd.from_arrow(pa.table({"doc_id": pa.array([3, 4, 5], pa.int64()),
                                    "s": pa.array([9.0, 8.0, 7.0])}))
        out = rrf_fuse([(a, "s"), (b, "s")], n=5).to_pandas()
        top = out.iloc[0]
        # doc 3: rank 3 in a, rank 1 in b -> 1/63 + 1/61
        assert top["doc_id"] == 3
        assert abs(top["rrf"] - round(1 / 63 + 1 / 61, 6)) < 1e-9
        # singles: 1/(60+rank)
        d1 = out.set_index("doc_id").loc[1, "rrf"]
        assert abs(d1 - round(1 / 61, 6)) < 1e-9

    def test_score_tie_rank_by_id(self):
        from cosmos_ray.functions.retrieval import rrf_fuse

        a = rd.from_arrow(pa.table({"doc_id": pa.array([7, 2], pa.int64()),
                                    "s": pa.array([5.0, 5.0])}))
        out = rrf_fuse([(a, "s")], n=2).to_pandas().set_index("doc_id")
        assert out.loc[2, "rrf"] > out.loc[7, "rrf"]  # id asc gets rank 1


def _typed_events(rows):
    """rows: list of (user_id, ts_us, event_type)."""
    uid, ts, et = zip(*rows) if rows else ((), (), ())
    return rd.from_arrow(pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
        "event_type": pa.array(et),
    }))


class TestFunnel:
    STEPS = ["view", "click", "purchase"]

    def _run(self, rows, window_s=100):
        from cosmos_ray.functions.windows import funnel

        df = funnel(_typed_events(rows), self.STEPS, window_s=window_s)
        return {int(r["step"]): int(r["users"])
                for r in df.to_pandas().to_dict("records")}

    def test_full_and_partial_depths(self):
        rows = [
            # user 1 completes all three steps in order
            (1, 1_000_000, "view"), (1, 2_000_000, "click"),
            (1, 3_000_000, "purchase"),
            # user 2 stops after click
            (2, 1_000_000, "view"), (2, 2_000_000, "click"),
            # user 3 has purchase BEFORE click -> depth 2 only
            (3, 1_000_000, "view"), (3, 1_500_000, "purchase"),
            (3, 2_000_000, "click"),
            # user 4 never views (click+purchase don't count)
            (4, 1_000_000, "click"), (4, 2_000_000, "purchase"),
        ]
        assert self._run(rows) == {1: 3, 2: 3, 3: 1}

    def test_window_anchored_at_first_view(self):
        rows = [
            # first view at t=0; purchase lands at exactly t=window (in),
            # click strictly inside
            (1, 0, "view"), (1, 50_000_000, "click"),
            (1, 100_000_000, "purchase"),
            # user 2: purchase one microsecond past the window -> out
            (2, 0, "view"), (2, 50_000_000, "click"),
            (2, 100_000_001, "purchase"),
            # user 3: a LATER view would allow the purchase, but the
            # anchor is the FIRST view (greedy semantics)
            (3, 0, "view"), (3, 90_000_000, "view"),
            (3, 95_000_000, "click"), (3, 150_000_000, "purchase"),
        ]
        assert self._run(rows) == {1: 3, 2: 3, 3: 1}

    def test_strictly_increasing_ts(self):
        # click at the SAME microsecond as the view does not advance
        rows = [(1, 1_000_000, "view"), (1, 1_000_000, "click"),
                (2, 1_000_000, "view"), (2, 1_000_001, "click")]
        assert self._run(rows) == {1: 2, 2: 1}

    def test_empty_and_no_step0(self):
        assert self._run([]) == {}
        assert self._run([(1, 0, "click"), (1, 1, "purchase")]) == {}


class TestDailyAnomalies:
    def test_spike_flagged_zero_variance_not(self):
        from cosmos_ray.functions.windows import daily_anomalies

        day = 86_400_000_000
        rows = []
        # 'click': 9 quiet days of 1 event + one day with 11 -> big z
        for d in range(9):
            rows.append((1, d * day + 1, "click"))
        rows += [(1, 9 * day + i, "click") for i in range(11)]
        # 'view': constant volume -> zero variance, never flagged
        for d in range(10):
            rows.append((2, d * day + 5, "view"))
        df = daily_anomalies(_typed_events(rows), z_thresh=2.0).to_pandas()
        assert set(df["event_type"]) == {"click"}
        assert df["day"].tolist() == [9] and df["n"].tolist() == [11]
        n = np.array([1.0] * 9 + [11.0])
        mu = n.sum() / 10
        sd = np.sqrt((n * n).sum() / 10 - mu * mu)
        want = np.floor(abs((11 - mu) / sd) * 1e6 + 0.5) / 1e6
        assert df["z"].iloc[0] == want

    def test_negative_dip_flagged(self):
        from cosmos_ray.functions.windows import daily_anomalies

        day = 86_400_000_000
        rows = []
        for d in range(9):
            rows += [(1, d * day + i, "view") for i in range(10)]
        rows.append((1, 9 * day + 1, "view"))  # dip day: 1 event
        df = daily_anomalies(_typed_events(rows), z_thresh=2.0).to_pandas()
        assert df["day"].tolist() == [9]
        assert df["z"].iloc[0] < 0


class TestMmrRerank:
    def test_hand_replay(self):
        from cosmos_ray.functions.retrieval import mmr_rerank

        rng = np.random.RandomState(3)
        V = rng.randn(12, 6)
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array(V.tolist()),
        }))
        q = rng.randn(6)
        lam = 0.7
        got = mmr_rerank(ds, q, k=5, lam=lam).to_pandas()

        # hand greedy replay
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        rel = Vn @ qn
        order = np.lexsort((np.arange(12), -rel))
        idx, Vs, rs = np.arange(12)[order], Vn[order], rel[order]
        sel, scores = [], []
        max_sim = np.zeros(12)
        picked = np.zeros(12, bool)
        for step in range(5):
            m = lam * rs - ((1 - lam) * max_sim if step else 0.0)
            m[picked] = -np.inf
            i = int(np.argmax(m))
            picked[i] = True
            sel.append(int(idx[i]))
            scores.append(m[i])
            max_sim = np.maximum(max_sim, Vs @ Vs[i])
        assert got["doc_id"].tolist() == sel
        want = [float(np.sign(s) * np.floor(abs(s) * 1e6 + 0.5) / 1e6)
                for s in scores]
        assert got["mmr"].tolist() == want
        assert got["rank"].tolist() == [1, 2, 3, 4, 5]

    def test_duplicates_pushed_down(self):
        """Two identical top-relevance vectors: MMR must NOT pick both
        first — the duplicate's diversity penalty demotes it."""
        from cosmos_ray.functions.retrieval import mmr_rerank

        q = np.array([1.0, 0.0])
        V = [[1.0, 0.0], [1.0, 0.0], [0.8, 0.6]]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(V),
        }))
        got = mmr_rerank(ds, q, k=3, lam=0.3).to_pandas()
        # doc1 duplicates doc0: mmr1 = .3*1 - .7*1 = -0.4; doc2 = .3*.8
        # - .7*.8 = -0.32 > -0.4 -> diversity wins
        assert got["doc_id"].tolist() == [0, 2, 1]

    def test_k_exceeds_candidates(self):
        from cosmos_ray.functions.retrieval import mmr_rerank

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "embedding": pa.array([[1.0, 0.0]]),
        }))
        got = mmr_rerank(ds, np.array([1.0, 0.0]), k=5).to_pandas()
        assert got["doc_id"].tolist() == [7] and got["rank"].tolist() == [1]


class TestSnippets:
    def _run(self, texts, query, window=2):
        from cosmos_ray.functions.retrieval import snippet_extract

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }))
        df = snippet_extract(ds, query, window=window).to_pandas()
        return dict(zip(df["doc_id"], df["snippet"]))

    def test_window_and_clamping(self):
        got = self._run([
            "a b c TARGET d e f",   # interior: full window
            "TARGET x y",            # match at doc start: clamp left
            "x y z TARGET",          # match at doc end: clamp right
            "no match here",         # dropped
        ], "target")
        assert got == {0: "b c target d e",
                       1: "target x y",
                       2: "y z target"}

    def test_earliest_across_terms_wins(self):
        got = self._run(["p q BETA r s ALPHA t"], "alpha beta", window=1)
        assert got == {0: "q beta r"}

    def test_first_occurrence_only(self):
        got = self._run(["z hit a b c hit d"], "hit", window=1)
        assert got == {0: "z hit a"}

    def test_all_dropped(self):
        from cosmos_ray.functions.retrieval import snippet_extract

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aa bb", "cc dd"]),
        }))
        assert snippet_extract(ds, "zz").count() == 0


class TestAppendTextIndex:
    def test_append_equals_fresh_union(self, tmp_path):
        from cosmos_ray.functions.retrieval import (
            append_text_index,
            bm25_query_index,
            build_text_index,
        )

        texts = ["data data data pad", "data pad pad pad", "pad pad pad pad",
                 "spark data pad pad", "spark spark engine", "engine pad data"]

        def docs(lo, hi):
            return rd.from_arrow(pa.table({
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pa.array(texts[lo:hi]),
            }))

        inc = str(tmp_path / "inc")
        build_text_index(docs(0, 4), inc, num_buckets=8)
        merged = append_text_index(docs(4, 6), inc)
        assert merged["n_docs"] == 6

        fresh = str(tmp_path / "fresh")
        build_text_index(docs(0, 6), fresh, num_buckets=8)

        a = (bm25_query_index(inc, "spark data", k=6).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (bm25_query_index(fresh, "spark data", k=6).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["bm25"].tolist() == b["bm25"].tolist()  # bitwise


class TestBooleanQuery:
    """Boolean query_string composition (ES analog): AND/OR/NOT trees,
    quoted phrases, BM25 ranking over positive terms."""

    def _ds(self):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "spark hash join fast",        # match
                "flink hash join slow",        # excluded by NOT slow
                "spark data hash joins",       # phrase boundary: no
                "flink sort merge hash join",  # match via OR flink
                "rehash join spark hash join", # leading boundary ok
                "spark hash",                  # no phrase
            ],
        }))

    def test_boolean_semantics_and_ranking(self):
        from cosmos_ray.functions.retrieval import boolean_query_topk

        got = boolean_query_topk(
            self._ds(), '(spark OR flink) AND "hash join" AND NOT slow', k=10
        ).take_all()
        ids = [r["doc_id"] for r in got]
        assert set(ids) == {1, 4, 5}
        # scores descending, ties by doc_id
        scores = [r["bm25"] for r in got]
        assert scores == sorted(scores, reverse=True)

    def test_parser_rejects_malformed(self):
        import pytest

        from cosmos_ray.functions.retrieval import parse_boolean_query

        for bad in ["(a OR b", "AND a", "a OR", 'a ""']:
            with pytest.raises(ValueError):
                parse_boolean_query(bad)

    def test_default_operator_is_and(self):
        from cosmos_ray.functions.retrieval import boolean_query_topk

        got = boolean_query_topk(self._ds(), "spark fast", k=10).take_all()
        assert [r["doc_id"] for r in got] == [1]

    def test_fuzzy_leaf_and_standalone(self):
        import pyarrow as pa
        import ray.data as rd

        from cosmos_ray.functions.retrieval import (
            boolean_query_topk,
            fuzzy_search,
        )

        ds = rd.from_arrow(pa.table({
            "doc_id": [1, 2, 3],
            "text": ["spark hash join", "spak hash join", "scan hash join"],
        }))
        # spak~1 matches spark (1 sub? no — spak->spark is 1 insert) and
        # spak itself; scan is 2 edits away
        got = boolean_query_topk(ds, 'spak~1 AND "hash join"', k=10).take_all()
        assert {r["doc_id"] for r in got} == {1, 2}
        hits = fuzzy_search(ds, "spak", max_dist=1, k=10).take_all()
        assert [r["doc_id"] for r in hits] == [1, 2]
        assert all(r["tf"] == 1 for r in hits)
