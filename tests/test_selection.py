"""DSIR importance weights, URL canonicalization, and keep-best
near-dup representative selection vs pure-python references."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from cosmos_ray.functions.selection import dsir_weights
from cosmos_ray.functions.urlops import canonicalize_url_column


def _bucket(s: str, B: int = 1024) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") % B


def _dsir_reference(rows, B=1024, target="en"):
    """Naive per-doc replay of the DSIR weight definition."""
    raw = np.zeros(B)
    tgt = np.zeros(B)
    per_doc = {}
    for r in rows:
        toks = r["text"].split(" ")
        buckets = [_bucket(f"{a} {b}", B) for a, b in zip(toks, toks[1:])]
        per_doc[r["doc_id"]] = buckets
        for b in buckets:
            raw[b] += 1
            if r["lang"] == target:
                tgt[b] += 1
    lw = (np.log(tgt + 1) - np.log(tgt.sum() + B)) - (
        np.log(raw + 1) - np.log(raw.sum() + B)
    )
    return {d: float(sum(lw[b] for b in bs)) for d, bs in per_doc.items()}


def test_dsir_weights_match_reference():
    rows = [
        {"doc_id": 0, "text": "the cat sat on the mat", "lang": "en"},
        {"doc_id": 1, "text": "the cat sat on the hat", "lang": "en"},
        {"doc_id": 2, "text": "le chat est sur le tapis", "lang": "fr"},
        {"doc_id": 3, "text": "der hund ist im haus heute", "lang": "de"},
        {"doc_id": 4, "text": "the dog sat on the mat", "lang": "en"},
        {"doc_id": 5, "text": "one", "lang": "en"},  # < 2 tokens -> 0
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = {r["doc_id"]: r["dsir_weight"] for r in dsir_weights(ds).take_all()}
    want = _dsir_reference(rows)
    assert got[5] == 0.0
    for d, w in want.items():
        assert math.isclose(got[d], round(w, 6), abs_tol=2e-6), (d, got[d], w)
    # directionally: english docs should score above the non-target docs
    assert min(got[0], got[1], got[4]) > max(got[2], got[3])


def test_canonicalize_url_cases():
    cases = {
        # fragment + tracking params + default port + mixed case + slash
        "HTTPS://Web3.Example.ORG:443/P/5/?utm_source=f&utm_campaign=c&id=5#s":
            "https://web3.example.org/P/5?id=5",
        # kept param order preserved; gclid dropped mid-string
        "https://a.com/x?id=1&gclid=g&z=2": "https://a.com/x?id=1&z=2",
        # all params tracking -> no '?'
        "http://A.com:80/x?utm_medium=m&ref=r": "http://a.com/x",
        # path case preserved; non-default port preserved
        "https://A.com:8443/Mixed/Case": "https://a.com:8443/Mixed/Case",
        # root trailing slash stripped
        "https://a.com/": "https://a.com",
        # 'ref' only matches as a whole param name
        "https://a.com/x?refresh=1": "https://a.com/x?refresh=1",
        # unparseable passes through
        "not a url": "not a url",
    }
    got = canonicalize_url_column(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_dedup_keep_best_picks_longest():
    from cosmos_ray.functions.dedup import dedup_keep_best

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
    rows = [
        # near-dup cluster {0, 1, 2}: 1 is the longest -> the keeper
        {"doc_id": 0, "text": base, "n_chars": len(base)},
        {"doc_id": 1, "text": base + " phi chi", "n_chars": len(base) + 8},
        {"doc_id": 2, "text": base, "n_chars": len(base)},
        # singleton: always kept
        {"doc_id": 3, "text": "completely different words entirely "
                              "unrelated content here today", "n_chars": 64},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = {r["doc_id"]: r["keep"] for r in dedup_keep_best(ds).take_all()}
    assert got == {0: False, 1: True, 2: False, 3: True}


def test_dedup_keep_best_tie_breaks_to_lowest_id():
    from cosmos_ray.functions.dedup import dedup_keep_best

    base = ("one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen") * 3
    rows = [
        {"doc_id": 10, "text": base, "n_chars": len(base)},
        {"doc_id": 11, "text": base, "n_chars": len(base)},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = {r["doc_id"]: r["keep"] for r in dedup_keep_best(ds).take_all()}
    assert got == {10: True, 11: False}


class TestSkyline:
    def _py_skyline(self, pts):
        out = []
        for p in pts:
            dominated = any(
                q[0] >= p[0] and q[1] <= p[1] and (q[0] > p[0] or q[1] < p[1])
                for q in pts)
            if not dominated:
                out.append(p)
        return sorted(out)

    def test_matches_quadratic_reference_across_batches(self):
        from cosmos_ray.queries.relational import skyline

        rng = np.random.RandomState(7)
        size = rng.randint(1, 50, 500).astype(np.int64)
        price = np.round(rng.uniform(900, 2000, 500), 2)
        ds = rd.from_arrow(pa.table({
            "id": pa.array(range(500)), "size": pa.array(size),
            "price": pa.array(price)}))
        # batch_size 32 forces many local passes before the converge pass
        got = skyline(ds, max_cols=["size"], min_cols=["price"],
                      batch_size=32).to_pandas()
        want = self._py_skyline(list(zip(size.tolist(), price.tolist())))
        assert sorted(zip(got["size"], got["price"])) == want

    def test_duplicate_frontier_points_all_survive(self):
        from cosmos_ray.queries.relational import skyline

        ds = rd.from_arrow(pa.table({
            "id": pa.array([1, 2, 3]),
            "size": pa.array([10, 10, 5]),
            "price": pa.array([1.0, 1.0, 2.0])}))
        got = skyline(ds, max_cols=["size"], min_cols=["price"]).to_pandas()
        assert sorted(got["id"].tolist()) == [1, 2]
