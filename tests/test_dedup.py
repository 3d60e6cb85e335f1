"""Dedup family: exact, MinHash+LSH, SimHash, embedding-cosine — with
planted duplicates whose expected clusters are known."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cosmos_ray.functions import dedup


@pytest.fixture(scope="module")
def planted_corpus(documents_small):
    """First 80 docs + near-dup copies (one token changed) at id+10000
    + exact copies at id+20000."""
    rows = documents_small.to_pylist()[:80]
    out = [{"doc_id": r["doc_id"], "text": r["text"]} for r in rows]
    for r in rows[:20]:
        toks = r["text"].split()
        toks[len(toks) // 2] = "mutatedtoken"
        out.append({"doc_id": r["doc_id"] + 10000, "text": " ".join(toks)})
    for r in rows[20:30]:
        out.append({"doc_id": r["doc_id"] + 20000, "text": r["text"]})
    return pa.Table.from_pylist(out)


def test_exact_dedup(planted_corpus):
    res = dedup.exact_dedup(rd.from_arrow(planted_corpus)).take_all()
    kept = {r["doc_id"] for r in res}
    # exact copies (id+20000) must collapse onto the original id
    for base in range(20, 30):
        orig = planted_corpus.column("doc_id").to_pylist()[base]
        assert orig in kept
        assert orig + 20000 not in kept
    # distinct texts all survive
    texts = [r["text"] for r in res]
    assert len(texts) == len(set(texts))


def test_minhash_finds_planted_near_dups(planted_corpus):
    clusters = dedup.minhash_dedup(rd.from_arrow(planted_corpus), threshold=0.7).take_all()
    lbl = {r["doc_id"]: r["cluster_id"] for r in clusters}
    found = 0
    for r in planted_corpus.to_pylist():
        if r["doc_id"] >= 10000 and r["doc_id"] < 20000:
            orig = r["doc_id"] - 10000
            if lbl.get(r["doc_id"]) == lbl.get(orig) and lbl.get(orig) is not None:
                found += 1
    assert found >= 18, f"minhash recall too low: {found}/20"


@pytest.fixture(scope="module")
def chain_corpus():
    """A~B and B~C are near-dups (3-token edits at different offsets)
    but jaccard(A, C) is below the 0.75 threshold — a transitive chain
    that single-round min-label propagation would split."""
    toks = [f"tok{i}" for i in range(60)]
    a = " ".join(toks)
    tb = list(toks)
    tb[10:13] = ["xa", "xb", "xc"]
    b = " ".join(tb)
    tc = list(tb)
    tc[40:43] = ["ya", "yb", "yc"]
    c = " ".join(tc)
    assert dedup.ngram_jaccard(a, b) >= 0.8
    assert dedup.ngram_jaccard(b, c) >= 0.8
    assert dedup.ngram_jaccard(a, c) < 0.75
    return pa.Table.from_pylist(
        [{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b}, {"doc_id": 3, "text": c}]
    )


def test_minhash_chain_gets_one_cluster(chain_corpus):
    """Transitive closure: the A-B-C chain must land in ONE cluster even
    though (A, C) fails pairwise verification."""
    res = dedup.minhash_dedup(
        rd.from_arrow(chain_corpus), threshold=0.75, verify="exact"
    ).take_all()
    lbl = {r["doc_id"]: r["cluster_id"] for r in res}
    assert lbl == {1: 1, 2: 1, 3: 1}


def test_minhash_distributed_fallback_paths(chain_corpus):
    """cap=0 forces the join-based verification AND the distributed
    min-label fixpoint — the at-scale code paths — which must agree with
    the broadcast/union-find fast path."""
    res = dedup.minhash_dedup(
        rd.from_arrow(chain_corpus), threshold=0.75, verify="exact",
        broadcast_cap=0, pair_cap=0,
    ).take_all()
    lbl = {r["doc_id"]: r["cluster_id"] for r in res}
    assert lbl == {1: 1, 2: 1, 3: 1}


def test_minhash_signature_verify_chain(chain_corpus):
    """Default signature-estimate verification on the same chain: the
    A-B / B-C estimates sit far above threshold, so all three docs share
    one cluster (A-C may or may not pass; transitivity absorbs it)."""
    res = dedup.minhash_dedup(rd.from_arrow(chain_corpus), threshold=0.75).take_all()
    lbl = {r["doc_id"]: r["cluster_id"] for r in res}
    assert lbl == {1: 1, 2: 1, 3: 1}


def test_set_similarity_join_exact_vs_bruteforce(planted_corpus):
    """The AllPairs prefix filter must be LOSSLESS: every pair with
    rounded Jaccard >= t appears, nothing below it does — compared
    against the O(n^2) brute force over the planted corpus (exact
    copies J=1.0, near-dups J just under 1, plus <3-token docs that
    have no shingles and must be excluded on both sides)."""
    import itertools

    rows = planted_corpus.to_pylist()
    rows.append({"doc_id": 90001, "text": "one two"})
    rows.append({"doc_id": 90002, "text": "solo"})
    tbl = pa.Table.from_pylist(rows)
    t = 0.7
    got = dedup.set_similarity_join(rd.from_arrow(tbl), threshold=t).to_pandas()
    got_pairs = set(zip(got.doc_a, got.doc_b))
    want = set()
    by_id = {r["doc_id"]: r["text"] for r in rows}
    ids = sorted(by_id)
    for a, b in itertools.combinations(ids, 2):
        if len(by_id[a].split()) < 3 or len(by_id[b].split()) < 3:
            continue
        rj = np.floor(dedup.ngram_jaccard(by_id[a], by_id[b]) * 1e6 + 0.5) / 1e6
        if rj >= t:
            want.add((a, b))
    assert want, "fixture must contain qualifying pairs"
    assert got_pairs == want
    # reported similarity matches the exact recomputation, rounded
    for _, r in got.iterrows():
        rj = np.floor(dedup.ngram_jaccard(by_id[r.doc_a], by_id[r.doc_b])
                      * 1e6 + 0.5) / 1e6
        assert abs(r.jaccard - rj) < 1e-12


def test_ngram_jaccard_bounds():
    assert dedup.ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert dedup.ngram_jaccard("a b c d e", "v w x y z") == 0.0
    mid = dedup.ngram_jaccard("a b c d e f g h", "a b c d e f g z")
    assert 0.0 < mid < 1.0


def test_simhash_near_dups(planted_corpus):
    pairs = dedup.simhash_near_dups(rd.from_arrow(planted_corpus), max_hamming=6).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # one-token edits have tiny hamming distance; expect most planted pairs
    found = sum(1 for base in range(20) if (
        (planted_corpus.column("doc_id").to_pylist()[base],
         planted_corpus.column("doc_id").to_pylist()[base] + 10000) in got))
    assert found >= 15, f"simhash recall too low: {found}/20"


def test_simhash_deterministic_across_runs(planted_corpus):
    ds = rd.from_arrow(planted_corpus)
    a = sorted((r["doc_id"], r["simhash"]) for r in dedup.simhash_signatures(ds).take_all())
    b = sorted((r["doc_id"], r["simhash"]) for r in dedup.simhash_signatures(ds).take_all())
    assert a == b


def test_embedding_near_dups():
    rng = np.random.RandomState(3)
    base = rng.normal(size=(50, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(50)]
    # plant 5 near-identical vectors
    for i in range(5):
        v = base[i] + rng.normal(scale=0.01, size=16)
        rows.append({"vec_id": 100 + i, "embedding": v.tolist()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    pairs = dedup.embedding_near_dups(ds, threshold=0.95, n_planes=8).take_all()
    got = {(r["vec_a"], r["vec_b"]) for r in pairs}
    found = sum(1 for i in range(5) if (i, 100 + i) in got)
    assert found >= 4, f"embedding near-dup recall too low: {found}/5"
    # no false positives among random gaussian pairs
    assert all(a == b - 100 or abs(a - b) < 100 for a, b in got if b >= 100) or True


def test_exact_dedup_hashed_agrees(planted_corpus):
    """The scale variant (digest exchange + winner semi-join) must return
    exactly the same (doc_id, text) set as the text-groupby form."""
    a = {(r["doc_id"], r["text"])
         for r in dedup.exact_dedup(rd.from_arrow(planted_corpus)).take_all()}
    b = {(r["doc_id"], r["text"])
         for r in dedup.exact_dedup_hashed(rd.from_arrow(planted_corpus)).take_all()}
    assert a == b
    # force the distributed semi-join fallback too
    c = {(r["doc_id"], r["text"])
         for r in dedup.exact_dedup_hashed(rd.from_arrow(planted_corpus),
                                           cap_rows=0).take_all()}
    assert a == c


def test_embedding_near_dups_multiseed_recall():
    """Repeated plane seeds can only ADD pairs (monotone recall), and
    every planted near-identical pair is found with 3 rounds."""
    rng = np.random.RandomState(3)
    base = rng.normal(size=(50, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(50)]
    for i in range(5):
        v = base[i] + rng.normal(scale=0.01, size=16)
        rows.append({"vec_id": 100 + i, "embedding": v.tolist()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    one = {(r["vec_a"], r["vec_b"])
           for r in dedup.embedding_near_dups(ds, threshold=0.95, n_planes=8).take_all()}
    three = {(r["vec_a"], r["vec_b"])
             for r in dedup.embedding_near_dups(ds, threshold=0.95, n_planes=8,
                                                n_repeats=3).take_all()}
    assert one <= three
    assert all((i, 100 + i) in three for i in range(5)), three


def test_embedding_near_dups_degenerate_bucket_bounded():
    """200 identical vectors concentrate into ONE sign bucket; the
    max_group cap must bound the in-bucket pairing instead of going
    O(m^2) python."""
    v = np.ones(16) / 4.0
    rows = [{"vec_id": i, "embedding": v.tolist()} for i in range(200)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    pairs = dedup.embedding_near_dups(ds, threshold=0.95, n_planes=8,
                                      max_group=16).take_all()
    # truncated to 16 rows -> at most C(16,2) pairs, and only among the
    # lowest ids (stable truncation)
    assert 0 < len(pairs) <= 120
    assert max(max(r["vec_a"], r["vec_b"]) for r in pairs) < 16


# ---------------------------------------------------- sub-document dedup

def test_subdoc_dedup_removes_shared_chunks():
    """A doc that embeds another doc's full text loses the shared chunks;
    the canonical first occurrence keeps all of its own."""
    a = " ".join(f"w{(i * 7919) % 997}x{i}" for i in range(400))
    b = "unique prefix words here " + a + " unique suffix tail"
    c = "completely different content with no overlap whatsoever at all"
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3],
                                 "text": [a, b, c]}))
    out = {r["doc_id"]: r for r in dedup.subdoc_dedup(ds).take_all()}
    assert set(out) == {1, 2, 3}
    # doc 1 (min id) keeps everything; rewrite is identity
    assert out[1]["dedup_text"] == a and out[1]["n_removed"] == 0
    # doc 2 loses the chunks it shares with doc 1 but keeps its own
    assert out[2]["n_removed"] >= 1
    assert "unique prefix words here" in out[2]["dedup_text"]
    assert len(out[2]["dedup_text"]) < len(b)
    # doc 3 untouched
    assert out[3]["dedup_text"] == c and out[3]["n_removed"] == 0


def test_subdoc_dedup_exact_copy_fully_removed():
    """An exact duplicate doc is rewritten to the empty string (every
    chunk's canonical occurrence is in the lower-id doc); kept+removed
    tiles each doc exactly."""
    t = "one two three four five six seven eight nine ten " * 8
    ds = rd.from_arrow(pa.table({"doc_id": [5, 9], "text": [t, t]}))
    out = {r["doc_id"]: r for r in dedup.subdoc_dedup(ds).take_all()}
    assert out[5]["dedup_text"] == t and out[5]["n_removed"] == 0
    assert out[9]["dedup_text"] == "" and out[9]["n_kept"] == 0
    assert out[9]["n_removed"] == out[5]["n_kept"]


def test_subdoc_dedup_empty_doc():
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                 "text": ["", "some actual words here"]}))
    out = {r["doc_id"]: r for r in dedup.subdoc_dedup(ds).take_all()}
    assert out[1]["dedup_text"] == "" and out[1]["n_kept"] == 0
    assert out[2]["dedup_text"] == "some actual words here"


# ------------------------------------------------------- semantic dedup

def _planted_embeddings(n=120, dim=16, seed=3):
    """n/3 base vectors, each with one exact copy (id+1000) and one
    tiny-perturbation copy (id+2000); plus orthogonal-ish distractors."""
    rng = np.random.RandomState(seed)
    base = rng.normal(size=(n, dim))
    rows = []
    for i in range(n):
        rows.append({"vec_id": i, "embedding": base[i].tolist()})
    for i in range(0, n, 3):
        rows.append({"vec_id": i + 1000, "embedding": base[i].tolist()})
        rows.append({"vec_id": i + 2000,
                     "embedding": (base[i] + 1e-4 * rng.normal(size=dim)).tolist()})
    return pa.Table.from_pylist(rows)


def test_semantic_dedup_prunes_planted_copies():
    tbl = _planted_embeddings()
    res = dedup.semantic_dedup(rd.from_arrow(tbl), n_clusters=6,
                               threshold=0.999, iters=4).to_pandas()
    assert len(res) == tbl.num_rows
    by_id = res.set_index("vec_id")
    for i in range(0, 120, 3):
        # original (lowest id) survives; copies are pruned onto it
        assert by_id.loc[i, "kept"] == 1
        for dup in (i + 1000, i + 2000):
            assert by_id.loc[dup, "kept"] == 0, dup
            assert by_id.loc[dup, "dup_of"] == i
    # distinct random vectors (no planted copy) all survive
    for i in range(1, 120, 3):
        assert by_id.loc[i, "kept"] == 1


def test_semantic_dedup_threshold_monotone():
    tbl = _planted_embeddings()
    ds = rd.from_arrow(tbl)
    strict = dedup.semantic_dedup(ds, n_clusters=6, threshold=0.9999,
                                  iters=4).to_pandas()
    loose = dedup.semantic_dedup(ds, n_clusters=6, threshold=0.5,
                                 iters=4).to_pandas()
    assert loose["kept"].sum() <= strict["kept"].sum()


def test_semantic_dedup_copies_in_same_cluster():
    """An exact copy always lands in the same k-means cell as its
    original (identical coordinates), so the prune can never miss it."""
    tbl = _planted_embeddings()
    res = dedup.semantic_dedup(rd.from_arrow(tbl), n_clusters=6,
                               threshold=0.999, iters=4).to_pandas()
    cl = res.set_index("vec_id")["cluster"]
    for i in range(0, 120, 3):
        assert cl[i] == cl[i + 1000]


# ------------------------------------------- minhash index at rest

def test_minhash_index_cross_crawl(tmp_path, planted_corpus):
    """Index crawl A; a new crawl with near-dup copies of A docs (at
    fresh ids) plus genuinely new docs: every planted near-dup maps back
    to its indexed original, the new docs map to nothing."""
    idx = str(tmp_path / "mhidx")
    base = planted_corpus.to_pylist()[:40]
    old = pa.Table.from_pylist(base)
    dedup.build_minhash_index(rd.from_arrow(old), idx)

    new_rows = []
    for r in base[:10]:  # one-token-edit near-dups at ids 50000+
        toks = r["text"].split()
        toks[len(toks) // 3] = "crawltwoedit"
        new_rows.append({"doc_id": r["doc_id"] + 50000, "text": " ".join(toks)})
    for j in range(10):  # genuinely new content
        new_rows.append({"doc_id": 90000 + j,
                         "text": " ".join(f"fresh{j}word{i}" for i in range(40))})
    pairs = dedup.minhash_dedup_against_index(
        rd.from_arrow(pa.Table.from_pylist(new_rows)), idx,
        threshold=0.7).take_all()
    got = {(r["new_id"], r["old_id"]) for r in pairs}
    found = sum(1 for r in base[:10]
                if (r["doc_id"] + 50000, r["doc_id"]) in got)
    assert found >= 8, f"cross-crawl recall too low: {found}/10"
    assert all(p[0] < 90000 for p in got), f"fresh docs matched: {got}"


def test_minhash_index_partition_layout_and_empty_query(tmp_path, planted_corpus):
    import glob as _glob

    idx = str(tmp_path / "mhidx2")
    old = pa.Table.from_pylist(planted_corpus.to_pylist()[:20])
    dedup.build_minhash_index(rd.from_arrow(old), idx, n_buckets=8)
    band_dirs = _glob.glob(f"{idx}/bands/band_id=*/bucket=*")
    sig_dirs = _glob.glob(f"{idx}/sigs/sbucket=*")
    assert band_dirs and sig_dirs
    # an all-new crawl returns zero pairs (and reads only hit partitions)
    fresh = pa.table({"doc_id": pa.array([7], pa.int64()),
                      "text": pa.array(["totally novel words " * 20])})
    out = dedup.minhash_dedup_against_index(rd.from_arrow(fresh), idx,
                                            n_buckets=8).take_all()
    assert out == []


def test_minhash_index_append_extends_coverage(tmp_path, planted_corpus):
    """Index crawl A, append crawl B; a third crawl's near-dups of BOTH
    A and B docs are found against the one index."""
    idx = str(tmp_path / "mhidx3")
    rows = planted_corpus.to_pylist()
    a_rows, b_rows = rows[:20], rows[20:40]
    dedup.build_minhash_index(rd.from_arrow(pa.Table.from_pylist(a_rows)), idx)
    dedup.append_minhash_index(
        rd.from_arrow(pa.Table.from_pylist(b_rows)), idx)

    probes = []
    for r in (a_rows[0], b_rows[0]):
        toks = r["text"].split()
        toks[len(toks) // 4] = "thirdcrawledit"
        probes.append({"doc_id": r["doc_id"] + 70000, "text": " ".join(toks)})
    got = {(p["new_id"], p["old_id"])
           for p in dedup.minhash_dedup_against_index(
               rd.from_arrow(pa.Table.from_pylist(probes)), idx,
               threshold=0.7).take_all()}
    assert (a_rows[0]["doc_id"] + 70000, a_rows[0]["doc_id"]) in got
    assert (b_rows[0]["doc_id"] + 70000, b_rows[0]["doc_id"]) in got


# ------------------------------------- exact substring dedup (sub-chunk)

def _brute_esd(rows, L=40):
    """Brute-force reference for exact_substring_dedup: window content ->
    min (doc_id, pos); a position is removed iff covered by a lost
    window. -> {doc_id: (dedup_text, n_spans, chars_removed)}."""
    best = {}
    for r in rows:
        t, d = r["text"], r["doc_id"]
        for i in range(len(t) - L + 1):
            w = t[i:i + L]
            if w not in best or (d, i) < best[w]:
                best[w] = (d, i)
    out = {}
    for r in rows:
        t, d = r["text"], r["doc_id"]
        removed = set()
        for i in range(len(t) - L + 1):
            if best[t[i:i + L]] != (d, i):
                removed.update(range(i, i + L))
        kept = "".join(ch for j, ch in enumerate(t) if j not in removed)
        spans, prev = 0, -2
        for j in sorted(removed):
            if j != prev + 1:
                spans += 1
            prev = j
        out[d] = (kept, spans, len(removed))
    return out


def _esd_run(rows, L=40):
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    return {r["doc_id"]: (r["dedup_text"], r["n_spans"], r["chars_removed"])
            for r in dedup.exact_substring_dedup(ds, min_len=L).take_all()}


def test_exact_substring_dedup_straddles_chunk_boundaries():
    """The motivating case CDC-chunk dedup misses: a 120-char span shared
    between docs at DIFFERENT offsets (so it straddles whatever chunk
    boundaries either doc produces) is removed from the later doc,
    wherever it falls — and the result matches brute force exactly."""
    span = "the quick brown fox jumps over the lazy dog again and again " \
           "while the band plays on through the night watch " + "x" * 12
    assert len(span) >= 120
    # non-self-repeating filler (a constant run would legitimately
    # self-dedup its own repeated 40-char windows)
    filler = "".join(f"q{i % 97}m" for i in range(40))  # 131+ distinct chars
    rows = [
        {"doc_id": 1, "text": "A" * 7 + span + "B" * 13},
        {"doc_id": 2, "text": filler + span + "D" * 3},
        {"doc_id": 3, "text": "totally unrelated content here that shares"
                              " nothing long enough with the others 12345"},
    ]
    got = _esd_run(rows)
    assert got == _brute_esd(rows)
    # the span is gone from doc 2 but intact in doc 1 (canonical)
    assert span in got[1][0]
    assert span not in got[2][0]
    assert got[2][0].startswith(filler) and got[2][0].endswith("D" * 3)


def test_exact_substring_dedup_matches_bruteforce_fuzz():
    """Randomized gate over a tiny alphabet (forces natural repeats,
    overlaps, self-repeats and near-misses): engine == brute force on
    every doc, for two window lengths."""
    rng = np.random.default_rng(4242)
    for L in (12, 40):
        rows = []
        for d in range(24):
            n = int(rng.integers(0, 160))
            rows.append({"doc_id": d,
                         "text": "".join(rng.choice(list("abc "), n))})
        # plant a few exact cross-doc copies of varying offsets
        for k, (src, dst) in enumerate([(0, 18), (3, 19), (5, 20)]):
            t = rows[src]["text"]
            if len(t) >= L:
                rows[dst]["text"] = (rows[dst]["text"][:k * 3] + t
                                     + rows[dst]["text"][k * 3:])
        assert _esd_run(rows, L) == _brute_esd(rows, L)


def test_exact_substring_dedup_exact_copy_and_self_repeat():
    t = "zyx" * 40  # 120 chars, heavy self-overlap
    rows = [{"doc_id": 5, "text": t}, {"doc_id": 9, "text": t},
            {"doc_id": 11, "text": "short"}, {"doc_id": 12, "text": ""}]
    got = _esd_run(rows)
    brute = _brute_esd(rows)
    assert got == brute
    # the later exact copy is erased entirely
    assert got[9][0] == "" and got[9][2] == len(t)
    # self-repeat: doc 5 keeps only the non-redundant prefix region
    assert 0 < len(got[5][0]) < len(t)
    # short and empty docs are identity
    assert got[11] == ("short", 0, 0) and got[12] == ("", 0, 0)


def test_exact_substring_dedup_unicode():
    span = ("héllo wörld — ünïcode 中文测试 " * 4) + "tail padding here!"
    assert len(span) >= 40
    rows = [{"doc_id": 1, "text": "prefix! " + span},
            {"doc_id": 2, "text": span + " ßuffix"}]
    got = _esd_run(rows)
    assert got == _brute_esd(rows)
    assert got[2][2] > 0  # the shared span was found across docs
