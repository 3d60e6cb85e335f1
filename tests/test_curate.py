"""Gates of the composed curation pipeline on a hand-built corpus:
exact dedup, quality (length / stopword ratio), language, sampling."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def _docs(rows):
    ids, texts, srcs = zip(*rows)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(srcs),
    }))


EN = "the cat sat on the mat and the dog ran over the hill today"
DE = "sch ein sch ein sch ein sch ein sch ein sch ein sch ein sch ein"
SHORT = "too short text"
STOPPY = "the the the the the a a a a a of of of of of to to to to and"


def test_each_gate():
    from cosmos_ray.pipelines.curate import curate_documents

    ds = _docs([
        (1, EN, "s1"),          # kept
        (2, EN, "s1"),          # exact dup of 1 -> dropped (min id wins)
        (3, SHORT, "s1"),       # < 10 tokens -> dropped
        (4, STOPPY, "s1"),      # stopword ratio > 0.5 -> dropped
        (5, DE, "s1"),          # predicted de -> dropped
        (6, EN + " extra", "s2"),  # kept, other source
    ])
    df = curate_documents(ds, lang="en", per_source=20).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == [1, 6]
    assert df["lang_pred"].unique().tolist() == ["en"]
    assert df.loc[0, "n_tokens"] == len(EN.split())
    assert df["source"].tolist() == ["s1", "s2"]


def test_per_source_cap():
    from cosmos_ray.pipelines.curate import curate_documents

    rows = [(i, EN + f" filler{i}", "s") for i in range(30)]
    df = curate_documents(_docs(rows), per_source=7).to_pandas()
    assert len(df) == 7


def test_pack_sequences_boundaries():
    """Hand-checkable packing: offsets are the exclusive prefix of token
    counts in doc_id order; first/last sequence ids follow from integer
    division; an empty-ish doc occupies exactly one sequence slot."""
    from cosmos_ray.functions.pack import pack_sequences

    texts = {1: "a b c d e", 2: "f g h", 3: "x", 4: "y z w v u t s"}
    ds = _docs([(i, texts[i], "s") for i in sorted(texts)])
    df = pack_sequences(ds, seq_len=4, bucket_span=2).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert df["n_tokens"].tolist() == [5, 3, 1, 7]
    assert df["start_offset"].tolist() == [0, 5, 8, 9]
    # doc1 spans tokens [0,5) -> seqs 0..1; doc2 [5,8) -> seq 1; doc3 [8,9)
    # -> seq 2; doc4 [9,16) -> seqs 2..3.
    assert df["first_seq"].tolist() == [0, 1, 2, 2]
    assert df["last_seq"].tolist() == [1, 1, 2, 3]


def test_pack_sequences_sparse_ids():
    """doc_id gaps (missing buckets) must not shift later offsets."""
    from cosmos_ray.functions.pack import pack_sequences

    ds = _docs([(0, "a b", "s"), (7, "c d e", "s"), (4000, "f", "s")])
    df = pack_sequences(ds, seq_len=2, bucket_span=1024).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert df["start_offset"].tolist() == [0, 2, 5]
    assert df["first_seq"].tolist() == [0, 1, 2]
    assert df["last_seq"].tolist() == [0, 2, 2]


def test_export_training_shards_roundtrip(tmp_path):
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from cosmos_ray.functions.pack import export_training_shards, shuffle_shards

    rows = [(i, f"doc text {i}", "s") for i in range(40)]
    ds = _docs(rows)
    out = export_training_shards(ds, str(tmp_path / "shards"), n_shards=4)
    dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(dirs) == 4
    back = pq.read_table(out)
    assert back.num_rows == 40
    # layout agrees with the shuffle plan
    plan = shuffle_shards(_docs(rows), n_shards=4).to_pandas()
    got = back.to_pandas()[["doc_id", "shard"]]
    got["shard"] = got["shard"].astype("int64")
    merged = got.merge(plan[["doc_id", "shard"]], on="doc_id",
                       suffixes=("_w", "_p"))
    assert (merged["shard_w"] == merged["shard_p"]).all()
    # per-shard pos is a dense 0..n-1 rank
    for s, g in plan.groupby("shard"):
        assert sorted(g["pos"].tolist()) == list(range(len(g)))
    # idempotent re-run: same layout
    export_training_shards(_docs(rows), str(tmp_path / "shards"), n_shards=4)
    assert pq.read_table(out).num_rows == 40


class TestTokenBudgetSample:
    def test_budget_binds_in_md5_order(self):
        import hashlib

        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.functions.pack import token_budget_sample

        texts = {0: "a b c", 1: "d e", 2: "f", 3: "g h i j"}  # 3,2,1,4 tokens
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(texts), pa.int64()),
            "source": pa.array(["s"] * 4),
            "text": pa.array(list(texts.values())),
        }))
        got = token_budget_sample(ds, budget=5, group_col="source").to_pandas()
        # hand replay: md5-of-id order, inclusive cumsum <= 5
        order = sorted(texts, key=lambda i: (hashlib.md5(str(i).encode())
                                             .hexdigest(), i))
        keep, cum = [], 0
        for i in order:
            n = len(texts[i].split())
            if cum + n <= 5:
                cum += n
                keep.append((i, n, cum))
        got = got.sort_values("cum_tokens").reset_index(drop=True)
        assert list(zip(got["doc_id"], got["n_tokens"],
                        got["cum_tokens"])) == keep

    def test_oversized_first_doc_dropped_group_isolation(self):
        import pyarrow as pa

        import ray.data as rd

        from cosmos_ray.functions.pack import token_budget_sample

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "source": pa.array(["big", "small"]),
            "text": pa.array(["w " * 99 + "w", "x y"]),  # 100 vs 2 tokens
        }))
        got = token_budget_sample(ds, budget=10).to_pandas()
        assert got["source"].tolist() == ["small"]
        assert got["cum_tokens"].tolist() == [2]
