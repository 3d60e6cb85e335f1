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
