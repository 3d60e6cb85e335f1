"""Byte-identical per-url extraction contract (north rule gate #1).

Reference analog: the text-layer parse + normalization the reference
freezes per document (`ingest/utils/pdf_extractor.py:26-84`,
`normalize_text.py:19-28`); golden-fixture pattern from
`cosmos_service/test/src/annotations/annotations_base.py`.
"""

from __future__ import annotations

from cosmos_ray.stages.extract import normalize_text, parse_html_blocks


def test_text_byte_identical_per_url(kg_small, golden_small):
    got = {
        r["url"]: r["text"] for r in kg_small.documents.take_all()
    }
    want = {
        u: t
        for u, t in zip(
            golden_small["text"].column("url").to_pylist(),
            golden_small["text"].column("text").to_pylist(),
        )
    }
    assert set(got) == set(want)
    mismatches = [u for u in want if got[u] != want[u]]
    assert mismatches == [], f"{len(mismatches)} urls not byte-identical"


def test_dead_letter_routing(kg_small, pages_small, golden_small):
    dead = kg_small.dead_letter.take_all()
    # every malformed url lands in dead letter with an error, none in docs
    n_urls = pages_small.num_rows
    golden_urls = set(golden_small["text"].column("url").to_pylist())
    dead_urls = {r["url"] for r in dead}
    assert dead_urls, "expected planted malformed rows"
    assert dead_urls.isdisjoint(golden_urls)
    assert all(r["error"] for r in dead)
    assert all(r["stage"] == "extract" for r in dead)


def test_keep_latest_dedup(kg_small, golden_small):
    # duplicate-crawl urls collapse to exactly one row per url
    urls = [r["url"] for r in kg_small.documents.select_columns(["url"]).take_all()]
    assert len(urls) == len(set(urls))
    assert len(urls) == golden_small["text"].num_rows


def test_parser_handles_noise():
    html = (
        b"<html><head><script>var a='<p>x</p>';</script><style>p{}</style></head>"
        b"<body><!-- c --><p>hello &amp; goodbye</p><nav><p>skip me</p></nav>"
        b"<ul><li>item one.</li></ul></body></html>"
    )
    blocks = parse_html_blocks(html)
    assert blocks == [("p", "hello & goodbye"), ("li", "item one.")]


def test_normalize_text_contract():
    assert normalize_text("  a\t b\n c ") == "a b c"
    # NFC normalization: decomposed e + combining acute -> composed
    assert normalize_text("é") == "é"


# ------------------------------------------------- interchange sources

def test_jsonl_and_csv_sources_roundtrip(tmp_path, documents_small):
    """A JSONL (and CSV) dump of the documents table reads back through
    the normalizing source into exactly the parquet rows; missing
    optional columns arrive as typed nulls; a dump without the required
    columns is rejected."""
    import csv
    import json

    import pytest as _pytest

    from cosmos_ray.sources.text_formats import read_csv_docs, read_jsonl_docs

    rows = documents_small.to_pylist()[:100]
    jl = tmp_path / "docs.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    got = (read_jsonl_docs(str(jl)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 100
    for r, (_, g) in zip(sorted(rows, key=lambda x: x["doc_id"]),
                         got.iterrows()):
        assert g["doc_id"] == r["doc_id"] and g["text"] == r["text"]
        assert g["lang"] == r["lang"] and g["n_chars"] == r["n_chars"]

    # minimal dump: only required columns -> optional ones are nulls
    jl2 = tmp_path / "mini.jsonl"
    with open(jl2, "w") as f:
        for r in rows[:5]:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
    mini = read_jsonl_docs(str(jl2)).to_pandas()
    assert mini["lang"].isna().all() and len(mini) == 5

    cv = tmp_path / "docs.csv"
    with open(cv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["doc_id", "text", "lang"])
        w.writeheader()
        for r in rows[:20]:
            w.writerow({k: r[k] for k in ("doc_id", "text", "lang")})
    gcsv = (read_csv_docs(str(cv)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(gcsv) == 20 and gcsv["text"].notna().all()

    bad = tmp_path / "bad.jsonl"
    with open(bad, "w") as f:
        f.write(json.dumps({"text": "no id"}) + "\n")
    with _pytest.raises(Exception):
        read_jsonl_docs(str(bad)).take_all()


def test_link_parser_edges():
    """`parse_html_links`: skip regions, nested <a> recovery, block
    boundary implicit close, href-less anchors, entity refs."""
    from cosmos_ray.stages.extract import parse_html_links

    html = (
        b"<html><head><script>var a='<a href=\"x\">no</a>';</script></head>"
        b"<body><nav><a href='https://skip.me/'>nav link</a></nav>"
        b"<p>see <a href='https://a.example/1'>first  link</a> here</p>"
        b"<p><a href='https://a.example/2'>outer "
        b"<a href='https://a.example/3'>inner</a></p>"
        b"<p><a>no href</a><a href='https://a.example/4'>A &amp; B</a></p>"
        b"</body></html>"
    )
    links = parse_html_links(html)
    assert links == [
        ("https://a.example/1", "first link"),
        ("https://a.example/2", "outer"),   # nested <a> closes it
        ("https://a.example/3", "inner"),
        ("https://a.example/4", "A & B"),
    ]
    # block boundary closes an unterminated anchor
    assert parse_html_links(
        b"<p><a href='https://a.example/5'>dangling<p>next block</p>") == [
        ("https://a.example/5", "dangling")]
    # undecodable bytes raise (dead-letter contract)
    import pytest as _pt

    with _pt.raises(UnicodeDecodeError):
        parse_html_links(b"\xff\xfe<a href='x'>y</a>")


def test_corpus_links_match_planted_facts(pages_small, golden_small, ray_session):
    """Every well-formed page plants exactly one outlink per fact <li>,
    href = _link_href(did, f), anchor = the li text."""
    from cosmos_ray.sources.pages import _link_href
    from cosmos_ray.stages.extract import extract_links

    import ray.data as rd

    links = extract_links(rd.from_arrow(pages_small)).to_pandas()
    seg = golden_small["segments"].to_pandas()
    # anchor text is the fact sentence; stale-dup urls repeat the
    # identical link rows, so contiguity holds on the distinct rows
    got = (links.sort_values(["url", "link_idx"])
           .drop_duplicates().reset_index(drop=True))
    assert (got.groupby("url")["link_idx"].apply(
        lambda s: (s.to_numpy() == range(len(s))).all())).all()
    li = seg[seg["tag"] == "li"]
    by_url = li.groupby("url").size()
    # stale dup urls appear twice in pages -> links doubled for them;
    # distinct rows must match the planted <li> counts, anchors the texts
    dist = got.drop_duplicates().groupby("url").size()
    assert dist.to_dict() == by_url.to_dict()
    merged = got.drop_duplicates().merge(
        li, left_on=["url", "link_idx"],
        right_on=["url", li.groupby("url").cumcount()], how="left")
    assert (merged["anchor"] == merged["text"]).all()
    # spot-check href arithmetic on one url
    u = got["url"].iloc[0]
    did = int(u.rsplit("/", 1)[1])
    row = got[got["url"] == u].iloc[0]
    assert row["href"] == _link_href(did, int(row["link_idx"]))


def test_jsonl_gz_reads_natively(tmp_path, documents_small):
    """.jsonl.gz dumps read transparently (arrow decompresses by
    extension) — the compressed interchange path beside .warc.gz."""
    import gzip
    import json

    from cosmos_ray.sources.text_formats import read_jsonl_docs

    rows = documents_small.slice(0, 30).select(["doc_id", "text"]).to_pylist()
    p = tmp_path / "dump.jsonl.gz"
    p.write_bytes(gzip.compress(
        "\n".join(json.dumps(r) for r in rows).encode()))
    got = read_jsonl_docs(str(p)).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == sorted(r["doc_id"] for r in rows)
