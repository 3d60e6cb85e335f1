"""Enrichment passes: dehyphenation (M7, byte-identical goldens) and
table-label context mining (context_from_text), reference
`enrich/context_enrichment.py:162-179,180-238`."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from cosmos_ray.stages import enrich
from cosmos_ray.stages.extract import parse_html_blocks


def test_dehyphenate_byte_golden():
    """Handcrafted html through the frozen extractor, then dehyphenation:
    exact expected bytes (hyphen+newline joins, plain hyphens survive)."""
    html = (
        b"<html><body><p>A frag-</p><p>mented word here.</p>"
        b"<p>range 2020-</p><p>2021 joins too.</p>"
        b"<p>well-known stays hyphenated.</p></body></html>"
    )
    text = "\n".join(t for _, t in parse_html_blocks(html))
    assert text == (
        "A frag-\nmented word here.\nrange 2020-\n2021 joins too."
        "\nwell-known stays hyphenated."
    )
    out = enrich.dehyphenate_batch(pa.table({"doc_id": [1], "text": [text]}))
    assert out.column("text").to_pylist() == [
        "A fragmented word here.\nrange 20202021 joins too."
        "\nwell-known stays hyphenated."
    ]


def test_dehyphenate_planted_corpus(kg_small, documents_small):
    """Docs with doc_id % 5 == 2 carry a planted hyphen-split word; the
    enriched documents dataset must contain the rejoined word and no
    residual 'hyphena-\\ntion' anywhere."""
    enriched = enrich.dehyphenate(kg_small.documents.select_columns(["url", "text"]))
    texts = {r["url"]: r["text"] for r in enriched.take_all()}
    from cosmos_ray.sources.pages import MALFORMED_MOD, MALFORMED_REM

    planted = [
        d for d in documents_small.column("doc_id").to_pylist()
        if d % 5 == 2 and d % MALFORMED_MOD != MALFORMED_REM
    ]
    assert planted, "corpus must contain planted hyphenation docs"
    for did in planted:
        url = f"https://web{did % 20}.example.org/p/{did}"
        assert "hyphena-\ntion" not in texts[url]
        assert "Closing note on hyphenation handling in this corpus." in texts[url]
    assert all("-\n" not in t or "hyphena" not in t for t in texts.values())


def test_table_context_planted_golden(kg_small, documents_small):
    """Exact context_from_text per planted caption: docs WITH a table get
    the planted 'See table N ...' sentence; docs WITHOUT get an empty
    context for their dangling caption."""
    from cosmos_ray.sources.entity_dict import build_entity_dict
    from cosmos_ray.sources.pages import (
        MALFORMED_MOD,
        MALFORMED_REM,
        golden_doc,
    )

    got = {
        (r["url"], r["table_label"]): r["context_from_text"]
        for r in enrich.table_context(kg_small.segments).take_all()
    }
    kb = build_entity_dict()
    kb_rows = kb.to_pylist()
    kb_names = [r["name"] for r in kb_rows]
    kb_aliases = {r["name"]: r["aliases"] for r in kb_rows}

    docs = documents_small.to_pylist()
    n_with_table = 0
    for d in docs:
        did = d["doc_id"]
        if did % MALFORMED_MOD == MALFORMED_REM:
            continue
        g = golden_doc(did, d["text"], d["lang"], d["source"], kb_names, kb_aliases)
        has_table = any(tag == "td" for tag, _ in g.blocks)
        label = f"table {1 + did % 3}"
        want = (
            f"See table {1 + did % 3} for the alpha and beta scores."
            if has_table
            else ""
        )
        assert got[(g.url, label)] == want, (g.url, label)
        n_with_table += has_table
    assert n_with_table > 0


def test_table_label_mining():
    assert enrich.mine_table_label("Table 3: results") == "table 3"
    assert enrich.mine_table_label("see tbl. 2.1 for details") == "table 2.1"
    assert enrich.mine_table_label("TABLE iv shows") == "table iv"
    assert enrich.mine_table_label("no label here") is None


def test_boilerplate_distributed_fallback_agrees(kg_small):
    """cap_rows=0 forces the site-totals join fallback (the unbounded-
    site-count posture at crawl scale); results must equal the broadcast
    path exactly."""
    def key(rows):
        return sorted(
            (r["site"], r["text"], r["n_pages"], r["site_pages"], r["frac"])
            for r in rows
        )

    a = key(enrich.detect_boilerplate(kg_small.segments).take_all())
    b = key(enrich.detect_boilerplate(kg_small.segments, cap_rows=0).take_all())
    assert a == b
    assert a, "synthetic corpus must contain site-level boilerplate"


def test_boilerplate_counts_pages_not_blocks():
    """A url repeating the same text in several blocks (and across
    batches) counts ONCE toward that (site, text) — frac can never
    exceed 1.0."""
    rows = []
    for p in range(6):
        url = f"https://s1.example.org/p/{p}"
        for _ in range(3):  # same furniture text 3x per page
            rows.append({"url": url, "text": "nav furniture"})
        rows.append({"url": url, "text": f"unique {p}"})
    # two single-block datasets would previously double-count across
    # batches; force multiple blocks
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = enrich.detect_boilerplate(ds, min_pages=5, min_frac=0.6).take_all()
    assert len(out) == 1
    r = out[0]
    assert (r["site"], r["text"], r["n_pages"], r["site_pages"], r["frac"]) == (
        "s1.example.org", "nav furniture", 6, 6, 1.0
    )
