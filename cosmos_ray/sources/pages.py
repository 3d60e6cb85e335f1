"""Deterministic synthetic Common-Crawl-style pages + golden outputs.

The driver-provided ``documents.parquet`` (doc_id, text, lang, source,
n_chars) is wrapped into templated HTML pages of the BASELINE.json
input_hint shape ``(url, warc_ts, html, text, lang)``.  Every planted
draw is INTEGER MODULAR ARITHMETIC on ``doc_id`` (``_h`` below) — no
float, no PRNG — so the expected extracted text, segments, mentions and
triples are computable exactly not only in Python (``golden_corpus``)
but also in ANSI SQL over the same ``documents`` table
(`cosmos_ray/queries/oracle_gen.py` reconstructs the full golden block
list and fact list in DuckDB; the driver verifies the kg_* queries
value-for-value against it). Golden-fixture pattern per the reference's
annotated-document tests
(`cosmos_service/test/src/annotations/annotations_base.py:16-133`).

Planted structure per page:
  <h1> title              -> cls Title
  <p>  source line        -> cls Body Text
  <h2> "Overview"         -> cls Section Header
  <p>  word-soup paras    -> cls Body Text
  <h2> "Facts"            -> cls Section Header
  <li> SVO fact sentences -> cls List Item   (triples live here)
  <p>  "Table 1: ..."     -> cls Table Caption  (rules postprocessor)
  <p>  "Figure 1: ..."    -> cls Figure Caption (rules postprocessor)

Fault injection (FIXTURES.md harness notes): every url with
``doc_id % MALFORMED_MOD == MALFORMED_REM`` carries invalid-UTF8 html and
must land in the dead-letter table; every url with
``doc_id % DUP_MOD == DUP_REM`` appears twice with different ``warc_ts``
(keep-latest dedup, SURVEY.md §2.10).
"""

from __future__ import annotations

import html as _html
import random
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from cosmos_ray.core import schemas
from cosmos_ray.sources.entity_dict import (
    DEFAULT_SEED,
    UNKNOWN_SURFACES,
    build_entity_dict,
    surface_index,
)

# Closed predicate lexicon (OpenIE-style SVO patterns). Multi-word and
# disjoint from both the testdata vocabulary and entity-name word lists.
PREDICATES = [
    "acquired",
    "founded",
    "partnered with",
    "produces",
    "is located in",
    "employs",
    "supplies",
    "competes with",
]

MALFORMED_MOD, MALFORMED_REM = 97, 13
DUP_MOD, DUP_REM = 50, 7

# bump when golden_doc/render_html semantics change (bench cache key)
GEN_VERSION = 7  # v7: fact <li> blocks hyperlink their text (html-only;
#                  extracted text/blocks unchanged vs v6)

_BASE_TS_US = 1_700_000_000_000_000  # fixed epoch anchor (us)

# All planted randomness is this integer hash — SQL-replicable exactly
# (`oracle_gen.py` emits the same expression). The did*k cross term
# breaks the fixed-stride lattice a pure linear form would have.
_H_MOD = 1048573  # prime, < 2^20: h*h*N stays well inside int64


def _h(did: int, k: int) -> int:
    return (did * 1000003 + k * 10007 + did * k * 7919 + 12345) % _H_MOD


@dataclass
class GoldenDoc:
    url: str
    doc_id: int
    lang: str
    blocks: list[tuple[str, str]] = field(default_factory=list)  # (tag, text)
    # (subj_surface, pred, obj_surface) in order of appearance
    facts: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def text(self) -> str:
        return "\n".join(t for _, t in self.blocks)


def _title_words(text: str) -> str:
    return " ".join(text.split()[:3])


def golden_doc(
    doc_id: int,
    text: str,
    lang: str,
    source: str,
    kb_names: list[str],
    kb_aliases: dict[str, list[str]],
    seed: int = DEFAULT_SEED,
) -> GoldenDoc:
    """Compute the golden block list + planted facts for one document.
    Pure function of its arguments, all draws integer arithmetic on
    ``doc_id`` — the html renderer, every golden fixture AND the DuckDB
    oracle CTEs (`queries/oracle_gen.py`) derive from this."""
    url = f"https://web{doc_id % 20}.example.org/p/{doc_id}"
    g = GoldenDoc(url=url, doc_id=doc_id, lang=lang)

    title = f"Document {doc_id} & notes: {_title_words(text)}"
    g.blocks.append(("h1", title))
    g.blocks.append(("p", f"source: {source}"))
    g.blocks.append(("h2", "Overview"))
    words = text.split()
    for i in range(0, len(words), 40):
        g.blocks.append(("p", " ".join(words[i : i + 40])))

    # a real table on ~40% of pages: 2x2 of deterministic metric cells
    # with its caption adjacent, so Table segments exist for caption
    # association (J2) on the same page
    has_table = _h(doc_id, 1) % 5 < 2
    if has_table:
        g.blocks.append(("h2", "Data"))
        m1, m2 = _h(doc_id, 2) % 100, _h(doc_id, 3) % 100
        g.blocks.append(("td", "metric"))
        g.blocks.append(("td", "value"))
        g.blocks.append(("td", f"alpha score {m1}"))
        g.blocks.append(("td", f"beta score {m2}"))
        g.blocks.append(("p", f"Table {1 + doc_id % 3}: alpha and beta scores."))
        # textual co-reference to the table label: exercises the
        # table-context enrichment pass (context_from_text)
        g.blocks.append(("p", f"See table {1 + doc_id % 3} for the alpha and beta scores."))

    g.blocks.append(("h2", "Facts"))
    n_facts = 2 + _h(doc_id, 4) % 7
    n = len(kb_names)
    for f in range(n_facts):
        # head-entity skew: quadratic subject draw concentrates subjects
        # at low indexes (SURVEY.md §4 skew row) — floor(n*u^2) with
        # u = hs/_H_MOD, computed integer-exactly
        hs = _h(doc_id, 10 + 6 * f)
        si = (n * hs * hs) // (_H_MOD * _H_MOD)
        subj = kb_names[si]
        ha = _h(doc_id, 11 + 6 * f)
        if ha % 4 == 0 and kb_aliases[subj]:
            subj_surface = kb_aliases[subj][(ha // 4) % len(kb_aliases[subj])]
        else:
            subj_surface = subj
        pred = PREDICATES[_h(doc_id, 12 + 6 * f) % len(PREDICATES)]
        ho = _h(doc_id, 13 + 6 * f)
        if ho % 25 < 3:
            obj_surface = UNKNOWN_SURFACES[(ho // 25) % len(UNKNOWN_SURFACES)]
        else:
            obj = kb_names[ho % n]
            hb = _h(doc_id, 14 + 6 * f)
            if hb % 4 == 0 and kb_aliases[obj]:
                obj_surface = kb_aliases[obj][(hb // 4) % len(kb_aliases[obj])]
            else:
                obj_surface = obj
        g.facts.append((subj_surface, pred, obj_surface))
        g.blocks.append(("li", f"{subj_surface} {pred} {obj_surface}."))

    if not has_table:
        # caption without an object: exercises the rules reclassifier and
        # the unmatched-caption branch of association
        g.blocks.append(("p", f"Table {1 + doc_id % 3}: summary of planted facts."))
    g.blocks.append(("p", f"Figure {1 + doc_id % 2}: entity graph sketch."))
    if doc_id % 4 == 1:
        # a display equation with its (X.Y) label in the ADJACENT block:
        # exercises equation detection (pre -> Equation) and the
        # nearest-midline label association (J3/G4,
        # `reaggregate_equations.py:61-120`)
        g.blocks.append(("h2", "Model"))
        g.blocks.append(("pre", f"gamma = alpha + {doc_id % 7} * beta"))
        g.blocks.append(("p", f"({1 + doc_id % 3}.{doc_id % 5})"))
    if doc_id % 5 == 2:
        # a word split across a block boundary with a trailing hyphen:
        # the dehyphenation enrichment must rejoin it across the "\n"
        g.blocks.append(("p", "Closing note on hyphena-"))
        g.blocks.append(("p", "tion handling in this corpus."))
    return g


_TAG_OPEN = {
    "h1": '<h1 class="title">',
    "h2": "<h2>",
    "p": '<p class="body">',
    "li": "<li>",
    "td": "<td>",
    "pre": "<pre>",
}


def _link_href(did: int, li_idx: int) -> str:
    """Planted outlink target for the li_idx-th fact <li> of doc did —
    _h arithmetic so the links oracle replays it in SQL (draw keys
    60+f sit clear of the fact draws 10+6f..14+6f, f <= 8)."""
    h = _h(did, 60 + li_idx)
    return f"https://web{h % 20}.example.org/p/{h % 9973}"


def render_html(g: GoldenDoc, seed: int = DEFAULT_SEED) -> bytes:
    """Render a GoldenDoc to noisy-but-well-formed HTML. Extraction of
    this html must reproduce ``g.text`` byte-for-byte (anchors are
    INLINE tags — the block parser passes their text through, so the
    planted fact-<li> hyperlinks leave extraction goldens untouched)."""
    rng = random.Random(f"{seed}:{g.doc_id}:html")
    parts = [
        "<!DOCTYPE html>",
        f'<html lang="{g.lang}"><head><meta charset="utf-8">',
        f"<title>{_html.escape(g.blocks[0][1])}</title>",
        "<style>body { margin: 0; } .nav { display: none; }</style>",
        '<script type="text/javascript">var tracker = "<p>not text</p>";</script>',
        "</head><body>",
        "<!-- boilerplate nav -->",
        '<nav class="nav"><span>skip</span></nav>',
    ]
    in_list = in_table = False
    td_in_row = 0
    li_idx = 0
    for tag, text in g.blocks:
        if tag == "li" and not in_list:
            parts.append("<ul>")
            in_list = True
        if tag != "li" and in_list:
            parts.append("</ul>")
            in_list = False
        if tag == "td":
            # real 2-column row structure (<tr> every 2 cells) so the
            # structured table-cell extractor has rows/cols to recover
            if not in_table:
                parts.append('<table class="data"><tr>')
                in_table = True
                td_in_row = 0
            elif td_in_row == 2:
                parts.append("</tr><tr>")
                td_in_row = 0
            td_in_row += 1
        if tag != "td" and in_table:
            parts.append("</tr></table>")
            in_table = False
        if rng.random() < 0.2:
            parts.append(f"<!-- c{rng.randrange(100)} -->")
        if tag == "li":
            href = _link_href(g.doc_id, li_idx)
            li_idx += 1
            parts.append(
                f'<li><a href="{href}">{_html.escape(text)}</a></li>')
        else:
            parts.append(f"{_TAG_OPEN[tag]}{_html.escape(text)}</{tag}>")
    if in_list:
        parts.append("</ul>")
    if in_table:
        parts.append("</tr></table>")
    parts.append("<footer><!-- end --></footer></body></html>")
    return "\n".join(parts).encode("utf-8")


def _doc_ts_us(doc_id: int) -> int:
    return _BASE_TS_US + doc_id * 1_000_000


def generate_pages_shard(
    documents: pa.Table,
    repeat_index: int = 0,
    seed: int = DEFAULT_SEED,
    inject_faults: bool = True,
    kb: pa.Table | None = None,
) -> pa.Table:
    """One repeat-shard of the synthetic corpus: the rows
    ``generate_pages_table(..., repeat=R)`` would produce for repeat
    index ``repeat_index``. Shards are independently generatable (bench
    parallelizes generation across processes)."""
    kb = kb if kb is not None else build_entity_dict(seed=seed)
    kb_rows = kb.to_pylist()
    kb_names = [r["name"] for r in kb_rows]
    kb_aliases = {r["name"]: r["aliases"] for r in kb_rows}

    n_docs = documents.num_rows
    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    langs = documents.column("lang").to_pylist()
    sources = documents.column("source").to_pylist()

    r = repeat_index
    urls, tss, htmls, texts_out, langs_out = [], [], [], [], []
    for j in range(n_docs):
        did = doc_ids[j] + r * n_docs
        g = golden_doc(did, texts[j], langs[j], sources[j], kb_names, kb_aliases, seed)
        ts = _doc_ts_us(did)
        if inject_faults and did % MALFORMED_MOD == MALFORMED_REM:
            body = b"\xff\xfe<html>broken \xff page</html>"
        else:
            body = render_html(g, seed)
        urls.append(g.url if r == 0 else f"{g.url}?r={r}")
        tss.append(ts)
        htmls.append(body)
        texts_out.append("")
        langs_out.append(g.lang)
        if inject_faults and did % DUP_MOD == DUP_REM:
            # stale duplicate: same url, earlier ts, same content
            urls.append(urls[-1])
            tss.append(ts - 3_600_000_000)
            htmls.append(body)
            texts_out.append("")
            langs_out.append(g.lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts_out, pa.string()),
            "lang": pa.array(langs_out, pa.string()),
        },
        schema=schemas.PAGES,
    )


def generate_pages_table(
    documents: pa.Table,
    seed: int = DEFAULT_SEED,
    repeat: int = 1,
    inject_faults: bool = True,
    kb: pa.Table | None = None,
) -> pa.Table:
    """Build the PAGES input table from a driver ``documents`` table.

    ``repeat > 1`` replicates the corpus with distinct doc_ids/urls and
    distinct seeded facts (for bench-scale inputs). The ``text`` column is
    left empty to force extraction from html.
    """
    kb = kb if kb is not None else build_entity_dict(seed=seed)
    shards = [
        generate_pages_shard(documents, r, seed=seed, inject_faults=inject_faults, kb=kb)
        for r in range(repeat)
    ]
    return pa.concat_tables(shards) if len(shards) > 1 else shards[0]


def golden_corpus(
    documents: pa.Table,
    seed: int = DEFAULT_SEED,
    repeat: int = 1,
) -> dict[str, pa.Table]:
    """Golden outputs for the corpus produced by ``generate_pages_table``
    with the same arguments (malformed docs excluded — they belong in the
    dead-letter table).

    Returns tables: ``text`` (url, text); ``segments`` (url, seg_id, tag,
    cls, text); ``triples`` (url, subj, pred, obj) surface-form,
    deduplicated per url; ``linked_triples`` (url, subj_id, pred, obj_id)
    for facts whose both surfaces link; ``mention_counts``
    (canonical_id, n_mentions).
    """
    kb = build_entity_dict(seed=seed)
    sidx = surface_index(kb)
    kb_rows = kb.to_pylist()
    kb_names = [r["name"] for r in kb_rows]
    kb_aliases = {r["name"]: r["aliases"] for r in kb_rows}

    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    langs = documents.column("lang").to_pylist()
    sources = documents.column("source").to_pylist()
    n_docs = documents.num_rows

    t_rows, s_rows, tr_set, lt_set = [], [], set(), set()
    mention_counts: dict[str, int] = {}
    for r in range(repeat):
        for j in range(n_docs):
            did = doc_ids[j] + r * n_docs
            if did % MALFORMED_MOD == MALFORMED_REM:
                continue
            g = golden_doc(did, texts[j], langs[j], sources[j], kb_names, kb_aliases, seed)
            url = g.url if r == 0 else f"{g.url}?r={r}"
            t_rows.append({"url": url, "text": g.text})
            for i, (tag, btext) in enumerate(g.blocks):
                s_rows.append(
                    {
                        "url": url,
                        "seg_id": i,
                        "tag": tag,
                        "cls": _golden_cls(tag, btext),
                        "text": btext,
                    }
                )
            for subj, pred, obj in g.facts:
                tr_set.add((url, subj, pred, obj))
                s_link = sidx.get(subj)
                o_link = sidx.get(obj)
                if s_link:
                    mention_counts[s_link[0]] = mention_counts.get(s_link[0], 0) + 1
                if o_link:
                    mention_counts[o_link[0]] = mention_counts.get(o_link[0], 0) + 1
                if s_link and o_link:
                    lt_set.add((url, s_link[0], pred, o_link[0]))

    return {
        "text": pa.Table.from_pylist(t_rows) if t_rows else pa.table({"url": [], "text": []}),
        "segments": pa.Table.from_pylist(s_rows),
        "triples": pa.Table.from_pylist(
            [{"url": u, "subj": s, "pred": p, "obj": o} for u, s, p, o in sorted(tr_set)]
        ),
        "linked_triples": pa.Table.from_pylist(
            [{"url": u, "subj_id": s, "pred": p, "obj_id": o} for u, s, p, o in sorted(lt_set)]
        ),
        "mention_counts": pa.Table.from_pylist(
            [{"canonical_id": k, "n_mentions": v} for k, v in sorted(mention_counts.items())]
        ),
        "kb": kb,
    }


_CAPTION_TABLE = re.compile(r"^(table|tbl|tab)\.? ?[0-9]", re.I)
_CAPTION_FIGURE = re.compile(r"^(figure|fig|scheme|plate)\.? ?[0-9]", re.I)


def _golden_cls(tag: str, text: str) -> str:
    """The class the classifier+rules stack must emit (reference analog:
    detect -> xgboost postprocess -> rules postprocess,
    `postprocess/pp_rules.py:7-35`)."""
    if tag == "p":
        if _CAPTION_TABLE.match(text):
            return "Table Caption"
        if _CAPTION_FIGURE.match(text):
            return "Figure Caption"
        return "Body Text"
    return {
        "h1": "Title",
        "h2": "Section Header",
        "li": "List Item",
        "td": "Table",
        "pre": "Equation",
    }.get(tag, "Other")


def write_pages_parquet(
    documents_path: str,
    out_path: str,
    seed: int = DEFAULT_SEED,
    repeat: int = 1,
    inject_faults: bool = True,
) -> str:
    """Materialize a pages parquet from a driver documents parquet (used
    by bench.py; generation is not part of the timed pipeline)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(documents_path)
    table = generate_pages_table(docs, seed=seed, repeat=repeat, inject_faults=inject_faults)
    pq.write_table(table, out_path)
    return out_path
