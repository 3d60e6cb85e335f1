"""HTML -> text extraction: the byte-identical-per-url contract.

Reference analog: the pdfminer text-layer parse + ftfy normalization
(Cosmos `ingest/utils/pdf_extractor.py:26-84`,
`ingest/utils/normalize_text.py:19-28`, applied at `ingest/ingest.py:178-179`).
This function is FROZEN by golden fixtures (tests/test_extract.py) — the
north rule requires every url's extracted text to be byte-identical run
over run; never change its behavior without regenerating fixtures.

Design notes (100 TB posture):
- Stateless ``map_batches`` over zero-copy Arrow batches; the parser is a
  module-level singleton per worker process (re-used, reset per row).
- The stage emits BOTH the joined document text and the block list as a
  nested ``list<struct<tag,text>>`` column, so segmentation never
  re-parses html and the expensive ``html`` binary column is dropped
  here, at the earliest possible stage (SURVEY.md §7 hard part (e)).
- Malformed rows (undecodable bytes, parser blowups) become dead-letter
  rows via the ``error`` column instead of killing the task (reference
  analog: per-PDF error skipping, `ingest/ingest.py:262-272`).
"""

from __future__ import annotations

import unicodedata
from html.parser import HTMLParser

import pyarrow as pa

import ray.data

# Block-level elements whose text content becomes one extracted block, in
# document order. Everything inside <script>/<style>/<nav>/<footer> and
# comments is dropped.
_BLOCK_TAGS = frozenset(
    {"h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "td", "th",
     "figcaption", "caption", "blockquote", "pre"}
)
# NOTE: "title" is intentionally a skip tag (head metadata, not body text);
# the skip check runs first in handle_starttag, so it must never also be a
# block tag — the frozen extraction contract has one source of truth here.
_SKIP_TAGS = frozenset({"script", "style", "nav", "footer", "head", "title"})

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.string()),
        ("blocks", pa.list_(pa.struct([("tag", pa.string()), ("text", pa.string())]))),
        ("n_blocks", pa.int32()),
        ("error", pa.string()),
    ]
)


class _BlockParser(HTMLParser):
    """Collect (tag, normalized_text) for block-level elements in document
    order; lenient with malformed nesting (stdlib HTMLParser never raises
    on bad markup)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str]] = []
        self._stack: list[str] = []
        self._skip_depth = 0
        self._buf: list[str] | None = None
        self._buf_tag: str | None = None

    def reset_state(self) -> None:
        self.reset()
        self.blocks.clear()
        self._stack.clear()
        self._skip_depth = 0
        self._buf = None
        self._buf_tag = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS and self._skip_depth == 0:
            self._flush()
            self._buf = []
            self._buf_tag = tag

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS and tag == self._buf_tag:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._buf is not None and self._skip_depth == 0:
            self._buf.append(data)

    def _flush(self) -> None:
        if self._buf is not None and self._buf_tag is not None:
            text = normalize_text("".join(self._buf))
            if text:
                self.blocks.append((self._buf_tag, text))
        self._buf = None
        self._buf_tag = None

    def close(self) -> None:
        super().close()
        self._flush()


def normalize_text(s: str) -> str:
    """The frozen normalization contract: NFC unicode normalization +
    whitespace collapse (reference analog: `ftfy.fix_text`,
    `normalize_text.py:19-28` — ftfy is not in this container; NFC covers
    the deterministic subset our corpus exercises)."""
    return " ".join(unicodedata.normalize("NFC", s).split())


_PARSER: _BlockParser | None = None


def parse_html_blocks(raw: bytes) -> list[tuple[str, str]]:
    """bytes -> [(tag, text)] in document order. Raises on undecodable
    bytes (caller routes to dead letter)."""
    global _PARSER
    if _PARSER is None:
        _PARSER = _BlockParser()
    p = _PARSER
    p.reset_state()
    p.feed(raw.decode("utf-8"))  # strict: invalid UTF-8 -> UnicodeDecodeError
    p.close()
    return list(p.blocks)


def extract_batch(batch: pa.Table) -> pa.Table:
    """PAGES batch -> EXTRACTED batch. The parse is necessarily per-row
    (HTML is a row-wise payload); column assembly builds the nested
    blocks column FLAT (offsets + struct-of-arrays) — no per-block python
    dicts, which at scale were the chain's dominant allocation source."""
    htmls = batch.column("html").to_pylist()
    n = len(htmls)
    texts: list[str] = [""] * n
    n_blocks = [0] * n
    errors: list[str | None] = [None] * n
    flat_tags: list[str] = []
    flat_texts: list[str] = []
    offsets = [0]
    for i in range(n):
        try:
            blocks = parse_html_blocks(htmls[i])
            texts[i] = "\n".join(t for _, t in blocks)
            for tg, t in blocks:
                flat_tags.append(tg)
                flat_texts.append(t)
            n_blocks[i] = len(blocks)
        except Exception as e:  # malformed row -> dead letter, keep going
            errors[i] = f"{type(e).__name__}: {e}"
        offsets.append(len(flat_tags))
    struct = pa.StructArray.from_arrays(
        [pa.array(flat_tags, pa.string()), pa.array(flat_texts, pa.string())],
        ["tag", "text"],
    )
    blocks_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "text": pa.array(texts, pa.string()),
            "blocks": blocks_arr,
            "n_blocks": pa.array(n_blocks, pa.int32()),
            "error": pa.array(errors, pa.string()),
        },
        schema=EXTRACTED_SCHEMA,
    )


def extract(pages: "ray.data.Dataset", batch_size: int = 256) -> "ray.data.Dataset":
    """The extraction stage. Small batch_size because rows carry the wide
    ``html`` binary column; the output drops it."""
    return pages.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)


class _LinkParser(HTMLParser):
    """Collect (href, normalized anchor text) for <a href=...> elements
    in document order — the hyperlink analog of `_BlockParser` (the web
    substrate's link graph is what the reference's cross-document entity
    index is to PDFs). Anchors inside skip regions (script/nav/...) are
    ignored; an anchor implicitly closes at the next block boundary or
    at a nested <a> (HTML5 recovery), so malformed nesting never leaks
    text across links; href-less <a> elements are skipped."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._skip_depth = 0
        self._href: str | None = None
        self._buf: list[str] = []

    def reset_state(self) -> None:
        self.reset()
        self.links.clear()
        self._skip_depth = 0
        self._href = None
        self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._flush()
            href = next((v for k, v in attrs if k == "href"), None)
            if href:
                self._href = href
                self._buf = []
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a" or tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None and self._skip_depth == 0:
            self._buf.append(data)

    def _flush(self) -> None:
        if self._href is not None:
            self.links.append((self._href, normalize_text("".join(self._buf))))
        self._href = None
        self._buf = []

    def close(self) -> None:
        super().close()
        self._flush()


_LINK_PARSER: _LinkParser | None = None


def parse_html_links(raw: bytes) -> list[tuple[str, str]]:
    """bytes -> [(href, anchor_text)] in document order. Raises on
    undecodable bytes (same dead-letter contract as the block parse)."""
    global _LINK_PARSER
    if _LINK_PARSER is None:
        _LINK_PARSER = _LinkParser()
    p = _LINK_PARSER
    p.reset_state()
    p.feed(raw.decode("utf-8"))
    p.close()
    return list(p.links)


def links_batch(batch: pa.Table) -> pa.Table:
    """PAGES batch -> (url, link_idx, href, anchor) outlink rows.
    Undecodable rows contribute no links (the extract dead-letter path
    owns their reporting); hrefs are emitted raw (no resolution —
    relative-url joining is a policy choice left to consumers)."""
    htmls = batch.column("html").to_pylist()
    urls = batch.column("url").to_pylist()
    out_url: list[str] = []
    out_idx: list[int] = []
    out_href: list[str] = []
    out_anchor: list[str] = []
    for u, h in zip(urls, htmls):
        try:
            links = parse_html_links(h)
        except Exception:
            continue
        for i, (href, anchor) in enumerate(links):
            out_url.append(u)
            out_idx.append(i)
            out_href.append(href)
            out_anchor.append(anchor)
    return pa.table({
        "url": pa.array(out_url, pa.string()),
        "link_idx": pa.array(out_idx, pa.int32()),
        "href": pa.array(out_href, pa.string()),
        "anchor": pa.array(out_anchor, pa.string()),
    })


def extract_links(pages: "ray.data.Dataset", batch_size: int = 256) -> "ray.data.Dataset":
    """Outlink extraction stage (same wide-row batch sizing as
    `extract`). Stale same-url duplicates in the input produce duplicate
    rows; callers wanting one crawl per url dedup downstream (the link
    tuple is identical by construction, so a distinct groupby is
    exact)."""
    return pages.map_batches(links_batch, batch_format="pyarrow",
                             batch_size=batch_size)


def split_dead_letter(extracted: "ray.data.Dataset"):
    """-> (ok_ds, dead_ds). Both remain lazy; the predicate is a
    vectorized Arrow filter."""
    import pyarrow.compute as pc

    ok = extracted.map_batches(
        lambda t: t.filter(pc.is_null(t.column("error"))), batch_format="pyarrow"
    )

    def to_dead(t: pa.Table) -> pa.Table:
        bad = t.filter(pc.is_valid(t.column("error")))
        return pa.table(
            {
                "url": bad.column("url"),
                "stage": pa.array(["extract"] * bad.num_rows, pa.string()),
                "error": bad.column("error"),
            }
        )

    return ok, extracted.map_batches(to_dead, batch_format="pyarrow")


def _batch_local_latest(t: pa.Table) -> pa.Table:
    """Keep only the max-ts row per url within one table — vectorized
    Arrow sort + numpy adjacent-duplicate mask. Used both as the
    pre-shuffle combiner and as the in-bucket reducer of keep_latest.

    Rows TIED at the max ts pick the min-content-hash winner:
    ``content_md5`` when such a column exists (the exact seam — carry a
    hash of the original bytes if both paths must agree
    post-extraction), else md5 of ``html`` when present, else of the
    extracted ``text`` (keep_latest runs post-extraction where html is
    already dropped). Deterministic regardless of arrival order. NOTE:
    the text-based fallback coincides with ``resolve_tied``'s
    min-md5(html) rule only PRE-extraction or when tied rows are
    byte-identical in html; tied rows with differing html that extract
    to differing text may pick a different (still deterministic)
    winner than the metadata-dup-plan path. The flagship pipelines
    never mix the two paths on the same input, so the divergence is
    per-path determinism, not nondeterminism. The hash is computed
    ONLY for tied rows."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return t
    order = pc.sort_indices(
        t, sort_keys=[("url", "ascending"), ("warc_ts", "descending")]
    )
    sorted_t = t.take(order)
    urls = np.asarray(sorted_t.column("url").to_pylist(), dtype=object)
    first = np.ones(len(urls), dtype=bool)
    first[1:] = urls[1:] != urls[:-1]
    tss = sorted_t.column("warc_ts").cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    # rows tying the head of their url group (sorted ts-desc => ties
    # with the head are contiguous right after it)
    idx = np.arange(len(urls))
    head = np.maximum.accumulate(np.where(first, idx, 0))
    tied = (~first) & (tss == tss[head])
    if not tied.any():
        return sorted_t.filter(pa.array(first))
    keep = first.copy()
    names = sorted_t.column_names
    col = ("content_md5" if "content_md5" in names
           else "html" if "html" in names else "text")
    # materialize ONLY the contending rows' payloads (heads of tied
    # groups + their tied followers), not the whole column
    contend = np.flatnonzero(tied | np.isin(idx, head[tied]))
    vals = dict(zip(
        contend.tolist(),
        sorted_t.column(col).take(pa.array(contend)).to_pylist()))

    def h(i: int) -> str:
        v = vals[i]
        if col == "content_md5":  # already a hash — order by its value
            return v or ""
        b = v if isinstance(v, bytes) else (v or "").encode()
        return hashlib.md5(b).hexdigest()

    for hstart in np.unique(head[tied]):
        group = [int(hstart)] + list(idx[(head == hstart) & tied])
        winner = min(group, key=lambda i: (h(i), i))
        keep[group] = False
        keep[winner] = True
    return sorted_t.filter(pa.array(keep))


def _reduce_dup_partials(t: pa.Table) -> pa.Table:
    """Reduce (url, max_ts, n, n_at_max) partials to one row per url:
    the GLOBAL max_ts, total row count, and how many rows sit AT that
    global max (>1 means the url is tied and needs exact resolution).
    Vectorized: sort by (url, max_ts desc) then segment reductions."""
    import numpy as np
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return pa.table(
            {"url": pa.array([], pa.string()),
             "max_ts": pa.array([], t.column("max_ts").type),
             "n": pa.array([], pa.int64()),
             "n_at_max": pa.array([], pa.int64())})
    order = pc.sort_indices(
        t, sort_keys=[("url", "ascending"), ("max_ts", "descending")])
    s = t.take(order)
    urls = np.asarray(s.column("url").to_pylist(), dtype=object)
    first = np.ones(len(urls), dtype=bool)
    first[1:] = urls[1:] != urls[:-1]
    idx = np.flatnonzero(first)
    tss = s.column("max_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    n = s.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    n_at = s.column("n_at_max").to_numpy(zero_copy_only=False).astype(np.int64)
    seg = np.cumsum(first) - 1
    gmax = tss[idx]  # segment head = per-url global max (sorted desc)
    at_global = tss == gmax[seg]
    return pa.table({
        "url": pa.array(urls[idx], pa.string()),
        "max_ts": s.column("max_ts").take(pa.array(idx)),
        "n": pa.array(np.add.reduceat(n, idx), pa.int64()),
        "n_at_max": pa.array(
            np.add.reduceat(np.where(at_global, n_at, 0), idx), pa.int64()),
    })


def discover_dup_urls(pages: "ray.data.Dataset", cap: int = 2_000_000):
    """Metadata-only duplicate discovery: shuffle ONLY (url, warc_ts) —
    pruned at the read for parquet sources — and return a broadcast plan
    ``{"ts": {url: max_warc_ts}, "tied": frozenset(urls)}`` covering just
    the urls that appear more than once; ``tied`` is the subset with MORE
    THAN ONE row at the max ts (needs ``resolve_tied`` for an exact,
    partition-independent winner).

    Rationale (100 TB): duplicate crawls of a url are a small fraction of
    rows; a full keep-latest shuffle moves every payload byte, while this
    plan moves two tiny columns and then filters losers BEFORE the html
    is ever parsed. Falls back to the full-shuffle path (``keep_latest``)
    if the dup-url set exceeds ``cap`` (degenerate corpus)."""
    import numpy as np

    import ray

    import pyarrow.compute as pc

    meta = pages.select_columns(["url", "warc_ts"])

    def partial(t: pa.Table) -> pa.Table:
        # per-batch (url, ts) counts reshaped into the partial schema,
        # then the SAME segment reducer that merges partials globally
        # (one vectorized-groupby implementation, not two)
        g = t.group_by(["url", "warc_ts"]).aggregate([([], "count_all")])
        cnt = g.column("count_all").cast(pa.int64())
        return _reduce_dup_partials(pa.table({
            "url": g.column("url"),
            "max_ts": g.column("warc_ts"),
            "n": cnt,
            "n_at_max": cnt,
        }))

    # one parallel pass emits per-batch (url, max_ts, n) partials; the
    # final reduce streams to the driver (bounded by unique urls in the
    # partition — the partitioned runner keeps that small). Beyond
    # ``driver_cap`` partial rows we fall back to the distributed
    # bucketed exchange. For unique-url corpora partials ~= rows, so the
    # cap is deliberately modest — past it the distributed reduce costs
    # about the same and the driver never becomes the bottleneck.
    driver_cap = 5_000_000
    batches: list[pa.Table] = []
    total = 0
    overflow = False
    part_ds = meta.map_batches(partial, batch_format="pyarrow")
    for b in part_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        batches.append(b)
        total += b.num_rows
        if total > driver_cap:
            overflow = True
            break
    if overflow:
        from cosmos_ray.stages.canonicalize import _add_bucket

        bucketed = part_ds.map_batches(
            lambda t: _add_bucket(t, ["url"], 64), batch_format="pyarrow"
        ).repartition(32)
        agg = bucketed.groupby("__bucket").map_groups(
            lambda t: _reduce_dup_partials(t.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
        dup_rows = agg.map_batches(
            lambda t: t.filter(pc.greater(t.column("n"), pa.scalar(1))),
            batch_format="pyarrow",
        ).take_all()
    else:
        full = pa.concat_tables(batches) if batches else None
        if full is None or full.num_rows == 0:
            return ray.put({"ts": {}, "tied": frozenset()})
        g = _reduce_dup_partials(full)
        dup_rows = g.filter(pc.greater(g.column("n"), pa.scalar(1))).to_pylist()
    if len(dup_rows) > cap:
        return None  # caller should use the full-shuffle keep_latest
    dups = {r["url"]: r["max_ts"] for r in dup_rows}
    tied = frozenset(r["url"] for r in dup_rows if r["n_at_max"] > 1)
    return ray.put({"ts": dups, "tied": tied})


def resolve_tied(pages: "ray.data.Dataset", dup_ref, col: str = "html"):
    """Exact winners for urls TIED at their max warc_ts: one row per tied
    url, picked by min md5 of ``col`` (``html`` pre-extraction; pass
    ``text`` for post-extraction rows — the same fallback rule as
    ``_batch_local_latest``; stable-first among byte-identical rows)
    inside a single ``map_groups`` group — deterministic regardless
    of batch or partition boundaries. Returns None when the plan has no
    ties. Only the tied rows flow past the filter; when the source is
    parquet, pass a predicate-pushdown read (url ∈ tied) as ``pages`` so
    the scan itself is pruned."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    import ray

    plan = ray.get(dup_ref)
    if not plan["tied"]:
        return None

    def only_tied(t: pa.Table) -> pa.Table:
        p = ray.get(dup_ref)
        tied, ts_map = p["tied"], p["ts"]
        urls = t.column("url").to_pylist()
        tss = t.column("warc_ts").cast(pa.int64()).to_pylist()
        keep = [u in tied and ts == _ts_us(ts_map[u])
                for u, ts in zip(urls, tss)]
        return t.filter(pa.array(keep))

    def pick(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(
                (x if isinstance(x, bytes) else (x or "").encode())
                if x is not None else b"").hexdigest()
             for x in t.column(col).to_pylist()]
        tt = t.append_column("__h", pa.array(h, pa.string()))
        order = pc.sort_indices(
            tt, sort_keys=[("url", "ascending"), ("__h", "ascending")])
        s = tt.take(order)
        urls = np.asarray(s.column("url").to_pylist(), dtype=object)
        first = np.ones(len(urls), dtype=bool)
        first[1:] = urls[1:] != urls[:-1]
        return s.filter(pa.array(first)).drop_columns(["__h"])

    cand = pages.map_batches(only_tied, batch_format="pyarrow")
    return cand.groupby("url").map_groups(pick, batch_format="pyarrow")


def keep_latest_planned(extracted: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact keep-latest over POST-EXTRACTION rows via the metadata dup
    plan: the same winners as ``keep_latest`` (min-md5(text) among
    max-ts ties, the `_batch_local_latest` fallback rule) for the cost
    of one (url, warc_ts) metadata pass plus batch-local filters —
    instead of keep_latest's full payload exchange. Ties cost one extra
    filtered scan only when they exist. Falls back to ``keep_latest``
    when the duplicate-url set exceeds the broadcast cap (degenerate
    corpus). Intended for the checkpointing/query path where
    ``extracted`` is already materialized (the streaming path dedups
    BEFORE extraction via ``dedup_latest_pages``)."""
    dup_ref = discover_dup_urls(extracted)
    if dup_ref is None:
        return keep_latest(extracted)
    cleaned = drop_stale(extracted, dup_ref, tied="exclude")
    winners = resolve_tied(extracted, dup_ref, col="text")
    return cleaned if winners is None else cleaned.union(winners)


def dedup_latest_pages(pages: "ray.data.Dataset", dup_ref) -> "ray.data.Dataset":
    """Exact keep-latest-per-url over ``pages`` given a dup plan:
    non-tied losers are filtered batch-locally (``drop_stale``); tied
    urls — a rare metadata edge — get an exact, deterministic winner via
    ``resolve_tied`` (costs one extra filtered scan ONLY when ties
    exist). Output: at most one row per url, independent of partitioning."""
    cleaned = drop_stale(pages, dup_ref, tied="exclude")
    winners = resolve_tied(pages, dup_ref)
    return cleaned if winners is None else cleaned.union(winners)


def drop_stale(pages: "ray.data.Dataset", dup_ref, tied: str = "first") -> "ray.data.Dataset":
    """Filter duplicate-crawl losers using the broadcast dup plan — runs
    BEFORE extraction so stale html is never parsed. Rows tied at the
    max warc_ts follow ``tied``: ``"first"`` keeps the first occurrence
    within a batch (legacy; exact only when a url's ties share a batch),
    ``"exclude"`` drops ALL tied-url rows so the caller resolves them
    exactly via ``resolve_tied`` (see ``dedup_latest_pages``)."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        plan = ray.get(dup_ref)
        dups, tied_set = plan["ts"], plan["tied"]
        if not dups:
            return t
        urls = t.column("url").to_pylist()
        tss = t.column("warc_ts").cast(pa.int64()).to_pylist()
        keep = []
        seen: set = set()
        for u, ts in zip(urls, tss):
            if u not in dups:
                keep.append(True)
            elif u in tied_set:
                keep.append(
                    tied == "first" and ts == _ts_us(dups[u]) and u not in seen
                )
                if keep[-1]:
                    seen.add(u)
            elif ts == _ts_us(dups[u]) and u not in seen:
                seen.add(u)
                keep.append(True)
            else:
                keep.append(False)
        return t.filter(pa.array(keep))

    return pages.map_batches(fn, batch_format="pyarrow")


def _ts_us(ts) -> int:
    """Normalize a timestamp scalar (pandas/py datetime/pa scalar) to
    int64 microseconds."""
    if isinstance(ts, int):
        return ts
    if hasattr(ts, "value"):  # pandas.Timestamp (ns)
        return ts.value // 1000
    import datetime

    if isinstance(ts, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1)
        return int((ts - epoch).total_seconds() * 1_000_000)
    raise TypeError(type(ts))


def extract_streaming(pages: "ray.data.Dataset", dead_dir: str, batch_size: int = 256):
    """Extraction emitting only OK rows; malformed rows are side-written
    as tiny parquet shards under ``dead_dir`` (reference analog:
    failed-PDF logging, `ingest/ingest.py:262-272`).

    Side-output design: each shard's filename is the hash of the urls it
    contains, and the write is atomic (tmp + rename) — re-execution of a
    task rewrites the identical file, so the dead-letter table is exact
    under Ray's lineage re-execution and task retries. (An actor-based
    collector was tried first and is flaky under full load: concurrent
    callers can trip 30 s actor seq_no timeouts.) Use a fresh dead_dir
    per run. On a multi-node cluster ``dead_dir`` MUST be shared storage
    (NFS/fuse mount) visible to every worker AND the driver — the
    content-keyed + atomic-rename scheme needs no coordination beyond a
    posix rename, but a node-local path would scatter the shards."""
    import hashlib
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cosmos_ray.core import schemas

    os.makedirs(dead_dir, exist_ok=True)

    def fn(t: pa.Table) -> pa.Table:
        out = extract_batch(t)
        bad_mask = pc.is_valid(out.column("error"))
        if pc.any(bad_mask).as_py():
            bad = out.filter(bad_mask)
            urls = bad.column("url").to_pylist()
            tbl = pa.table(
                {
                    "url": bad.column("url"),
                    "stage": pa.array(["extract"] * bad.num_rows, pa.string()),
                    "error": bad.column("error"),
                },
                schema=schemas.DEAD_LETTER,
            )
            key = hashlib.md5("|".join(sorted(urls)).encode()).hexdigest()[:16]
            final = os.path.join(dead_dir, f"dead_{key}.parquet")
            tmp = final + f".tmp{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, final)  # atomic; identical content on re-run
        return out.filter(pc.is_null(out.column("error")))

    return pages.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def keep_latest(extracted: "ray.data.Dataset", num_buckets: int = 256) -> "ray.data.Dataset":
    """Keep-latest-per-url dedup (SURVEY.md §2.10: groupby(url) -> max by
    warc_ts). Runs AFTER extraction so the shuffle never moves the raw
    ``html`` bytes — post-extract rows are ~10x smaller.

    Shape: batch-local combiner, then a shuffle on a COARSE url-hash
    bucket (num_buckets groups) with a fully vectorized in-bucket reduce —
    per-group python overhead would be ruinous at one group per url."""
    import numpy as np
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t.column("url").to_pylist(), dtype=object))
        return t.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64))
        )

    def reduce_bucket(t: pa.Table) -> pa.Table:
        return _batch_local_latest(t.drop_columns(["__bucket"]))

    pre = extracted.map_batches(_batch_local_latest, batch_format="pyarrow")
    bucketed = pre.map_batches(add_bucket, batch_format="pyarrow")
    # no repartition before the groupby: groupby is itself the exchange,
    # and a second repartition doubled the shuffle fixed cost
    return bucketed.groupby("__bucket").map_groups(reduce_bucket, batch_format="pyarrow")
