"""WARC source: ingest Common-Crawl-style WARC dumps straight into the
pages schema (url, warc_ts, html, text, lang) — the crawl-interchange
format (ISO 28500 / WARC 1.0) the reference-scale corpora actually ship
as, so a user can point the KG pipeline at raw `*.warc` shards instead
of pre-converted parquet.

Scale shape: WARC has no record index inside a file, so the FILE is the
parallelism unit — `read_binary_files` fans one task per shard and the
parser is a flat_map (1 file -> N response records). Crawl dumps are
written as many ~1 GiB shards precisely so this layout parallelizes;
re-shard upstream if handed one giant file. Parsing is sequential
byte-slicing per record (Content-Length driven — never a regex over
the whole payload); malformed records are skipped, not raised, matching
the extract stage's dead-letter posture (the extractor downstream
quarantines undecodable html itself).

Writer (`write_warc_shard`) exists for round-trip gates and for
publishing: records are response-type with an HTTP/1.1 envelope, the
layout real WARC consumers (warcio etc.) expect.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

from cosmos_ray.core import schemas

_CRLF = b"\r\n"


def _fmt_ts(ts_us: int) -> str:
    t = _dt.datetime.fromtimestamp(ts_us / 1e6, tz=_dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_ts(s: str) -> int:
    t = _dt.datetime.strptime(s.strip(), "%Y-%m-%dT%H:%M:%SZ")
    return int(t.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)


def write_warc_shard(url_ts_html: list[tuple[str, int, bytes]]) -> bytes:
    """Serialize (url, warc_ts_us, html) records into one WARC shard's
    bytes (response records with an HTTP/1.1 envelope)."""
    out = []
    for url, ts_us, html in url_ts_html:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html)
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {_fmt_ts(ts_us)}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + _CRLF
        )
        out.append(hdr + http + _CRLF + _CRLF)
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Sequential WARC record walk -> [{url, warc_ts_us, html}] for the
    response records; anything malformed or non-response is skipped."""
    rows = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("latin-1").strip().lower()] = \
                    v.decode("latin-1").strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        payload = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        if not url or not date:
            continue
        try:
            ts_us = _parse_ts(date)
        except ValueError:
            continue
        # strip the HTTP envelope: body starts after its header block
        body_at = payload.find(b"\r\n\r\n")
        if body_at >= 0:
            body = payload[body_at + 4:]
            if _is_chunked(payload[:body_at]):
                body = _dechunk(body)
        else:
            body = payload
        rows.append({"url": url, "warc_ts_us": ts_us, "html": body})
    return rows


def _is_chunked(http_hdr: bytes) -> bool:
    """True when the HTTP header block declares chunked transfer
    coding.  Parses header LINES (name ':' value, both sides
    whitespace-stripped, case-insensitive) rather than matching one
    fixed spacing — real captures carry 'Transfer-Encoding:chunked'
    and padded variants too.  Per RFC 7230 the coding list is
    comma-separated with chunked last; any 'chunked' member means the
    framing bytes are present."""
    for line in http_hdr.split(_CRLF):
        k, sep, v = line.partition(b":")
        if sep and k.strip().lower() == b"transfer-encoding":
            if any(tok.strip().lower() == b"chunked"
                   for tok in v.split(b",")):
                return True
    return False


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked body (real crawls store responses
    as-captured, chunk framing included). Malformed framing returns
    the remaining bytes as-is — the extract stage's dead-letter path
    owns undecodable html."""
    out = []
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            out.append(body[pos:])
            break
        size_tok = body[pos:nl].split(b";")[0].strip()
        try:
            n = int(size_tok, 16)
        except ValueError:
            out.append(body[pos:])
            break
        if n == 0:
            break
        out.append(body[nl + 2:nl + 2 + n])
        pos = nl + 2 + n + 2  # skip chunk payload + trailing CRLF
    return b"".join(out)


def read_warc_pages(paths: str | list[str]):
    """Distributed WARC read -> pages-schema Dataset. One task per
    shard file (see module docstring for why)."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def explode(batch: pa.Table) -> pa.Table:
        import gzip

        urls, tss, htmls = [], [], []
        for blob in batch.column("bytes").to_pylist():
            if blob[:2] == b"\x1f\x8b":  # .warc.gz shard (the Common
                # Crawl shipping format); member-concatenated gzip
                # decompresses transparently with stdlib gzip
                blob = gzip.decompress(blob)
            for r in parse_warc_bytes(blob):
                urls.append(r["url"])
                tss.append(r["warc_ts_us"])
                htmls.append(r["html"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array([""] * len(urls), pa.string()),
            },
            schema=schemas.PAGES,
        )

    return files.map_batches(explode, batch_format="pyarrow",
                             batch_size=None)


# ------------------------------------------------------------- revisits

def write_warc_revisit(url: str, ts_us: int, refers_to_url: str,
                       refers_to_ts_us: int, digest: str) -> bytes:
    """Serialize one WARC 1.0 `revisit` record (identical-payload-digest
    profile): the crawler's own statement that this fetch matched an
    earlier capture byte-for-byte."""
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: revisit\r\n"
        b"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
        b"identical-payload-digest\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {_fmt_ts(ts_us)}\r\n".encode()
        + f"WARC-Refers-To-Target-URI: {refers_to_url}\r\n".encode()
        + f"WARC-Refers-To-Date: {_fmt_ts(refers_to_ts_us)}\r\n".encode()
        + f"WARC-Payload-Digest: {digest}\r\n".encode()
        + b"Content-Length: 0\r\n"
        + _CRLF
    )
    return hdr + _CRLF + _CRLF


def parse_warc_revisits(data: bytes) -> list[dict]:
    """Sequential walk -> the `revisit` records: (url, warc_ts_us,
    refers_to_url, refers_to_ts_us, digest). Same skip-malformed
    posture as `parse_warc_bytes`."""
    rows = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("latin-1").strip().lower()] = \
                    v.decode("latin-1").strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "revisit":
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        ref_url = headers.get("warc-refers-to-target-uri")
        ref_date = headers.get("warc-refers-to-date")
        if not url or not date:
            continue
        try:
            ts_us = _parse_ts(date)
            ref_ts = _parse_ts(ref_date) if ref_date else None
        except ValueError:
            continue
        rows.append({
            "url": url, "warc_ts_us": ts_us,
            "refers_to_url": ref_url, "refers_to_ts_us": ref_ts,
            "digest": headers.get("warc-payload-digest"),
        })
    return rows


def read_warc_revisits(paths: str | list[str]):
    """Distributed read of the `revisit` records — the crawl's own
    duplicate declarations. Feed these to crawl-diff / dedup accounting
    (a revisit means the url re-fetched IDENTICAL content: it renews the
    capture's timestamp without shipping payload bytes — exactly the
    metadata row the keep-latest dup plan wants). One task per shard."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def explode(batch: pa.Table) -> pa.Table:
        import gzip

        cols: dict[str, list] = {k: [] for k in (
            "url", "warc_ts_us", "refers_to_url", "refers_to_ts_us",
            "digest")}
        for blob in batch.column("bytes").to_pylist():
            if blob[:2] == b"\x1f\x8b":
                blob = gzip.decompress(blob)
            for r in parse_warc_revisits(blob):
                for k in cols:
                    cols[k].append(r[k])
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts_us"], pa.timestamp("us")),
            "refers_to_url": pa.array(cols["refers_to_url"], pa.string()),
            "refers_to_ts": pa.array(cols["refers_to_ts_us"],
                                     pa.timestamp("us")),
            "digest": pa.array(cols["digest"], pa.string()),
        })

    return files.map_batches(explode, batch_format="pyarrow",
                             batch_size=None)


def discover_revisit_winners(revisits, cap: int = 2_000_000):
    """Metadata plan from the crawl's own duplicate declarations: per
    url, the LATEST revisit record (max ``warc_ts``; ties -> max
    ``(refers_to_ts, refers_to_url)``) as a broadcast map
    ``{url: (rev_ts_us, refers_to_url, refers_to_ts_us)}``.

    Scale shape: revisit records can be a large fraction of a crawl, but
    they are METADATA rows (no payload) — each batch reduces to one row
    per url before anything moves, and the partial fold streams to the
    driver under ``cap`` distinct revisited urls (past it, returns None
    and the caller falls back to payload-side keep-latest; the dup-plan
    overflow tier in `extract.discover_dup_urls` shows the distributed
    shape to add if a corpus ever exceeds it)."""
    import ray

    from cosmos_ray.stages.extract import _ts_us

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "url": t.column("url").to_pylist(),
            "ts": [_ts_us(x) for x in t.column("warc_ts").to_pylist()],
            "ru": t.column("refers_to_url").to_pylist(),
            "rt": [_ts_us(x) for x in t.column("refers_to_ts").to_pylist()],
        })
        df = df.sort_values(["url", "ts", "rt", "ru"]).drop_duplicates(
            "url", keep="last")
        return pa.Table.from_pandas(df, preserve_index=False)

    best: dict[str, tuple[int, str, int]] = {}
    n = 0
    for b in (revisits.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        for r in b.to_pylist():
            cur = best.get(r["url"])
            cand = (r["ts"], r["rt"], r["ru"])
            if cur is None or cand > (cur[0], cur[2], cur[1]):
                best[r["url"]] = (r["ts"], r["ru"], r["rt"])
        n = len(best)
        if n > cap:
            return None
    return ray.put(best)


def effective_latest_pages(pages, revisits):
    """Keep-latest-per-url honoring WARC ``revisit`` records — the
    crawl's own duplicate declarations folded into the dedup decision:
    a revisit at t3 declaring "identical to the capture at t1" RENEWS
    the t1 content, so a url whose latest capture is a revisit keeps
    the REFERRED response row (not the max-ts response), with
    ``effective_ts`` = the renewing revisit's timestamp. Urls without a
    winning revisit keep plain keep-latest semantics (max warc_ts, ties
    by min md5(html) — `extract.dedup_latest_pages`).

    Declared edge: a revisit whose referred capture is absent from the
    response set drops its url from the effective view — the latest
    capture asserts content this shard set does not carry.

    Shape: two metadata-only plans (responses' (url, warc_ts) and the
    reduced revisit map) + batch-local filters; referred rows resolve
    through `resolve_tied`'s exact min-md5 pick, so multiple rows at
    the referred timestamp stay deterministic. Payload bytes never
    enter an exchange."""
    import ray

    from cosmos_ray.stages import extract as ex

    rev_ref = discover_revisit_winners(revisits)
    dup_ref = ex.discover_dup_urls(pages)
    if rev_ref is None or dup_ref is None:
        # degenerate corpus: fall back to the payload-side exact path
        return ex.keep_latest(pages) if dup_ref is None else \
            ex.dedup_latest_pages(pages, dup_ref)
    rev = ray.get(rev_ref)
    plan = ray.get(dup_ref)
    ts_map = dict(plan["ts"])
    tied = set(plan["tied"])
    # response max-ts for exactly the revisited urls (the dup plan only
    # covers urls with >1 response row; a single-response url still
    # needs its ts to reject STALE revisits). Metadata-only, pruned to
    # the revisited-url set, per-batch partial max + driver fold.
    rev_urls_ref = ray.put(pa.array(sorted(rev), pa.string()))

    def resp_max_partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        tt = t.filter(pc.is_in(t.column("url"),
                               value_set=ray.get(rev_urls_ref)))
        if tt.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "mx": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "url": tt.column("url").to_pylist(),
            "mx": [ex._ts_us(x) for x in tt.column("warc_ts").to_pylist()]})
        g = df.groupby("url", as_index=False)["mx"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    resp_max: dict[str, int] = {}
    for b in (pages.select_columns(["url", "warc_ts"])
              .map_batches(resp_max_partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        for r in b.to_pylist():
            if r["mx"] > resp_max.get(r["url"], -1):
                resp_max[r["url"]] = r["mx"]

    eff_ts: dict[str, int] = {}
    for url, (rts, r_url, r_ts) in rev.items():
        base_max = resp_max.get(url)
        if base_max is None:
            continue  # no response rows at all for this url
        if rts <= base_max:
            continue  # a newer RESPONSE exists; the revisit is stale
        if r_url != url:
            # cross-url revisit: the referred row lives under another
            # url key; keeping it under this url would duplicate that
            # row. Treat like plain keep-latest for this url.
            continue
        # the revisit wins: want exactly the referred capture; route
        # through the tied set so resolve_tied makes the exact pick
        # (and absent referred captures drop out, per the docstring)
        ts_map[url] = r_ts
        tied.add(url)
        eff_ts[url] = rts
    new_ref = ray.put({"ts": ts_map, "tied": frozenset(tied)})
    cleaned = ex.drop_stale(pages, dup_ref=new_ref, tied="exclude")
    winners = ex.resolve_tied(pages, new_ref)
    out = cleaned if winners is None else cleaned.union(winners)
    eff_ref = ray.put(eff_ts)

    def stamp(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        m = ray.get(eff_ref)
        base = t.column("warc_ts").cast(pa.int64())
        if not m:
            eff = base
        else:
            # renewed timestamps only exist for the (few) revisit-won
            # urls; everything else keeps its own capture time
            hit = pc.is_in(t.column("url"),
                           value_set=pa.array(sorted(m), pa.string()))
            eff_np = base.to_numpy(zero_copy_only=False).copy()
            idx = np.flatnonzero(hit.to_numpy(zero_copy_only=False))
            urls = t.column("url").take(pa.array(idx)).to_pylist()
            eff_np[idx] = [m[u] for u in urls]
            eff = pa.array(eff_np, pa.int64())
        return t.append_column("effective_ts",
                               eff.cast(pa.timestamp("us")))

    return out.map_batches(stamp, batch_format="pyarrow")
