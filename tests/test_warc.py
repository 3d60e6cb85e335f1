"""WARC source gates (`sources/warc.py`): byte round-trip and pipeline
equality with the parquet-path pages."""

import hashlib

import pyarrow.parquet as pq

from cosmos_ray.sources import pages as P
from cosmos_ray.sources.warc import (parse_warc_bytes, read_warc_pages,
                                     write_warc_shard)

SF = "/root/testdata/sf0.001"


def _pages_rows():
    docs = pq.read_table(f"{SF}/documents.parquet")
    t = P.generate_pages_table(docs)
    return list(zip(t.column("url").to_pylist(),
                    [x.value for x in t.column("warc_ts")],
                    t.column("html").to_pylist()))


def _key_set(rows):
    return {(u, ts, hashlib.md5(h).hexdigest()) for u, ts, h in rows}


class TestWarc:
    def test_roundtrip_bytes(self):
        rows = _pages_rows()[:50]
        parsed = parse_warc_bytes(write_warc_shard(rows))
        got = {(r["url"], r["warc_ts_us"],
                hashlib.md5(r["html"]).hexdigest()) for r in parsed}
        assert got == _key_set(rows)

    def test_malformed_records_skipped(self):
        rows = _pages_rows()[:3]
        blob = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 2\r\n\r\nok\r\n\r\n"
                + write_warc_shard(rows[:1])
                + b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: notanint\r\n\r\n"
                + write_warc_shard(rows[1:]))
        parsed = parse_warc_bytes(blob)
        assert _key_set([(r["url"], r["warc_ts_us"], r["html"])
                         for r in parsed]) == _key_set(rows)

    def test_distributed_read_and_kg_equality(self, tmp_path):
        import ray.data as rd

        from cosmos_ray.pipelines.kg import build_kg

        rows = _pages_rows()
        paths = []
        for k in range(3):  # shard like a real crawl dump
            p = tmp_path / f"shard-{k}.warc"
            p.write_bytes(write_warc_shard(rows[k::3]))
            paths.append(str(p))
        df = read_warc_pages(paths).to_pandas()
        got = {(u, int(ts), hashlib.md5(h).hexdigest())
               for u, ts, h in zip(
                   df["url"],
                   df["warc_ts"].astype("datetime64[us]").astype("int64"),
                   df["html"])}
        assert got == _key_set(rows)

        # the KG built from WARC shards equals the parquet-path build
        # (triples are lang-free, so the missing lang column is inert)
        def tri_set(kg):
            return {(r["url"], r["subj"], r["pred"], r["obj"])
                    for r in kg.triples.take_all()}

        docs = pq.read_table(f"{SF}/documents.parquet")
        base = build_kg(rd.from_arrow(P.generate_pages_table(docs)))
        from_warc = build_kg(read_warc_pages(paths))
        assert tri_set(from_warc) == tri_set(base)
        assert from_warc.entities.count() == base.entities.count()

    def test_gzip_shards(self, tmp_path):
        """.warc.gz shards (the Common Crawl shipping format) read
        transparently — including multi-member concatenated gzip."""
        import gzip

        from cosmos_ray.sources.warc import read_warc_pages

        rows = _pages_rows()[:20]
        p = tmp_path / "shard.warc.gz"
        # two gzip members concatenated, as real dumps are
        p.write_bytes(gzip.compress(write_warc_shard(rows[:10]))
                      + gzip.compress(write_warc_shard(rows[10:])))
        df = read_warc_pages(str(p)).to_pandas()
        got = {(u, int(ts), hashlib.md5(h).hexdigest())
               for u, ts, h in zip(
                   df["url"],
                   df["warc_ts"].astype("datetime64[us]").astype("int64"),
                   df["html"])}
        assert got == _key_set(rows)

    def test_chunked_transfer_encoding_dechunked(self):
        """Responses captured with Transfer-Encoding: chunked decode to
        the logical body (real crawls store the wire framing)."""
        from cosmos_ray.sources.warc import parse_warc_bytes

        body = b"<html>hello chunked world</html>"
        chunked = (b"d\r\n" + body[:13] + b"\r\n"
                   + format(len(body) - 13, "x").encode() + b"\r\n"
                   + body[13:] + b"\r\n0\r\n\r\n")
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n" + chunked)
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://x.example/a\r\n"
               b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
               + f"Content-Length: {len(http)}\r\n\r\n".encode()
               + http + b"\r\n\r\n")
        parsed = parse_warc_bytes(rec)
        assert len(parsed) == 1
        assert parsed[0]["html"] == body

    def test_chunked_te_header_spacing_variants(self):
        """'Transfer-Encoding:chunked' (no space / padded / mixed-case
        / coding-list) all trigger dechunking — the header VALUE is
        parsed, not one fixed byte spacing."""
        from cosmos_ray.sources.warc import parse_warc_bytes

        body = b"<html>spacing</html>"
        chunked = (format(len(body), "x").encode() + b"\r\n" + body
                   + b"\r\n0\r\n\r\n")
        for te_line in (b"Transfer-Encoding:chunked",
                        b"transfer-encoding:  chunked  ",
                        b"TRANSFER-ENCODING:\tChunked",
                        b"Transfer-Encoding: gzip, chunked"):
            http = (b"HTTP/1.1 200 OK\r\n" + te_line + b"\r\n\r\n"
                    + chunked)
            rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                   b"WARC-Target-URI: https://x.example/sp\r\n"
                   b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
                   + f"Content-Length: {len(http)}\r\n\r\n".encode()
                   + http + b"\r\n\r\n")
            parsed = parse_warc_bytes(rec)
            assert len(parsed) == 1, te_line
            assert parsed[0]["html"] == body, te_line

    def test_content_encoding_chunked_value_not_matched(self):
        """A DIFFERENT header whose value happens to contain 'chunked'
        must not trigger dechunking."""
        from cosmos_ray.sources.warc import parse_warc_bytes

        body = b"5\r\nplain-looking body"
        http = (b"HTTP/1.1 200 OK\r\nX-Note: chunked\r\n\r\n" + body)
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://x.example/nc\r\n"
               b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
               + f"Content-Length: {len(http)}\r\n\r\n".encode()
               + http + b"\r\n\r\n")
        parsed = parse_warc_bytes(rec)
        assert len(parsed) == 1
        assert parsed[0]["html"] == body


class TestRevisits:
    """WARC `revisit` records: the crawl's own duplicate declarations
    (identical-payload-digest profile) read as a metadata Dataset."""

    def test_roundtrip_and_interleaving(self, ray_session, tmp_path):
        import ray.data as rd

        from cosmos_ray.sources.warc import (
            parse_warc_bytes,
            read_warc_pages,
            read_warc_revisits,
            write_warc_revisit,
            write_warc_shard,
        )

        shard = write_warc_shard([
            ("http://a/1", 1_000_000, b"<p>one</p>"),
            ("http://a/2", 3_000_000, b"<p>two</p>"),
        ])
        shard += write_warc_revisit(
            "http://a/1", 5_000_000, "http://a/1", 1_000_000, "sha1:XYZ")
        p = tmp_path / "shard.warc"
        p.write_bytes(shard)

        # response stream ignores revisits; revisit stream ignores responses
        pages = read_warc_pages(str(p)).take_all()
        assert {r["url"] for r in pages} == {"http://a/1", "http://a/2"}
        revs = read_warc_revisits(str(p)).take_all()
        assert len(revs) == 1
        r = revs[0]
        assert (r["url"], r["refers_to_url"], r["digest"]) == (
            "http://a/1", "http://a/1", "sha1:XYZ")
        assert r["warc_ts"].timestamp() == 5.0
        assert r["refers_to_ts"].timestamp() == 1.0
        # zero-length revisit bodies never leak into the response parse
        assert all(rr["html"] for rr in parse_warc_bytes(shard))
