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


class TestEffectiveLatest:
    """Revisit-aware keep-latest (`effective_latest_pages`): the crawl's
    own duplicate declarations fold into the dedup decision — a newer
    revisit renews OLD content instead of letting a stale max-ts
    response win."""

    @staticmethod
    def _pages(rows):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }))

    @staticmethod
    def _revisits(rows):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "refers_to_url": pa.array([r[2] for r in rows], pa.string()),
            "refers_to_ts": pa.array([r[3] for r in rows],
                                     pa.timestamp("us")),
            "digest": pa.array(["sha1:X"] * len(rows), pa.string()),
        }))

    def test_interplay_with_keep_latest(self, ray_session):
        from cosmos_ray.sources.warc import effective_latest_pages

        pages = self._pages([
            ("u://a", 1_000_000, b"<p>a-old</p>"),
            ("u://a", 2_000_000, b"<p>a-new</p>"),
            ("u://b", 1_000_000, b"<p>b-old</p>"),
            ("u://b", 2_000_000, b"<p>b-new</p>"),
            ("u://c", 1_000_000, b"<p>c-only</p>"),
            ("u://d", 1_000_000, b"<p>d-only</p>"),
            ("u://e", 1_000_000, b"<p>e-only</p>"),
        ])
        revisits = self._revisits([
            # a: revisit at t3 renews the t1 capture -> a-old wins
            ("u://a", 3_000_000, "u://a", 1_000_000),
            # c: STALE revisit (older than the only response) -> ignored
            ("u://c", 500_000, "u://c", 200_000),
            # d: revisit renews d's own single row -> kept, ts renewed
            ("u://d", 4_000_000, "u://d", 1_000_000),
            # e: revisit refers to an ABSENT capture -> url drops
            ("u://e", 9_000_000, "u://e", 777_000),
        ])
        out = {r["url"]: r
               for r in effective_latest_pages(pages, revisits).take_all()}
        assert set(out) == {"u://a", "u://b", "u://c", "u://d"}
        # a: the revisit redirected the winner to the OLD capture
        assert out["u://a"]["html"] == b"<p>a-old</p>"
        assert out["u://a"]["effective_ts"].timestamp() == 3.0
        # b: no revisit -> plain keep-latest
        assert out["u://b"]["html"] == b"<p>b-new</p>"
        assert out["u://b"]["effective_ts"].timestamp() == 2.0
        # c: stale revisit ignored
        assert out["u://c"]["html"] == b"<p>c-only</p>"
        assert out["u://c"]["effective_ts"].timestamp() == 1.0
        # d: single row kept with the renewed timestamp
        assert out["u://d"]["effective_ts"].timestamp() == 4.0

    def test_latest_revisit_wins_and_ties_deterministic(self, ray_session):
        from cosmos_ray.sources.warc import effective_latest_pages

        pages = self._pages([
            ("u://t", 1_000_000, b"<p>v1</p>"),
            ("u://t", 2_000_000, b"<p>v2</p>"),
            ("u://t", 3_000_000, b"<p>v3</p>"),
        ])
        # two revisits; the LATEST (t5 -> v2) decides
        revisits = self._revisits([
            ("u://t", 4_000_000, "u://t", 1_000_000),
            ("u://t", 5_000_000, "u://t", 2_000_000),
        ])
        out = effective_latest_pages(pages, revisits).take_all()
        assert len(out) == 1
        assert out[0]["html"] == b"<p>v2</p>"
        assert out[0]["effective_ts"].timestamp() == 5.0

    def test_warc_end_to_end(self, ray_session, tmp_path):
        """Full file path: responses + revisits in one WARC shard ->
        effective view -> extraction still byte-exact on the winner."""
        import ray.data as rd

        from cosmos_ray.sources.warc import (
            effective_latest_pages,
            read_warc_pages,
            read_warc_revisits,
            write_warc_revisit,
            write_warc_shard,
        )
        from cosmos_ray.stages import extract

        shard = write_warc_shard([
            ("http://w/1", 1_000_000, b"<p>original body</p>"),
            ("http://w/1", 2_000_000, b"<p>vandalized body</p>"),
        ])
        shard += write_warc_revisit(
            "http://w/1", 6_000_000, "http://w/1", 1_000_000, "sha1:D")
        p = tmp_path / "rv.warc"
        p.write_bytes(shard)

        pages = read_warc_pages(str(p))
        revs = read_warc_revisits(str(p))
        eff = effective_latest_pages(pages, revs)
        rows = eff.take_all()
        assert len(rows) == 1 and rows[0]["html"] == b"<p>original body</p>"
        ex = extract.extract(
            eff.drop_columns(["effective_ts"])).take_all()
        assert ex[0]["text"] == "original body"
