"""WARC source: pure-parser round-trip + Spark ingestion into the pages
schema + conversion through the real pipeline stage."""

import datetime
import gzip

import pytest

from extractor_spark.engine.warc import (
    build_warc,
    extract_pages,
    gunzip_members,
    iter_warc_records,
)

pytestmark = pytest.mark.spark

TS = datetime.datetime(2024, 3, 1, 12, 0, 0)
RECORDS = [
    ("https://w.test/a", TS, b"<h1>Alpha</h1><p>body a</p>"),
    ("https://w.test/b", TS + datetime.timedelta(hours=1), b"<p>beta</p>"),
    ("https://w.test/c", TS + datetime.timedelta(hours=2), "<p>café</p>".encode()),
]


def test_roundtrip_plain():
    blob = build_warc(RECORDS)
    got = list(extract_pages(blob))
    assert [(u, ts) for u, ts, _ in got] == [(u, ts.replace(tzinfo=None)) for u, ts, _ in RECORDS]
    assert got[0][2] == RECORDS[0][2]


def test_roundtrip_gzip_members():
    # one gzip member per record, like Common Crawl
    blob = b"".join(gzip.compress(build_warc([r])) for r in RECORDS)
    assert len(list(iter_warc_records(gunzip_members(blob)))) == 3
    got = list(extract_pages(blob, gzipped=True))
    assert len(got) == 3 and got[2][2] == RECORDS[2][2]


def test_corrupt_records_skipped():
    blob = build_warc(RECORDS[:1])
    junk = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: notanum\r\n\r\nxx"
    nonresp = build_warc([("https://w.test/d", TS, b"x")]).replace(
        b"WARC-Type: response", b"WARC-Type: request"
    )
    got = list(extract_pages(junk + blob + nonresp))
    assert [u for u, _, _ in got] == ["https://w.test/a"]


def test_spark_warc_to_pipeline(spark, tmp_path):
    from extractor_spark.spark.sources import read_warc_pages
    from extractor_spark.spark.stages import convert_stage

    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    (warc_dir / "part1.warc").write_bytes(build_warc(RECORDS[:2]))
    (warc_dir / "part2.warc.gz").write_bytes(gzip.compress(build_warc(RECORDS[2:])))

    pages = read_warc_pages(spark, str(warc_dir))
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {u for u, _, _ in RECORDS}
    assert bytes(rows["https://w.test/a"]["html"]) == RECORDS[0][2]

    out = {r["url"]: r for r in convert_stage(pages).collect()}
    assert out["https://w.test/a"]["markdown"] == "Alpha\n=====\n\nbody a"
    assert out["https://w.test/c"]["markdown"] == "café"
    assert all(r["convert_error"] is None for r in out.values())


def test_negative_content_length_and_tz_offset():
    """Review findings: a negative Content-Length must not loop the record
    generator; offset-bearing WARC-Dates normalize to UTC."""
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://bad.test/x\r\n"
           b"WARC-Date: 2024-03-01T10:00:00+02:00\r\nContent-Length: -500\r\n\r\n")
    good = build_warc([("https://ok.test/a", TS, b"<p>fine</p>")])
    got = list(extract_pages(bad + good + bad))
    assert [u for u, _, _ in got] == ["https://ok.test/a"]

    offset = (b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://tz.test/x\r\n"
              b"WARC-Date: 2024-03-01T10:00:00+02:00\r\nContent-Length: 4\r\n\r\nbody")
    (_, ts, _), = extract_pages(offset)
    assert ts == datetime.datetime(2024, 3, 1, 8, 0)


def _chunk(data: bytes, sizes) -> bytes:
    out = bytearray()
    i = 0
    for s in sizes:
        piece = data[i : i + s]
        out += f"{len(piece):x}".encode() + b"\r\n" + piece + b"\r\n"
        i += s
    out += b"0\r\n\r\n"
    return bytes(out)


def test_http_body_chunked():
    from extractor_spark.engine.warc import http_body

    html = b"<html><body>chunked page body</body></html>"
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        + _chunk(html, [10, 16, 100])
    )
    assert http_body(payload) == html


def test_http_body_chunk_extension_and_trailer():
    from extractor_spark.engine.warc import http_body

    html = b"abcdef"
    body = b"3;ext=1\r\nabc\r\n3\r\ndef\r\n0\r\nX-Trailer: v\r\n\r\n"
    payload = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
    assert http_body(payload) == html


def test_http_body_gzip_content_encoding():
    from extractor_spark.engine.warc import http_body

    html = b"<html>gzipped body</html>"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gzip.compress(html)
    )
    assert http_body(payload) == html


def test_http_body_deflate_both_wrappings():
    import zlib

    from extractor_spark.engine.warc import http_body

    html = b"<html>deflated</html>"
    for raw in (zlib.compress(html), zlib.compress(html)[2:-4]):  # zlib + raw
        payload = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + raw
        assert http_body(payload) == html


def test_http_body_chunked_then_gzip():
    """TE is the outer wire framing: de-chunk first, then gunzip."""
    from extractor_spark.engine.warc import http_body

    html = b"<html>both encodings</html>"
    gz = gzip.compress(html)
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + _chunk(gz, [7, 5, 1000])
    )
    assert http_body(payload) == html


def test_http_body_corrupt_encodings_fall_back_to_raw():
    from extractor_spark.engine.warc import http_body

    bad_chunked = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZZ\r\nnope"
    assert http_body(bad_chunked) == b"ZZZ\r\nnope"
    bad_gzip = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot gzip at all"
    assert http_body(bad_gzip) == b"not gzip at all"


def test_extract_pages_decodes_chunked_gzip_records():
    """End-to-end through the record reader: a WARC response whose HTTP
    payload is chunked+gzipped yields clean HTML bytes."""
    from extractor_spark.engine.warc import extract_pages

    html = b"<html><body>real page</body></html>"
    gz = gzip.compress(html)
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + _chunk(gz, [11, 1000])
    )
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://enc.test/page\r\n"
        b"WARC-Date: 2025-06-01T00:00:00Z\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
        + b"Content-Type: application/http; msgtype=response\r\n\r\n"
        + http
        + b"\r\n\r\n"
    )
    pages = list(extract_pages(rec))
    assert len(pages) == 1
    url, ts, body = pages[0]
    assert url == "https://enc.test/page" and body == html
