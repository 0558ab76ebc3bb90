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
