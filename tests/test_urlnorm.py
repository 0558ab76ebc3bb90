"""URL canonicalization: unit semantics + pipeline dedup integration."""

import datetime

import pandas as pd
import pytest

from extractor_spark.engine.urlnorm import canonical_url


@pytest.mark.parametrize(
    "raw,want",
    [
        # scheme/host case, default port, fragment
        ("HTTPS://Example.COM:443/Path#frag", "https://example.com/Path"),
        ("http://example.com:80/", "http://example.com/"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # empty path normalizes to /
        ("https://example.com", "https://example.com/"),
        # tracking params dropped, rest sorted; blank values kept
        (
            "https://e.com/a?utm_source=x&b=2&a=1&gclid=zz&fbclid=q",
            "https://e.com/a?a=1&b=2",
        ),
        ("https://e.com/a?b=&a=1", "https://e.com/a?a=1&b="),
        # path case and encoding untouched (over-normalization merges
        # different pages)
        ("https://e.com/CaseSensitive%2Fpath", "https://e.com/CaseSensitive%2Fpath"),
        # non-http(s) schemes: lowercased scheme/host only, port kept
        ("FTP://Host:21/f", "ftp://host:21/f"),
        # unparseable / relative: unchanged
        ("not a url", "not a url"),
        ("/relative/only", "/relative/only"),
        ("mailto:a@b.c", "mailto:a@b.c"),
    ],
)
def test_canonical_url(raw, want):
    assert canonical_url(raw) == want


def test_canonical_idempotent():
    urls = [
        "HTTPS://A.com:443/x?utm_campaign=c&z=1&a=2#f",
        "http://b.com",
        "weird:///thing",
    ]
    for u in urls:
        once = canonical_url(u)
        assert canonical_url(once) == once


@pytest.mark.spark
def test_pipeline_canonicalize_urls_dedups_variants(spark, tmp_path):
    """Three spellings of one page (tracking param, fragment, host case)
    collapse to ONE canonical output row carrying the newest crawl."""
    from extractor_spark.spark.pipeline import PipelineConfig, run_pipeline

    t = datetime.datetime(2024, 1, 1)
    rows = [
        {
            "url": "https://site.test/page?utm_source=feed",
            "warc_ts": t,
            "html": b"<html><body><h1>old</h1></body></html>",
            "text": None,
            "lang": None,
        },
        {
            "url": "HTTPS://Site.TEST/page#section",
            "warc_ts": t + datetime.timedelta(days=30),
            "html": b"<html><body><h1>newest</h1></body></html>",
            "text": None,
            "lang": None,
        },
        {
            "url": "https://site.test:443/page",
            "warc_ts": t + datetime.timedelta(days=10),
            "html": b"<html><body><h1>middle</h1></body></html>",
            "text": None,
            "lang": None,
        },
        {
            "url": "https://other.test/thing",
            "warc_ts": t,
            "html": b"<html><body><p>other page</p></body></html>",
            "text": None,
            "lang": None,
        },
    ]
    src = str(tmp_path / "pages.parquet")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(src)

    out = str(tmp_path / "out")
    summary = run_pipeline(
        spark,
        PipelineConfig(
            pages_path=src,
            output_path=out,
            n_buckets=4,
            resume=False,
            canonicalize_urls=True,
        ),
    )
    assert summary["docs"] == 2
    got = {r["url"]: r["markdown"] for r in spark.read.parquet(out).collect()}
    assert set(got) == {"https://site.test/page", "https://other.test/thing"}
    assert "newest" in got["https://site.test/page"]
