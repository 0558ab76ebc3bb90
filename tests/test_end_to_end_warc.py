"""The full production path in one test: WARC crawl archives → extract
pipeline (convert + dedup + bucketed write + manifest) → curation funnel
(exact dedup → MinHash near-dup clusters → quality filter) → JSONL export.

Every stage is individually tested elsewhere; this pins that they COMPOSE —
the schema each stage emits is the schema the next one reads."""

import datetime
import json

import pytest

pytestmark = pytest.mark.spark


def test_warc_to_curated_jsonl(spark, tmp_path):
    from extractor_spark.engine.warc import build_warc
    from extractor_spark.spark.curate import curate
    from extractor_spark.spark.pipeline import PipelineConfig, run_pipeline
    from extractor_spark.spark.synth import synth_page_html

    # 2 archives × 100 pages, with the last 20 urls of archive 1 re-crawled
    # in archive 2 (later warc_ts must win via latest-per-url dedup)
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    t1 = datetime.datetime(2024, 1, 1)
    t2 = datetime.datetime(2024, 2, 1)
    arch1 = [
        (f"https://w.test/p/{i}", t1, synth_page_html(i, i % 3).encode())
        for i in range(100)
    ]
    arch2 = [
        (f"https://w.test/p/{i}", t2, synth_page_html(i + 1000, i % 3).encode())
        for i in range(80, 180)
    ]
    (warc_dir / "a1.warc").write_bytes(build_warc(arch1))
    (warc_dir / "a2.warc").write_bytes(build_warc(arch2))

    out = str(tmp_path / "extract_out")
    summary = run_pipeline(
        spark,
        PipelineConfig(
            pages_path=str(warc_dir),
            output_path=out,
            pages_format="warc",
            n_buckets=8,
            resume=False,
        ),
    )
    assert summary["docs"] == 180  # 200 records, 20 urls re-crawled
    assert summary["convert_failures"] == 0

    # the re-crawled urls must carry archive 2's content (later warc_ts)
    rows = spark.read.parquet(out)
    recrawled = rows.filter("url = 'https://w.test/p/90'").collect()
    assert len(recrawled) == 1
    assert recrawled[0]["warc_ts"] == t2

    curated = str(tmp_path / "curated")
    stats = curate(spark, out, curated, min_tokens=5)
    assert stats["input_docs"] == 180
    assert stats["after_quality_filter"] > 0

    kept = []
    for f in (tmp_path / "curated").glob("*.json"):
        kept += [json.loads(l) for l in f.read_text().splitlines()]
    assert len(kept) == stats["after_quality_filter"]
    assert all(k["url"].startswith("https://w.test/p/") for k in kept)
    assert all(k["text"] for k in kept)


def test_jsonl_pages_source(spark, tmp_path):
    """JSONL crawl-dump input drives the same pipeline: write pages as
    one-object-per-line JSON, run with pages_format='jsonl', same docs out."""
    from extractor_spark.spark.pipeline import PipelineConfig, run_pipeline
    from extractor_spark.spark.synth import build_pages_df

    pages = build_pages_df(spark, 60, include_fixtures=False, dup_every=0)
    src = str(tmp_path / "pages_jsonl")
    pages.selectExpr(
        "url", "warc_ts", "CAST(html AS STRING) AS html", "text", "lang"
    ).write.json(src)

    out = str(tmp_path / "out")
    summary = run_pipeline(
        spark,
        PipelineConfig(
            pages_path=src,
            output_path=out,
            pages_format="jsonl",
            n_buckets=4,
            resume=False,
        ),
    )
    assert summary["docs"] == 60
    assert summary["convert_failures"] == 0
    got = spark.read.parquet(out)
    assert got.filter("markdown IS NOT NULL").count() == 60


def test_orc_pages_source(spark, tmp_path):
    """ORC crawl input (Hive-resident corpora; ORC ships in Spark core, no
    extra jar) drives the same pipeline: write pages as ORC, run with
    pages_format='orc', byte-identical markdown vs the parquet path."""
    from extractor_spark.spark.pipeline import PipelineConfig, run_pipeline
    from extractor_spark.spark.synth import build_pages_df

    pages = build_pages_df(spark, 60, include_fixtures=False, dup_every=0)
    src = str(tmp_path / "pages_orc")
    pages.write.orc(src)

    out = str(tmp_path / "out_orc")
    summary = run_pipeline(
        spark,
        PipelineConfig(
            pages_path=src,
            output_path=out,
            pages_format="orc",
            n_buckets=4,
            resume=False,
        ),
    )
    assert summary["docs"] == 60
    assert summary["convert_failures"] == 0

    # cross-format byte identity: same corpus through the parquet path
    src_pq = str(tmp_path / "pages_pq")
    pages.write.parquet(src_pq)
    out_pq = str(tmp_path / "out_pq")
    run_pipeline(
        spark,
        PipelineConfig(
            pages_path=src_pq, output_path=out_pq, n_buckets=4, resume=False
        ),
    )
    a = {r.url: r.markdown for r in spark.read.parquet(out).collect()}
    b = {r.url: r.markdown for r in spark.read.parquet(out_pq).collect()}
    assert a == b


def test_warc_with_pdf_records_extracts_both(spark, tmp_path):
    """A Common-Crawl-style archive mixing text/html and application/pdf
    response records: the pipeline routes each payload by magic, so PDFs
    come out with their layout text and HTML with markdown — one archive,
    one pipeline, no special-casing at the call site."""
    from extractor_spark.engine.pdfwrite import text_to_pdf
    from extractor_spark.engine.warc import build_warc
    from extractor_spark.spark.pipeline import PipelineConfig, run_pipeline
    from extractor_spark.spark.synth import synth_page_html

    t = datetime.datetime(2024, 3, 1)
    pdf_text = "Crawled report\n\nparagraph one.\nparagraph two."
    records = [
        ("https://m.test/page", t, synth_page_html(7, 1).encode()),
        ("https://m.test/report.pdf", t, text_to_pdf(pdf_text)),
    ]
    warc_dir = tmp_path / "mixed"
    warc_dir.mkdir()
    (warc_dir / "m.warc").write_bytes(build_warc(records))

    out = str(tmp_path / "mixed_out")
    summary = run_pipeline(
        spark,
        PipelineConfig(
            pages_path=str(warc_dir),
            output_path=out,
            pages_format="warc",
            n_buckets=2,
            resume=False,
        ),
    )
    assert summary["docs"] == 2
    assert summary["convert_failures"] == 0
    rows = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert rows["https://m.test/report.pdf"]["markdown"] == pdf_text
    assert "#" in rows["https://m.test/page"]["markdown"] or rows["https://m.test/page"]["markdown"]
