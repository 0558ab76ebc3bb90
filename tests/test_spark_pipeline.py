"""Spark integration: synthetic pages table, stage C byte-identity against
the pure-Python engine (the per-url invariant), full pipeline with dedup +
manifest + resume, and the extraction stage end-to-end."""

import json

import pytest

from pyspark.sql import functions as F

from extractor_spark.engine.convert import HtmlExtractionOptions, html_to_markdown
from extractor_spark.spark.pipeline import (
    PipelineConfig,
    dedup_latest_per_url,
    run_pipeline,
    summarize_metrics,
)
from extractor_spark.spark.stages import convert_stage, extract_stage
from extractor_spark.spark.synth import FIXTURE_URLS, build_pages_df

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    build_pages_df(spark, 60).write.mode("overwrite").parquet(path)
    return path


def test_synth_schema_and_determinism(spark, pages_path):
    df = spark.read.parquet(pages_path)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    # deterministic: regenerating yields identical url+hash set
    again = build_pages_df(spark, 60)
    a = {(r["url"], r["warc_ts"]) for r in df.select("url", "warc_ts").collect()}
    b = {(r["url"], r["warc_ts"]) for r in again.select("url", "warc_ts").collect()}
    assert a == b
    # duplicate urls exist (dedup window fodder)
    dup = df.groupBy("url").count().filter("count > 1").count()
    assert dup > 0


def test_convert_stage_matches_engine_bytes(spark, pages_path):
    """The core per-url invariant: the distributed stage output is
    byte-identical to the single-document engine."""
    df = spark.read.parquet(pages_path)
    df = dedup_latest_per_url(df)
    out = convert_stage(df).select("url", "markdown", "convert_error").collect()
    assert len(out) > 0
    # recompute locally from the deduped input rows
    local = {
        r["url"]: r["html"] for r in dedup_latest_per_url(spark.read.parquet(pages_path)).collect()
    }
    for row in out:
        assert row["convert_error"] is None, row
        expected = html_to_markdown(
            local[row["url"]].decode("utf-8"), None, row["url"]
        )
        assert row["markdown"] == expected, row["url"]


def test_pipeline_run_and_resume(spark, pages_path, tmp_path):
    out_dir = str(tmp_path / "out")
    conf = PipelineConfig(
        pages_path=pages_path, output_path=out_dir, n_buckets=8, n_salt=4
    )
    summary = run_pipeline(spark, conf)
    assert summary["docs"] > 0
    assert summary["convert_failures"] == 0
    assert summary["skipped_buckets"] == 0

    output = spark.read.parquet(out_dir)
    # dedup-latest: urls unique
    assert output.count() == output.select("url").distinct().count()
    # fixtures present with markdown
    fixture_rows = output.filter(
        F.col("url").isin(list(FIXTURE_URLS.values()))
    ).collect()
    assert len(fixture_rows) == 3
    for r in fixture_rows:
        assert r["markdown"]

    manifest = spark.read.parquet(summary["manifest_path"])
    n_done = manifest.count()
    assert n_done <= 8
    assert manifest.agg(F.sum("docs_parsed")).collect()[0][0] == summary["docs"]
    assert "code_version" in manifest.columns

    # resume: everything already done → all buckets skipped
    summary2 = run_pipeline(spark, conf)
    assert summary2["skipped_buckets"] == n_done
    assert spark.read.parquet(out_dir).count() == summary["docs"]


def test_pipeline_with_extraction(spark, pages_path, tmp_path):
    schema = {
        "type": "object",
        "required": ["title"],
        "properties": {
            "title": {"type": "string"},
            "links": {
                "type": "array",
                "items": {"type": "string", "format": "uri"},
                "optional": True,
            },
        },
    }
    out_dir = str(tmp_path / "out_extract")
    conf = PipelineConfig(
        pages_path=pages_path,
        output_path=out_dir,
        schema=schema,
        n_buckets=4,
        n_salt=2,
    )
    summary = run_pipeline(spark, conf)
    assert summary["docs"] > 0
    output = spark.read.parquet(out_dir)
    assert "data" in output.columns
    blog = output.filter(F.col("url") == FIXTURE_URLS["blog-post"]).collect()[0]
    assert blog["data"]["title"] == "Understanding Async/Await in JavaScript"
    links = blog["data"]["links"]
    assert "https://example.com/blog/javascript-tutorials" in links
    # typed struct column is queryable JVM-side
    n = output.filter(F.col("data.title").isNotNull()).count()
    assert n > 0

    # The ONLY schema-validation failures are the unit-literal micro-pages
    # that genuinely lack the schema's required fields (no setext-h1 title):
    # the reference throws when required data is unextractable
    # (extractors.ts:241-244), so these 4 are expected-by-construction.
    # This pins BENCH's schema_validation_failures=4 to its exact cause.
    failures = {
        r["url"] for r in output.filter(F.col("extract_error").isNotNull()).collect()
    }
    assert failures == {
        "https://fixtures.test/unit/attrs",
        "https://fixtures.test/unit/escape",
        "https://fixtures.test/unit/image",
        "https://fixtures.test/unit/link",
    }
    assert summary["schema_validation_failures"] == len(failures)


def test_extract_stage_with_context_join(spark):
    import pandas as pd

    md_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://a.test/1"],
                "markdown": ["Body text\n\nauthor: Unknown"],
                "context_json": [json.dumps({"title": "Context Title"})],
            }
        )
    )
    schema = {
        "type": "object",
        "required": [],
        "properties": {"title": {"type": "string", "optional": True}},
    }
    out = extract_stage(md_df, schema, context_column="context_json").collect()[0]
    assert out["extract_error"] is None
    assert "context_json" not in out.asDict()
    # context flows into the prompt; the offline extractor works from content
    assert out["data_json"] is not None


def test_fused_equals_windowed(spark, pages_path, tmp_path):
    """The single-shuffle fused dedup+convert produces exactly the same rows
    as the reference-shaped window plan."""
    out_a = str(tmp_path / "fused")
    out_b = str(tmp_path / "windowed")
    run_pipeline(
        spark,
        PipelineConfig(
            pages_path=pages_path, output_path=out_a, n_buckets=8,
            dedup_mode="fused", resume=False,
        ),
    )
    run_pipeline(
        spark,
        PipelineConfig(
            pages_path=pages_path, output_path=out_b, n_buckets=8,
            dedup_mode="windowed", resume=False,
        ),
    )
    a = {
        (r["url"], r["markdown"], r["warc_ts"])
        for r in spark.read.parquet(out_a).select("url", "markdown", "warc_ts").collect()
    }
    b = {
        (r["url"], r["markdown"], r["warc_ts"])
        for r in spark.read.parquet(out_b).select("url", "markdown", "warc_ts").collect()
    }
    assert a == b
    assert len(a) > 0


def test_waves_checkpointing(spark, pages_path, tmp_path):
    """waves>1 must produce identical output to a single wave, commit the
    manifest incrementally, and resume across interrupted wave boundaries."""
    out_a = str(tmp_path / "one_wave")
    out_b = str(tmp_path / "three_waves")
    run_pipeline(
        spark,
        PipelineConfig(pages_path=pages_path, output_path=out_a, n_buckets=9, resume=False),
    )
    summary_b = run_pipeline(
        spark,
        PipelineConfig(pages_path=pages_path, output_path=out_b, n_buckets=9, waves=3),
    )
    a = {(r["url"], r["markdown"]) for r in spark.read.parquet(out_a).select("url", "markdown").collect()}
    b = {(r["url"], r["markdown"]) for r in spark.read.parquet(out_b).select("url", "markdown").collect()}
    assert a == b

    # simulate an interrupted run: keep only wave-0 buckets in the manifest
    manifest_path = summary_b["manifest_path"]
    manifest = spark.read.parquet(manifest_path).collect()
    wave0 = [r for r in manifest if r["bucket"] % 3 == 0]
    spark.createDataFrame(wave0, schema=spark.read.parquet(manifest_path).schema) \
        .write.mode("overwrite").parquet(str(tmp_path / "m2"))
    conf_resume = PipelineConfig(
        pages_path=pages_path, output_path=out_b,
        manifest_path=str(tmp_path / "m2"), n_buckets=9, waves=3,
    )
    summary_resumed = run_pipeline(spark, conf_resume)
    assert summary_resumed["skipped_buckets"] == len(wave0)
    resumed = {(r["url"], r["markdown"]) for r in spark.read.parquet(out_b).select("url", "markdown").collect()}
    assert resumed == a


def test_pipeline_survives_garbage_pages(spark, tmp_path):
    """Crawl reality: non-UTF8 bytes, empty payloads, truncated markup,
    deep nesting, nulls — the job must complete with per-row error
    accounting, never crash."""
    import datetime

    import pandas as pd

    from extractor_spark.spark.synth import PAGES_SCHEMA

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        {"url": "https://g.test/latin1", "warc_ts": ts, "html": "café ñ <p>ok</p>".encode("latin-1"), "text": None, "lang": None},
        {"url": "https://g.test/binary", "warc_ts": ts, "html": bytes(range(256)), "text": None, "lang": None},
        {"url": "https://g.test/empty", "warc_ts": ts, "html": b"", "text": None, "lang": None},
        {"url": "https://g.test/truncated", "warc_ts": ts, "html": b"<div><a href='x", "text": None, "lang": None},
        {"url": "https://g.test/deep", "warc_ts": ts, "html": ("<div>" * 400 + "x").encode(), "text": None, "lang": None},
        {"url": "https://g.test/marked", "warc_ts": ts, "html": b"<p>A<![bogus[x]]>B</p>", "text": None, "lang": None},
        {"url": "https://g.test/huge-attr", "warc_ts": ts, "html": ("<p " + "a" * 10000 + "='v'>t</p>").encode(), "text": None, "lang": None},
        {"url": "https://g.test/normal", "warc_ts": ts, "html": b"<h1>Fine</h1><p>body</p>", "text": None, "lang": "en"},
    ]
    pages_path = str(tmp_path / "garbage.parquet")
    spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_SCHEMA).write.parquet(pages_path)

    out_dir = str(tmp_path / "out")
    summary = run_pipeline(
        spark,
        PipelineConfig(pages_path=pages_path, output_path=out_dir, n_buckets=4, resume=False),
    )
    assert summary["docs"] == len(rows)
    output = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    assert output["https://g.test/normal"]["markdown"] == "Fine\n====\n\nbody"
    assert output["https://g.test/marked"]["convert_error"] is None
    assert "A" in output["https://g.test/marked"]["markdown"]
    # every row either converted or carries an error, never both-null
    for r in output.values():
        assert (r["markdown"] is not None) or (r["convert_error"] is not None)


def test_metrics_rollup(spark, pages_path, tmp_path):
    out_dir = str(tmp_path / "out_metrics")
    run_pipeline(
        spark,
        PipelineConfig(pages_path=pages_path, output_path=out_dir, n_buckets=4),
    )
    rollup = summarize_metrics(spark, out_dir)
    rows = rollup.collect()
    assert len(rows) > 1
    assert rows[0]["docs"] >= rows[-1]["docs"]  # ordered by docs desc


def test_manifest_identity_and_per_run_totals(spark, pages_path, tmp_path):
    """Round-2 manifest contract: rows record n_buckets (resume identity),
    each wave appends exactly its own buckets (no rescan/rewrite of prior
    waves), a mismatched-n_buckets resume fails loudly, and per-run totals
    exclude previously-committed buckets."""
    out_dir = str(tmp_path / "out")
    conf = PipelineConfig(pages_path=pages_path, output_path=out_dir, n_buckets=9, waves=3)
    summary = run_pipeline(spark, conf)

    manifest = spark.read.parquet(summary["manifest_path"])
    rows = manifest.collect()
    # exactly one manifest row per non-empty bucket — the old implementation
    # re-aggregated ALL buckets every wave and overwrote the manifest
    buckets = [r["bucket"] for r in rows]
    assert len(buckets) == len(set(buckets))
    assert {r["n_buckets"] for r in rows} == {9}
    assert {r["run_id"] for r in rows} == {summary["run_id"]}
    assert {r["dedup_mode"] for r in rows} == {"fused"}

    # the wave read-back prunes to the wave's bucket partitions: the filter
    # lands in PartitionFilters, not a post-scan Filter over all data
    plan = (
        spark.read.parquet(out_dir)
        .filter(F.col("bucket").isin([0, 3, 6]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [bucket" in plan

    # resuming with a different n_buckets must fail loudly, not skip wrong buckets
    bad = PipelineConfig(pages_path=pages_path, output_path=out_dir, n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets"):
        run_pipeline(spark, bad)

    # resumed run: per-run docs are 0 (everything skipped); cumulative keeps the total
    summary2 = run_pipeline(spark, conf)
    assert summary2["docs"] == 0
    assert summary2["cumulative_docs"] == summary["docs"]
    assert summary2["skipped_buckets"] == len(buckets)


def test_pipeline_empty_input_does_not_crash(spark, tmp_path):
    """A wave that writes zero rows into a fresh output dir must complete
    (ADVICE r1: the manifest refresh used to crash on schema inference)."""
    import pandas as pd

    from extractor_spark.spark.synth import PAGES_SCHEMA

    pages_path = str(tmp_path / "empty.parquet")
    spark.createDataFrame(
        pd.DataFrame({"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}),
        schema=PAGES_SCHEMA,
    ).write.parquet(pages_path)

    out_dir = str(tmp_path / "out")
    summary = run_pipeline(
        spark,
        PipelineConfig(pages_path=pages_path, output_path=out_dir, n_buckets=4, waves=2),
    )
    assert summary["docs"] == 0
    assert summary["convert_failures"] == 0


def test_crash_between_write_and_manifest_is_idempotent(spark, pages_path, tmp_path):
    """A crash AFTER a bucket's output lands but BEFORE its manifest row is
    appended must be repaired by resume without duplicating rows (dynamic
    partition overwrite rewrites exactly the re-processed buckets)."""
    out_dir = str(tmp_path / "out")
    conf = PipelineConfig(pages_path=pages_path, output_path=out_dir, n_buckets=6)
    summary = run_pipeline(spark, conf)
    total = spark.read.parquet(out_dir).count()
    urls = {r["url"] for r in spark.read.parquet(out_dir).select("url").collect()}

    # simulate the crash: drop one bucket's manifest rows (its output stays)
    manifest = spark.read.parquet(summary["manifest_path"])
    victim = manifest.select("bucket").first()["bucket"]
    trimmed = manifest.filter(F.col("bucket") != victim).collect()
    m2 = str(tmp_path / "m2")
    spark.createDataFrame(trimmed, schema=manifest.schema).write.parquet(m2)

    conf2 = PipelineConfig(
        pages_path=pages_path, output_path=out_dir, manifest_path=m2, n_buckets=6
    )
    summary2 = run_pipeline(spark, conf2)
    # only the victim bucket was reprocessed; output identical, no dupes
    assert summary2["skipped_buckets"] == len({r["bucket"] for r in trimmed})
    after = spark.read.parquet(out_dir)
    assert after.count() == total
    assert {r["url"] for r in after.select("url").collect()} == urls
    assert after.groupBy("url").count().filter("count > 1").count() == 0
    # the repaired manifest covers the victim bucket again
    m_after = spark.read.parquet(m2)
    assert victim in {r["bucket"] for r in m_after.select("bucket").collect()}


def test_defuse_skew_spreads_hot_host(spark):
    """A zipf-dominant host must not serialize on one partition: salting
    spreads its pages across many partitions (the north-rule skew defense)."""
    import pandas as pd

    from extractor_spark.spark.pipeline import defuse_skew
    from extractor_spark.spark.synth import PAGES_SCHEMA
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        {"url": f"https://hot.example.org/p/{i}", "warc_ts": ts, "html": b"<p>x</p>",
         "text": None, "lang": None}
        for i in range(400)
    ] + [
        {"url": f"https://cold-{i}.example.org/", "warc_ts": ts, "html": b"<p>y</p>",
         "text": None, "lang": None}
        for i in range(40)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_SCHEMA)
    spread = defuse_skew(df, n_salt=16, partitions=16)
    per_part = spread.filter("url_host = 'hot.example.org'").rdd.glom().map(len).collect()
    used = sum(1 for n in per_part if n > 0)
    assert used >= 8, f"hot host landed on only {used} partitions: {per_part}"
    assert max(per_part) < 400, "hot host serialized on a single partition"


def test_resume_without_manifest_over_stale_output_fails_loudly(
    spark, pages_path, tmp_path
):
    """ADVICE r2: resume=True against an output dir holding bucket
    partitions but NO manifest (deleted / never written) must raise, not
    silently treat the run as fresh — leftover partitions from a prior run
    with a different n_buckets would pollute the output and totals."""
    import shutil

    out = str(tmp_path / "out")
    conf = PipelineConfig(
        pages_path=pages_path, output_path=out, n_buckets=8, resume=False
    )
    run_pipeline(spark, conf)
    shutil.rmtree(f"{out}/_manifest")

    with pytest.raises(ValueError, match="no manifest"):
        run_pipeline(
            spark,
            PipelineConfig(
                pages_path=pages_path, output_path=out, n_buckets=8, resume=True
            ),
        )

    # resume into a genuinely EMPTY output dir is still a legal fresh start
    out2 = str(tmp_path / "out2")
    summary = run_pipeline(
        spark,
        PipelineConfig(
            pages_path=pages_path, output_path=out2, n_buckets=8, resume=True
        ),
    )
    assert summary["docs"] > 0


def test_pdf_payloads_route_through_layout_extractor(spark, tmp_path):
    """north_rule "PDF/layout parse": a crawl payload whose bytes are a PDF
    flows through engine/pdf.py inside the same convert stage; HTML rows are
    unaffected, and a poisoned PDF records convert_error, not a crash."""
    import datetime

    import pandas as pd

    from extractor_spark.engine.pdfwrite import text_to_pdf
    from extractor_spark.spark.synth import PAGES_SCHEMA

    pdf_doc = "Report title\n\nFirst body line.\nSecond body line."
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        {"url": "https://p.test/doc.pdf", "warc_ts": ts,
         "html": text_to_pdf(pdf_doc), "text": None, "lang": None},
        {"url": "https://p.test/page", "warc_ts": ts,
         "html": b"<h1>Fine</h1><p>body</p>", "text": None, "lang": "en"},
        # leading whitespace before the magic still routes as PDF
        {"url": "https://p.test/ws.pdf", "warc_ts": ts,
         "html": b"  \n" + text_to_pdf("padded"), "text": None, "lang": None},
        # mentions %PDF- mid-document but is HTML: must NOT route as PDF
        {"url": "https://p.test/about-pdf", "warc_ts": ts,
         "html": b"<p>The %PDF- magic marks PDF files.</p>", "text": None, "lang": "en"},
    ]
    pages_path = str(tmp_path / "pdfpages.parquet")
    spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_SCHEMA).write.parquet(pages_path)

    out_dir = str(tmp_path / "out_pdf")
    run_pipeline(
        spark,
        PipelineConfig(pages_path=pages_path, output_path=out_dir, n_buckets=2, resume=False),
    )
    out = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    assert out["https://p.test/doc.pdf"]["markdown"] == pdf_doc
    assert out["https://p.test/doc.pdf"]["text"] == " ".join(pdf_doc.split())
    assert out["https://p.test/doc.pdf"]["convert_error"] is None
    assert out["https://p.test/ws.pdf"]["markdown"] == "padded"
    assert out["https://p.test/page"]["markdown"] == "Fine\n====\n\nbody"
    assert "%PDF-" in out["https://p.test/about-pdf"]["markdown"]


def test_synth_corpus_with_pdfs_converts_cleanly(spark, tmp_path):
    """include_pdfs=True (entry + bench corpora): the deterministic PDF
    rows flow through the convert stage with zero failures and layout
    text in markdown."""
    from extractor_spark.spark.synth import write_pages

    pages_path = str(tmp_path / "pdfsynth.parquet")
    write_pages(spark, pages_path, n_pages=20, include_pdfs=True)
    out = str(tmp_path / "pdfsynth_out")
    summary = run_pipeline(
        spark,
        PipelineConfig(pages_path=pages_path, output_path=out, n_buckets=4, resume=False),
    )
    assert summary["convert_failures"] == 0
    rows = spark.read.parquet(out).filter("url like 'https://synth.test/pdf/%'").collect()
    assert len(rows) == 8
    for r in rows:
        assert r["markdown"].startswith("Synthetic report")
        assert "\n\n" in r["markdown"]  # blank-line layout recovered
