"""End-to-end extract pipeline (reference A1 composed Spark-first, plus the
scale engineering the north rule mandates: dedup-latest window, host
salting, resumable per-bucket manifest with lineage + metrics).

Dataflow (SURVEY.md §3.1 Spark lifecycle):

    scan pages (parquet/Iceberg)                    -- Catalyst pruning
      → latest-crawl-per-url window dedup           -- shuffle on url
      → bucket = pmod(xxhash64(url), n_buckets)     -- resume granularity
      → anti-join vs manifest buckets               -- broadcast, ~free
      → repartition(url_host, salt)                 -- defuses domain skew
      → stage C (mapInPandas convert)               -- Arrow batches
      → optional broadcast context join on url
      → stage E (mapInPandas extract)
      → write output partitioned by bucket
      → append manifest rows (bucket, metrics, lineage)

At 10^12-document scale every step stays shuffle-bounded: one shuffle for the
dedup window, one for the skew repartition; the manifest join broadcasts
(manifest ≪ data); output partitioning by bucket gives idempotent re-runs
(dynamic partition overwrite replaces exactly the re-processed buckets).

Manifest contract (resume identity): one row per (bucket, run); rows record
``n_buckets`` — the bucket-assignment modulus — and resume FAILS LOUDLY on a
mismatch (a silent mismatch would skip the wrong buckets).  Each wave appends
only its own buckets' rows, aggregated from the wave's partition directories
(partition-pruned read — previously-committed waves are never re-scanned).
"""

from __future__ import annotations

import datetime
import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor_spark.engine.convert import HtmlExtractionOptions
from extractor_spark.spark.stages import convert_stage, extract_stage, with_typed_data

CODE_VERSION = "extractor-spark-0.1"


@dataclass
class PipelineConfig:
    pages_path: str
    output_path: str
    # "parquet" (default), "iceberg" (catalog table id), or "warc"
    # (directory of .warc/.warc.gz crawl archives, parsed distributed)
    pages_format: str = "parquet"
    manifest_path: str | None = None  # default: <output>/_manifest
    schema: dict | None = None  # extraction schema; None = convert-only
    html_options: HtmlExtractionOptions = field(default_factory=HtmlExtractionOptions)
    # Resume granularity; must stay FIXED across runs (bucket identity is
    # xxhash64(url) % n_buckets — changing it invalidates the manifest).
    n_buckets: int = 512
    n_salt: int = 64
    repartition: int | None = None  # default: 4 × spark.sql.shuffle.partitions
    # "fused" (default): ONE full-data shuffle — partition by bucket (bucket =
    # f(url), so same-url rows co-locate), sort runs within partitions, dedup
    # inside the convert stage, write bucket-aligned with no further shuffle.
    # url-hash bucketing is inherently uniform, so host skew cannot
    # materialize.  At petabyte scale the saved shuffles are the dominant
    # network cost.
    # "windowed": reference-shaped plan — window dedup shuffle, then salted
    # url-host repartition ("hash" one-pass, or "range" for sorted host
    # locality at the cost of a sampling pass), then a bucket shuffle for the
    # write.  Use when host-grouped processing is required (per-host rate
    # limits, politeness, sorted host output).
    dedup_mode: str = "fused"
    partition_strategy: str = "hash"
    # >1 = intra-run checkpointing: buckets split into this many commit
    # waves, manifest refreshed after each (crash loses ≤ one wave).
    waves: int = 1
    resume: bool = True
    context_path: str | None = None  # optional (url, context_json) side table
    custom_prompt: str | None = None
    max_input_tokens: float | None = None
    # Opt-in: rewrite url to engine.urlnorm.canonical_url BEFORE bucketing,
    # so spelling variants (host case, fragments, default ports, tracking
    # params, unsorted query) share a bucket and dedup to one row.  Off by
    # default — it changes the output url column to the canonical form.
    canonicalize_urls: bool = False

    def resolved_manifest_path(self) -> str:
        return self.manifest_path or os.path.join(self.output_path, "_manifest")


def dedup_latest_per_url(pages: DataFrame) -> DataFrame:
    """Keep the newest crawl of each url (engineered window op,
    SURVEY.md §2.5): row_number over (url ⟶ warc_ts desc)."""
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_canonical_urls(pages: DataFrame) -> DataFrame:
    """Rewrite ``url`` to its canonical spelling (Arrow-vectorized batches;
    the per-url work is a pure string function)."""
    from .arrow_udfs import canonical_url_udf

    return pages.withColumn("url", canonical_url_udf()("url"))


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def defuse_skew(
    df: DataFrame, n_salt: int, partitions: int, strategy: str = "hash"
) -> DataFrame:
    """Spread hot hosts: repartition on (url_host, salt) so one domain's
    pages land on n_salt partitions instead of one (BASELINE.json north
    rule).  The convert/extract stages are maps, so this partitioning is
    purely for work balance — correctness is unaffected.

    Range partitioning (per the north rule) samples key weights, so the
    zipf-heavy hosts are spread into weight-balanced partitions; the salt
    splits a single hot host across up to n_salt ranges.  The partition
    count is always explicit: HTML is cheap in bytes but expensive in CPU,
    so AQE's size-based coalescing (which would happily fold a 70 MB
    shuffle into one partition) must not shrink the Python stage's
    parallelism — explicit counts are exempt from coalescing."""
    df = df.withColumn("url_host", F.expr("parse_url(url, 'HOST')")).withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(n_salt)).cast("int")
    )
    if strategy == "range":
        return df.repartitionByRange(partitions, "url_host", "salt")
    return df.repartition(partitions, "url_host", "salt")


def completed_buckets(
    spark: SparkSession, manifest_path: str, expected_n_buckets: int | None = None
) -> list[int] | None:
    """Bucket ids already committed, materialized eagerly — later waves
    append to the manifest files, so resume must not keep a lazy file
    dependency on them.

    ``expected_n_buckets``: bucket identity is xxhash64(url) % n_buckets, so
    resuming a manifest written under a different modulus would silently
    skip the WRONG buckets (missing/duplicate rows).  Manifest rows record
    their n_buckets; any mismatch raises."""
    try:
        manifest = spark.read.parquet(manifest_path)
    except Exception:
        return None  # no manifest yet — nothing committed
    if "n_buckets" not in manifest.columns:
        # a manifest written before the resume-identity contract: refuse to
        # guess the modulus (silently reprocessing + appending mixed-schema
        # rows would be worse) — the operator decides
        raise ValueError(
            f"manifest at {manifest_path} predates the n_buckets contract "
            "(no n_buckets column); start a fresh output/manifest or migrate "
            "the manifest by adding the n_buckets/run_id/dedup_mode columns."
        )
    rows = manifest.select("bucket", "n_buckets").distinct().collect()
    if expected_n_buckets is not None:
        seen = {r["n_buckets"] for r in rows}
        bad = seen - {expected_n_buckets}
        if bad:
            raise ValueError(
                f"manifest at {manifest_path} was written with n_buckets={sorted(bad)} "
                f"but this run uses n_buckets={expected_n_buckets}; bucket identity is "
                "xxhash64(url) % n_buckets, so resuming would skip the wrong buckets. "
                "Re-run with the original n_buckets or start a fresh output/manifest."
            )
    return sorted({r["bucket"] for r in rows})


def _delete_path(spark: SparkSession, path: str) -> None:
    """FS-agnostic recursive delete via the Hadoop FileSystem API (works on
    local paths in the sandbox and on HDFS/S3A on a cluster)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _has_bucket_partitions(spark: SparkSession, path: str) -> bool:
    """True when ``path`` already holds bucket=N partition dirs — output
    from some prior run."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    for st in fs.listStatus(hpath):
        if st.getPath().getName().startswith("bucket="):
            return True
    return False


def warmup(
    spark: SparkSession,
    pages_path: str,
    n_rows: int = 512,
    schema: dict | None = None,
) -> None:
    """Exercise the full stage chain on a small slice so JVM JIT, codegen,
    and Python-worker spawn costs are paid before measurement (a cluster
    amortizes these over hours; a cold local[N] JVM would otherwise fold
    them into the timed region).  Pass ``schema`` to also warm the
    extraction stage's codegen/worker path (the structured pipeline's
    first leg otherwise pays it inside the timed region)."""
    import tempfile

    scratch = tempfile.mkdtemp(prefix="extractor_warmup_")
    sample = spark.read.parquet(pages_path).limit(n_rows)
    converted = convert_stage(
        dedup_latest_per_url(sample).select("url", "warc_ts", "html", "lang")
    )
    if schema is not None:
        from extractor_spark.spark.stages import extract_stage

        converted = extract_stage(converted, schema)
    converted.write.mode("overwrite").parquet(os.path.join(scratch, "out"))


def _read_pages(spark: SparkSession, conf: PipelineConfig) -> DataFrame:
    if conf.pages_format == "warc":
        from extractor_spark.spark.sources import read_warc_pages

        return read_warc_pages(spark, conf.pages_path)
    from extractor_spark.spark.sources import read_pages

    return read_pages(spark, conf.pages_path, conf.pages_format)


def run_pipeline(spark: SparkSession, conf: PipelineConfig) -> dict:
    """Execute (or resume) the pipeline; returns a run summary dict.

    ``conf.waves > 1`` splits the remaining buckets into that many commit
    waves — each wave writes its output and refreshes the manifest before
    the next starts, so a mid-run failure loses at most one wave (the next
    launch resumes from the manifest).  The tradeoff is one input scan per
    wave; at petabyte scale pick waves so a wave is hours, not minutes.
    """
    started = time.time()
    manifest_path = conf.resolved_manifest_path()
    run_id = uuid.uuid4().hex[:12]

    pages_raw = _read_pages(spark, conf)
    if conf.canonicalize_urls:
        pages_raw = with_canonical_urls(pages_raw)
    pages_all = with_bucket(pages_raw, conf.n_buckets)

    skipped_buckets = 0
    done: list[int] = []
    if conf.resume:
        done_or_none = completed_buckets(spark, manifest_path, conf.n_buckets)
        if done_or_none is None and _has_bucket_partitions(spark, conf.output_path):
            # resume identity contract (mirrors the n_buckets mismatch
            # check): output holds bucket partitions but the manifest is
            # missing — deleted, or written by a run that predates it.
            # Treating this as fresh WITHOUT deleting would let leftover
            # partitions from a different n_buckets (ids >= the current
            # modulus are never overwritten) silently pollute the output
            # and the cumulative totals.  The operator decides.
            raise ValueError(
                f"resume=True but no manifest at {manifest_path} while "
                f"{conf.output_path} already contains bucket partitions; "
                "refusing to guess their provenance. Delete the stale "
                "output (or run with resume=False, which clears it) or "
                "restore the manifest."
            )
        done = done_or_none or []
        if done:
            skipped_buckets = len(done)
            # bucket list is tiny — a literal NOT IN filter (no shuffle,
            # evaluated at the scan)
            pages_all = pages_all.filter(~F.col("bucket").isin(done))
    else:
        # fresh run: drop stale state so totals/resume never mix runs — the
        # manifest AND the output (leftover bucket partitions from a prior
        # larger run would otherwise be re-read by the wave aggregation and
        # stamped with THIS run's run_id, corrupting per-run totals and
        # future resumes)
        _delete_path(spark, manifest_path)
        _delete_path(spark, conf.output_path)

    # Default compute parallelism: 4 task waves per core slot for balance
    # under per-document cost variance (page sizes are long-tailed).
    n_parts = conf.repartition or 4 * int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )

    done_set = set(done)
    waves = max(1, conf.waves)
    wave_seconds: list[float] = []
    for wave in range(waves):
        pages = (
            pages_all
            if waves == 1
            else pages_all.filter(F.pmod(F.col("bucket"), F.lit(waves)) == wave)
        )
        wave_buckets = [
            b
            for b in range(conf.n_buckets)
            if b % waves == wave and b not in done_set
        ]
        t_wave = time.time()
        _run_wave(spark, conf, pages, n_parts, manifest_path, wave_buckets, run_id)
        wave_seconds.append(round(time.time() - t_wave, 3))

    wall = time.time() - started
    # totals from the written manifest (tiny) — not a recompute of the agg.
    # Per-run figures come from THIS run's manifest rows only (a resumed run
    # must not claim previously-committed docs in its throughput).
    try:
        manifest = spark.read.parquet(manifest_path)
    except Exception:  # nothing ever written (fully-empty input)
        manifest = None
    zero = {"docs": 0, "bytes": 0, "convert_failures": 0, "schema_failures": 0}
    if manifest is not None:
        agg = [
            F.coalesce(F.sum("docs_parsed"), F.lit(0)).alias("docs"),
            F.coalesce(F.sum("html_bytes"), F.lit(0)).alias("bytes"),
            F.coalesce(F.sum("convert_failures"), F.lit(0)).alias("convert_failures"),
            F.coalesce(F.sum("schema_validation_failures"), F.lit(0)).alias(
                "schema_failures"
            ),
        ]
        totals = manifest.filter(F.col("run_id") == run_id).agg(*agg).collect()[0]
        cumulative = manifest.agg(*agg).collect()[0]
    else:
        totals = cumulative = zero
    return {
        "docs": totals["docs"],
        "html_bytes": totals["bytes"],
        "convert_failures": totals["convert_failures"],
        "schema_validation_failures": totals["schema_failures"],
        "cumulative_docs": cumulative["docs"],
        "skipped_buckets": skipped_buckets,
        "wall_seconds": wall,
        "wave_seconds": wave_seconds,
        "docs_per_sec": (totals["docs"] or 0) / wall if wall > 0 else None,
        "run_id": run_id,
        "output_path": conf.output_path,
        "manifest_path": manifest_path,
    }


def _run_wave(
    spark: SparkSession,
    conf: PipelineConfig,
    pages: DataFrame,
    n_parts: int,
    manifest_path: str,
    wave_buckets: list[int],
    run_id: str,
) -> None:
    if conf.dedup_mode == "fused":
        # one shuffle: bucket partitioning co-locates url runs AND aligns
        # with the bucketed write (no further shuffle before the sink)
        n_parts = min(n_parts, conf.n_buckets)
        pages = pages.repartition(n_parts, "bucket").sortWithinPartitions(
            "url", F.col("warc_ts").desc()
        )
        converted = convert_stage(
            pages.select("url", "warc_ts", "html", "lang"),
            conf.html_options,
            dedup_sorted_runs=True,
        )
    else:
        pages = dedup_latest_per_url(pages)
        pages = defuse_skew(pages, conf.n_salt, n_parts, conf.partition_strategy)
        converted = convert_stage(
            pages.select("url", "warc_ts", "html", "lang"),
            conf.html_options,
        )

    if conf.schema is not None:
        md = converted
        if conf.context_path:
            context = spark.read.parquet(conf.context_path)
            md = md.join(F.broadcast(context), "url", "left")
        # extract_stage passes all convert columns through — no self-join.
        output = extract_stage(
            md,
            conf.schema,
            custom_prompt=conf.custom_prompt,
            max_input_tokens=conf.max_input_tokens,
            context_column="context_json" if conf.context_path else None,
        )
        output = with_typed_data(output, conf.schema).drop("data_json")
    else:
        output = converted

    output = with_bucket(output, conf.n_buckets)

    # Dynamic partition overwrite: re-running a bucket replaces exactly that
    # bucket's files — idempotent resume.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if conf.dedup_mode != "fused":
        # group buckets so each directory gets one file, not one per task
        output = output.repartition(conf.n_buckets, "bucket")
    # fused mode: rows never moved since the bucket shuffle, so each task
    # already holds whole buckets — partitionBy emits one file per bucket
    output.write.mode("overwrite").partitionBy("bucket").parquet(conf.output_path)

    # Manifest: one row per completed bucket with lineage + metrics,
    # aggregated from THIS wave's bucket partitions only.  The filter is on
    # the partition column, so Catalyst prunes every previously-committed
    # bucket directory — a W-wave run reads each output byte once, not W
    # times.  Rows are APPENDED; a crash between the output write and this
    # append just reprocesses the wave (idempotent via dynamic overwrite).
    try:
        written = spark.read.parquet(conf.output_path)
    except Exception:
        # fully-filtered wave into a not-yet-existing output dir: nothing
        # was written, so there is nothing to commit
        return
    written = written.filter(F.col("bucket").isin(wave_buckets))
    agg_cols = [
        F.count("*").alias("docs_parsed"),
        F.sum("html_bytes").alias("html_bytes"),
        F.sum("boilerplate_bytes_removed").alias("boilerplate_bytes_removed"),
        F.sum(F.when(F.col("convert_error").isNotNull(), 1).otherwise(0)).alias(
            "convert_failures"
        ),
    ]
    if conf.schema is not None:
        agg_cols.append(
            F.sum(F.when(F.col("extract_error").isNotNull(), 1).otherwise(0)).alias(
                "schema_validation_failures"
            )
        )
    else:
        agg_cols.append(F.lit(0).alias("schema_validation_failures"))

    run_ts = datetime.datetime.now(datetime.timezone.utc).isoformat()
    manifest_rows = (
        written.groupBy("bucket")
        .agg(*agg_cols)
        .withColumn("input_path", F.lit(conf.pages_path))
        .withColumn("code_version", F.lit(CODE_VERSION))
        .withColumn("run_ts", F.lit(run_ts))
        .withColumn("run_id", F.lit(run_id))
        # resume identity + provenance (completed_buckets checks n_buckets)
        .withColumn("n_buckets", F.lit(conf.n_buckets))
        .withColumn("dedup_mode", F.lit(conf.dedup_mode))
    )
    manifest_rows.write.mode("append").parquet(manifest_path)


def summarize_metrics(spark: SparkSession, output_path: str) -> DataFrame:
    """Host-level metric rollup over the output table (engineered agg op)."""
    out = spark.read.parquet(output_path)
    return (
        out.withColumn("url_host", F.expr("parse_url(url, 'HOST')"))
        .groupBy("url_host")
        .agg(
            F.count("*").alias("docs"),
            F.sum("html_bytes").alias("html_bytes"),
            F.sum("markdown_chars").alias("markdown_chars"),
            F.sum("boilerplate_bytes_removed").alias("boilerplate_bytes_removed"),
        )
        .orderBy(F.col("docs").desc())
    )
