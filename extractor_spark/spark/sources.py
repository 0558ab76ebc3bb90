"""Table IO for the pages/output tables — Iceberg-ready, parquet fallback.

The target deployment stores ``pages`` as an Iceberg table
(BASELINE.json input_hint); this sandbox has no Iceberg runtime jar, so the
default is a parquet layout with the identical logical schema.  When the
cluster image carries ``iceberg-spark-runtime`` (plus catalog conf), pass
``fmt="iceberg"`` — the read/write paths below are the documented one-line
switch (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark extension classes are on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        return True
    except Exception:
        return False


_PAGES_JSONL_SCHEMA = (
    "url string, warc_ts timestamp, html string, text string, lang string"
)


def read_pages(spark: SparkSession, location: str, fmt: str = "parquet") -> DataFrame:
    """Read the pages table.  ``location`` is a path (parquet/jsonl) or a
    catalog table identifier (iceberg).  ``jsonl`` covers the common
    crawl-dump interchange shape (one JSON object per line, html as a
    string); the schema is given explicitly so malformed lines become null
    rows instead of triggering a schema-inference pass over the corpus."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    if fmt == "jsonl":
        return spark.read.schema(_PAGES_JSONL_SCHEMA).json(location)
    if fmt == "orc":
        # ORC ships in Spark core (no extra jar): same columnar
        # pushdown/pruning properties as parquet for Hive-resident crawls
        return spark.read.orc(location)
    return spark.read.parquet(location)


def read_warc_pages(spark: SparkSession, location: str) -> DataFrame:
    """Read WARC crawl archives into the ``pages`` schema.

    Scale shape: ``binaryFile`` lists the archive files and each task parses
    whole files (the Common-Crawl unit of parallelism — ~1 GB per .warc.gz;
    a 100 TB crawl is ~100k files, far more than executor slots).  Per-record
    gzip members are handled by the engine parser; text/lang are left null
    (the convert stage recomputes them).
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )

    def parse_files(batches):
        import pandas as pd

        from extractor_spark.engine.warc import extract_pages

        CHUNK = 2000  # bound per-yield memory: a ~1 GB archive holds ~50k
        # pages; never hold a whole file's rows (let alone a whole batch's)

        def frames(pdf):
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                gz = str(path).endswith(".gz")
                for url, ts, html in extract_pages(bytes(content), gzipped=gz):
                    rows.append(
                        {"url": url, "warc_ts": ts, "html": html, "text": None, "lang": None}
                    )
                    if len(rows) >= CHUNK:
                        yield rows
                        rows = []
            if rows:
                yield rows

        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            empty = True
            for rows in frames(pdf):
                empty = False
                yield pd.DataFrame(rows, columns=cols)
            if empty:
                yield pd.DataFrame([], columns=cols)

    files = spark.read.format("binaryFile").load(location).select("path", "content")
    return files.mapInPandas(parse_files, schema=schema)


def write_output(
    df: DataFrame,
    location: str,
    fmt: str = "parquet",
    partition_col: str = "bucket",
) -> None:
    """Write the output table partitioned by ``partition_col``.

    Iceberg: ``createOrReplace``/``append`` via the DataFrameWriterV2 API
    (atomic snapshot commits subsume the parquet path's dynamic partition
    overwrite).  Parquet: dynamic-overwrite handled by the caller's session
    conf (pipeline.run_pipeline sets it).
    """
    if fmt == "iceberg":
        writer = df.writeTo(location)
        if partition_col and partition_col in df.columns:
            writer = writer.partitionedBy(df[partition_col])
        writer.createOrReplace()
        return
    if fmt == "jsonl":
        # training-data export shape: one JSON object per line (binary
        # columns are base64'd by the JSON writer; callers usually select
        # the text/markdown/data columns first)
        writer = df.write.mode("overwrite")
        if partition_col and partition_col in df.columns:
            writer = writer.partitionBy(partition_col)
        writer.json(location)
        return
    writer = df.write.mode("overwrite")
    if partition_col and partition_col in df.columns:
        writer = writer.partitionBy(partition_col)
    writer.parquet(location)
