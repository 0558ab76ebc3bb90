"""Structured Streaming surfaces.

The reference is a batch library (no streaming, SURVEY.md §2.5); these are
the engineered streaming counterparts a crawl pipeline needs:

- ``stream_events_hourly``: watermarked event-time windowed aggregation
  (late data tolerated up to the watermark), the streaming twin of the
  batch ``events_hourly`` query.
- ``stream_convert_pages``: continuous extraction — new page files landing
  in a directory are converted incrementally via ``foreachBatch`` running
  the same Arrow-batched convert stage, with exactly-once file-sink
  semantics from the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extractor_spark.spark.stages import convert_stage
from extractor_spark.spark.synth import PAGES_SCHEMA

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events_hourly(
    spark: SparkSession, events_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """readStream → watermark → 1-hour tumbling window agg (append-mode
    compatible: the watermark bounds state and late data)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, closed boolean"
)
_SESSION_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"
SESSION_GAP_US = 30 * 60 * 1_000_000


def _session_func(key, pdf_iter, state):
    """applyInPandasWithState body: 30-minute-gap sessionization per user.

    Emits a row per closed session; the still-open tail session is emitted
    with ``closed=false`` each time the group sees data (so a drained
    static source yields the complete sessionization).
    """
    import pandas as pd

    (user_id,) = key
    if state.exists:
        start_us, end_us, n = state.get
    else:
        start_us = end_us = None
        n = 0

    out_rows = []
    for pdf in pdf_iter:
        ts_us = sorted(int(v) for v in pdf["ts_us"])
        for t in ts_us:
            if start_us is None:
                start_us, end_us, n = t, t, 1
            elif t - end_us > SESSION_GAP_US:
                out_rows.append((user_id, start_us, end_us, n, True))
                start_us, end_us, n = t, t, 1
            else:
                end_us = max(end_us, t)
                n += 1

    if start_us is not None:
        state.update((start_us, end_us, n))
        out_rows.append((user_id, start_us, end_us, n, False))

    yield pd.DataFrame(
        out_rows,
        columns=["user_id", "session_start_us", "session_end_us", "n_events", "closed"],
    )


def stream_user_sessions(spark: SparkSession, events_dir: str):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user 30-minute-gap sessionization with explicit state.  Returns the
    streaming DataFrame; attach a sink and drain."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    events = stream.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _session_func,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_convert_pages(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """Continuous convert pipeline: each micro-batch of newly-landed page
    files runs the batch convert stage and appends to the output table.
    Returns the StreamingQuery (caller stops it)."""

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.rdd.isEmpty():
            return
        converted = convert_stage(batch_df.select("url", "warc_ts", "html", "lang"))
        converted.write.mode("append").parquet(output_dir)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
