"""SparkSession factory with the engine's standard configuration.

Tuned for the extract pipeline's shape: fat HTML rows moving into Python
workers over Arrow (small record batches bound worker memory), AQE with skew
handling on, shuffle parallelism matched to cores rather than the 200
default.  The same settings translate to multi-executor clusters — only
``master`` and the memory knobs change at spark-submit time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# HTML rows are fat (KBs–MBs); keep Arrow batches small so each Python worker
# holds a bounded number of documents (SURVEY.md §4.2).
DEFAULT_ARROW_BATCH_ROWS = 256


def _default_driver_memory() -> str:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(4, min(24, total_gb // 5))}g"
    except OSError:
        pass
    return "4g"


def get_spark(
    app_name: str = "extractor_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = DEFAULT_ARROW_BATCH_ROWS,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM hosts every executor thread plus all
        # cached/checkpointed blocks; a fixed 8g caused GCLocker-retry task
        # aborts at the tail of long benches on the 128 GiB box (32 threads
        # allocating under a nearly-full heap).  Size to ~1/5 of host RAM,
        # clamped to [4g, 24g], so smaller machines aren't handed an -Xmx
        # beyond physical memory; override via SPARK_DRIVER_MEMORY.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY") or _default_driver_memory())
    )
    # Shuffle/spill on the RAM disk when one exists (memory-rich local node;
    # overridable via SPARK_LOCAL_DIRS) — avoids disk-latency noise.
    if "SPARK_LOCAL_DIRS" not in os.environ and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
