"""Incremental MinHash near-dup detection against a persisted band index —
the per-crawl-batch shape of corpus deduplication.

A 100 TB corpus is not re-deduplicated on every crawl: each new batch of
pages probes a PERSISTED LSH band index (16 bands × 4 of a 64-perm MinHash
signature, the same parameters as the curate funnel, `curate.py:36-76`),
verifies the banded candidates with exact Jaccard over the stored hashed
shingle sets, and is then appended to the index.  Cost per batch is
O(batch + collisions) — independent of corpus size except through the
band-join fan-out, which banding keeps near-linear.

Semantics (deliberately simple and chunking-honest): a batch doc is a
near-dup iff a verified match exists in STRICTLY EARLIER batches; every
batch doc enters the index regardless of verdict (the CDX convention —
index everything, flag dups), so survivorship chains cannot make verdicts
order-fragile.  Within-batch duplicates are NOT flagged against each other
— the curate funnel owns intra-corpus dedup; this operator owns the
incremental frontier-vs-corpus question.

Store layout: two parquet dirs under the store path — ``bands/``
(url, band_idx, band_hash) and ``shingles/`` (url, hs).  At production
scale both are transactional tables BUCKETED on the join keys
((band_idx, band_hash) and url respectively), making the probe joins
shuffle-free on the store side; here they are plain appended parquet.

The correctness gate (tests/test_incremental_dedup.py) replays the same
batches through a from-scratch reference that rebuilds the accumulated
corpus per step with the identical SQL — so the persisted-store path is
pinned to introduce no loss or corruption — plus a planted near-copy test
and a streaming (foreachBatch availableNow) ≡ batch-loop equality.

No reference analog (lightfeed/extractor has no dedup); parameters and
star/verify conventions follow `curate.py`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BANDS_SUBDIR = "bands"
SHINGLES_SUBDIR = "shingles"

# Same signature construction as the curate funnel: 64 MinHash values as a
# pure array expression (no 64-way explode), 16 bands of 4.  The SQL form
# is kept for the from-scratch reference in tests/test_incremental_dedup.py
# (batch_shingles_and_bands builds the identical expressions with the
# DataFrame API — see its docstring for why views are unusable here).
_BATCH_BANDS_SQL = """
SELECT url, b.pos AS band_idx,
       xxhash64(sig[b.pos * 4], sig[b.pos * 4 + 1], sig[b.pos * 4 + 2], sig[b.pos * 4 + 3]) AS band_hash
FROM (
  SELECT url,
         transform(sequence(0, 63),
                   seed -> array_min(transform(hs, h -> xxhash64(h, seed)))) AS sig
  FROM {sh_view}
)
LATERAL VIEW posexplode(sequence(0, 15)) b AS pos, val
"""


def batch_shingles_and_bands(
    spark: SparkSession, docs: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) for a batch of (url, text) docs.  Docs under 3
    tokens yield no shingles and therefore no bands: they can never match
    and are skipped by the index entirely.

    Built with DataFrame expressions, NOT temp views: inside a
    foreachBatch handler the batch frame belongs to the microbatch's
    CLONED session, so a view registered on it is invisible to the outer
    session's sql() — which then silently resolves a stale same-named view
    from an earlier batch run (the bug the streaming equality test
    caught).  The expressions are verbatim from curate.py's templates, and
    the from-scratch reference test still runs those templates, pinning
    the two forms equal."""
    sh = (
        docs.selectExpr("url", "split(trim(text), '\\\\s+') AS w")
        .filter("size(w) >= 3")
        .selectExpr(
            "url",
            "array_distinct(transform(sequence(0, size(w) - 3),"
            " i -> xxhash64(concat_ws(' ', w[i], w[i+1], w[i+2])))) AS hs",
        )
    )
    bands = (
        sh.selectExpr(
            "url",
            "transform(sequence(0, 63),"
            " seed -> array_min(transform(hs, h -> xxhash64(h, seed)))) AS sig",
        )
        .select(
            F.col("url"),
            F.col("sig"),
            F.posexplode(F.expr("sequence(0, 15)")).alias("band_idx", "_v"),
        )
        .selectExpr(
            "url",
            "band_idx",
            "xxhash64(sig[band_idx * 4], sig[band_idx * 4 + 1],"
            " sig[band_idx * 4 + 2], sig[band_idx * 4 + 3]) AS band_hash",
        )
    )
    return sh, bands


def _verdicts(
    docs: DataFrame,
    batch_sh: DataFrame,
    batch_bands: DataFrame,
    store_sh: DataFrame | None,
    store_bands: DataFrame | None,
    threshold: float,
) -> DataFrame:
    """(url, is_dup, dup_of): banded candidates vs the store, exact-Jaccard
    verified on the hashed shingle sets, min matching stored url as the
    attribution.  Empty store → all novel."""
    if store_bands is None:
        return docs.select(
            "url", F.lit(False).alias("is_dup"), F.lit(None).cast("string").alias("dup_of")
        )
    cand = (
        batch_bands.alias("b")
        .join(
            store_bands.alias("s"),
            (F.col("b.band_idx") == F.col("s.band_idx"))
            & (F.col("b.band_hash") == F.col("s.band_hash")),
        )
        .select(F.col("b.url").alias("b_url"), F.col("s.url").alias("s_url"))
        .distinct()
    )
    n_common = F.size(F.array_intersect(F.col("bs.hs"), F.col("ss.hs"))).cast("double")
    n_total = (F.size(F.col("bs.hs")) + F.size(F.col("ss.hs"))).cast("double")
    matches = (
        cand.join(batch_sh.alias("bs"), F.col("b_url") == F.col("bs.url"))
        .join(store_sh.alias("ss"), F.col("s_url") == F.col("ss.url"))
        .filter(n_common / (n_total - n_common) >= threshold)
        .groupBy("b_url")
        .agg(F.min("s_url").alias("dup_of"))
    )
    return docs.join(matches, docs["url"] == matches["b_url"], "left").select(
        docs["url"],
        F.col("dup_of").isNotNull().alias("is_dup"),
        "dup_of",
    )


def _read_earlier(spark: SparkSession, root: str, batch_id: int):
    """Partitions of the store strictly EARLIER than ``batch_id`` (batch=N
    subdir layout, Spark partition discovery + pruning), or None when none
    exist yet."""
    if not os.path.isdir(root) or not any(
        e.startswith("batch=") for e in os.listdir(root)
    ):
        return None
    return (
        spark.read.parquet(root)
        .filter(F.col("batch") < batch_id)
        .drop("batch")
    )


def dedup_batch(
    spark: SparkSession,
    store_path: str,
    docs: DataFrame,
    threshold: float = 0.8,
    append: bool = True,
    batch_id: int = 0,
) -> DataFrame:
    """Verdict every doc in ``docs`` (columns url, text; urls assumed new —
    the crawl frontier's anti-join guarantees it) against the persisted
    index at ``store_path``, then write the batch's shingles and bands.

    REPLAY-IDEMPOTENT (streaming's at-least-once semantics): the store is
    laid out as batch=N partitions, each batch's write is a deterministic
    OVERWRITE of its own partition (a retried microbatch rewrites the same
    bytes instead of appending duplicates), and the probe reads only
    partitions with batch < batch_id (partition-pruned) — so a retry that
    runs after its own first-attempt write still sees exactly the
    strictly-earlier store and produces the identical verdicts.

    Returns the materialized verdict frame."""
    bands_dir = os.path.join(store_path, BANDS_SUBDIR)
    sh_dir = os.path.join(store_path, SHINGLES_SUBDIR)
    store_bands = _read_earlier(spark, bands_dir, batch_id)
    store_sh = _read_earlier(spark, sh_dir, batch_id)

    batch_sh, batch_bands = batch_shingles_and_bands(spark, docs)
    batch_sh = batch_sh.persist()
    batch_bands = batch_bands.persist()
    try:
        # localCheckpoint, NOT persist: writing to a path RECACHES every
        # cached plan that reads it (InsertIntoHadoopFsRelation calls
        # refreshByPath), so a merely-persisted verdict frame would be
        # recomputed against the post-write store.  The eager checkpoint
        # severs the lineage before the store mutates.  (With the
        # batch< pruning the recompute would now be benign, but the
        # snapshot guarantee is worth keeping explicit.)
        out = _verdicts(
            docs, batch_sh, batch_bands, store_sh, store_bands, threshold
        ).localCheckpoint(eager=True)
        if append:
            # The two store tables live in independent dirs — write them on
            # two driver threads (r6: saves ~0.15 s/batch of sequential job
            # latency).  Both writes read their already-persisted batch
            # frames, and the verdicts are an eager checkpoint above, so
            # the writes' refreshByPath cannot reach them; content and
            # layout per dir are identical to the sequential writes.
            import threading

            errs: list = []

            def _w(df, path):
                try:
                    df.write.mode("overwrite").parquet(path)
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    errs.append(e)

            ts = [
                threading.Thread(
                    target=_w,
                    args=(batch_sh, os.path.join(sh_dir, f"batch={int(batch_id)}")),
                    daemon=True,
                ),
                threading.Thread(
                    target=_w,
                    args=(
                        batch_bands,
                        os.path.join(bands_dir, f"batch={int(batch_id)}"),
                    ),
                    daemon=True,
                ),
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            if errs:
                raise errs[0]
        return out
    finally:
        batch_sh.unpersist()
        batch_bands.unpersist()


def streaming_dedup(
    spark: SparkSession,
    docs_stream_dir: str,
    work_dir: str,
    threshold: float = 0.8,
) -> DataFrame:
    """foreachBatch availableNow drain over a stream of (url, text) files:
    each microbatch runs ``dedup_batch`` against the growing store and
    appends its verdicts to ``work_dir/verdicts``.  Returns the union of
    all verdicts.  Equality vs the batch loop is pinned in
    tests/test_incremental_dedup.py (same chunking on both sides — the
    strictly-earlier-batches semantics makes chunking part of the
    contract, exactly as in a real crawl's arrival order)."""
    store_dir = os.path.join(work_dir, "incdedup_store")
    ckpt_dir = os.path.join(work_dir, "incdedup_ckpt")
    verdicts_dir = os.path.join(work_dir, "verdicts")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from . import caches

        with caches.scope():
            out = dedup_batch(
                spark, store_dir, batch_df, threshold=threshold, batch_id=batch_id
            )
            # verdicts idempotent the same way: per-batch partition overwrite
            out.write.mode("overwrite").parquet(
                os.path.join(verdicts_dir, f"batch={int(batch_id)}")
            )
            out.unpersist()

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(verdicts_dir)


def streaming_source_counts(
    spark: SparkSession,
    docs_stream_dir: str,
    work_dir: str,
) -> DataFrame:
    """Incremental per-(source, token) counts over a stream of (source,
    text) docs — the maintained statistic behind source_drift_kl (corpus
    monitoring at ingest time).  Counts are ASSOCIATIVE, so merging each
    microbatch's partial counts into the store by summation converges to
    exactly the batch aggregation regardless of chunking — the same
    argument as merge_frontier_store's argmax (frontier.py), with sum in
    place of argmax.  Store swap is write-next → atomic rename, as there.

    Returns the final (source, w, c) store; feeding it to the
    source_drift_kl SQL gives bit-identical KL to the batch query
    (pinned in tests/test_incremental_dedup.py)."""
    import shutil

    store_dir = os.path.join(work_dir, "srccnt_store")
    ckpt_dir = os.path.join(work_dir, "srccnt_ckpt")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        inc = (
            batch_df.selectExpr(
                "source", "explode(split(trim(lower(text)), '\\\\s+')) AS w"
            )
            .groupBy("source", "w")
            .agg(F.count("*").cast("bigint").alias("c"))
        )
        if os.path.isdir(store_dir):
            merged = (
                spark.read.parquet(store_dir)
                .unionByName(inc)
                .groupBy("source", "w")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
        else:
            merged = inc
        tmp_dir = f"{store_dir}.next{batch_id}"
        merged.write.mode("overwrite").parquet(tmp_dir)
        if os.path.isdir(store_dir):
            shutil.rmtree(store_dir)
        os.rename(tmp_dir, store_dir)

    stream = (
        spark.readStream.schema("source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store_dir)
