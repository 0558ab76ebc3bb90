"""Incremental MinHash dedup (spark/incdedup.py) gates:

1. From-scratch reference equality — the persisted-store replay is pinned
   against an independent one-shot computation that builds bands for the
   WHOLE corpus at once and takes only strictly-earlier-batch verified
   matches (no store, no incremental code, just the SQL templates).
2. Planted near-copy: a batch-2 doc that is a near-copy of a batch-1 doc
   is flagged with the right attribution; a fresh doc is not.
3. Streaming (foreachBatch availableNow) ≡ the batch loop on the same
   chunking.
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from extractor_spark.spark.session import get_spark

    yield get_spark("incdedup-tests", cpus=8)


def _corpus(spark, sf_dir=SF_DIR):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "CAST(doc_id AS STRING) AS url", "text", "pmod(doc_id, 3) AS b"
    )


def _run_incremental(spark, docs, n_batches=3, threshold=0.8):
    from extractor_spark.spark.incdedup import dedup_batch

    work = tempfile.mkdtemp(prefix="incdedup_t_")
    try:
        rows = {}
        for b in range(n_batches):
            batch = docs.filter(F.col("b") == b).select("url", "text")
            v = dedup_batch(spark, work, batch, threshold=threshold, batch_id=b)
            for r in v.collect():
                rows[r["url"]] = (r["is_dup"], r["dup_of"])
            v.unpersist()
        return rows
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_incremental_matches_from_scratch_reference(spark):
    from extractor_spark.spark.curate import _SHINGLE_SETS_TMPL
    from extractor_spark.spark.incdedup import _BATCH_BANDS_SQL

    docs = _corpus(spark)
    got = _run_incremental(spark, docs)

    # one-shot reference: full-corpus shingles + bands, candidates = band
    # collisions where the matched side sits in a STRICTLY EARLIER batch,
    # exact-Jaccard verify, min earlier url as attribution
    docs.createOrReplaceTempView("ref_docs")
    spark.sql(_SHINGLE_SETS_TMPL.format(view="ref_docs")).createOrReplaceTempView(
        "ref_sh"
    )
    spark.sql(_BATCH_BANDS_SQL.format(sh_view="ref_sh")).createOrReplaceTempView(
        "ref_bands"
    )
    expected_matches = {
        r["url"]: r["dup_of"]
        for r in spark.sql(
            """
            WITH cand AS (
              SELECT DISTINCT nb.url AS b_url, sb.url AS s_url
              FROM ref_bands nb
              JOIN ref_bands sb
                ON nb.band_idx = sb.band_idx AND nb.band_hash = sb.band_hash
              JOIN ref_docs nd ON nd.url = nb.url
              JOIN ref_docs sd ON sd.url = sb.url
              WHERE sd.b < nd.b
            )
            SELECT c.b_url AS url, min(c.s_url) AS dup_of
            FROM cand c
            JOIN ref_sh s1 ON s1.url = c.b_url
            JOIN ref_sh s2 ON s2.url = c.s_url
            WHERE CAST(size(array_intersect(s1.hs, s2.hs)) AS DOUBLE)
                  / (size(s1.hs) + size(s2.hs)
                     - size(array_intersect(s1.hs, s2.hs))) >= 0.8
            GROUP BY c.b_url
            """
        ).collect()
    }
    n_docs = docs.count()
    assert len(got) == n_docs
    flagged = {u for u, (d, _a) in got.items() if d}
    assert flagged == set(expected_matches)
    assert len(flagged) > 0, "corpus should contain cross-batch near-dups"
    for u in flagged:
        assert got[u][1] == expected_matches[u], u


def test_planted_near_copy_flagged(spark):
    import pandas as pd

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " changed"
    fresh = " ".join(f"other{i}" for i in range(60))
    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                ("a1", base, 0),
                ("b1", near, 1),   # near-copy of a1 -> flagged, dup_of a1
                ("b2", fresh, 1),  # novel -> not flagged
                ("c1", base, 2),   # exact copy arriving later -> dup_of a1
            ],
            columns=["url", "text", "b"],
        )
    )
    got = _run_incremental(spark, docs)
    assert got["a1"] == (False, None)
    assert got["b1"] == (True, "a1")
    assert got["b2"] == (False, None)
    assert got["c1"] == (True, "a1")


def test_streaming_equals_batch_loop(spark, tmp_path):
    from extractor_spark.spark.incdedup import streaming_dedup

    docs = _corpus(spark)
    batch_rows = _run_incremental(spark, docs)

    stream_dir = os.path.join(str(tmp_path), "docs_stream")
    os.makedirs(stream_dir)
    # one parquet FILE per batch, written in arrival order (the file
    # source picks them up one per microbatch via maxFilesPerTrigger=1)
    for b in range(3):
        part_dir = os.path.join(str(tmp_path), f"part{b}")
        docs.filter(F.col("b") == b).select("url", "text").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        src = next(
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        shutil.copy(
            os.path.join(part_dir, src), os.path.join(stream_dir, f"batch_{b}.parquet")
        )

    out = streaming_dedup(spark, stream_dir, os.path.join(str(tmp_path), "work"))
    stream_rows = {r["url"]: (r["is_dup"], r["dup_of"]) for r in out.collect()}
    assert stream_rows == batch_rows


def test_streaming_source_counts_match_batch_and_kl(spark, tmp_path):
    """Counts are associative: the streamed (source, w, c) store equals the
    one-shot batch aggregation exactly, and feeding the store to the KL
    SQL reproduces the batch source_drift_kl rows bit-for-bit."""
    from extractor_spark.spark.incdedup import streaming_source_counts
    from extractor_spark.spark.queries import _SOURCE_KL_SC_SQL, _SOURCE_KL_SPARK, _views

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
        "source", "text", "pmod(doc_id, 3) AS b"
    )
    stream_dir = os.path.join(str(tmp_path), "docs_stream")
    os.makedirs(stream_dir)
    for b in range(3):
        part_dir = os.path.join(str(tmp_path), f"part{b}")
        docs.filter(F.col("b") == b).select("source", "text").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        src = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        shutil.copy(
            os.path.join(part_dir, src), os.path.join(stream_dir, f"chunk_{b}.parquet")
        )

    store = streaming_source_counts(spark, stream_dir, os.path.join(str(tmp_path), "w"))

    _views(spark, SF_DIR)
    batch_counts = spark.sql(_SOURCE_KL_SC_SQL)
    got = {(r["source"], r["w"]): r["c"] for r in store.collect()}
    want = {(r["source"], r["w"]): r["c"] for r in batch_counts.collect()}
    assert got == want

    # KL from the streamed store == the batch query rows exactly
    batch_counts.createOrReplaceTempView("source_kl_sc")
    batch_kl = {tuple(r) for r in spark.sql(_SOURCE_KL_SPARK).collect()}
    store.createOrReplaceTempView("source_kl_sc")
    stream_kl = {tuple(r) for r in spark.sql(_SOURCE_KL_SPARK).collect()}
    assert stream_kl == batch_kl


def test_batch_replay_is_idempotent(spark):
    """At-least-once streaming semantics: re-running a batch AFTER its
    first attempt already wrote the store (the retry case) produces the
    identical verdicts — the probe reads only batch< partitions, so a
    batch never sees its own first attempt — and the per-batch partition
    OVERWRITE leaves the store without duplicates."""
    import pandas as pd

    from extractor_spark.spark.incdedup import BANDS_SUBDIR, dedup_batch

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " changed"
    docs = spark.createDataFrame(
        pd.DataFrame(
            [("a1", base, 0), ("b1", near, 1), ("b2", base + " tail x", 1)],
            columns=["url", "text", "b"],
        )
    )
    work = tempfile.mkdtemp(prefix="incdedup_replay_")
    try:
        for b in range(2):
            batch = docs.filter(F.col("b") == b).select("url", "text")
            v1 = dedup_batch(spark, work, batch, batch_id=b)
        first = sorted(tuple(r) for r in v1.collect())
        bands_rows = spark.read.parquet(os.path.join(work, BANDS_SUBDIR)).count()

        # retry batch 1: store already holds its first attempt
        batch = docs.filter(F.col("b") == 1).select("url", "text")
        v2 = dedup_batch(spark, work, batch, batch_id=1)
        assert sorted(tuple(r) for r in v2.collect()) == first
        # overwrite, not append: store row count unchanged
        assert (
            spark.read.parquet(os.path.join(work, BANDS_SUBDIR)).count()
            == bands_rows
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
