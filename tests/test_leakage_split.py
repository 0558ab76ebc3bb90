"""Gates for leakage_safe_split (queries.py).

Twin of oracle strength: DuckDB recursive-CTE connected components (the
same oracle SQL the driver hash-checks for dedup_clusters) + the in-repo
bit-identical Murmur3 (pinned vs Spark hash() in test_queries_oracle) —
EXACT row equality on (doc_id, cluster_id, split_bucket, split).

Plus the property the operator exists for: no near-dup pair straddles
splits (closure), demonstrated non-vacuously by a planted corpus where
the naive doc_id-hash split DOES straddle a dup pair.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


def _twin_frame(sf_dir: str) -> pd.DataFrame:
    from extractor_spark.spark.queries import (
        _DEDUP_CLUSTERS_ORACLE,
        _SPLIT_BOUNDS,
        _murmur3_32,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    twin = con.execute(_DEDUP_CLUSTERS_ORACLE).fetchdf()
    lo, hi = _SPLIT_BOUNDS
    twin["split_bucket"] = [
        _murmur3_32(str(int(c)).encode("utf-8"), 42) % 100
        for c in twin["cluster_id"]
    ]
    twin["split"] = [
        "train" if b < lo else ("valid" if b < hi else "test")
        for b in twin["split_bucket"]
    ]
    return twin.sort_values("doc_id").reset_index(drop=True)


def _spark_frame(spark, sf_dir: str) -> pd.DataFrame:
    from extractor_spark.spark.queries import (
        _leakage_safe_split,
        release_query_caches,
    )

    got = _leakage_safe_split(spark, sf_dir).toPandas()
    release_query_caches()
    return got.sort_values("doc_id").reset_index(drop=True)


def test_split_equals_twin_exactly(spark):
    got = _spark_frame(spark, SF)
    want = _twin_frame(SF)
    assert len(got) == len(want) > 0
    for col in ("doc_id", "cluster_id", "split_bucket"):
        assert got[col].astype("int64").tolist() == want[col].astype("int64").tolist()
    assert got["split"].tolist() == want["split"].tolist()


def test_closure_and_proportions_sf001(spark):
    from extractor_spark.spark.queries import _JACCARD_ORACLE

    got = _spark_frame(spark, SF_MID)
    split_of = dict(zip(got["doc_id"], got["split"]))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_MID}/documents.parquet'"
    )
    pairs = con.execute(_JACCARD_ORACLE).fetchall()
    assert len(pairs) > 0, "corpus must contain near-dup pairs for a closure gate"
    for d1, d2 in pairs:
        assert split_of[d1] == split_of[d2], (d1, d2)
    # 90/5/5 on 500 docs: all three splits populated, train dominant
    counts = got["split"].value_counts()
    assert set(counts.index) == {"train", "valid", "test"}
    frac_train = counts["train"] / len(got)
    assert 0.8 <= frac_train <= 0.97


def test_planted_straddle_contrast(spark):
    """A dup pair whose two doc_ids hash to DIFFERENT naive buckets: the
    naive doc_id-hash split straddles it, the cluster-closed split cannot.
    Non-vacuity gate: proves the operator changes the outcome."""
    from pyspark.sql import functions as F

    from extractor_spark.spark.queries import (
        _SPLIT_BOUNDS,
        _murmur3_32,
        leakage_split_frame,
    )

    lo, _ = _SPLIT_BOUNDS

    def naive_bucket(doc_id: int) -> int:
        return _murmur3_32(str(doc_id).encode(), 42) % 100

    # find a pair where one id is train and the other isn't, under the
    # naive per-doc split
    a = next(i for i in range(1000) if naive_bucket(i) < lo)
    b = next(i for i in range(1000) if naive_bucket(i) >= lo)
    labels = spark.createDataFrame(
        [(a, min(a, b)), (b, min(a, b))], "doc_id long, cluster_id long"
    )
    got = leakage_split_frame(labels).collect()
    splits = {r["split"] for r in got}
    assert len(splits) == 1, "cluster-closed split must not straddle"
    naive = {naive_bucket(a) < lo, naive_bucket(b) < lo}
    assert len(naive) == 2, "naive split straddles this planted pair"
    # and the bucket matches the murmur twin on the cluster id
    want_bucket = _murmur3_32(str(min(a, b)).encode(), 42) % 100
    assert {r["split_bucket"] for r in got} == {want_bucket}
