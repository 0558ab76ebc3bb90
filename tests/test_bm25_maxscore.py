"""Gates for MaxScore-pruned BM25 serving (spark/bm25index.py).

Equivalence chain: the pruned two-pass plan ≡ the single-pass full plan on
a Zipf corpus with mixed rare+stopword queries (the regime the pruning is
FOR), the full plan ≡ the fused registry SQL (tests/test_bm25_index.py),
and the fused SQL is pinned to a DuckDB twin + a hand-computed formula
corpus — so pruned serving inherits oracle strength transitively.  Plus:
the stored per-term upper bound dominates every actual posting
contribution (the exactness precondition), the all-hot query takes the
fallback path and still matches, and the stats out-param records real
pruning on the Zipf corpus.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from extractor_spark.spark.bm25index import (
    _HOT_DF_FRAC,
    B,
    K1,
    bm25_search_index,
    build_bm25_index,
)

pytestmark = pytest.mark.spark

N_DOCS = 2000
VOCAB = 5000


@pytest.fixture(scope="module")
def zipf_idx(spark, tmp_path_factory):
    """Deterministic Zipf-ish corpus: 40 tokens/doc, rank drawn log-uniform
    (pmf ∝ 1/rank — the web-text shape: a few stopwords own most postings,
    a long tail of rare terms)."""
    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        f"""concat_ws(' ', transform(sequence(1, 40), i ->
             concat('w', cast(floor(exp(
               (pmod(hash(id * 131 + i), 1000000) / 1000000.0) * ln({VOCAB})
             )) AS string)))) AS text""",
    )
    path = str(tmp_path_factory.mktemp("zipfidx") / "idx")
    build_bm25_index(docs, path)
    dfs = spark.read.parquet(path + "/_df")
    hot_cap = max(10.0, _HOT_DF_FRAC * N_DOCS)
    # df 8..cap/4: enough postings that the per-query essential candidate
    # pool exceeds topk (θ_lb needs a k-th partial), still rare-class
    rare = [
        r["term"]
        for r in dfs.where(f"df BETWEEN 8 AND {hot_cap / 4}")
        .orderBy(F.desc("df"), "term")
        .limit(24)
        .collect()
    ]
    hot = [
        r["term"]
        for r in dfs.where(f"df > {hot_cap}").orderBy(F.desc("df"), "term").limit(4).collect()
    ]
    assert len(rare) >= 24 and len(hot) >= 2, "corpus must have both regimes"
    queries = [
        (qid, [rare[2 * qid], rare[2 * qid + 1], hot[qid % 2], hot[2 + qid % 2]])
        for qid in range(12)
    ]
    return path, queries, hot


def _rows(df):
    return {(r["query_id"], r["doc_id"]): r["score"] for r in df.collect()}


def test_pruned_equals_full_on_zipf(spark, zipf_idx):
    path, queries, _hot = zipf_idx
    stats: dict = {}
    pruned = _rows(bm25_search_index(spark, path, queries, topk=10, stats_out=stats))
    full = _rows(bm25_search_index(spark, path, queries, topk=10, prune=False))
    assert pruned.keys() == full.keys()
    for key in full:
        # exact equality of the ROUNDED scores: the _ROUND_MARGIN
        # argument makes pruning exact post-rounding, so any real
        # divergence is at least one 4-dp grid step — a tolerance of
        # 1.5e-4 would silently admit it (membership equality above
        # remains the primary gate)
        assert pruned[key] == full[key], key
    # the pruning must actually fire on this corpus, not silently fall back
    assert stats["pruned_queries"] >= 8, stats
    assert 0 < stats["candidates"] <= 12 * 80, stats
    from extractor_spark.spark.queries import release_query_caches

    release_query_caches()


def test_all_hot_query_falls_back_and_matches(spark, zipf_idx):
    path, _queries, hot = zipf_idx
    q = [(99, hot[:3])]
    stats: dict = {}
    pruned = _rows(bm25_search_index(spark, path, q, topk=5, stats_out=stats))
    full = _rows(bm25_search_index(spark, path, q, topk=5, prune=False))
    assert stats["fallback_queries"] == 1 and stats["pruned_queries"] == 0
    assert pruned.keys() == full.keys() and pruned
    for key in full:
        # exact equality of the ROUNDED scores: the _ROUND_MARGIN
        # argument makes pruning exact post-rounding, so any real
        # divergence is at least one 4-dp grid step — a tolerance of
        # 1.5e-4 would silently admit it (membership equality above
        # remains the primary gate)
        assert pruned[key] == full[key], key
    from extractor_spark.spark.queries import release_query_caches

    release_query_caches()


def test_pass2_hot_scan_is_partition_pruned(spark, zipf_idx):
    """The hot-postings pass of a pruned query stays lazy in the returned
    frame: its parquet scan must carry the bucket PartitionFilters (the
    pass-1 scan is pinned transitively — same _pruned_postings helper,
    plan-gated via prune=False in test_bm25_index.py)."""
    path, queries, _hot = zipf_idx
    stats: dict = {}
    df = bm25_search_index(spark, path, queries[:2], topk=10, stats_out=stats)
    assert stats["pruned_queries"] == 2, stats
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan
    from extractor_spark.spark.queries import release_query_caches

    release_query_caches()


def test_stored_ub_dominates_every_posting(spark, zipf_idx):
    """The exactness precondition: the serve-derived envelope bound
    idf(Σdf)·sat(tf_max, dl_min) ≥ contribution of every actual posting of
    the term (saturation is monotone ↑ in tf, ↓ in dl)."""
    path, _queries, _hot = zipf_idx
    srows = spark.read.parquet(path + "/_stats").collect()
    n_docs = float(sum(r["n_docs"] for r in srows))
    avgdl = float(sum(r["sum_dl"] for r in srows)) / n_docs
    env = (
        spark.read.parquet(path + "/_df")
        .groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.max("tf_max").alias("tf_max"),
            F.min("dl_min").alias("dl_min"),
        )
    )
    post = spark.read.parquet(path).join(env, "term")
    tf = F.col("tf").cast("double")
    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = idf * tf * (K1 + 1.0) / (
        tf + K1 * (1.0 - B + B * F.col("dl").cast("double") / F.lit(avgdl))
    )
    ub = idf * F.col("tf_max") * (K1 + 1.0) / (
        F.col("tf_max") + K1 * (1.0 - B + B * F.col("dl_min") / F.lit(avgdl))
    )
    worst = post.agg(F.max(contrib - ub).alias("gap")).first()["gap"]
    assert worst <= 1e-9, worst


def test_rounding_margin_exceeds_grid_step():
    from extractor_spark.spark.bm25index import _ROUND_MARGIN

    assert _ROUND_MARGIN > 1e-4
    assert math.isfinite(_ROUND_MARGIN)
