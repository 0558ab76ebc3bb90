"""Stored BM25 index: build-once ranked-retrieval postings + pruned serving.

The ranked-retrieval sibling of spark/phraseindex.py (same index-once
serve-many amortization, same 256 term-hash bucket layout so a query's
scan is partition-pruned at planning time).  Where the phrase index stores
positions for exact intersection, this stores per-(term, doc) term
frequencies plus the two corpus statistics BM25 needs (document frequency
per term; N and avgdl), so serving a query batch costs one pruned postings
scan + two broadcast joins — never a corpus pass.

Semantics are identical to the fused registry query
(`queries.py:_BM25_BATCH_SPARK`: Okapi BM25, k1=1.2, b=0.75, Lucene's
non-negative idf, per-query top-10, 4-dp rounding, doc_id tie-break);
tests/test_bm25_index.py pins serve ≡ fused-SQL equality on the registry's
own query set, the partition-pruned scan, and OR-semantics for absent
terms.

Layout under ``path``:
  bucket=<0..255>/  (term, doc_id, tf, dl) term-sorted row groups
  _df/              (term, df) vocabulary-sized side table
  _stats/           1 row (n_docs, avgdl)
Underscore prefixes keep the side tables invisible to parquet reads of
``path`` itself (the phraseindex convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .phraseindex import N_TERM_BUCKETS, tokenize_expr

K1 = 1.2
B = 0.75


def build_bm25_index(docs: DataFrame, path: str, n_partitions: int = 32) -> None:
    """ONE tokenize pass → (term, doc_id, tf, dl) postings hash-partitioned
    into ``bucket=pmod(xxhash64(term), 256)`` dirs; df and corpus stats are
    derived FROM the written postings (column-pruned scans), not a second
    corpus pass."""
    postings = (
        docs.select("doc_id", tokenize_expr().alias("t"))
        .select("doc_id", F.size("t").alias("dl"), F.explode("t").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"), F.max("dl").alias("dl"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)))
    )
    (
        postings.repartition(n_partitions, "bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    spark = docs.sparkSession
    written = spark.read.parquet(path)
    written.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    ).repartition(8).write.mode("overwrite").parquet(path + "/_df")
    # every doc contributes ≥1 posting (split of any text is non-empty), so
    # the postings cover the corpus: N = distinct docs, sum(tf) = Σ dl
    written.agg(
        F.countDistinct("doc_id").cast("double").alias("n_docs"),
        (F.sum("tf") / F.countDistinct("doc_id")).alias("avgdl"),
    ).write.mode("overwrite").parquet(path + "/_stats")


def bm25_search_index(
    spark: SparkSession,
    index_path: str,
    queries: list[tuple[int, list[str]]],
    topk: int = 10,
) -> DataFrame:
    """Batch ranked retrieval: (query_id, doc_id, score) top-``topk`` per
    query, score DESC / doc_id ASC.  Absent query terms contribute nothing
    (bag-of-words OR semantics).  Cost: one partition+row-group-pruned
    postings scan ∝ the query terms' postings, one broadcast legs join,
    one broadcast df join, one (query, doc) aggregation shuffle, one
    WindowGroupLimit top-k — corpus size only enters through the stats."""
    from pyspark.sql import Window

    leg_rows = sorted(
        {(qid, t.strip().lower()) for qid, terms in queries for t in terms if t.strip()}
    )
    if not leg_rows:
        return spark.createDataFrame([], "query_id int, doc_id long, score double")
    vocab = sorted({t for _, t in leg_rows})
    legs = spark.createDataFrame(leg_rows, "query_id int, term string")

    stats = spark.read.parquet(index_path + "/_stats").first()
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    dfs = spark.read.parquet(index_path + "/_df").where(F.col("term").isin(vocab))

    buckets = sorted(
        {
            r["b"]
            for r in spark.createDataFrame([(w,) for w in vocab], "term string")
            .select(F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).alias("b"))
            .collect()
        }
    )
    post = spark.read.parquet(index_path).where(
        F.col("bucket").isin(buckets) & F.col("term").isin(vocab)
    )

    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf = F.col("tf").cast("double")
    contrib = idf * tf * (K1 + 1.0) / (
        tf + K1 * (1.0 - B + B * F.col("dl").cast("double") / F.lit(avgdl))
    )
    scored = (
        post.join(F.broadcast(legs), "term")
        .join(F.broadcast(dfs), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 4).cast("double").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select("query_id", "doc_id", "score")
    )
