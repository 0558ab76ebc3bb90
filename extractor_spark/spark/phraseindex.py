"""Positional inverted index: distributed build + arbitrary-length phrase serving.

The index-and-serve layer a web corpus needs for exact-phrase retrieval
(quote attribution, contamination auditing, "which training docs contain
this sentence") — the operator class Lucene/Elasticsearch fill in serving
stacks, expressed Spark-first.  No analog in /root/reference (it extracts
single pages); semantics are the textbook positional-postings model
(Manning/Raghavan/Schütze IR ch. 2: phrase queries via positional
intersection).

Two pieces:

- ``build_phrase_index(docs, path)``: ONE tokenize pass explodes
  (term, doc_id, pos) rows — the positional postings in flat columnar
  form — repartitioned BY TERM and sorted within partitions, then written
  to parquet.  Term-clustered row groups mean a later ``term IN (...)``
  predicate prunes on row-group min/max stats, so serving never rescans
  the corpus; at 100 TB this is the standard "index once, serve many"
  amortization, and the per-term row layout has no giant-postings-row
  skew problem (a stopword's postings are millions of SMALL rows spread
  over splittable row groups, never one unsplittable array cell).
- ``phrase_search(spark, path, phrases)``: arbitrary-k exact-phrase
  lookup in ONE index scan + ONE shuffle, phrase length notwithstanding.
  Each phrase is decomposed into (term, offset) legs; the index is
  filtered to the query vocabulary (pushdown-pruned scan), broadcast-
  joined against the tiny leg table, and a candidate start ``pos -
  offset`` matches iff ALL k offsets are present:
  ``count(distinct offset) == k`` grouped by (phrase, doc, start) — the
  classic positional-intersection algorithm as a single aggregation
  instead of k−1 self-joins.  Repeated terms in a phrase ("the cat the")
  and overlapping occurrences ("a a" in "a a a") fall out correctly from
  the distinct-offset count; tests pin both.

The registry query (`queries.py:_PHRASE_SPARK`) is the fixed-k=3 fused
form of the same semantics (trigram explode + broadcast phrase join, one
corpus pass, no stored artifact) with an exact DuckDB twin; this module
is the general-k production path, gated by a brute-force Python twin and
a pushdown plan test (tests/test_phrase_search.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tokenize_expr(col: str = "text"):
    """The corpus tokenize used across the text operators (whitespace on
    lowered, trimmed text) — index and query sides must split identically."""
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def build_phrase_index(docs: DataFrame, path: str, n_partitions: int = 32) -> None:
    """Write the flat positional postings (term, doc_id, pos) to ``path``.

    ``pos`` is 1-based.  Rows are term-repartitioned and term-sorted so
    parquet row-group statistics make the serving scan's ``term IN``
    filter prune effectively.
    """
    idx = docs.select(
        "doc_id", F.posexplode(tokenize_expr()).alias("pos0", "term")
    ).select("term", "doc_id", (F.col("pos0") + 1).alias("pos"))
    (
        idx.repartition(n_partitions, "term")
        .sortWithinPartitions("term", "doc_id", "pos")
        .write.mode("overwrite")
        .parquet(path)
    )


def _phrase_legs(spark: SparkSession, phrases: list[str]) -> DataFrame:
    rows = []
    for pid, p in enumerate(phrases):
        toks = p.strip().lower().split()
        if not toks:
            raise ValueError(f"empty phrase at index {pid}")
        for j, w in enumerate(toks):
            rows.append((pid, w, j, len(toks)))
    return spark.createDataFrame(
        rows, "phrase_id int, term string, offset int, k int"
    )


def phrase_search(
    spark: SparkSession, index_path: str, phrases: list[str]
) -> DataFrame:
    """Every occurrence of every phrase: (phrase_id, doc_id, start).

    One pruned index scan, one broadcast join, one aggregation shuffle —
    independent of phrase length k.
    """
    legs = _phrase_legs(spark, phrases)
    vocab = sorted({w for p in phrases for w in p.strip().lower().split()})
    idx = spark.read.parquet(index_path).where(F.col("term").isin(vocab))
    return (
        idx.join(F.broadcast(legs), "term")
        .groupBy(
            "phrase_id",
            "doc_id",
            (F.col("pos") - F.col("offset")).alias("start"),
            "k",
        )
        .agg(F.count_distinct("offset").alias("n_legs"))
        .where((F.col("n_legs") == F.col("k")) & (F.col("start") >= 1))
        .select("phrase_id", "doc_id", F.col("start").cast("long").alias("start"))
    )
