"""Training-data curation: the composite job a 100 TB text pipeline runs
AFTER extraction — exact dedup, MinHash-LSH near-dup clustering with
canonical selection, quality filtering, JSONL export.

Every stage is the scale-audited primitive from queries.py applied to the
extract pipeline's output table (url-keyed instead of doc_id-keyed):

1. exact dedup       — md5 fingerprint, keep min-url per group (map-side
                       hash agg; one shuffle on the fingerprint)
2. near-dup clusters — banded MinHash (64 perms × 16 bands) candidate
                       pairs → exact-Jaccard verify (only candidates, never
                       all pairs) → connected components via min-label
                       propagation → keep the longest text per cluster
3. quality filter    — token-count floor + duplicate-line ceiling
                       (Gopher-style repetition signal)
4. export            — one JSON object per line (url, text, markdown)

Returns per-stage counts so the curation funnel is auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import caches

_MINHASH_PAIRS_TMPL = """
WITH toks AS (
  SELECT url, split(trim(text), '\\\\s+') AS w FROM {view}
),
sh AS (
  SELECT DISTINCT url, sh.shingle
  FROM toks
  LATERAL VIEW explode(
    transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
  ) sh AS shingle
  WHERE size(w) >= 3
),
seeded AS (
  SELECT url, s.seed, min(xxhash64(shingle, s.seed)) AS mh
  FROM sh LATERAL VIEW posexplode(sequence(0, 63)) s AS seed, sval
  GROUP BY url, s.seed
),
sigs AS (
  SELECT url,
         transform(array_sort(collect_list(struct(seed, mh))), x -> x.mh) AS sig
  FROM seeded GROUP BY url
),
bands AS (
  SELECT url, b.pos AS band_idx,
         xxhash64(sig[b.pos * 4], sig[b.pos * 4 + 1], sig[b.pos * 4 + 2], sig[b.pos * 4 + 3]) AS band_hash
  FROM sigs
  LATERAL VIEW posexplode(sequence(0, 15)) b AS pos, val
),
cand AS (
  SELECT DISTINCT a.url AS u1, b.url AS u2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.url < b.url
),
-- exact-Jaccard verify on CANDIDATES only (the all-pairs join never happens)
sh_sizes AS (SELECT url, count(*) AS n FROM sh GROUP BY url),
common AS (
  SELECT c.u1, c.u2, count(*) AS n_common
  FROM cand c
  JOIN sh s1 ON s1.url = c.u1
  JOIN sh s2 ON s2.url = c.u2 AND s2.shingle = s1.shingle
  GROUP BY c.u1, c.u2
)
SELECT m.u1, m.u2
FROM common m
JOIN sh_sizes z1 ON m.u1 = z1.url
JOIN sh_sizes z2 ON m.u2 = z2.url
WHERE CAST(m.n_common AS DOUBLE) / (z1.n + z2.n - m.n_common) >= {threshold}
"""


def _components(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Min-label connected components over (u1, u2) pairs; returns
    (url, cluster_id) via the shared Pregel-lite helper (url strings —
    min() orders lexicographically)."""
    from extractor_spark.spark.graph import min_label_components

    return min_label_components(
        docs, pairs.selectExpr("u1 AS src", "u2 AS dst"), "url"
    )


def curate(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    min_tokens: int = 10,
    max_dup_permille: int = 300,
    jaccard_threshold: float = 0.8,
) -> dict:
    """Run the curation funnel over an extract-pipeline output table;
    returns per-stage counts."""
    docs = (
        spark.read.parquet(input_path)
        .select("url", "markdown", "text")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
    )
    stats = {"input_docs": docs.count()}
    sc = spark.sparkContext
    cache_mark = len(caches.LIVE)  # don't touch unrelated queries' caches
    ckpt_handles: list = []

    # 1. exact dedup (keep min url per fingerprint)
    w = Window.partitionBy(F.md5("text")).orderBy("url")
    docs = (
        docs.withColumn("_rk", F.row_number().over(w)).filter("_rk = 1").drop("_rk")
    )
    before = caches.persistent_ids(sc)
    docs = docs.localCheckpoint()  # reused by pairs + components + filter
    ckpt_handles += caches.checkpoint_handles_since(sc, before)
    stats["after_exact_dedup"] = docs.count()

    # 2. near-dup clusters → canonical per cluster (longest text, then url)
    docs.createOrReplaceTempView("curate_docs")
    pairs = spark.sql(
        _MINHASH_PAIRS_TMPL.format(view="curate_docs", threshold=jaccard_threshold)
    )
    labels = _components(docs, pairs)
    wc = Window.partitionBy("cluster_id").orderBy(
        F.length("text").desc(), F.col("url").asc()
    )
    before = caches.persistent_ids(sc)
    docs = (
        docs.join(labels, "url")
        .withColumn("_rk", F.row_number().over(wc))
        .filter("_rk = 1")
        .drop("_rk", "cluster_id")
    ).localCheckpoint()  # consumed by two counts AND the export write
    ckpt_handles += caches.checkpoint_handles_since(sc, before)
    stats["after_neardup_dedup"] = docs.count()
    # labels' checkpoint (registered by min_label_components) has no
    # dependents once docs is materialized — release it now
    caches.retire_since(cache_mark)

    # 3. quality filter: token floor + duplicate-line ceiling
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    lines = F.filter(F.split("text", "\n"), lambda l: F.length(F.trim(l)) > 0)
    dup_permille = F.when(
        F.size(lines) > 0,
        F.round(
            1000.0
            * (F.size(lines) - F.size(F.array_distinct(lines)))
            / F.size(lines)
        ),
    ).otherwise(F.lit(0))
    docs = docs.filter(
        (toks >= min_tokens) & (dup_permille <= max_dup_permille)
    )
    stats["after_quality_filter"] = docs.count()

    # 4. export
    from extractor_spark.spark.sources import write_output

    write_output(docs, output_path, fmt="jsonl", partition_col=None)
    stats["output_path"] = output_path
    # the export was the last consumer — release this run's checkpoints
    # (curate owns them end-to-end, unlike lazy-returning queries)
    for h in ckpt_handles:
        h.unpersist()
    return stats
