"""Training-data curation: the composite job a 100 TB text pipeline runs
AFTER extraction — URL blocklist, exact dedup, MinHash-LSH near-dup
clustering with canonical selection, quality filtering, benchmark
decontamination, leakage-safe split assignment, JSONL export.

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

# Per-doc hashed-shingle SETS as one array row (no (url, shingle) explode
# anywhere).  Shingles are 64-bit xxhash64'd up front: Jaccard over hashed
# shingles equals Jaccard over strings up to hash collisions (~|S|²/2⁶⁴ per
# doc pair — negligible), and the set rides through every later stage as a
# ~1.6 KB array instead of ~200 string rows.  This is what makes the verify
# stage scale: the old exploded-form verify built a |cand| × |shingles/doc|
# row intermediate (≈10⁹ rows / ~100 GB shuffle at 100k docs) and OOM'd the
# box; the array form shuffles |cand| pair rows + one 2-column array table.
_SHINGLE_SETS_TMPL = """
SELECT url,
       array_distinct(transform(
         sequence(0, size(w) - 3),
         i -> xxhash64(concat_ws(' ', w[i], w[i+1], w[i+2])))) AS hs
FROM (SELECT url, split(trim(text), '\\\\s+') AS w FROM {view})
WHERE size(w) >= 3
"""

# 64 MinHash values per doc as a pure array expression over the hashed
# shingle set — 64 × |hs| JVM-side hash evals in one projection, NO
# 64-way posexplode and NO (url, seed) shuffle — then 16 bands of 4.
_BANDS_SQL = """
SELECT url, b.pos AS band_idx,
       xxhash64(sig[b.pos * 4], sig[b.pos * 4 + 1], sig[b.pos * 4 + 2], sig[b.pos * 4 + 3]) AS band_hash
FROM (
  SELECT url,
         transform(sequence(0, 63),
                   seed -> array_min(transform(hs, h -> xxhash64(h, seed)))) AS sig
  FROM curate_sh
)
LATERAL VIEW posexplode(sequence(0, 15)) b AS pos, val
"""

# Banded candidates as a STAR per bucket (each member links to the bucket's
# min url), then exact-Jaccard verify on those pairs only via
# array_intersect over the per-doc hash sets.
#
# Star-per-bucket is what keeps candidate volume LINEAR in bucket size: an
# all-pairs bucket join is quadratic per bucket, and on template-heavy web
# corpora one hot band bucket (measured: 2,319 docs in the 100k-page bench
# corpus) concentrates C(2319,2) ≈ 2.7M pairs × two 1.6 KB hash arrays into
# a single join task — an unsplittable straggler AQE's skew join cannot
# help with (the skew only exists in the join OUTPUT).  For clustering,
# star connectivity is equivalent UP TO the verify: x—y inside one bucket
# are connected iff both (hub,x) and (hub,y) survive the Jaccard gate,
# rather than iff (x,y) does.  For true near-dup families (the thing hot
# buckets are made of) hub edges verify; borderline pairs may fragment
# across clusters — the price of linear candidate volume, and the standard
# production trade (16 independent bands give 16 independent hubs, so a
# genuine cluster needs all 16 star edges to fail before it splits).
#
# r6: the hub is attached with ONE window pass (min(url) OVER the band
# bucket) instead of a groupBy + join-back — identical hubs, one shuffle
# of the band table instead of two full passes (measured 5.1 -> 3.7 s on
# the hubs+cand portion at 100k docs).
_VERIFIED_PAIRS_TMPL = """
WITH cand AS (
  SELECT DISTINCT hub AS u1, url AS u2
  FROM (
    SELECT url, min(url) OVER (PARTITION BY band_idx, band_hash) AS hub
    FROM curate_bands
  )
  WHERE url <> hub
)
SELECT u1, u2
FROM (
  SELECT c.u1, c.u2,
         CAST(size(array_intersect(s1.hs, s2.hs)) AS DOUBLE) AS n_common,
         CAST(size(s1.hs) + size(s2.hs) AS DOUBLE) AS n_total
  FROM cand c
  JOIN curate_sh s1 ON s1.url = c.u1
  JOIN curate_sh s2 ON s2.url = c.u2
)
WHERE n_common / (n_total - n_common) >= {threshold}
"""


def _components(docs: DataFrame, pairs: DataFrame, algorithm: str) -> DataFrame:
    """Connected components over (u1, u2) pairs; returns (url, cluster_id)
    via the shared graph helpers (url strings — min() orders
    lexicographically).  ``minlabel`` converges in rounds ∝ cluster
    diameter (near-dup clusters are quasi-cliques: 2-4 rounds);
    ``star`` (alternating large/small-star) is the O(log diameter)
    variant for corpora with long near-dup chains."""
    from extractor_spark.spark.graph import min_label_components, star_components

    algo = {"minlabel": min_label_components, "star": star_components}[algorithm]
    return algo(docs, pairs.selectExpr("u1 AS src", "u2 AS dst"), "url")


def assign_packs(
    spark: SparkSession,
    docs: DataFrame,
    order_col: str,
    budget: int,
    n_parts: int = 16,
) -> DataFrame:
    """Concat-then-chunk pack ids over `order_col` order via the two-level
    distributed prefix sum (per-partition cumsum + broadcast offsets —
    never a single-partition global window; same decomposition as the
    oracle-checked `sequence_packing` query in queries.py).  Adds
    `n_tokens` and `pack_id` columns.

    A caller may pre-compute `n_tokens` (with this exact expression) and
    pass a frame WITHOUT the text payload: repartitionByRange samples its
    input with a separate job and the checkpoint stores every column, so
    a narrow frame skips a full text pass + text-sized block storage
    (r6 — the sequence_packing query passes (doc_id, n_tokens) only)."""
    if "n_tokens" in docs.columns:
        base = docs
    else:
        base = docs.withColumn(
            "n_tokens", F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
        )
    parts = (
        base.repartitionByRange(n_parts, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # the totals collect materializes it
    )
    totals = parts.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    by_pid = {r["_pid"]: r["t"] for r in totals}
    offsets, acc = [], 0
    for pid in sorted(by_pid):
        offsets.append((pid, acc))
        acc += by_pid[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _offset bigint")
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        parts.withColumn("_cs", F.sum("n_tokens").over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            "pack_id",
            F.floor((F.col("_offset") + F.col("_cs") - F.col("n_tokens")) / F.lit(budget)).cast("bigint"),
        )
        .drop("_pid", "_cs", "_offset")
    )


def curate(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    min_tokens: int = 10,
    max_dup_permille: int = 300,
    jaccard_threshold: float = 0.8,
    components: str = "minlabel",
    pack_budget: int | None = None,
    blocklist_domains: str | None = None,
    blocklist_urls: str | None = None,
    decon_benchmarks: str | None = None,
    split: bool = False,
    shuffle_seed: int | None = None,
    stage_times: dict | None = None,
) -> dict:
    """Run the curation funnel over an extract-pipeline output table;
    returns per-stage counts.

    Optional stages (each a scale-audited primitive from this repo):

    - ``blocklist_domains`` / ``blocklist_urls``: UT1-format rule files
      (spark/blocklist.py loaders); pages matching any rule are dropped
      FIRST — cheapest filter before any hashing.
    - ``decon_benchmarks``: text file(s), one benchmark document per
      line; any doc sharing an 8-token word-gram with a benchmark is
      dropped (GPT-3 appendix-C whole-doc variant) after the quality
      filter — the expensive gram join runs on the smallest surviving
      set.  Grams are xxhash64'd (collision odds ~|grams|²/2⁶⁴ —
      negligible; the oracled exact-string form is ngram_decontaminate).
    - ``split``: adds a leakage-safe train/valid/test column keyed on
      the SAME near-dup cluster ids stage 2 already computed (zero extra
      shuffles) — so the assignment is closed over near-dup clusters by
      construction even if dedup is later relaxed to keep k per cluster.
    - ``shuffle_seed``: packs are composed over a seeded deterministic
      global shuffle order (xxhash64(url, seed)) instead of url order —
      the standard pre-training document shuffle, so a pack mixes hosts
      and sources rather than concatenating one site's pages.  Only
      meaningful with ``pack_budget``.
    - ``stage_times``: optional dict that receives per-stage wall seconds
      (measurement aid — does not change execution).
    """
    import time as _time

    _t0 = _time.time()

    def _mark(label: str) -> None:
        nonlocal _t0
        now = _time.time()
        if stage_times is not None:
            stage_times[label] = round(now - _t0, 3)
        _t0 = now

    docs = (
        spark.read.parquet(input_path)
        .select("url", "markdown", "text")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
    )
    stats = {"input_docs": docs.count()}
    _mark("input")
    sc = spark.sparkContext
    cache_mark = len(caches.LIVE)  # don't touch unrelated queries' caches
    ckpt_handles: list = []

    # 0. URL blocklist (UT1 rules): drop matched pages before any hashing
    if blocklist_domains or blocklist_urls:
        from .blocklist import apply_blocklist, load_ut1_domains, load_ut1_urls

        dom = (
            load_ut1_domains(spark, blocklist_domains)
            if blocklist_domains
            else spark.createDataFrame([], "domain string, category string")
        )
        pre = (
            load_ut1_urls(spark, blocklist_urls)
            if blocklist_urls
            else spark.createDataFrame(
                [], "rule_host string, path_prefix string, category string"
            )
        )
        docs = apply_blocklist(docs, dom, pre)
        stats["after_blocklist"] = docs.count()
        _mark("blocklist")

    # 1. exact dedup (keep min url per fingerprint).  r6: decide on LIGHT
    # (url, md5) rows and attach once — same winner set as the payload
    # window (identical window spec), one url-keyed join instead of
    # shuffling text+markdown through the fingerprint window (AQE
    # broadcasts the winner set at bench scale).
    w = Window.partitionBy("_fp").orderBy("url")
    keep = (
        docs.select("url", F.md5("text").alias("_fp"))
        .withColumn("_rk", F.row_number().over(w))
        .filter("_rk = 1")
        .select("url")
    )
    docs = docs.join(keep, "url")
    before = caches.persistent_ids(sc)
    # lazy: the stage count below is the materializing job (one pass, not
    # checkpoint + count); reused by pairs + components + filter
    docs = docs.localCheckpoint(eager=False)
    ckpt_handles += caches.checkpoint_handles_since(sc, before)
    stats["after_exact_dedup"] = docs.count()
    _mark("exact_dedup")

    # 2. near-dup clusters → canonical per cluster (longest text, then url)
    docs.createOrReplaceTempView("curate_docs")
    # materialize the shingle sets and band table once each (both are
    # consumed 2-3 times downstream; without the checkpoint Spark would
    # recompute the 64-hash signature projection per consumer)
    before = caches.persistent_ids(sc)
    sh = spark.sql(_SHINGLE_SETS_TMPL.format(view="curate_docs")).localCheckpoint()
    sh.createOrReplaceTempView("curate_sh")
    _mark("shingle_sets")
    bands = spark.sql(_BANDS_SQL).localCheckpoint()
    bands.createOrReplaceTempView("curate_bands")
    _mark("bands")
    ckpt_handles += caches.checkpoint_handles_since(sc, before)
    # materialize the verified pairs before the CC loop: the verify join is
    # the funnel's most expensive plan, and leaving it lazy re-plans it
    # inside the first label-propagation round's edges materialization —
    # measured 3-5x timing instability at 100k docs (AQE re-plans under a
    # different runtime-stats context); checkpointed it is a stable ~9 s
    # stage and the CC rounds join a small materialized edge table.
    before = caches.persistent_ids(sc)
    pairs = spark.sql(
        _VERIFIED_PAIRS_TMPL.format(threshold=jaccard_threshold)
    ).localCheckpoint()
    ckpt_handles += caches.checkpoint_handles_since(sc, before)
    _mark("verified_pairs")
    labels = _components(docs, pairs, components)
    # r6 canonical pick: decide on LIGHT rows, attach once (guide §8).
    # The old form joined the full (url, markdown, text) payload to the
    # labels and ran the cluster window over it — two payload shuffles for
    # a decision that only needs (url, cluster_id, length(text)).  Here the
    # window runs over the light frame; the surviving (url[, cluster_id])
    # set joins back to the payload once (AQE broadcasts it at bench scale;
    # at corpus scale it degrades to the same single url-keyed shuffle the
    # old join already paid).  Winner set is identical: same window, same
    # ordering keys.
    wc = Window.partitionBy("cluster_id").orderBy(
        F.col("_n").desc(), F.col("url").asc()
    )
    kept = (
        docs.select("url", F.length("text").alias("_n"))
        .join(labels, "url")
        .withColumn("_rk", F.row_number().over(wc))
        .filter("_rk = 1")
        .select("url", *(["cluster_id"] if split else []))
    )
    before = caches.persistent_ids(sc)
    docs = docs.join(kept, "url").localCheckpoint(
        eager=False
    )  # consumed by two counts AND the export
    # write; the stage count below is the materializing job
    ckpt_handles += caches.checkpoint_handles_since(sc, before)
    stats["after_neardup_dedup"] = docs.count()
    _mark("components_canonical")
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
    _mark("quality_filter")

    # 3a. optional benchmark decontamination: drop any doc sharing an
    # 8-token word-gram with a benchmark line (GPT-3 appendix-C whole-doc
    # variant, xxhash64'd grams).  Benchmark grams are a bounded table
    # (benchmark suites are MBs) — broadcast; the corpus gram stream flows
    # through the join un-materialized and the anti-join is one shuffle
    # on url.
    if decon_benchmarks:
        gram_hashes = (
            "transform(sequence(0, size(_w) - 8), "
            "i -> xxhash64(concat_ws(' ', slice(_w, i + 1, 8))))"
        )
        bm_grams = (
            spark.read.text(decon_benchmarks)
            .select(F.split(F.trim("value"), r"\s+").alias("_w"))
            .where(F.size("_w") >= 8)
            .select(F.explode(F.expr(gram_hashes)).alias("gh"))
            .distinct()
        )
        doc_grams = (
            docs.select("url", F.split(F.trim("text"), r"\s+").alias("_w"))
            .where(F.size("_w") >= 8)
            .select("url", F.explode(F.expr(gram_hashes)).alias("gh"))
        )
        contaminated = (
            doc_grams.join(F.broadcast(bm_grams), "gh").select("url").distinct()
        )
        docs = docs.join(contaminated, "url", "left_anti")
        stats["after_decontamination"] = docs.count()

    # 3b. optional leakage-safe split: train/valid/test keyed on the
    # near-dup cluster id stage 2 already computed — a pure JVM hash
    # expression, zero extra shuffles, closed over dup clusters by
    # construction.
    if split:
        from .queries import leakage_split_expr

        _, split_col = leakage_split_expr("cluster_id")
        docs = docs.withColumn("split", split_col).drop("cluster_id")
        stats["split_counts"] = {
            r["split"]: r["n"]
            for r in docs.groupBy("split").agg(F.count("*").alias("n")).collect()
        }

    # 3c. optional sequence packing: training-ready pack ids over the
    # surviving docs (url order), so the exported JSONL can be consumed as
    # concat-then-chunk sequences without another pass over the corpus
    if pack_budget:
        sc_before = caches.persistent_ids(sc)
        # seeded global shuffle order for pack composition (deterministic:
        # same seed → same packs); url order otherwise
        order_col = "url"
        if shuffle_seed is not None:
            docs = docs.withColumn(
                "_ord", F.xxhash64(F.col("url"), F.lit(int(shuffle_seed)))
            )
            order_col = "_ord"
            stats["shuffle_seed"] = int(shuffle_seed)
        # checkpoint the packed result too: both the n_packs count and the
        # export write consume it, and the post-checkpoint window+join
        # portion of assign_packs would otherwise run twice (lazy: the
        # n_packs aggregate below is the materializing job)
        docs = assign_packs(spark, docs, order_col, pack_budget).drop(
            "_ord"
        ).localCheckpoint(eager=False)
        ckpt_handles += caches.checkpoint_handles_since(sc, sc_before)
        stats["n_packs"] = docs.agg(F.countDistinct("pack_id")).first()[0]
        stats["pack_budget"] = pack_budget

    # 4. export
    from extractor_spark.spark.sources import write_output

    write_output(docs, output_path, fmt="jsonl", partition_col=None)
    _mark("export")
    stats["output_path"] = output_path
    # the export was the last consumer — release this run's checkpoints
    # (curate owns them end-to-end, unlike lazy-returning queries)
    for h in ckpt_handles:
        h.unpersist()
    return stats
