"""Trained character-trigram Naive-Bayes language identification
(the CLD/langid.py shape — McNamee 2005 "Language identification: a
solved problem suitable for undergraduate instruction"; public
algorithm).  Upgrades the repo's marker-word `lang_id` heuristic to a
model TRAINED on the corpus's own labels.

Spark-first scale shape:

- Trigram extraction is one JVM pass (decode each text to a char array
  ONCE via split — the per-position substr loop is O(n²) on UTF8String —
  then a sequence/transform slide), shared verbatim between training and
  scoring so the twin can isolate the classifier math.
- Training is ONE map-side-combined groupBy (lang, trigram) over the
  doc_id%2==0 half, truncated to the top ``vocab_per_lang`` trigrams per
  language (window) — the model is BOUNDED (langs × vocab rows) and
  driver-resident, like the IVF centroids / PCA moments / LR weights.
- Scoring is a broadcast join of the model against the corpus trigram
  stream + one doc_id-shuffle aggregation.  Unseen trigrams take the
  per-language Laplace floor; every per-doc score is an exact BIGINT sum
  of precomputed micro-nat log-likelihoods (floor(1e6·ln p)), so the
  pandas twin (tests/test_langid_model.py) matches INTEGER-exactly —
  no float-order tolerance anywhere.
- Prediction = deterministic argmax (score desc, lang asc).

At 100 TB: the model stays a few thousand rows regardless of corpus
size; the corpus is touched once for training counts (half) and once for
scoring — both embarrassingly parallel around single shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000  # micro-nats


def _trigram_norm():
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")


def _hof_tris(norm):
    """Trigram-array spec expression (r5): split to a char array once,
    then zip_with over three shifted slices."""
    chars = F.filter(F.split(norm, "(?!^)"), lambda c: c != "")
    # zip_with over three shifted slices, NOT element_at(chars, i) inside a
    # sequence-transform: Catalyst inlines `chars` into every element_at
    # call, re-running the regex split per ELEMENT — O(n²)/doc, measured
    # 25 s for 500 docs.  zip_with binds its array arguments once per row
    # (the CLAUDE.md decode-once rule); slices of length max(n-2, 0) make
    # short docs yield an empty array and drop at the explode.
    m = F.greatest(F.size(chars) - 2, F.lit(0))
    s1 = F.slice(chars, 1, m)
    s2 = F.slice(chars, 2, m)
    s3 = F.slice(chars, 3, m)
    return F.zip_with(
        F.zip_with(s1, s2, lambda a, b: F.concat(a, b)),
        s3,
        lambda ab, c: F.concat(ab, c),
    )


def _doc_trigrams_hof(docs: DataFrame) -> DataFrame:
    """Spec form of the trigram extraction — tests/test_langid_model.py
    pins the production form exactly equal to it."""
    return docs.select(
        "doc_id", "lang", F.explode(_hof_tris(_trigram_norm())).alias("tri")
    )


def doc_trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, tri) — one row per character trigram of
    lower(trim(text)).  Whitespace runs collapse to a single space so
    formatting doesn't leak into the model.

    r6 fast path: ONE compiled-regex pass — overlapping trigrams via a
    lookahead capture, ``regexp_extract_all(norm, '(?s)(?=(.{3}))', 1)``
    — instead of the char-split + 3 slices + nested interpreted zip_with
    chain (~2.5x on the extraction-bound langid query).  (?s) keeps the
    Unicode line separators that survive the ASCII-only \\s collapse
    matchable by ``.``.

    The split spec operates on UTF-16 code UNITS (astral chars become two
    lone-surrogate "chars"), while Java regex advances by code POINTS —
    so rows containing astral chars take the spec branch (CASE WHEN
    evaluates per row, and the corpus is overwhelmingly BMP).  Equality
    vs the spec form on adversarial inputs (astral, U+2028/9, NBSP,
    combining marks) AND the corpus is pinned by
    tests/test_langid_model.py::test_trigram_regexp_matches_spec."""
    norm = _trigram_norm()
    fast = F.regexp_extract_all(norm, F.lit(r"(?s)(?=(.{3}))"), 1)
    tris = F.when(
        norm.rlike(r"[\x{10000}-\x{10FFFF}]"), _hof_tris(norm)
    ).otherwise(fast)
    return docs.select("doc_id", "lang", F.explode(tris).alias("tri"))


def train_langid(docs: DataFrame, vocab_per_lang: int = 2000):
    """Fit the NB model on the doc_id%2==0 half.

    Returns (model_rows, floors, priors):
    - model_rows: list of (lang, tri, score) — score = floor(1e6·ln((cnt+1)/(total+V)))
    - floors: {lang: floor-score for unseen trigrams} = floor(1e6·ln(1/(total+V)))
    - priors: {lang: floor(1e6·ln(n_lang_docs/n_docs))}
    All integers; V = the lang's truncated vocabulary size + 1."""
    from pyspark.sql import Window

    tris = doc_trigrams(docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0))
    counts = tris.groupBy("lang", "tri").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "tri")
    top = (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= vocab_per_lang)
        .drop("_rk")
    )
    rows = top.collect()  # bounded: langs × vocab_per_lang

    doc_counts = (
        docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    n_docs = sum(r["n"] for r in doc_counts)

    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["tri"], r["cnt"]))
    model_rows: list[tuple[str, str, int]] = []
    floors: dict[str, int] = {}
    for lang, items in by_lang.items():
        total = sum(c for _t, c in items)
        V = len(items) + 1
        for tri, cnt in items:
            model_rows.append(
                (lang, tri, math.floor(_SCALE * math.log((cnt + 1) / (total + V))))
            )
        floors[lang] = math.floor(_SCALE * math.log(1.0 / (total + V)))
    priors = {
        r["lang"]: math.floor(_SCALE * math.log(r["n"] / n_docs)) for r in doc_counts
    }
    return model_rows, floors, priors


def langid_scores_df(
    docs: DataFrame, vocab_per_lang: int = 2000
) -> DataFrame:
    """Train on the even-doc_id half, score EVERY doc, and emit
    (doc_id, actual_lang, predicted_lang, is_train, correct).

    Per-doc per-lang score = prior + Σ_matched model-score +
    (n_tri − n_matched)·floor — all BIGINT."""
    spark = docs.sparkSession
    model_rows, floors, priors = train_langid(docs, vocab_per_lang)
    langs = sorted(floors)
    model = F.broadcast(
        spark.createDataFrame(model_rows, "lang string, tri string, s bigint")
    )
    lang_consts = F.broadcast(
        spark.createDataFrame(
            [(lg, floors[lg], priors[lg]) for lg in langs],
            "lang string, floor_s bigint, prior_s bigint",
        ).withColumnRenamed("lang", "cand_lang")
    )

    # `tris` feeds BOTH the n_tri totals and the matched-score join, so the
    # trigram extraction runs twice — MEASURED as the right call (plan-audit
    # r5): persisting the exploded stream costs 9.1 s vs 7.4 s recomputed at
    # sf0.1, because building the columnar cache of a ~3×-text stream is
    # dearer than re-running the JVM split and it blocks codegen fusion
    # into the two aggregations.  Both passes are embarrassingly parallel.
    tris = doc_trigrams(docs).withColumnRenamed("lang", "actual_lang")
    totals = tris.groupBy("doc_id", "actual_lang").agg(
        F.count("*").cast("bigint").alias("n_tri")
    )
    # matched-score partials per candidate language (broadcast join; a
    # trigram unseen by a language simply contributes no row here)
    matched = (
        tris.join(model, tris["tri"] == model["tri"])
        .groupBy("doc_id", F.col("lang").alias("cand_lang"))
        .agg(
            F.sum("s").cast("bigint").alias("matched_s"),
            F.count("*").cast("bigint").alias("n_matched"),
        )
    )
    # every doc scores against every candidate language (langs is a small
    # constant — the cross join is |docs|×|langs| rows, the same width the
    # NB argmax needs)
    scored = (
        totals.crossJoin(lang_consts)
        .join(matched, ["doc_id", "cand_lang"], "left")
        .select(
            "doc_id",
            "actual_lang",
            "cand_lang",
            (
                F.col("prior_s")
                + F.coalesce(F.col("matched_s"), F.lit(0))
                + (F.col("n_tri") - F.coalesce(F.col("n_matched"), F.lit(0)))
                * F.col("floor_s")
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand_lang")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "doc_id",
            "actual_lang",
            F.col("cand_lang").alias("predicted_lang"),
            (F.pmod(F.col("doc_id"), F.lit(2)) == 0).alias("is_train"),
            (F.col("cand_lang") == F.col("actual_lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )
