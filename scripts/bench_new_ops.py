"""Scale probe for the late-round-4 operators at bench scale (default
100k docs / 100k pages — 200x the driver tables they are gated on).

What it demonstrates, per operator:
- ccnet_perplexity: the full-corpus bigram-scoring shuffle + bounded-
  histogram tertiles at 200x the gate corpus.
- bpe_learn_merges: corpus-size-INDEPENDENT rounds — the 100k-doc corpus
  collapses to a vocabulary once, then per-round cost matches the 500-doc
  case (the timing splits build vs rounds to make that visible).
- lr_quality_scores: 20 epochs over a persisted multi-million-row feature
  table, D+1 doubles to the driver per epoch.
- robots_filter: host join + Arrow decision pass over 100k real synth
  pages.

Corpus: the sf0.001 driver documents tiled deterministically with
distinct doc_ids and a copy-tag token (keeps per-doc text realistic while
scaling row count; no external data, no RNG).

Usage: python scripts/bench_new_ops.py [--docs 100000] [--pages 100000]
Writes one JSON line; redirect to BENCH/ to record.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def tiled_documents(spark, n_docs: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_base = base.count()
    copies = (n_docs + n_base - 1) // n_base
    tiled = (
        spark.range(copies)
        .crossJoin(base)
        .select(
            (F.col("doc_id") + F.col("id") * n_base).alias("doc_id"),
            # copy tag keeps tiled docs from being exact duplicates without
            # distorting the language signal
            F.concat(F.col("text"), F.lit(" copytag"), F.col("id").cast("string")).alias(
                "text"
            ),
            "lang",
        )
        .filter(F.col("doc_id") < n_docs)
        .repartition(32)
    )
    tiled.persist().count()
    return tiled


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--pages", type=int, default=100000)
    args = ap.parse_args()

    from extractor_spark.spark.session import get_spark
    from extractor_spark.spark import caches

    spark = get_spark("new-ops-scale", cpus=32)
    out: dict = {"docs": args.docs, "pages": args.pages}

    docs = tiled_documents(spark, args.docs)

    t0 = time.time()
    from extractor_spark.spark.queries import ccnet_perplexity_frame

    n = ccnet_perplexity_frame(docs).count()
    out["ccnet_perplexity_s"] = round(time.time() - t0, 2)
    out["ccnet_rows"] = n

    from extractor_spark.spark.bpe import learn_bpe

    t0 = time.time()
    merges = learn_bpe(docs, n_merges=24)
    out["bpe_24_merges_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    learn_bpe(docs.limit(500), n_merges=24)
    out["bpe_24_merges_500docs_s"] = round(time.time() - t0, 2)
    out["bpe_top_merge"] = list(merges[0]) if merges else None

    from extractor_spark.spark.lrtrain import lr_quality_scores_df

    t0 = time.time()
    n = lr_quality_scores_df(docs).count()
    caches.retire_all()
    out["lr_train_score_s"] = round(time.time() - t0, 2)
    out["lr_rows"] = n

    docs.unpersist()

    from extractor_spark.spark.robots import robots_filter, synth_robots_df
    from extractor_spark.spark.synth import build_pages_df
    from pyspark.sql import functions as F

    pages = build_pages_df(spark, args.pages, include_fixtures=False, dup_every=0)
    pages.persist().count()
    hosts = [
        r["host"]
        for r in pages.select(
            F.lower(F.parse_url("url", F.lit("HOST"))).alias("host")
        )
        .distinct()
        .collect()
    ]
    robots = synth_robots_df(spark, hosts)
    t0 = time.time()
    res = robots_filter(pages, robots).groupBy("allowed").count().collect()
    out["robots_filter_s"] = round(time.time() - t0, 2)
    out["robots_verdicts"] = {str(r["allowed"]): r["count"] for r in res}
    pages.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
