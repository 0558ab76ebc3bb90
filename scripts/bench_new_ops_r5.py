"""Scale probe for the round-5 continuation-session-2 operators.

Per operator, what it demonstrates well past the 500-doc driver gates:

- source_quota_cap / mixture_sample (default 1M docs): the partial+final
  WindowGroupLimit plan under heavy keys — tiling keeps 20 sources /
  5 languages, so each window key holds ~50k/200k rows and the partial
  group-limit must do the work (a full per-key sort would be the
  quadratic-ish failure mode the plan pin guards against).
- unicode_sanitize_stats' Arrow pass (default 200k docs): sustained
  Python-side sanitize throughput (docs/s) — the pass is map-only, so
  this number scales linearly with executors.
- PQ (default 500k synthetic 64-dim vectors, generated distributed with
  per-partition seeded RNG — deterministic, no external data): bounded
  codebook training (16384-row sample regardless of corpus size), the
  one-pass encode, and the JVM ADC shortlist + exact rerank search.

Session-3 legs:

- decontaminate_spans (1M tiled docs): the tiling REPLICATES the sf0.001
  benchmark docs (doc_id<10) as training copies, so every copy fully
  collides — ~20k contaminated docs exercise the covered-index union and
  rebuild at three orders of magnitude past the driver gate.
- source_drift_kl (1M docs): one tokenize pass + vocab-sized joins.
- d4_prototypes_prune core (500k synthetic vectors): the Arrow scoring
  pass + per-cell prototypicality window at 1000× the driver's table
  (centroids trained on the seeded IVF sample as in the query).

Usage: python scripts/bench_new_ops_r5.py [--docs 1000000]
       [--sanitize-docs 200000] [--vecs 500000]
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
        "doc_id", "text", "lang", "source"
    )
    n_base = base.count()
    copies = (n_docs + n_base - 1) // n_base
    tiled = (
        spark.range(copies)
        .crossJoin(base)
        .select(
            (F.col("doc_id") + F.col("id") * n_base).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" copytag"), F.col("id").cast("string")
            ).alias("text"),
            "lang",
            "source",
        )
        .filter(F.col("doc_id") < n_docs)
        .withColumn("n_chars", F.length("text").cast("bigint"))
        .repartition(32)
    )
    tiled.persist().count()
    return tiled


def synth_embeddings(spark, n_vecs: int, dim: int = 64):
    """Distributed deterministic synthesis: per-partition numpy RNG seeded
    by the partition's first id — same output at any parallelism because
    ids are range-partitioned contiguously."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(0xE5 + int(ids[0]))
            x = rng.standard_normal((len(ids), dim))
            yield pd.DataFrame({"vec_id": ids, "embedding": list(x)})

    df = (
        spark.range(n_vecs, numPartitions=32)
        .mapInPandas(gen, schema="vec_id bigint, embedding array<double>")
        .persist()
    )
    df.count()
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--sanitize-docs", type=int, default=200_000)
    ap.add_argument("--vecs", type=int, default=500_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from extractor_spark.spark.session import get_spark

    spark = get_spark("new-ops-scale-r5", cpus=32)
    out: dict = {
        "docs": args.docs,
        "sanitize_docs": args.sanitize_docs,
        "vecs": args.vecs,
    }

    docs = tiled_documents(spark, args.docs)
    docs.createOrReplaceTempView("documents")

    from extractor_spark.spark.queries import (
        _MIXTURE_SAMPLE_SPARK,
        _SOURCE_QUOTA_SPARK,
    )

    t0 = time.time()
    out["source_quota_rows"] = spark.sql(_SOURCE_QUOTA_SPARK).count()
    out["source_quota_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["mixture_rows"] = spark.sql(_MIXTURE_SAMPLE_SPARK).count()
    out["mixture_s"] = round(time.time() - t0, 2)

    from extractor_spark.spark.queries import (
        _DECON_SPANS_SPARK,
        _SOURCE_KL_SC_SQL,
        _SOURCE_KL_SPARK,
    )

    t0 = time.time()
    out["decon_spans_rows"] = spark.sql(_DECON_SPANS_SPARK).count()
    out["decon_spans_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    sc_df = spark.sql(_SOURCE_KL_SC_SQL).persist()
    sc_df.createOrReplaceTempView("source_kl_sc")
    out["source_kl_rows"] = spark.sql(_SOURCE_KL_SPARK).count()
    out["source_kl_s"] = round(time.time() - t0, 2)
    sc_df.unpersist()

    from extractor_spark.spark.arrow_udfs import sanitize_text_udf

    san_docs = docs.filter(F.col("doc_id") < args.sanitize_docs)
    t0 = time.time()
    n_changed = (
        san_docs.withColumn("s", sanitize_text_udf()(F.col("text")))
        .filter(F.col("s.clean") != F.col("text"))
        .count()
    )
    dt = time.time() - t0
    out["sanitize_s"] = round(dt, 2)
    out["sanitize_docs_per_s"] = round(args.sanitize_docs / dt)
    out["sanitize_changed"] = n_changed
    docs.unpersist()

    from extractor_spark.spark.pq import encode, pq_search, train_pq

    emb = synth_embeddings(spark, args.vecs)
    t0 = time.time()
    cb = train_pq(emb)
    out["pq_train_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    codes = encode(emb, cb).persist()
    out["pq_codes"] = codes.count()
    out["pq_encode_s"] = round(time.time() - t0, 2)

    q = emb.where("vec_id = 0").first()["embedding"]
    t0 = time.time()
    top = pq_search(emb, codes, cb, q, topk=10, exclude_vec_id=0).collect()
    out["pq_search_s"] = round(time.time() - t0, 2)
    out["pq_top1"] = [int(top[0]["vec_id"]), float(top[0]["cos_sim"])]
    codes.unpersist()

    # D4 prototypicality prune over the same synthetic vectors: bounded
    # centroid training (10% seeded sample), then the Arrow scoring pass +
    # per-cell window at the full 500k
    from extractor_spark.spark.ivf import train_centroids
    from extractor_spark.spark.queries import _D4_PRUNE_FRACTION, _D4_PRUNE_SQL, _d4_score

    t0 = time.time()
    cents = train_centroids(emb, k=16, iters=5, seed=0x1FF2024, train_fraction=0.1)
    out["d4_train_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    _d4_score(emb, cents).createOrReplaceTempView("d4_scored")
    pruned = spark.sql(_D4_PRUNE_SQL.format(frac=_D4_PRUNE_FRACTION))
    stats = pruned.selectExpr(
        "count(*) AS n", "sum(CASE WHEN kept THEN 0 ELSE 1 END) AS d"
    ).first()
    out["d4_rows"], out["d4_dropped"] = stats["n"], int(stats["d"])
    out["d4_prune_s"] = round(time.time() - t0, 2)
    emb.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
