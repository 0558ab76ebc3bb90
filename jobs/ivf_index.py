#!/usr/bin/env python
"""IVF ANN index CLI: build a cell-partitioned index from an embeddings
parquet, or search it with a query vector id.

    # build (train Lloyd centroids on a sample, write partitioned by cell)
    python jobs/ivf_index.py build --embeddings /data/embeddings.parquet \
        --index /data/ivf_index [--k 16] [--iters 5] [--train-fraction 0.7]

    # search (scans only the nprobe nearest cells' partitions)
    python jobs/ivf_index.py search --embeddings /data/embeddings.parquet \
        --index /data/ivf_index --query-vec-id 0 [--nprobe 8] [--topk 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["build", "search"])
    p.add_argument("--embeddings", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--train-fraction", type=float, default=0.7)
    p.add_argument("--query-vec-id", type=int, default=0)
    p.add_argument("--nprobe", type=int, default=8)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--from-submit", action="store_true")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    if args.from_submit:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
    else:
        from extractor_spark.spark.session import get_spark

        spark = get_spark("ivf-index", cpus=args.cpus)

    from extractor_spark.spark.ivf import build_index, search

    emb = spark.read.parquet(args.embeddings)
    if args.mode == "build":
        stats = build_index(
            spark,
            emb,
            args.index,
            k=args.k,
            iters=args.iters,
            train_fraction=args.train_fraction,
        )
        print(json.dumps({"mode": "build", "index": args.index, **stats}))
    else:
        q = emb.where(emb.vec_id == args.query_vec_id).first()
        if q is None:
            print(json.dumps({"error": f"vec_id {args.query_vec_id} not found"}))
            spark.stop()
            return 1
        hits = search(
            spark,
            args.index,
            q["embedding"],
            nprobe=args.nprobe,
            topk=args.topk,
            exclude_vec_id=args.query_vec_id,
        ).collect()
        print(
            json.dumps(
                {
                    "mode": "search",
                    "query_vec_id": args.query_vec_id,
                    "hits": [{"vec_id": r["vec_id"], "cos_sim": r["cos_sim"]} for r in hits],
                }
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
