"""Scale probe for the tokenize-and-pack pipeline (spark/tokenshards.py)
an order of magnitude past the driver gates.

Corpus: the tiled sf0.001 documents (bench_new_ops_r5.tiled_documents),
default 500k docs.  Legs:
  - learn: 16-merge BPE training (rounds are corpus-size-independent —
    the distinct-word vocabulary trick; recorded for completeness)
  - encode+pack: the map-only inline encode pass + exact seq_len packing,
    timed as one leg because the pack's totals-collect materializes the
    encode checkpoint (that IS the pipeline shape)
  - per-sequence invariant spot check (every non-final sequence exactly
    seq_len ids) and ids/sec throughput

Usage: python scripts/bench_tokenshards_scale.py [--docs 500000]
       [--merges 16] [--seq-len 1024]
Writes one JSON line; redirect to BENCH/ to record.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_new_ops_r5 import tiled_documents  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--merges", type=int, default=16)
    ap.add_argument("--seq-len", type=int, default=1024)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from extractor_spark.spark.bpe import learn_bpe
    from extractor_spark.spark.queries import release_query_caches
    from extractor_spark.spark.session import get_spark
    from extractor_spark.spark.tokenshards import (
        bpe_vocab,
        encode_corpus_ids,
        pack_token_shards,
    )

    spark = get_spark("tokenshards-scale", cpus=32)
    out: dict = {"docs": args.docs, "merges": args.merges, "seq_len": args.seq_len}

    docs = tiled_documents(spark, args.docs).select("doc_id", "text")

    t0 = time.time()
    merges = learn_bpe(docs, n_merges=args.merges)
    out["learn_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    vocab = bpe_vocab(docs, merges)
    out["vocab_s"] = round(time.time() - t0, 2)
    out["vocab_size"] = len(vocab)

    t0 = time.time()
    shards = pack_token_shards(
        encode_corpus_ids(docs, merges, vocab), args.seq_len
    )
    agg = shards.agg(
        F.count("*").alias("n_seqs"),
        F.sum(F.size("token_ids")).alias("n_tokens"),
        F.sum(
            F.when(F.size("token_ids") != args.seq_len, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_partial"),
    ).first()
    dt = time.time() - t0
    out["encode_pack_s"] = round(dt, 2)
    out["n_seqs"] = int(agg["n_seqs"])
    out["n_tokens"] = int(agg["n_tokens"])
    out["n_partial_seqs"] = int(agg["n_partial"])  # must be ≤ 1
    out["ids_per_s"] = round(agg["n_tokens"] / dt)
    out["docs_per_s"] = round(args.docs / dt)
    release_query_caches()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
