#!/usr/bin/env python
"""Tokenize-and-pack CLI — corpus parquet → BPE token-id training shards.

The endgame artifact of a pre-training data pipeline: learn a subword
merge table from the corpus (or load one produced by a previous run),
encode every document map-only with the trainer's own merge fold, and
chunk the global token stream into exact fixed-length sequences (docs
concatenated in doc_id order, split across boundaries) — what a trainer's
data loader consumes directly.

    python jobs/tokenize_pack.py --input documents.parquet --output outdir \
        [--merges 24] [--merges-table outdir2/merges] [--seq-len 1024] \
        [--cpus 8]

Writes under --output:
    merges/   (rank, left, right, pair_count) — reusable via --merges-table
    vocab/    (id, token) — sorted-symbol id assignment
    shards/   (seq_id, token_ids array<int>)
    manifest.json  {n_docs, n_tokens, n_seqs, seq_len, n_merges, vocab_size}

Every piece reuses a gated operator (spark/bpe.py learning + fold,
spark/tokenshards.py encode/pack) so their correctness gates carry over;
tests/test_tokenize_pack_job.py pins the CLI composition (roundtrip decode
of the written shards, manifest consistency, merges-table reuse).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_job(
    spark,
    input_path: str,
    output_dir: str,
    n_merges: int = 24,
    seq_len: int = 1024,
    merges_table: str | None = None,
    shuffle_seed: int | None = None,
) -> dict:
    from pyspark.sql import functions as F

    from extractor_spark.spark import caches
    from extractor_spark.spark.bpe import learn_bpe
    from extractor_spark.spark.tokenshards import (
        bpe_vocab,
        encode_corpus_ids,
        pack_token_shards,
    )

    docs = spark.read.parquet(input_path).select("doc_id", "text").where(
        "text IS NOT NULL"
    )
    if merges_table:
        merges = [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in spark.read.parquet(merges_table).orderBy("rank").collect()
        ]
    else:
        merges = learn_bpe(docs, n_merges=n_merges)
    vocab = bpe_vocab(docs, merges)

    spark.createDataFrame(
        merges or [], "rank int, left string, right string, pair_count bigint"
    ).repartition(1).write.mode("overwrite").parquet(
        os.path.join(output_dir, "merges")
    )
    spark.createDataFrame(
        list(enumerate(vocab)), "id int, token string"
    ).repartition(1).write.mode("overwrite").parquet(
        os.path.join(output_dir, "vocab")
    )

    with caches.scope():
        encoded = encode_corpus_ids(docs, merges, vocab)
        shards = pack_token_shards(encoded, seq_len, shuffle_seed=shuffle_seed)
        shards.write.mode("overwrite").parquet(os.path.join(output_dir, "shards"))

    written = spark.read.parquet(os.path.join(output_dir, "shards"))
    agg = written.agg(
        F.count("*").alias("n_seqs"),
        F.sum(F.size("token_ids")).alias("n_tokens"),
    ).first()
    manifest = {
        "n_docs": docs.count(),
        "n_tokens": int(agg["n_tokens"] or 0),
        "n_seqs": int(agg["n_seqs"]),
        "seq_len": seq_len,
        "n_merges": len(merges),
        "vocab_size": len(vocab),
    }
    with open(os.path.join(output_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--merges", type=int, default=24)
    ap.add_argument("--merges-table", default=None)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--shuffle-seed", type=int, default=None)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from extractor_spark.spark.session import get_spark

    spark = get_spark("tokenize-pack", cpus=args.cpus)
    os.makedirs(args.output, exist_ok=True)
    manifest = run_job(
        spark,
        args.input,
        args.output,
        n_merges=args.merges,
        seq_len=args.seq_len,
        merges_table=args.merges_table,
        shuffle_seed=args.shuffle_seed,
    )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
