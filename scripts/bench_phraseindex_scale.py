"""Scale probe for the positional phrase index (spark/phraseindex.py).

Demonstrates the index-once/serve-many amortization well past the
500-doc driver gates: build the flat term-clustered postings over a
tiled corpus (default 500k docs — the tiling from bench_new_ops_r5
replicates sf0.001 docs with a per-copy tag token, so phrase occurrences
replicate predictably), then serve a 20-phrase batch and a single phrase
from the STORED index and report both. Serving must be orders of
magnitude cheaper than building (pruned scan + broadcast + one shuffle),
and the absent phrase leg pins that pruning touches only the query
vocabulary's row groups.

Usage: python scripts/bench_phraseindex_scale.py [--docs 500000]
Writes one JSON line; redirect to BENCH/ to record.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_new_ops_r5 import tiled_documents  # noqa: E402  (sibling script)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    args = ap.parse_args()

    from extractor_spark.spark.phraseindex import (
        build_phrase_index,
        phrase_search,
        tokenize_expr,
    )
    from extractor_spark.spark.session import get_spark

    spark = get_spark("phraseindex-scale", cpus=32)
    out: dict = {"docs": args.docs}

    docs = tiled_documents(spark, args.docs)
    path = tempfile.mkdtemp(prefix="phraseidx_") + "/idx"

    t0 = time.time()
    build_phrase_index(docs, path)
    out["build_s"] = round(time.time() - t0, 2)
    out["index_rows"] = spark.read.parquet(path).count()

    # 20 corpus-drawn 4-token phrases + 1 absent phrase
    base = {
        r["doc_id"]: list(r["t"])
        for r in docs.filter("doc_id < 500")
        .select("doc_id", tokenize_expr().alias("t"))
        .collect()
    }
    phrases = [
        " ".join(base[d][3:7]) for d in sorted(base) if len(base[d]) >= 7
    ][:20]
    phrases.append("zzzq absent phrase entirely")

    t0 = time.time()
    out["serve20_hits"] = phrase_search(spark, path, phrases).count()
    out["serve20_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["serve1_hits"] = phrase_search(spark, path, phrases[:1]).count()
    out["serve1_s"] = round(time.time() - t0, 2)

    # rare-term phrase (ends in a per-tile copytag token): serving cost
    # must track the QUERY TERMS' postings size, not the corpus size —
    # the tiled corpus has only ~1k distinct terms so the legs above are
    # the all-stopwords worst case; this leg is the realistic tail case.
    tail_doc = next(iter(base))
    rare = " ".join(
        docs.filter(f"doc_id = {tail_doc + 7 * 500}")
        .select(tokenize_expr().alias("t"))
        .collect()[0]["t"][-2:]
    )
    t0 = time.time()
    out["serve_rare_hits"] = phrase_search(spark, path, [rare]).count()
    out["serve_rare_s"] = round(time.time() - t0, 2)

    docs.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
