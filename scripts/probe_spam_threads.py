"""In-process interleaved A/B for webgraph.spam_mass_ranks (r6).

Cold-process A/B on this box is JIT/window-noise-bound (identical code
measured 7.7-16.6 s across reps).  This probe warms ONE session, then
alternates the sequential form (pagerank(); trustrank()) with the
threaded form (spam_mass_ranks()) over the same checkpointed edge frame,
asserting bit-identical collected outputs each cycle.

Usage: python scripts/probe_spam_threads.py [cycles]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from extractor_spark.spark import caches
    from extractor_spark.spark.queries import _webgraph_pages
    from extractor_spark.spark.session import get_spark
    from extractor_spark.spark.webgraph import (
        extract_outlinks,
        host_graph,
        pagerank,
        spam_mass_ranks,
        trustrank,
    )
    from pyspark.sql import functions as F

    spark = get_spark("probe_spam_threads")

    pages = _webgraph_pages(spark)
    edges = host_graph(extract_outlinks(pages)).localCheckpoint()
    seeds = (
        edges.select(F.col("src_host").alias("host"))
        .unionAll(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .where(F.pmod(F.xxhash64("host"), F.lit(4)) == 0)
    )

    def collect_sorted(pr, tr):
        out = sorted(
            tuple(map(repr, r))
            for r in pr.join(tr.withColumnRenamed("rank", "tr"), "host").collect()
        )
        caches.retire_all()
        return out

    def run_seq():
        pr = pagerank(edges, max_iter=20, tol=1e-9)
        tr = trustrank(edges, seeds, max_iter=20, tol=1e-9)
        return collect_sorted(pr, tr)

    def run_thr():
        pr, tr = spam_mass_ranks(edges, seeds, max_iter=20, tol=1e-9)
        return collect_sorted(pr, tr)

    # warmup one of each (untimed)
    ref = run_seq()
    assert run_thr() == ref, "threaded != sequential on warmup"

    seq_t, thr_t = [], []
    for c in range(cycles):
        t0 = time.time()
        out = run_seq()
        seq_t.append(round(time.time() - t0, 3))
        assert out == ref
        t0 = time.time()
        out = run_thr()
        thr_t.append(round(time.time() - t0, 3))
        assert out == ref, f"threaded output diverged on cycle {c}"
        print(f"cycle {c}: seq {seq_t[-1]}  thr {thr_t[-1]}", flush=True)

    print(f"sequential: {seq_t} (best {min(seq_t)})")
    print(f"threaded:   {thr_t} (best {min(thr_t)})")
    print("outputs bit-identical across all cycles")


if __name__ == "__main__":
    main()
