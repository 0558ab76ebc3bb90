"""In-process interleaved A/B: HITS per-round a_raw checkpoint vs inline (r6).

The a_raw lazy checkpoint exists to share one RDD between its two
consumers inside the round's single job.  At loop widths of 1-4 the
subtree it guards is a one-task join+agg, while the checkpoint call costs
~45 ms of physical-plan compile per round — this probe measures whether
inlining (recomputing the tiny subtree twice inside the job) is cheaper,
asserting bit-identical collected outputs every cycle.

Usage: python scripts/probe_hits_inline.py [cycles]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from extractor_spark.spark import caches
    from extractor_spark.spark import webgraph
    from extractor_spark.spark.queries import _webgraph_pages
    from extractor_spark.spark.session import get_spark

    spark = get_spark("probe_hits_inline")

    pages = _webgraph_pages(spark)
    edges = webgraph.host_graph(webgraph.extract_outlinks(pages)).localCheckpoint()

    def run(inline):
        webgraph._HITS_INLINE_OVERRIDE = inline
        try:
            out = sorted(
                tuple(map(repr, r))
                for r in webgraph.hits(edges, max_iter=20).collect()
            )
        finally:
            webgraph._HITS_INLINE_OVERRIDE = None
        caches.retire_all()
        return out

    ref = run(False)
    assert run(True) == ref, "inline != checkpointed on warmup"

    ck_t, in_t = [], []
    for c in range(cycles):
        t0 = time.time()
        out = run(False)
        ck_t.append(round(time.time() - t0, 3))
        assert out == ref
        t0 = time.time()
        out = run(True)
        in_t.append(round(time.time() - t0, 3))
        assert out == ref, f"inline output diverged on cycle {c}"
        print(f"cycle {c}: ckpt {ck_t[-1]}  inline {in_t[-1]}", flush=True)

    print(f"checkpointed: {ck_t} (best {min(ck_t)})")
    print(f"inline:       {in_t} (best {min(in_t)})")
    print("outputs bit-identical across all cycles")


if __name__ == "__main__":
    main()
