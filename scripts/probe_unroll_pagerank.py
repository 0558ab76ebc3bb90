"""Probe (guide §1): K-step unrolled PageRank power iteration vs the
sequential one-job-per-round loop in webgraph.pagerank.

Hypothesis: at host-graph scale (53 hosts at sf0.1) each round's cost is
fixed driver/job overhead — one lazy-checkpoint materializing action per
round, serialized by the driver roundtrip that feeds the round's dangling
mass back as a literal.  Unrolling K rounds into ONE action (dangling mass
for inner rounds computed in-lineage as a 1-row broadcast aggregate, all
K per-round (delta, dangling) pairs returned by a single union-of-
aggregates job) should cut the loop wall by ~K× of the per-job overhead
while producing BIT-IDENTICAL iterates: the inner-round aggregate is the
same partial-per-partition + single-reduce sum over the same checkpointed
RDD, and IEEE ops on equal inputs are equal.

Usage: python scripts/probe_unroll_pagerank.py [--sf-dir D] [--k 5]
"""

from __future__ import annotations

import argparse
import os
import struct
import time

from pyspark.sql import functions as F


def unrolled_pagerank(edges, damping=0.85, max_iter=20, tol=1e-9, k=5, ckpt_trans=False):
    """Prototype: semantics of webgraph.pagerank, K rounds per Spark job."""
    spark = edges.sparkSession
    sc = spark.sparkContext
    from extractor_spark.spark.tuning import loop_partitions, scoped_loop_conf

    edges = edges.persist()
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionAll(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    n_parts = loop_partitions(sc, max(n, edges.count()))
    with scoped_loop_conf(spark, n_parts):
        out_totals = edges.groupBy("src_host").agg(F.sum("n_links").alias("out_total"))
        trans = (
            edges.join(out_totals, "src_host")
            .select(
                F.col("src_host").alias("host"),
                "dst_host",
                (F.col("n_links").cast("double") / F.col("out_total")).alias("w"),
            )
            .repartition(n_parts, "host")
        )
        if ckpt_trans:
            # truncate the LOGICAL plan too: with a bare persist every
            # round's analysis/optimization re-walks the full upstream
            # lineage (the cache short-circuits execution, not planning)
            trans = trans.localCheckpoint(eager=True)
        else:
            trans.persist()
        srcs = edges.select(F.col("src_host").alias("host")).distinct().withColumn(
            "_has_out", F.lit(True)
        )
        ranks = (
            nodes.join(srcs, "host", "left")
            .select(
                "host",
                F.lit(1.0 / n).alias("rank"),
                (~F.coalesce(F.col("_has_out"), F.lit(False))).alias("is_dangling"),
            )
            .localCheckpoint(eager=False)
        )
        dangling_mass = ranks.agg(
            F.coalesce(F.sum(F.when(F.col("is_dangling"), F.col("rank"))), F.lit(0.0))
        ).first()[0]

        timers = {"build": 0.0, "ckpt": 0.0, "action": 0.0}

        def one_round(state, dm_expr):
            contrib = (
                state.join(trans, "host")
                .select(
                    F.col("dst_host").alias("host"),
                    (F.col("rank") * F.col("w")).alias("c"),
                )
                .groupBy("host")
                .agg(F.sum("c").alias("contrib"))
            )
            keep = ["host", F.col("rank").alias("old_rank"), "is_dangling"]
            if "_dm" in state.columns:
                keep.append(F.col("_dm"))
            built = (
                state.select(*keep)
                .join(contrib, "host", "left")
                .select(
                    "host",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (F.coalesce("contrib", F.lit(0.0)) + dm_expr)
                    ).alias("rank"),
                    "old_rank",
                    "is_dangling",
                )
            )
            t = time.time()
            out = built.localCheckpoint(eager=False)
            timers["ckpt"] += time.time() - t
            return out

        rounds_done = 0
        deltas = []
        while rounds_done < max_iter:
            block = min(k, max_iter - rounds_done)
            iterates = []
            state = ranks
            for j in range(block):
                if j == 0:
                    dm_expr = F.lit(dangling_mass / n)
                else:
                    dm_1row = state.agg(
                        (
                            F.coalesce(
                                F.sum(F.when(F.col("is_dangling"), F.col("rank"))),
                                F.lit(0.0),
                            )
                            / F.lit(float(n))
                        ).alias("_dm")
                    )
                    dm_expr = F.col("_dm")
                    state = state.crossJoin(F.broadcast(dm_1row))
                state = one_round(state, dm_expr)
                iterates.append(state)
            stats = [
                s.agg(
                    F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("delta"),
                    F.coalesce(
                        F.sum(F.when(F.col("is_dangling"), F.col("rank"))), F.lit(0.0)
                    ).alias("dangling"),
                ).withColumn("_j", F.lit(j))
                for j, s in enumerate(iterates)
            ]
            u = stats[0]
            for s in stats[1:]:
                u = u.unionAll(s)
            t = time.time()
            rows = {r["_j"]: r for r in u.collect()}
            timers["action"] += time.time() - t
            stop = None
            for j in range(block):
                deltas.append(rows[j]["delta"])
                if rows[j]["delta"] < tol:
                    stop = j
                    break
            if stop is not None:
                ranks = iterates[stop]
                rounds_done += stop + 1
                break
            ranks = iterates[block - 1]
            dangling_mass = rows[block - 1]["dangling"]
            rounds_done += block
        trans.unpersist()
        edges.unpersist()
        print(f"    timers: {', '.join(f'{k}={v:.2f}s' for k, v in timers.items())}")
        return ranks.select("host", "rank"), deltas


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from extractor_spark.spark.queries import _views, _webgraph_pages, release_query_caches
    from extractor_spark.spark.session import get_spark
    from extractor_spark.spark.webgraph import extract_outlinks, host_graph, pagerank

    spark = get_spark("probe_unroll")
    sc = spark.sparkContext
    _views(spark, args.sf_dir)
    pages = _webgraph_pages(spark)

    t0 = time.time()
    edges_spec = host_graph(extract_outlinks(pages)).persist()
    ne = edges_spec.count()
    print(f"setup: {ne} edges in {time.time()-t0:.2f}s")

    def bits(rows):
        return [(r["host"], struct.pack("<d", r["rank"]).hex()) for r in rows]

    spec_rows = None
    for rep in range(args.reps):
        sc.setJobDescription("probe: spec pagerank")
        t0 = time.time()
        out = pagerank(edges_spec, max_iter=20, tol=1e-9)
        rows = sorted(out.collect(), key=lambda r: r["host"])
        t = time.time() - t0
        release_query_caches()
        print(f"spec  rep{rep}: {t:.2f}s")
        spec_rows = bits(rows)

    for label, k, ckpt in [
        (f"unrol k={args.k}", args.k, False),
        ("seq+ckpt k=1", 1, True),
        (f"unrol+ckpt k={args.k}", args.k, True),
    ]:
        new_rows = None
        for rep in range(args.reps):
            sc.setJobDescription(f"probe: {label}")
            t0 = time.time()
            out, deltas = unrolled_pagerank(
                edges_spec, max_iter=20, tol=1e-9, k=k, ckpt_trans=ckpt
            )
            rows = sorted(out.collect(), key=lambda r: r["host"])
            t = time.time() - t0
            release_query_caches()
            print(
                f"{label} rep{rep}: {t:.2f}s  rounds={len(deltas)} last_delta={deltas[-1]:.3e}"
            )
            new_rows = bits(rows)
        ident = spec_rows == new_rows
        print(f"{label}: bit-identical: {ident}")
        if not ident:
            diff = [(a, b) for a, b in zip(spec_rows, new_rows) if a != b][:5]
            print("first diffs:", diff)


if __name__ == "__main__":
    main()
