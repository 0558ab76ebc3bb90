#!/usr/bin/env python
"""Crawl-cycle CLI: one politeness-aware discovery→schedule pass.

Composes the repo's crawl-ops operators end to end:

    sitemap + feed discovery (tolerant parsers, per-loc dedupe)
      → anti-join against the already-crawled set
      → RFC 9309 robots exclusion (engine/robots.py via the Arrow pass)
      → union of the two discovery channels (freshest/highest wins per url)
      → global fetch-budget allocation across hosts (≥1 slot per host,
        optional per-host cap; BIGINT arithmetic throughout)
      → fetch plan parquet, ordered (host, slot)

    python jobs/crawl_cycle.py --sitemaps site.parquet [--feeds feeds.parquet]
        --crawled pages.parquet --robots robots.parquet \
        --budget 1000 [--per-host-cap 50] [--agent extractor-spark] \
        --output /data/fetch_plan [--cpus 8]

Inputs: sitemaps/feeds are (host, xml) parquet; robots is (host, body);
crawled is any parquet with a ``url`` column (``--url-col`` to rename).
Prints ONE summary JSON line.  Every stage is an existing gated operator
(spark/frontier.py, spark/robots.py); this job is their composition, and
tests/test_crawl_cycle.py pins the composition's politeness invariants.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sitemaps")
    p.add_argument("--feeds")
    p.add_argument("--crawled", required=True)
    p.add_argument("--url-col", default="url")
    p.add_argument("--robots", required=True)
    p.add_argument("--budget", type=int, required=True)
    p.add_argument("--per-host-cap", type=int, default=None)
    p.add_argument("--agent", default="extractor-spark")
    p.add_argument("--output", required=True)
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)
    if not args.sitemaps and not args.feeds:
        p.error("need --sitemaps and/or --feeds")

    from pyspark.sql import functions as F

    from extractor_spark.spark.frontier import (
        allocate_crawl_budget,
        build_feed_frontier,
        build_frontier,
    )
    from extractor_spark.spark.session import get_spark

    spark = get_spark("crawl-cycle", cpus=args.cpus)
    crawled = spark.read.parquet(args.crawled).withColumnRenamed(
        args.url_col, "url"
    )
    robots = spark.read.parquet(args.robots)

    summary: dict = {"budget": args.budget}
    channels = []
    if args.sitemaps:
        sm = build_frontier(
            spark.read.parquet(args.sitemaps), crawled, robots, agent=args.agent
        ).select("url", "host", "priority_milli")
        summary["sitemap_frontier"] = sm.count()
        channels.append(sm)
    if args.feeds:
        # feeds carry freshness (published_s), not sitemap priority: they
        # enter the scheduler priority-less and sort after prioritized
        # sitemap entries within a host (deterministic url tiebreak)
        fd = build_feed_frontier(
            spark.read.parquet(args.feeds), crawled, robots, agent=args.agent
        ).select(
            "url", "host", F.lit(None).cast("bigint").alias("priority_milli")
        )
        summary["feed_frontier"] = fd.count()
        channels.append(fd)

    combined = channels[0]
    for ch in channels[1:]:
        combined = combined.unionByName(ch)
    # a url discovered by both channels schedules once — keep the
    # best-attributed row (highest priority, i.e. the sitemap one)
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.col("priority_milli").desc_nulls_last())
    combined = (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    plan = allocate_crawl_budget(
        combined, args.budget, per_host_cap=args.per_host_cap
    )
    plan.write.mode("overwrite").parquet(args.output)

    plan_back = spark.read.parquet(args.output)
    summary["planned_fetches"] = plan_back.count()
    summary["hosts"] = plan_back.select("host").distinct().count()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
