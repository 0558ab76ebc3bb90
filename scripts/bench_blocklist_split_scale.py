"""Scale probe for the round-5 session-4 operators.

- url_blocklist_filter core (default 1M urls, 50k domain rules + 2k
  prefix rules): demonstrates the linear label-boundary suffix join well
  past the 218-row driver gate.  URLs are generated distributed (pure
  expressions over spark.range — no external data) over ~20k registrable
  domains with 0–3 subdomain labels, so the suffix explode emits 2–5
  rows/url and the broadcast rule join stays linear in pages.  A
  deliberately HOT rule (a parent domain owning ~5% of all urls) checks
  that a popular blocked domain fans out k×1 against its 1-row rule,
  never k².
- leakage_safe_split core (default 5M labels): the split assignment is
  claimed to add ZERO shuffles on top of the components labels — a pure
  JVM hash expression — so per-row cost must be scan-bound.  Labels are
  generated with a skewed cluster-size distribution (90% singletons, a
  16k-member hot cluster) and the probe asserts closure: one split per
  cluster_id.  (The components loop feeding it in the registry query is
  the star machinery probed separately at 480k docs in
  BENCH/scaling_r*.json and dedup_clusters_star runs.)

Usage: python scripts/bench_blocklist_split_scale.py [--urls 1000000]
       [--labels 5000000]
Writes one JSON line; redirect to BENCH/ to record.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_urls(spark, n_urls: int):
    """~20k registrable domains, 0-3 subdomain labels, zipf-ish host reuse.

    domain d such that url i uses domain (i*2654435761 mod 97003) mod 20000
    — multiplicative hashing spreads ids; domain 0 is made HOT (~5% of
    urls) to exercise the hot-rule fan-out.
    """
    from pyspark.sql import functions as F

    df = spark.range(n_urls, numPartitions=32)
    h = (F.col("id") * 2654435761) % 97003
    dom = F.when((h % 20) == 0, F.lit(0)).otherwise((h % 19997) + 1)
    depth = h % 4  # 0-3 subdomain labels
    sub = F.concat_ws(
        ".",
        F.slice(
            F.array(
                F.concat(F.lit("s"), (h % 7).cast("string")),
                F.concat(F.lit("t"), (h % 5).cast("string")),
                F.lit("cdn"),
            ),
            F.lit(1),
            depth.cast("int"),
        ),
    )
    host = F.concat(
        F.when(depth > 0, F.concat(sub, F.lit("."))).otherwise(F.lit("")),
        F.lit("d"),
        dom.cast("string"),
        F.lit(".example.com"),
    )
    return df.select(
        F.concat(
            F.lit("https://"), host, F.lit("/p/"), (F.col("id") % 1000).cast("string")
        ).alias("url")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=1_000_000)
    ap.add_argument("--labels", type=int, default=5_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from extractor_spark.spark.blocklist import (
        apply_blocklist,
        blocklist_matches,
        domain_rules_df,
        prefix_rules_df,
    )
    from extractor_spark.spark.queries import leakage_split_frame
    from extractor_spark.spark.session import get_spark

    spark = get_spark("blocklist-split-scale", cpus=32)
    out: dict = {"urls": args.urls, "labels": args.labels}

    urls = synth_urls(spark, args.urls).persist()
    urls.count()

    # 50k domain rules: d0 (the hot 5% domain) + every 4th domain +
    # subdomain-level rules; 2k prefix rules on distinct hosts.
    dom_rules = [("d0.example.com", "ads")]
    dom_rules += [(f"d{4 * i + 1}.example.com", "ads") for i in range(12_500)]
    dom_rules += [(f"cdn.d{2 * i + 1}.example.com", "tracking") for i in range(37_499)]
    pre_rules = [(f"d{i + 1}.example.com", f"/p/{i % 1000}", "paywall") for i in range(2_000)]

    t0 = time.time()
    n_matches = blocklist_matches(
        urls, domain_rules_df(spark, dom_rules), prefix_rules_df(spark, pre_rules)
    ).count()
    out["blocklist_match_rows"] = n_matches
    out["blocklist_match_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_kept = apply_blocklist(
        urls, domain_rules_df(spark, dom_rules), prefix_rules_df(spark, pre_rules)
    ).count()
    out["blocklist_kept_rows"] = n_kept
    out["blocklist_apply_s"] = round(time.time() - t0, 2)
    out["blocklist_urls_per_s"] = round(args.urls / (time.time() - t0))
    urls.unpersist()

    # Leakage split over skewed labels: 90% singletons, one 16k hot
    # cluster (cluster_id 0), remainder in 8-member clusters.
    lab = spark.range(args.labels, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 16_384, F.lit(0))
        .when((F.col("id") % 10) < 9, F.col("id"))
        .otherwise((F.col("id") / 80).cast("long") * 80 + 1)
        .alias("cluster_id"),
    ).persist()
    lab.count()
    t0 = time.time()
    split = leakage_split_frame(lab)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    dt = time.time() - t0
    out["split_counts"] = counts
    out["split_s"] = round(dt, 2)
    out["split_rows_per_s"] = round(args.labels / dt)
    # closure: every cluster maps to exactly one split
    n_bad = (
        leakage_split_frame(lab)
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    out["split_closure_violations"] = n_bad
    lab.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
