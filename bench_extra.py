"""Per-query isolation harness for optimization work (guide §1).

NOT the driver bench — bench.py is frozen for measurement.  This script
times individual registry queries with the SAME session + methodology as
bench.py's query loop (fn(spark, sf_dir) + .count(), cache release between
legs), optionally with a noop sink (computes every column, §1.4), and can
dump .explain("formatted") plans to plans/r06/.

Usage:
  python bench_extra.py q1 q2 ...            # time queries, 2 reps each
  python bench_extra.py --reps 3 --noop q1   # noop sink instead of count
  python bench_extra.py --plan before q1     # write plans/r06/q1_before.txt
  python bench_extra.py --all                # the full bench.py query list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plan", choices=["before", "after"], default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from extractor_spark.spark.queries import QUERIES, release_query_caches
    from extractor_spark.spark.session import get_spark

    names = list(args.queries)
    if args.all:
        names = [n for n in QUERIES]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("bench_extra")
    sc = spark.sparkContext

    results: dict[str, list[float]] = {}
    for name in names:
        fn, _oracle = QUERIES[name]
        if args.plan:
            df = fn(spark, sf_dir)
            path = os.path.join("plans", "r06", f"{name}_{args.plan}.txt")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                f.write(df._sc is not None and df._jdf.queryExecution().explainString(
                    sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ) or "")
            release_query_caches()
            print(f"plan -> {path}")
        runs = []
        for _ in range(args.reps):
            sc.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.time() - t0, 3))
            release_query_caches()
            sc.setJobDescription(None)
        results[name] = runs
        print(f"{name}: {runs} (best {min(runs)})")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
