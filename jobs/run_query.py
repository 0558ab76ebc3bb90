#!/usr/bin/env python
"""Run any registered coverage query from the CLI.

    python jobs/run_query.py --list
    python jobs/run_query.py pricing_summary --sf-dir /root/testdata/sf0.01
    python jobs/run_query.py dedup_clusters --output /tmp/clusters --format jsonl
    python jobs/run_query.py embedding_topk --explain

Writes parquet/jsonl when --output is given, otherwise shows the first
--limit rows.  The same registry backs the driver contract
(__spark_entry__.queries()), so anything runnable there is runnable here.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    from extractor_spark.spark.queries import QUERIES

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument("--list", action="store_true", help="list registered queries")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--output", default=None, help="write results here instead of showing")
    p.add_argument("--format", default="parquet", choices=["parquet", "jsonl"])
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--explain", action="store_true", help="print the physical plan")
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--from-submit", action="store_true")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    if args.list or not args.name:
        for name, (_fn, oracle) in sorted(QUERIES.items()):
            print(f"{name:32s} {'oracle' if oracle else 'rows-only'}")
        return 0

    if args.name not in QUERIES:
        p.error(f"unknown query {args.name!r} (use --list)")

    if args.from_submit:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
    else:
        from extractor_spark.spark.session import get_spark

        spark = get_spark(f"query-{args.name}", cpus=args.cpus)

    fn, _oracle = QUERIES[args.name]
    df = fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.output:
        from extractor_spark.spark.sources import write_output

        write_output(df, args.output, fmt=args.format, partition_col=None)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit, truncate=80)
    return 0


if __name__ == "__main__":
    sys.exit(main())
