#!/usr/bin/env python
"""Curate-funnel scale probe an order of magnitude past the 100k bench
(VERDICT r4 #7): synth N pages → extract pipeline (untimed producer) →
curate, reporting per-stage survivor counts and wall time.

What it evidences at 5× the bench corpus:
- star-per-bucket candidate volume stays linear in hot-bucket size (no
  pair blow-up / OOM),
- the lazy-checkpoint release ordering (handles released only AFTER the
  materializing stage count) holds when every stage is 5× bigger,
- no straggler stage: the probe records per-stage wall times.

Usage: python scripts/probe_curate_500k.py [--pages 500000] [--cpus 32]
Writes one JSON line; redirect to BENCH/ to record.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=500000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from extractor_spark.spark.curate import curate
    from extractor_spark.spark.pipeline import PipelineConfig, run_pipeline, warmup
    from extractor_spark.spark.session import get_spark
    from extractor_spark.spark.synth import write_pages

    spark = get_spark("curate-500k-probe", cpus=args.cpus)
    workdir = tempfile.mkdtemp(prefix="curate_probe_")
    pages_path = os.path.join(workdir, "pages.parquet")
    out_path = os.path.join(workdir, "out")

    out: dict = {"pages": args.pages, "cpus": args.cpus}

    t0 = time.time()
    write_pages(spark, pages_path, n_pages=args.pages)
    out["synth_s"] = round(time.time() - t0, 2)

    warmup(spark, pages_path)
    t0 = time.time()
    summary = run_pipeline(
        spark, PipelineConfig(pages_path=pages_path, output_path=out_path, resume=False)
    )
    out["extract_s"] = round(time.time() - t0, 2)
    out["extract_docs"] = summary["docs"]

    # untimed curate warmup on a small slice (codegen/checkpoint paths)
    warm_in = os.path.join(workdir, "warm_in")
    spark.read.parquet(out_path).limit(2000).write.mode("overwrite").parquet(warm_in)
    curate(spark, warm_in, os.path.join(workdir, "warm_out"))

    t0 = time.time()
    stats = curate(spark, out_path, os.path.join(workdir, "curated"))
    out["curate_s"] = round(time.time() - t0, 2)
    out["curate_stages"] = {k: v for k, v in stats.items() if k != "output_path"}

    # full composition leg (r5 s4): UT1 blocklist + benchmark decon +
    # leakage split + seeded-shuffle packing on top of the same corpus —
    # records what the optional stages add at probe scale.
    dom_f = os.path.join(workdir, "ut1_domains")
    url_f = os.path.join(workdir, "ut1_urls")
    bm_f = os.path.join(workdir, "benchmarks.txt")
    with open(dom_f, "w") as f:
        f.write("site-03.example.org\nsite-11.example.org\n")
    with open(url_f, "w") as f:
        f.write("site-02.example.org/article/1\n")
    bm_text = (
        spark.read.parquet(out_path)
        .select("text")
        .where("length(text) > 400")
        .limit(1)
        .collect()[0]["text"]
        .replace("\n", " ")
    )
    with open(bm_f, "w") as f:
        f.write(bm_text + "\n")
    t0 = time.time()
    stats_full = curate(
        spark,
        out_path,
        os.path.join(workdir, "curated_full"),
        blocklist_domains=dom_f,
        blocklist_urls=url_f,
        decon_benchmarks=bm_f,
        split=True,
        pack_budget=2048,
        shuffle_seed=7,
    )
    out["curate_full_s"] = round(time.time() - t0, 2)
    out["curate_full_stages"] = {
        k: v for k, v in stats_full.items() if k != "output_path"
    }

    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
