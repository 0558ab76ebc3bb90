#!/usr/bin/env python
"""Per-stage wall-time breakdown of the curate funnel at bench scale (r6).

Synth N pages -> extract pipeline (untimed producer) -> curate REPS times
with curate(stage_times=...), printing each run's stage seconds.  The
first run is the cold leg; decisions use the warm legs.

Usage: python scripts/probe_curate_stages.py [--pages 100000] [--reps 3]
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
    ap.add_argument("--pages", type=int, default=100000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from extractor_spark.spark.curate import curate
    from extractor_spark.spark.pipeline import PipelineConfig, run_pipeline, warmup
    from extractor_spark.spark.session import get_spark
    from extractor_spark.spark.synth import write_pages

    spark = get_spark("curate-stages-probe", cpus=args.cpus)
    workdir = tempfile.mkdtemp(prefix="curate_stages_")
    pages_path = os.path.join(workdir, "pages.parquet")
    out_path = os.path.join(workdir, "out")

    write_pages(spark, pages_path, n_pages=args.pages)
    warmup(spark, pages_path)
    run_pipeline(
        spark, PipelineConfig(pages_path=pages_path, output_path=out_path, resume=False)
    )

    for rep in range(args.reps):
        st: dict = {}
        t0 = time.time()
        stats = curate(
            spark, out_path, os.path.join(workdir, f"curated_{rep}"), stage_times=st
        )
        total = round(time.time() - t0, 3)
        print(
            json.dumps({"rep": rep, "total_s": total, "stages": st}),
            flush=True,
        )
    print(json.dumps({"counts": {k: v for k, v in stats.items() if k != "output_path"}}))
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
