#!/usr/bin/env python
"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency ≥0.8 between N and 4N executors; sandbox stand-in = local[N] vs
local[4N] on the same input, fresh JVM per level).

Generates a pages corpus once, then runs the convert pipeline at each
parallelism level in a subprocess (cold JVM, session startup excluded from
the timed region — jobs/extract_pipeline.py times only the pipeline).

    python scripts/bench_scaling.py --pages 200000 --pairs 4:16,8:32

Co-tenant noise handling (--reps R, default 1): this VM shares hardware
with unpredictable neighbors and single legs vary ±25%+ (measured: the
same 1-core leg 626–835 docs/s across one hour).  With R>1 the levels run
INTERLEAVED (1,4,1,4 …) so both levels sample the same windows, the best
rep per level is the headline (best-of approximates the uncontended
machine — the bench.py protocol), and every leg records a pre/post
single-core contention probe so a degraded sample is self-documenting.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(pages_path: str, out_dir: str, cpus: int) -> dict:
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "extract_pipeline.py"),
            "--pages", pages_path,
            "--output", out_dir,
            "--cpus", str(cpus),
            "--no-resume",
            "--warmup",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    last = result.stdout.strip().splitlines()[-1]
    return json.loads(last)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200000)
    ap.add_argument("--pairs", default="4:16,8:32",
                    help="comma-separated N:4N parallelism pairs")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scaling.json"))
    ap.add_argument("--reps", type=int, default=1,
                    help="interleaved repetitions per level; best-of wins")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import _PROBE_NOMINAL_S, _contention_probe

    workdir = tempfile.mkdtemp(prefix="extractor_scaling_")
    pages_path = os.path.join(workdir, "pages.parquet")

    # one-time corpus generation (excluded from all measurements)
    subprocess.run(
        [
            sys.executable, "-c",
            "import sys; sys.path.insert(0, %r); "
            "from extractor_spark.spark.session import get_spark; "
            "from extractor_spark.spark.synth import write_pages; "
            "spark = get_spark('gen', cpus=32); "
            "write_pages(spark, %r, %d); spark.stop()"
            % (REPO, pages_path, args.pages),
        ],
        check=True,
        cwd=REPO,
    )

    wanted: list[int] = []
    for pair in args.pairs.split(","):
        for part in pair.split(":"):
            if int(part) not in wanted:
                wanted.append(int(part))

    levels: dict[int, dict] = {}
    legs: list[dict] = []
    results = []
    for rep in range(args.reps):
        for cpus in wanted:  # interleaved: both levels sample each window
            out_dir = os.path.join(workdir, f"out_{cpus}_{rep}")
            probe_pre = _contention_probe()
            env_summary = run_level(pages_path, out_dir, cpus)
            probe_post = _contention_probe()
            rate = env_summary["docs"] / env_summary["wall_seconds"]
            leg = {
                "cpus": cpus,
                "rep": rep,
                "docs": env_summary["docs"],
                "wall_seconds": round(env_summary["wall_seconds"], 2),
                "docs_per_sec": round(rate, 1),
                "html_mb_per_sec": round(
                    env_summary["html_bytes"] / 1e6 / env_summary["wall_seconds"], 2
                ),
                "probe_pre_s": round(probe_pre, 3),
                "probe_post_s": round(probe_post, 3),
            }
            legs.append(leg)
            print(json.dumps(leg), flush=True)
            if cpus not in levels or rate > levels[cpus]["docs_per_sec"]:
                levels[cpus] = {
                    k: v for k, v in leg.items() if k not in ("rep",)
                }
            shutil.rmtree(out_dir, ignore_errors=True)
    for pair in args.pairs.split(","):
        n_s, n4_s = pair.split(":")
        n, n4 = int(n_s), int(n4_s)
        eff = (levels[n4]["docs_per_sec"] / levels[n]["docs_per_sec"]) / (n4 / n)
        results.append(
            {
                "pair": f"local[{n}] -> local[{n4}]",
                "throughput_n": levels[n]["docs_per_sec"],
                "throughput_4n": levels[n4]["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump({"corpus_pages": args.pages,
                   "reps": args.reps,
                   "probe_nominal_s": _PROBE_NOMINAL_S,
                   "levels": list(levels.values()),
                   "legs": legs,
                   "pairs": results}, fh, indent=2)
    shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
