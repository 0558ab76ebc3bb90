"""Single-core engine perf gauge: convert N deterministic synth pages
(plus the embedded fixture/adversarial pages) through
convert_html_to_markdown and report best-of-R docs/s + MB/s.

Used as the before/after meter for engine optimizations — the pipeline
bench (bench.py) is bandwidth-saturated at local[32], so single-core is
where engine work is visible first.  Protocol mirrors CLAUDE.md: warmup
pass, then best-of-R timed passes (host has ±25% contention variance).

Usage: python scripts/perf_engine.py [--pages 600] [--runs 3] [--profile]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_corpus(n_pages: int):
    from extractor_spark.spark.synth import (
        adversarial_page_html,
        fixture_rows,
        synth_page_html,
    )

    corpus = []
    for i in range(n_pages):
        if i % 97 == 0:
            html = adversarial_page_html(i)
        else:
            html = synth_page_html(i)
        corpus.append((html, f"https://host{i % 13}.example.com/p/{i}"))
    for row in fixture_rows():
        html = row["html"]
        if isinstance(html, (bytes, bytearray)):
            html = bytes(html).decode("utf-8", "replace")
        corpus.append((html, row["url"]))
    return corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=600)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    from extractor_spark.engine.convert import convert_html_to_markdown

    corpus = build_corpus(args.pages)
    total_bytes = sum(len(h.encode("utf-8", "surrogatepass")) for h, _ in corpus)

    # warmup (JIT-free CPython, but warms allocator/caches and regex caches)
    for html, url in corpus[:100]:
        convert_html_to_markdown(html, source_url=url)

    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        for html, url in corpus:
            convert_html_to_markdown(html, source_url=url)
        times.append(time.perf_counter() - t0)

    best = min(times)
    result = {
        "docs": len(corpus),
        "bytes": total_bytes,
        "runs_sec": [round(t, 4) for t in times],
        "best_docs_per_s": round(len(corpus) / best, 1),
        "best_mb_per_s": round(total_bytes / best / 1e6, 2),
    }
    print(json.dumps(result))

    if args.profile:
        import cProfile
        import io
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        for html, url in corpus:
            convert_html_to_markdown(html, source_url=url)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(30)
        print(s.getvalue())


if __name__ == "__main__":
    main()
