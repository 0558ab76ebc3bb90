"""jobs/crawl_cycle.py — the discovery→schedule composition's politeness
invariants, on the synth sitemap/feed/robots fixtures:

- every planned url came from a discovery channel, is NOT in the crawled
  set, and is robots-allowed for the agent (re-checked independently via
  the engine matcher);
- per-host slots are contiguous 1..quota and respect the per-host cap;
- a url discovered by BOTH channels is scheduled once;
- the plan is deterministic across runs.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

SF = None  # synthetic inputs only


@pytest.fixture(scope="module")
def spark():
    from extractor_spark.spark.session import get_spark

    yield get_spark("crawl-cycle-tests", cpus=8)


def _write_inputs(spark, tmp):
    from extractor_spark.spark.frontier import synth_feeds_df, synth_sitemaps_df
    from extractor_spark.spark.robots import synth_robots_df

    hosts = [f"host{i}.example.com" for i in range(6)]
    crawled_urls = [f"https://{h}/article/{k}" for h in hosts for k in range(3)]
    known = {h: [f"https://{h}/article/0"] for h in hosts}

    paths = {
        "sitemaps": os.path.join(tmp, "sitemaps"),
        "feeds": os.path.join(tmp, "feeds"),
        "robots": os.path.join(tmp, "robots"),
        "crawled": os.path.join(tmp, "crawled"),
    }
    synth_sitemaps_df(spark, hosts, known=known).write.mode("overwrite").parquet(
        paths["sitemaps"]
    )
    synth_feeds_df(spark, hosts, known=known).write.mode("overwrite").parquet(
        paths["feeds"]
    )
    synth_robots_df(spark, hosts).write.mode("overwrite").parquet(paths["robots"])
    spark.createDataFrame(
        [(u,) for u in crawled_urls], "url string"
    ).write.mode("overwrite").parquet(paths["crawled"])
    return hosts, set(crawled_urls), paths


def test_crawl_cycle_invariants(spark, tmp_path, capsys):
    from jobs.crawl_cycle import main

    hosts, crawled, paths = _write_inputs(spark, str(tmp_path))
    out = os.path.join(str(tmp_path), "plan")
    rc = main(
        [
            "--sitemaps", paths["sitemaps"],
            "--feeds", paths["feeds"],
            "--crawled", paths["crawled"],
            "--robots", paths["robots"],
            "--budget", "60",
            "--per-host-cap", "15",
            "--output", out,
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["planned_fetches"] > 0
    assert summary["sitemap_frontier"] > 0 and summary["feed_frontier"] > 0

    plan = spark.read.parquet(out)
    rows = plan.collect()

    # scheduled once per url
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls))
    # nothing already crawled
    assert not (set(urls) & crawled)

    # per-host: cap respected, slots contiguous from 1
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, hr in by_host.items():
        slots = sorted(x["slot"] for x in hr)
        assert slots == list(range(1, len(hr) + 1)), host
        assert len(hr) <= 15

    # robots-allowed, re-checked independently through the engine matcher
    from urllib.parse import urlsplit

    from extractor_spark.engine.robots import RobotsMatcher

    bodies = {
        r["host"]: r["body"]
        for r in spark.read.parquet(paths["robots"]).collect()
    }
    for r in rows:
        body = bodies.get(r["host"])
        if body is None:
            continue  # no robots.txt -> allowed by default
        m = RobotsMatcher(body, agent="extractor-spark")
        u = urlsplit(r["url"])
        path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        allowed, _rule = m.decide(path)
        assert allowed, r["url"]

    # every planned url was actually discovered by a channel
    from extractor_spark.engine.feeds import parse_feed
    from extractor_spark.engine.sitemap import parse_sitemap

    discovered = set()
    for row in spark.read.parquet(paths["sitemaps"]).collect():
        for e in parse_sitemap(row["xml"]):
            if e.kind == "url":
                discovered.add(e.loc)
    for row in spark.read.parquet(paths["feeds"]).collect():
        for e in parse_feed(row["xml"]):
            if e.loc:
                discovered.add(e.loc)
    assert set(urls) <= discovered

    # determinism: a second run produces the identical plan
    out2 = os.path.join(str(tmp_path), "plan2")
    main(
        [
            "--sitemaps", paths["sitemaps"],
            "--feeds", paths["feeds"],
            "--crawled", paths["crawled"],
            "--robots", paths["robots"],
            "--budget", "60",
            "--per-host-cap", "15",
            "--output", out2,
        ]
    )
    rows2 = {tuple(r) for r in spark.read.parquet(out2).collect()}
    assert rows2 == {tuple(r) for r in rows}
