"""Crawl-scale robots.txt filtering (RFC 9309) as a Spark stage.

Shape for 10^12 pages / ~10^8 hosts:

- The pages side carries only (url, host, path): host and path are
  extracted JVM-side with ``parse_url`` (no Python touches the full row).
- pages ⋈ robots is a plain equi-join on host.  At crawl scale BOTH sides
  are large (the robots table is ~10^8 rows of KB-sized bodies) so the
  join must shuffle — but the extraction pipeline is already
  host-partitioned (north rule), so in situ the join is co-partitioned
  and shuffle-free on the pages side; hot hosts are exactly the AQE
  skew-join case.  Nothing here is broadcast that grows with the crawl.
- The decision stage is one Arrow ``mapInPandas`` pass: within a batch,
  URLs are grouped per host so each robots body is parsed/compiled ONCE
  per (host, batch) via an LRU kept across batches of the same task
  (engine.robots.RobotsMatcher), then each compiled rule regex is applied
  to the host's whole path Series — per-rule vectorized matching, not
  per-row parsing.  Pages on hosts with no robots.txt take a constant
  vectorized default-allow path (RFC §2.3.1: unavailable ⇒ allowed) —
  kept INSIDE the single Arrow pass because the JVM-side filter/union
  alternative recomputes the host join once per union branch
  (plan-audited), and the join is the expensive half at crawl scale.

Gates (tests/test_robots.py): an independently-coded brute-force REP
twin (recursive wildcard matcher, no regex) must agree on every decision
over the synth crawl + adversarial bodies; RFC 9309 §5 example table;
determinism; and a plan gate pinning the single-join single-pass shape.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("allowed", T.BooleanType()),
        T.StructField("rule", T.StringType()),
    ]
)


def robots_filter(
    pages: DataFrame, robots: DataFrame, agent: str = "extractor-spark"
) -> DataFrame:
    """Annotate every page URL with its RFC 9309 verdict.

    pages: any frame with a ``url`` column; robots: (host, body).
    Returns (url, host, allowed, rule) — ``rule`` is the winning pattern,
    '' when the default-allow applied.
    """
    urls = pages.select(
        F.col("url"),
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.concat(
            F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("/")),
            F.coalesce(
                F.concat(F.lit("?"), F.parse_url("url", F.lit("QUERY"))),
                F.lit(""),
            ),
        ).alias("path"),
    )
    # ONE left join, ONE Arrow pass.  (A filter/union split that keeps
    # robots-less hosts JVM-side recomputes the join once per union branch
    # — plan-audited; the join is the expensive half at crawl scale, so
    # null-body rows instead ride the batch and take a constant vectorized
    # default-allow path with zero parsing/matching work.)
    joined = urls.join(robots.select("host", "body"), ["host"], "left")

    def decide(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import OrderedDict

        from ..engine.robots import RobotsMatcher

        # true LRU: evict one cold entry at a time — a clear()-style purge
        # oscillates between full and empty on tasks streaming >capacity
        # distinct bodies, recompiling hot hosts' rule sets repeatedly
        cache: OrderedDict[str, RobotsMatcher] = OrderedDict()
        for pdf in batches:
            outs = []
            # robots-less hosts: RFC §2.3.1 unavailable => allowed
            missing = pdf[pdf["body"].isna()]
            if len(missing):
                outs.append(
                    pd.DataFrame(
                        {
                            "url": missing["url"],
                            "host": missing["host"],
                            "allowed": True,
                            "rule": "",
                        }
                    )
                )
            for body, grp in pdf[pdf["body"].notna()].groupby("body", sort=False):
                matcher = cache.get(body)
                if matcher is None:
                    while len(cache) >= 4096:  # bound task memory on huge batches
                        cache.popitem(last=False)
                    matcher = cache[body] = RobotsMatcher(body, agent)
                else:
                    cache.move_to_end(body)
                allowed = pd.Series(True, index=grp.index)
                rule = pd.Series("", index=grp.index)
                paths = grp["path"]
                # ascending precedence: later rules overwrite earlier ones
                for _ln, allow, pattern, rx in matcher.rules:
                    hit = paths.str.match(rx)
                    allowed = allowed.where(~hit, allow)
                    rule = rule.where(~hit, pattern)
                outs.append(
                    pd.DataFrame(
                        {
                            "url": grp["url"],
                            "host": grp["host"],
                            "allowed": allowed,
                            "rule": rule,
                        }
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame(
                columns=["url", "host", "allowed", "rule"]
            )

    return joined.mapInPandas(decide, schema=_OUT_SCHEMA)


def synth_robots_df(spark, hosts: list[str]) -> DataFrame:
    """Deterministic per-host robots.txt bodies covering the REP grammar:
    wildcard + anchored patterns, allow-overrides, agent-specific groups,
    stacked UA lines, comments, unknown directives, malformed lines, and
    (every 5th host) no robots at all (left out of the table)."""
    rows = []
    for i, host in enumerate(sorted(hosts)):
        if i % 5 == 4:
            continue  # no robots.txt for this host
        variant = i % 4
        if variant == 0:
            body = (
                "# generic deny of the archive section\n"
                "User-agent: *\n"
                "Disallow: /article/1*\n"
                "Allow: /article/1$\n"
                "Crawl-delay: 2\n"
            )
        elif variant == 1:
            body = (
                "User-agent: extractor-spark\n"
                "User-agent: otherbot\n"
                "Allow: /article/*2$\n"
                "Disallow: /article/\n"
                "\n"
                "User-agent: *\n"
                "Disallow: /\n"
            )
        elif variant == 2:
            body = (
                "Disallow: /ignored-no-group\n"
                "User-agent: *\n"
                "Disallow: /article/*3\n"
                "Disallow: /article/*5$\n"
                "Allow: /article/15\n"
                "broken line without colon\n"
            )
        else:
            body = (
                "User-agent: somebodyelse\n"
                "Disallow: /\n"
                "Sitemap: https://%s/sitemap.xml\n" % host
            )
        rows.append((host, body))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["host", "body"])
    )
