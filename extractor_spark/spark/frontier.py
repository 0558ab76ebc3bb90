"""Crawl-frontier construction: sitemap discovery → already-crawled
anti-join → robots exclusion, Spark-first.

The standing shape of every recrawl planner: per host, the sitemap says
what exists, the crawl archive says what we have, robots.txt says what
we may fetch.  At 10^12 documents each piece keeps its scale shape:

- ``parse_sitemaps`` is one Arrow ``mapInPandas`` pass over the
  (host, xml) sitemap table (engine/sitemap.py per payload — tolerant,
  per-entry degradation, a non-XML payload yields zero rows).
- The "already crawled" check is a LEFT ANTI equi-join on url against
  the pages table — Catalyst's standard shuffle/broadcast decision; in
  the host-partitioned pipeline both sides are co-partitioned on host so
  the anti-join is local.
- Robots exclusion reuses spark/robots.py (host join + per-body-compiled
  Arrow decision pass).

Gates (tests/test_sitemap_frontier.py): engine parser vs an independent
xml.etree twin on well-formed docs; frontier composition vs a pure-Python
set-algebra twin over the same synth inputs; count sanity (frontier ⊆
sitemap locs, no crawled url survives, every surviving url robots-allowed).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("priority_milli", T.LongType()),
    ]
)


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(host, xml) → exploded (host, kind, loc, lastmod, priority_milli)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..engine.sitemap import parse_sitemap

        for pdf in batches:
            rows = []
            for host, xml in zip(pdf["host"], pdf["xml"]):
                for e in parse_sitemap(xml or ""):
                    rows.append((host, e.kind, e.loc, e.lastmod, e.priority_milli))
            yield pd.DataFrame(
                rows, columns=["host", "kind", "loc", "lastmod", "priority_milli"]
            )

    return sitemaps.select("host", "xml").mapInPandas(run, schema=_ENTRY_SCHEMA)


def build_frontier(
    sitemaps: DataFrame,
    crawled_pages: DataFrame,
    robots: DataFrame,
    agent: str = "extractor-spark",
) -> DataFrame:
    """URLs to fetch next: in a sitemap, not yet crawled, robots-allowed.

    Returns (url, host, lastmod, priority_milli, rule) sorted by
    (priority desc, url) — the classic fetch-order key."""
    from pyspark.sql import Window

    from . import caches
    from .robots import robots_filter

    entries = parse_sitemaps(sitemaps).filter(F.col("kind") == "url")
    # A loc may legally appear many times — repeated entries in one
    # sitemap, or the same URL cross-submitted in several hosts' sitemaps
    # (ADVICE r4, medium).  Without dedup the verdicts join below fans out
    # n×n (duplicate frontier rows → duplicate fetches).  Keep one
    # best-attributed row per loc: highest priority, freshest lastmod,
    # lowest host as the deterministic tiebreak.  One shuffle on loc —
    # the same key the anti-join and verdict join use.
    dedup_w = Window.partitionBy("loc").orderBy(
        F.col("priority_milli").desc_nulls_last(),
        F.col("lastmod").desc_nulls_last(),
        F.col("host"),
    )
    entries = (
        entries.withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # fresh feeds BOTH the robots verdicts and the final attribute join —
    # persist it (entry-sized: sitemap rows, not the crawl) or the Arrow
    # parse pass and the anti-join run once per consumer (plan-audited:
    # 2x "MapInPandas run" without the persist).  Registered for
    # release_query_caches like every other cache-producing lazy result.
    fresh = entries.join(
        crawled_pages.select(F.col("url").alias("loc")).distinct(),
        ["loc"],
        "left_anti",
    ).persist()
    caches.register(fresh)
    verdicts = robots_filter(fresh.select(F.col("loc").alias("url")), robots, agent)
    return (
        fresh.join(verdicts.filter("allowed"), fresh["loc"] == verdicts["url"])
        .select(
            verdicts["url"],
            verdicts["host"],
            "lastmod",
            "priority_milli",
            "rule",
        )
        .orderBy(F.col("priority_milli").desc_nulls_last(), "url")
    )


def merge_frontier_store(store: DataFrame | None, increment: DataFrame) -> DataFrame:
    """Upsert an increment into the accumulated frontier: one row per url,
    keeping the best-attributed entry (priority desc nulls last, lastmod
    desc nulls last).  The reduction is an associative lexicographic
    argmax, so incremental merging converges to exactly the batch
    ``build_frontier`` result regardless of how entries are split across
    microbatches (rows tying on the full key are identical: host and rule
    are url-derived).  At production scale this merge is a Delta/Iceberg
    MERGE INTO keyed on url; here it is union + window-dedupe."""
    from pyspark.sql import Window

    unioned = increment if store is None else store.unionByName(increment)
    w = Window.partitionBy("url").orderBy(
        F.col("priority_milli").desc_nulls_last(),
        F.col("lastmod").desc_nulls_last(),
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_frontier(
    spark,
    sitemaps_stream_dir: str,
    crawled_pages: DataFrame,
    robots: DataFrame,
    work_dir: str,
    agent: str = "extractor-spark",
) -> DataFrame:
    """Incremental frontier over a STREAM of sitemap bodies (VERDICT r4
    #8): new (host, xml) files land in ``sitemaps_stream_dir``; each
    microbatch runs the same parse → dedupe → anti-join → robots
    composition as ``build_frontier`` and is upserted into a persistent
    frontier store via ``merge_frontier_store``.  availableNow drain;
    returns the final store DataFrame.

    The store swap is read-old → write-new-dir → atomic rename (the local
    stand-in for a transactional table MERGE; the checkpoint +
    deterministic merge make replays idempotent)."""
    import os
    import shutil

    from . import caches

    store_dir = os.path.join(work_dir, "frontier_store")
    ckpt_dir = os.path.join(work_dir, "frontier_ckpt")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        with caches.scope():
            inc = build_frontier(batch_df, crawled_pages, robots, agent=agent)
            store = (
                spark.read.parquet(store_dir) if os.path.isdir(store_dir) else None
            )
            merged = merge_frontier_store(store, inc)
            tmp_dir = f"{store_dir}.next{batch_id}"
            merged.write.mode("overwrite").parquet(tmp_dir)
            if os.path.isdir(store_dir):
                shutil.rmtree(store_dir)
            os.rename(tmp_dir, store_dir)

    stream = (
        spark.readStream.schema("host string, xml string")
        .option("maxFilesPerTrigger", 1)
        .parquet(sitemaps_stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store_dir).orderBy(
        F.col("priority_milli").desc_nulls_last(), "url"
    )


def allocate_crawl_budget(
    frontier: DataFrame, budget: int, per_host_cap: int | None = None
) -> DataFrame:
    """Politeness-aware fetch scheduling over a frontier (the
    Mercator/Heritrix budget shape): split a global fetch ``budget``
    across hosts proportionally to their frontier share — every
    represented host gets at least 1 slot, an optional ``per_host_cap``
    bounds hot hosts — then pick each host's top-priority URLs within its
    quota.

    Determinism: quotas are (budget × n_urls) DIV total (BIGINT integer
    division — no float anywhere), slot ordering inside a host is
    (priority desc nulls last, url).  Scale shape: the frontier is
    shuffled ONCE on host (the same partitioning a politeness queue needs
    anyway); n_urls, slot, and the quota are all computed in that single
    window pass, and the only other traffic is the 1-row total broadcast.
    No host-sized table is ever built or broadcast (10^8 hosts at web
    scale).

    Returns (url, host, priority_milli, host_quota, slot) with slot ≤
    host_quota — ``slot`` is the per-host fetch order."""
    from pyspark.sql import Window

    total = frontier.select(F.count("*").cast("bigint").alias("t"))
    w_host = Window.partitionBy("host")
    w_slot = Window.partitionBy("host").orderBy(
        F.col("priority_milli").desc_nulls_last(), "url"
    )
    cap_terms = (
        [F.lit(int(per_host_cap)).cast("bigint")] if per_host_cap else []
    )
    n_urls = F.count("*").over(w_host).cast("bigint")
    quota = F.least(
        n_urls,
        F.greatest(
            F.expr(f"CAST({int(budget)} AS BIGINT) * _n_urls DIV _t"),
            F.lit(1).cast("bigint"),
        ),
        *cap_terms,
    )
    return (
        frontier.crossJoin(F.broadcast(total).withColumnRenamed("t", "_t"))
        .withColumn("_n_urls", n_urls)
        .withColumn("slot", F.row_number().over(w_slot))
        .withColumn("host_quota", quota)
        .filter(F.col("slot") <= F.col("host_quota"))
        .select("url", "host", "priority_milli", "host_quota", "slot")
        .orderBy("host", "slot")
    )


def synth_sitemaps_df(
    spark,
    hosts: list[str],
    n_per_host: int = 40,
    known: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Deterministic sitemap bodies per host: clean urlset entries (new
    ids beyond the crawled range plus, when ``known`` is given, real
    already-crawled urls so the anti-join has guaranteed work), plus
    namespace prefixes, CDATA, entities, junk blocks, one sitemap-index,
    REPEATED locs within a sitemap, and locs cross-submitted by the
    previous host's sitemap (both legal; the frontier must emit each loc
    once — the twin gate asserts url uniqueness)."""
    known = known or {}
    rows = []
    sorted_hosts = sorted(hosts)
    for i, host in enumerate(sorted_hosts):
        parts = ['<?xml version="1.0" encoding="UTF-8"?>']
        if i % 7 == 3:
            parts.append(
                "<sitemapindex><sitemap><loc>https://%s/sitemap-2.xml</loc>"
                "<lastmod>2026-01-0%d</lastmod></sitemap></sitemapindex>" % (host, i % 9 + 1)
            )
            rows.append((host, "".join(parts)))
            continue
        parts.append(
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
            ' xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">'
        )
        for u in known.get(host, []):
            parts.append(f"<url><loc>{u}</loc></url>")
        for k in range(n_per_host):
            page_id = 100000 + i * 1000 + k
            loc = f"https://{host}/article/{page_id}"
            if k % 11 == 5:
                loc_xml = f"<![CDATA[{loc}]]>"
            elif k % 11 == 7:
                loc_xml = loc.replace("&", "&amp;") + "?a=1&amp;b=2"
            else:
                loc_xml = loc
            tag = "sm:url" if k % 13 == 4 else "url"
            ltag = "sm:loc" if k % 13 == 4 else "loc"
            entry = f"<{tag}><{ltag}>{loc_xml}</{ltag}>"
            if k % 3 == 0:
                entry += f"<lastmod>2026-0{k % 9 + 1}-15</lastmod>"
            if k % 4 == 0:
                entry += f"<priority>0.{k % 10}</priority>"
            if k % 17 == 9:
                entry += "<junk>ignored</junk>"
            entry += f"</{tag}>"
            parts.append(entry)
        if i % 5 == 2:
            parts.append("<url><lastmod>2026-01-01</lastmod></url>")  # no loc
            parts.append("<url><loc>   </loc></url>")  # blank loc
        # repeated loc within the same sitemap, different priority
        dup_loc = f"https://{host}/article/{100000 + i * 1000}"
        parts.append(f"<url><loc>{dup_loc}</loc><priority>0.9</priority></url>")
        # cross-submission: this host's sitemap also lists the previous
        # host's first article (the same URL in two hosts' sitemaps)
        if i > 0:
            prev = sorted_hosts[i - 1]
            parts.append(
                f"<url><loc>https://{prev}/article/{100000 + (i - 1) * 1000}</loc></url>"
            )
        parts.append("</urlset>")
        rows.append((host, "".join(parts)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["host", "xml"]))


# ---------------------------------------------------------------------------
# Feed discovery (RSS/Atom — engine/feeds.py): the "what is NEW" half of
# the discovery stack, composed exactly like the sitemap frontier.
# ---------------------------------------------------------------------------

_FEED_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("loc", T.StringType()),
        T.StructField("published_s", T.LongType()),
        T.StructField("title", T.StringType()),
    ]
)


def parse_feeds(feeds: DataFrame) -> DataFrame:
    """(host, xml) → exploded (host, kind, loc, published_s, title) via one
    Arrow ``mapInPandas`` pass (engine/feeds.py per payload — tolerant,
    per-entry degradation, a non-feed payload yields zero rows)."""

    def run(batches):
        from ..engine.feeds import parse_feed

        for pdf in batches:
            rows = []
            for host, xml in zip(pdf["host"], pdf["xml"]):
                for e in parse_feed(xml or ""):
                    rows.append((host, e.kind, e.loc, e.published_s, e.title))
            yield pd.DataFrame(
                rows, columns=["host", "kind", "loc", "published_s", "title"]
            )

    return feeds.select("host", "xml").mapInPandas(run, schema=_FEED_ENTRY_SCHEMA)


def build_feed_frontier(
    feeds: DataFrame,
    crawled_pages: DataFrame,
    robots: DataFrame,
    agent: str = "extractor-spark",
) -> DataFrame:
    """URLs announced by a feed, not yet crawled, robots-allowed — the
    incremental-discovery sibling of ``build_frontier``.  Freshness is the
    numeric ``published_s`` (engine/feeds.py normalizes RFC 822 and
    RFC 3339 dates to epoch seconds — unlike sitemap ISO ``lastmod``
    strings, feed dates do not sort lexically).

    Same scale shape as the sitemap path: one Arrow parse pass, one
    loc-shuffle for the dedupe (cross-posted and repeated entries are
    legal and common in feeds — syndication mirrors), co-keyed anti-join
    against the crawl, robots verdicts on the deduped survivors only.
    Returns (url, host, published_s, title, rule) sorted freshest-first."""
    from pyspark.sql import Window

    from . import caches
    from .robots import robots_filter

    entries = parse_feeds(feeds)
    # Tiebreak uses only columns that SURVIVE into the output (published_s,
    # title): the output's host and rule are url-derived, so rows tying on
    # (published_s, title) are output-identical, and the streaming store
    # merge (merge_feed_store) can reproduce this choice exactly from
    # output rows alone — the same argument streaming_frontier relies on.
    dedup_w = Window.partitionBy("loc").orderBy(
        F.col("published_s").desc_nulls_last(),
        F.col("title").asc_nulls_last(),
    )
    entries = (
        entries.withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # fresh feeds both the robots verdicts and the final attribute join —
    # persist (feed-entry-sized) or the Arrow parse + anti-join would run
    # once per consumer (same plan-audit finding as build_frontier).
    fresh = entries.join(
        crawled_pages.select(F.col("url").alias("loc")).distinct(),
        ["loc"],
        "left_anti",
    ).persist()
    caches.register(fresh)
    verdicts = robots_filter(fresh.select(F.col("loc").alias("url")), robots, agent)
    return (
        fresh.join(verdicts.filter("allowed"), fresh["loc"] == verdicts["url"])
        .select(
            verdicts["url"],
            verdicts["host"],
            "published_s",
            "title",
            "rule",
        )
        .orderBy(F.col("published_s").desc_nulls_last(), "url")
    )


def synth_feeds_df(
    spark,
    hosts: list[str],
    n_per_host: int = 24,
    known: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Deterministic feed bodies per host: RSS 2.0 for even hosts, Atom
    for odd (both with namespace/CDATA/entity/junk noise), embedding
    already-crawled urls when ``known`` is given so the anti-join has
    guaranteed work, repeated locs within one feed and cross-posted locs
    across hosts (syndication), items with no link, permalink and
    non-permalink guids, rel=self link noise, unparseable dates, and one
    non-feed payload."""
    known = known or {}
    rows = []
    sorted_hosts = sorted(hosts)
    for i, host in enumerate(sorted_hosts):
        if i % 11 == 6:
            rows.append((host, "this is not a feed at all {}"))
            continue
        items = []
        locs = [f"https://{host}/post/{200000 + i * 1000 + k}" for k in range(n_per_host)]
        for u in known.get(host, []):
            locs.append(u)
        if i > 0:
            # syndication: re-announce the previous host's first post
            locs.append(f"https://{sorted_hosts[i - 1]}/post/{200000 + (i - 1) * 1000}")
        locs.append(locs[0])  # repeated entry in the same feed
        if i % 2 == 0:
            for k, loc in enumerate(locs):
                title = f"<![CDATA[Post <{k}> & more]]>" if k % 5 == 2 else f"Post {k}"
                link = loc.replace("&", "&amp;") + ("?a=1&amp;b=2" if k % 9 == 4 else "")
                item = "<item>"
                if k % 7 == 3:
                    item += '<atom:link href="https://feedproxy.invalid/self" rel="self"/>'
                if k % 13 == 8:
                    item += f'<guid isPermaLink="true">{link}</guid>'
                else:
                    item += f"<link>{link}</link>"
                if k % 3 != 2:
                    item += f"<pubDate>Mon, {k % 28 + 1:02d} Jul 2025 0{k % 10}:30:00 GMT</pubDate>"
                elif k % 6 == 5:
                    item += "<pubDate>not a date</pubDate>"
                item += f"<title>{title}</title><junk>x</junk></item>"
                items.append(item)
            items.append("<item><title>linkless</title></item>")
            items.append('<item><guid isPermaLink="false">tag:not-a-url</guid></item>')
            body = (
                '<?xml version="1.0"?><rss version="2.0" '
                'xmlns:atom="http://www.w3.org/2005/Atom"><channel>'
                f"<title>{host}</title><link>https://{host}/</link>"
                + "".join(items)
                + "</channel></rss>"
            )
        else:
            for k, loc in enumerate(locs):
                tag = "atom:entry" if k % 13 == 4 else "entry"
                entry = f"<{tag}>"
                if k % 7 == 3:
                    entry += f'<link rel="enclosure" href="https://{host}/audio/{k}.mp3"/>'
                entry += f'<link rel="alternate" href="{loc.replace("&", "&amp;")}"/>'
                if k % 3 != 2:
                    entry += f"<updated>2025-07-{k % 28 + 1:02d}T0{k % 10}:30:00Z</updated>"
                elif k % 6 == 5:
                    entry += f"<published>2025-06-{k % 28 + 1:02d}T00:00:00+02:00</published>"
                entry += f"<title>Entry {k}</title></{tag}>"
                items.append(entry)
            items.append("<entry><title>linkless</title></entry>")
            # xmlns:atom DECLARED: the etree twin parses these bodies and an
            # undeclared prefix is fine for the tolerant engine but kills
            # etree (same lesson as the sitemap synth's xmlns:sm).
            body = (
                '<feed xmlns="http://www.w3.org/2005/Atom"'
                ' xmlns:atom="http://www.w3.org/2005/Atom">'
                f"<title>{host}</title>" + "".join(items) + "</feed>"
            )
        rows.append((host, body))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["host", "xml"]))


def merge_feed_store(store: DataFrame | None, increment: DataFrame) -> DataFrame:
    """Upsert a feed-frontier increment: one row per url, keeping the
    freshest-attributed entry (published_s desc nulls last, title asc
    nulls last — the same total order build_feed_frontier's dedupe uses,
    over columns present in the OUTPUT, so incremental merging converges
    to exactly the batch result regardless of microbatch splits; rows
    tying on the full key are output-identical because host and rule are
    url-derived)."""
    from pyspark.sql import Window

    unioned = increment if store is None else store.unionByName(increment)
    w = Window.partitionBy("url").orderBy(
        F.col("published_s").desc_nulls_last(),
        F.col("title").asc_nulls_last(),
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_feed_frontier(
    spark,
    feeds_stream_dir: str,
    crawled_pages: DataFrame,
    robots: DataFrame,
    work_dir: str,
    agent: str = "extractor-spark",
) -> DataFrame:
    """Incremental feed-driven discovery over a STREAM of feed bodies —
    the natural deployment shape (feeds announce what is NEW, so they
    arrive continuously): new (host, xml) files land in
    ``feeds_stream_dir``; each microbatch runs the same parse → dedupe →
    anti-join → robots composition as ``build_feed_frontier`` and is
    upserted into a persistent store via ``merge_feed_store``.
    availableNow drain; returns the final store, freshest-first.  Same
    read-old → write-new → atomic-rename store swap as
    ``streaming_frontier`` (the local stand-in for MERGE INTO)."""
    import os
    import shutil

    from . import caches

    store_dir = os.path.join(work_dir, "feed_store")
    ckpt_dir = os.path.join(work_dir, "feed_ckpt")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        with caches.scope():
            inc = build_feed_frontier(batch_df, crawled_pages, robots, agent=agent)
            store = (
                spark.read.parquet(store_dir) if os.path.isdir(store_dir) else None
            )
            merged = merge_feed_store(store, inc)
            tmp_dir = f"{store_dir}.next{batch_id}"
            merged.write.mode("overwrite").parquet(tmp_dir)
            if os.path.isdir(store_dir):
                shutil.rmtree(store_dir)
            os.rename(tmp_dir, store_dir)

    stream = (
        spark.readStream.schema("host string, xml string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feeds_stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store_dir).orderBy(
        F.col("published_s").desc_nulls_last(), "url"
    )
