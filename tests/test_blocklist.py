"""Gates for url_blocklist_filter (spark/blocklist.py).

Twin: an independent urllib + explicit-endswith implementation over every
url in the query's own input corpus (synth crawl + planted traps) — no
suffix explode, no Spark expressions — compared by EXACT match-set
equality.  Plus the planted adversarial urls pinned individually (the
label-boundary string-endswith trap is the bug this operator exists to
not have) and the anti-join filter form checked against the twin's
keep-set.
"""

from __future__ import annotations

import urllib.parse

SF = "/root/testdata/sf0.001"


def _twin_match_rows(urls, domain_rules, prefix_rules):
    out = set()
    for u in urls:
        sp = urllib.parse.urlsplit(u)
        host = sp.netloc.lower()
        path = sp.path
        for d, cat in domain_rules:
            if host == d or host.endswith("." + d):
                out.add((u, host, cat, "domain", d))
        for rh, pref, cat in prefix_rules:
            if host == rh and path.startswith(pref):
                out.add((u, host, cat, "prefix", rh + pref))
    return out


def _corpus_urls(spark):
    from extractor_spark.spark.queries import (
        _BLOCKLIST_PLANTED_URLS,
        _webgraph_pages,
    )

    urls = [r["url"] for r in _webgraph_pages(spark).select("url").collect()]
    return urls + list(_BLOCKLIST_PLANTED_URLS)


def test_blocklist_matches_equal_twin(spark):
    from extractor_spark.spark.queries import (
        _BLOCKLIST_DOMAIN_RULES,
        _BLOCKLIST_PREFIX_RULES,
        _url_blocklist_filter,
        release_query_caches,
    )

    got = {
        (r["url"], r["host"], r["category"], r["rule_kind"], r["matched_rule"])
        for r in _url_blocklist_filter(spark, SF).collect()
    }
    release_query_caches()
    want = _twin_match_rows(
        _corpus_urls(spark), _BLOCKLIST_DOMAIN_RULES, _BLOCKLIST_PREFIX_RULES
    )
    assert got == want
    # every rule kind and several rules actually fire on this corpus
    kinds = {r[3] for r in got}
    assert kinds == {"domain", "prefix"}
    assert len(got) > 20


def test_planted_label_boundary_traps(spark):
    from extractor_spark.spark.queries import (
        _url_blocklist_filter,
        release_query_caches,
    )

    rows = _url_blocklist_filter(spark, SF).collect()
    release_query_caches()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append((r["rule_kind"], r["matched_rule"]))
    # subdomains match the parent rule on label boundaries...
    assert ("domain", "ads.example.org") in by_url["https://x.ads.example.org/a/1"]
    assert ("domain", "ads.example.org") in by_url["https://ads.example.org/a/2"]
    assert (
        ("domain", "cdn.site-05.example.org")
        in by_url["https://a.b.cdn.site-05.example.org/t2.js"]
    )
    # ...but a host that merely string-endswith the rule must NOT match
    assert "https://bads.example.org/a/3" not in by_url
    # the deep rule never blocks the parent host's own pages
    assert not any("site-05.example.org/article" in u for u in by_url)


def test_apply_blocklist_keepset(spark):
    from extractor_spark.spark.blocklist import (
        apply_blocklist,
        domain_rules_df,
        prefix_rules_df,
    )
    from extractor_spark.spark.queries import (
        _BLOCKLIST_DOMAIN_RULES,
        _BLOCKLIST_PLANTED_URLS,
        _BLOCKLIST_PREFIX_RULES,
        _webgraph_pages,
        release_query_caches,
    )

    pages = _webgraph_pages(spark).select("url").unionByName(
        spark.createDataFrame([(u,) for u in _BLOCKLIST_PLANTED_URLS], "url string")
    )
    kept = {
        r["url"]
        for r in apply_blocklist(
            pages,
            domain_rules_df(spark, _BLOCKLIST_DOMAIN_RULES),
            prefix_rules_df(spark, _BLOCKLIST_PREFIX_RULES),
        ).collect()
    }
    release_query_caches()
    urls = _corpus_urls(spark)
    blocked = {
        row[0]
        for row in _twin_match_rows(
            urls, _BLOCKLIST_DOMAIN_RULES, _BLOCKLIST_PREFIX_RULES
        )
    }
    assert kept == set(urls) - blocked
    assert "https://bads.example.org/a/3" in kept
