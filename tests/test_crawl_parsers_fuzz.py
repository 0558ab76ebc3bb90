"""Hypothesis fuzz for the crawl-politeness parsers (robots + sitemap).

The tolerance contracts these modules document — "a trillion-page crawl
contains every malformation; degrade per-entry, never raise" — get the
property-based treatment: arbitrary text (including XML-ish and
robots-ish fragments stitched from grammar shards) must parse without
exceptions and return well-typed results, and the matcher must stay
total and deterministic over arbitrary paths.
"""

from hypothesis import given, settings, strategies as st

from extractor_spark.engine.robots import RobotsMatcher, parse_robots
from extractor_spark.engine.sitemap import SitemapEntry, parse_sitemap

_ROBOTS_SHARDS = st.sampled_from(
    [
        "User-agent: *", "User-agent:", "user-AGENT: bot", "Allow: /a*b$",
        "Disallow: /", "Disallow:", "Allow: ", "Sitemap: https://x/s.xml",
        "Crawl-delay: 2", "# comment", "", ":", "Disallow /nospace",
        "Allow: /*.gif$", "Disallow: /a/**$", "User-agent: a", "junk",
        "Disallow: /%e2%82%ac", "Allow: /$$", "Disallow: *",
    ]
)
_XML_SHARDS = st.sampled_from(
    [
        "<urlset>", "</urlset>", "<url>", "</url>", "<loc>", "</loc>",
        "<loc>https://x/a</loc>", "<sm:loc>b</sm:loc>", "<![CDATA[", "]]>",
        "<sitemap>", "</sitemap>", "<priority>0.5</priority>",
        "<priority>NaN</priority>", "<lastmod>2026</lastmod>", "&amp;",
        "&bogus;", "<", ">", "</", "<!--", "-->", "x y z", "",
    ]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_ROBOTS_SHARDS, max_size=30).map("\n".join), st.text(max_size=80))
def test_robots_total_on_grammar_shards(body, path):
    groups = parse_robots(body)
    assert isinstance(groups, list)
    m = RobotsMatcher(body, "extractor-spark")
    allowed, rule = m.decide(path)
    assert isinstance(allowed, bool) and isinstance(rule, str)
    assert (allowed, rule) == m.decide(path)  # deterministic


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300), st.text(max_size=60))
def test_robots_total_on_arbitrary_text(body, path):
    allowed, rule = RobotsMatcher(body, "bot").decide(path)
    assert isinstance(allowed, bool) and isinstance(rule, str)


@settings(max_examples=300, deadline=None)
@given(st.lists(_XML_SHARDS, max_size=40).map("".join))
def test_sitemap_total_on_xmlish_shards(xml):
    entries = parse_sitemap(xml)
    for e in entries:
        assert isinstance(e, SitemapEntry)
        assert e.kind in ("url", "sitemap") and e.loc
        assert e.priority_milli is None or isinstance(e.priority_milli, int)
    assert entries == parse_sitemap(xml)  # deterministic


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_sitemap_total_on_arbitrary_text(xml):
    assert isinstance(parse_sitemap(xml), list)
