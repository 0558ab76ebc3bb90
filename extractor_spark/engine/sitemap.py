"""Sitemaps-protocol parser (sitemaps.org XML format — public spec),
stdlib-only and crawl-tolerant.

Why here: sitemaps are the discovery half of the crawl-politeness pair
(robots.txt is the exclusion half — engine/robots.py); a batch frontier
builder re-parses millions of archived sitemap payloads, most of them
slightly malformed, so the parser must degrade per-entry rather than
raise.  The Spark composition (parse → known-URL anti-join → robots
filter) lives in extractor_spark/spark/frontier.py.

Grammar handled:
- ``<urlset>`` with ``<url>`` entries: loc (required), lastmod,
  changefreq, priority (optional).
- ``<sitemapindex>`` with ``<sitemap>`` entries: loc, lastmod — emitted
  with kind='sitemap' so the caller can recurse.
- Namespace prefixes are ignored (``<sm:loc>`` parses like ``<loc>``),
  attribute noise is ignored, entity references in loc are decoded
  (&amp; etc.), surrounding whitespace/CDATA is stripped.
- Malformed entries (no loc, unparseable block) are skipped; a document
  that is not XML at all yields zero entries, never an exception.

Gates (tests/test_sitemap_frontier.py): equality against an independent
xml.etree twin on well-formed documents (namespace-wildcarded), entity /
CDATA / prefix / junk tolerance cases, and the Spark frontier
composition twin.
"""

from __future__ import annotations

import re
from html import unescape
from typing import NamedTuple


class SitemapEntry(NamedTuple):
    kind: str  # 'url' (urlset entry) or 'sitemap' (index entry)
    loc: str
    lastmod: str | None
    priority_milli: int | None


_BLOCK_RE = re.compile(
    r"<(?:[A-Za-z0-9_.-]+:)?(url|sitemap)\b[^>]*>(.*?)</(?:[A-Za-z0-9_.-]+:)?\1\s*>",
    re.S | re.I,
)
_FIELD_RES = {
    name: re.compile(
        r"<(?:[A-Za-z0-9_.-]+:)?%s\b[^>]*>(.*?)</(?:[A-Za-z0-9_.-]+:)?%s\s*>"
        % (name, name),
        re.S | re.I,
    )
    for name in ("loc", "lastmod", "priority")
}
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)


def _text(block: str, field: str) -> str | None:
    m = _FIELD_RES[field].search(block)
    if not m:
        return None
    raw = m.group(1)
    cm = _CDATA_RE.search(raw)
    if cm:
        raw = cm.group(1)
    return unescape(raw).strip() or None


def parse_sitemap(xml: str) -> list[SitemapEntry]:
    """All well-formed-enough entries of a sitemap / sitemap-index body."""
    entries: list[SitemapEntry] = []
    for m in _BLOCK_RE.finditer(xml):
        kind = m.group(1).lower()
        block = m.group(2)
        loc = _text(block, "loc")
        if not loc:
            continue
        prio = _text(block, "priority")
        prio_milli: int | None = None
        if prio is not None:
            try:
                prio_milli = round(float(prio) * 1000)
            except ValueError:
                prio_milli = None
        entries.append(
            SitemapEntry(kind, loc, _text(block, "lastmod"), prio_milli)
        )
    return entries
