"""RSS 2.0 / Atom feed parser (public rssboard.org RSS 2.0 spec and
RFC 4287 Atom), stdlib-only and crawl-tolerant.

Why here: feeds are the third discovery channel of the crawl-politeness
stack (robots.txt excludes — engine/robots.py; sitemaps enumerate —
engine/sitemap.py; feeds announce what is NEW).  A recrawl planner
re-parses millions of archived feed payloads, most of them slightly
malformed, so the parser must degrade per-entry rather than raise —
exactly the contract engine/sitemap.py already establishes.

Grammar handled:
- RSS 2.0 ``<item>`` entries: link from ``<link>text</link>`` with a
  ``<guid isPermaLink="true">`` fallback; freshness from ``<pubDate>``
  (RFC 822 date); ``<title>``.
- Atom ``<entry>`` entries: link from ``<link href="..."/>`` preferring
  rel="alternate" (or no rel) over other rels; freshness from
  ``<updated>`` falling back to ``<published>`` (RFC 3339 date);
  ``<title>``.
- Namespace prefixes are ignored (``<atom:entry>`` parses like
  ``<entry>``), CDATA and entity references are decoded, attribute and
  element noise is skipped.
- Dates are normalized to epoch SECONDS (``published_s``) so freshness
  sorts numerically — RFC 822 strings do not sort lexically the way
  sitemap ISO ``lastmod`` strings do.  An unparseable date yields None,
  never an exception.
- Entries without a resolvable link are skipped; a payload that is not a
  feed at all yields zero entries, never an exception.

The Spark composition (parse → dedupe → known-URL anti-join → robots
filter) lives in extractor_spark/spark/frontier.py:build_feed_frontier.

Gates (tests/test_feed_frontier.py): equality against an independent
xml.etree twin on well-formed feeds (namespace-wildcarded), CDATA /
entity / junk / malformed tolerance cases, date-normalization cases, and
the Spark frontier composition twin.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from html import unescape
from typing import NamedTuple


class FeedEntry(NamedTuple):
    kind: str  # 'rss' (item) or 'atom' (entry)
    loc: str
    published_s: int | None  # epoch seconds, None if absent/unparseable
    title: str | None


_BLOCK_RE = re.compile(
    r"<(?:[A-Za-z0-9_.-]+:)?(item|entry)\b[^>]*>(.*?)</(?:[A-Za-z0-9_.-]+:)?\1\s*>",
    re.S | re.I,
)
_FIELD_RES = {
    name: re.compile(
        r"<(?:[A-Za-z0-9_.-]+:)?%s\b[^>]*>(.*?)</(?:[A-Za-z0-9_.-]+:)?%s\s*>"
        % (name, name),
        re.S | re.I,
    )
    for name in ("link", "title", "pubDate", "updated", "published", "guid")
}
# Atom link: self-closing (or not) tag with attributes; captured whole so
# rel/href can be inspected per candidate.
_ATOM_LINK_RE = re.compile(
    r"<(?:[A-Za-z0-9_.-]+:)?link\b([^>]*?)/?>", re.S | re.I
)
# RSS text link: the element text may be plain (no '<') or CDATA-wrapped.
# Constraining the text grammar keeps a preceding attribute-only
# <atom:link .../> (rel=self noise) from being matched as an open tag whose
# lazy span would swallow — and CONSUME past — the real <link> element.
_RSS_LINK_RE = re.compile(
    r"<(?:[A-Za-z0-9_.-]+:)?link\b[^>]*>((?:<!\[CDATA\[.*?\]\]>|[^<])*)"
    r"</(?:[A-Za-z0-9_.-]+:)?link\s*>",
    re.S | re.I,
)
_ATTR_RE = re.compile(
    r"""([A-Za-z0-9_:-]+)\s*=\s*("([^"]*)"|'([^']*)')""", re.S
)
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)


def _clean(raw: str) -> str | None:
    cm = _CDATA_RE.search(raw)
    if cm:
        raw = cm.group(1)
    return unescape(raw).strip() or None


def _text(block: str, field: str) -> str | None:
    m = _FIELD_RES[field].search(block)
    if not m:
        return None
    return _clean(m.group(1))


def _attrs(tag_body: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(tag_body):
        # strip any namespace prefix off the attribute name too
        name = m.group(1).split(":")[-1].lower()
        out[name] = unescape(m.group(3) if m.group(3) is not None else m.group(4))
    return out


def parse_feed_date(raw: str | None) -> int | None:
    """RFC 822 (RSS pubDate) or RFC 3339/ISO 8601 (Atom updated/published)
    → epoch seconds; None when absent or unparseable.  A date with no zone
    is treated as UTC (the common sloppy-feed convention)."""
    if not raw:
        return None
    raw = raw.strip()
    dt: datetime | None = None
    try:
        dt = parsedate_to_datetime(raw)
    except (TypeError, ValueError):
        dt = None
    if dt is None:
        iso = raw[:-1] + "+00:00" if raw.endswith(("Z", "z")) else raw
        try:
            dt = datetime.fromisoformat(iso)
        except ValueError:
            return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _atom_link(block: str) -> str | None:
    """Best <link href=...> of an entry: rel='alternate' or rel-less wins
    over enclosure/self/etc.; first declared wins inside a class."""
    best: str | None = None
    for m in _ATOM_LINK_RE.finditer(block):
        attrs = _attrs(m.group(1))
        href = (attrs.get("href") or "").strip()
        if not href:
            continue
        rel = attrs.get("rel", "alternate").lower()
        if rel == "alternate":
            return href
        if best is None:
            best = href
    return best


def _rss_link(block: str) -> str | None:
    """<link>text</link>, falling back to a permalink <guid>.  Items often
    also carry an attribute-only ``<atom:link .../>`` (rel=self noise);
    the dedicated ``_RSS_LINK_RE`` only admits text-or-CDATA content, so a
    noise tag can never anchor a span that swallows the real link."""
    for m in _RSS_LINK_RE.finditer(block):
        loc = _clean(m.group(1))
        if loc:
            return loc
    m = _FIELD_RES["guid"].search(block)
    if not m:
        return None
    # find the guid's open tag to check isPermaLink (default true per spec)
    open_tag = re.search(
        r"<(?:[A-Za-z0-9_.-]+:)?guid\b([^>]*)>", block, re.S | re.I
    )
    attrs = _attrs(open_tag.group(1)) if open_tag else {}
    if attrs.get("ispermalink", "true").lower() == "false":
        return None
    return _clean(m.group(1))


def parse_feed(xml: str) -> list[FeedEntry]:
    """All well-formed-enough entries of an RSS or Atom feed body."""
    entries: list[FeedEntry] = []
    for m in _BLOCK_RE.finditer(xml):
        kind = "rss" if m.group(1).lower() == "item" else "atom"
        block = m.group(2)
        if kind == "rss":
            loc = _rss_link(block)
            raw_date = _text(block, "pubDate")
        else:
            loc = _atom_link(block)
            raw_date = _text(block, "updated") or _text(block, "published")
        if not loc:
            continue
        entries.append(
            FeedEntry(kind, loc, parse_feed_date(raw_date), _text(block, "title"))
        )
    return entries
