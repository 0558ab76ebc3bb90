"""Dolma-style typed PII span tagging (AI2 Dolma toolkit's tagger/filter
decoupling, public): taggers emit OFFSET ATTRIBUTES over the original
text; a separate apply step decides what to do with them (mask, drop,
count).  This module is the tagger; the mask-apply helper reproduces the
JVM `pii_scrub` query's sequential regexp_replace output exactly, which
tests/test_queries_oracle.py pins cross-implementation (Python `re` spans
+ right-to-left masking ≡ Java-regex sequential replace).

Patterns are the same literals as queries.py's pii_scrub (email / ipv4 /
phone).  Overlap rule: kinds are scanned in priority order (email, ip,
phone) and a later-kind match is dropped if it overlaps an accepted span
— mirroring what the sequential replace does implicitly (by the time the
phone pass runs, email/ip text is already consumed, and the placeholders
contain no digits for a phone match to latch onto).

Spans are 0-based [start, end) character offsets into the ORIGINAL text.

No reference analog (the reference does no PII handling); the pattern
trio follows the repo's existing pii_scrub query.
"""

from __future__ import annotations

import re

# keep in sync with queries.py _PII_EMAIL/_PII_IPV4/_PII_PHONE (the pinned
# cross-implementation test fails loudly on drift)
PII_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("email", re.compile(r"[A-Za-z0-9._+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")),
    ("ip", re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")),
    ("phone", re.compile(
        r"\+?[0-9]{1,2}[ .-]?\(?[0-9]{3}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}"
    )),
]

MASK = {"email": "<EMAIL>", "ip": "<IP>", "phone": "<PHONE>"}


def pii_spans(text: str) -> list[tuple[str, int, int, str]]:
    """(kind, start, end, matched) spans over ``text``, kind-priority
    overlap resolution, sorted by (start, end)."""
    if not text:
        return []
    accepted: list[tuple[str, int, int, str]] = []
    taken: list[tuple[int, int]] = []
    for kind, pat in PII_PATTERNS:
        for m in pat.finditer(text):
            s, e = m.span()
            if any(s < te and ts < e for ts, te in taken):
                continue
            accepted.append((kind, s, e, m.group()))
            taken.append((s, e))
    accepted.sort(key=lambda t: (t[1], t[2]))
    return accepted


def mask_spans(text: str, spans: list[tuple[str, int, int, str]]) -> str:
    """Apply step: replace each span with its kind's mask token,
    right-to-left so earlier offsets stay valid."""
    out = text
    for kind, s, e, _m in sorted(spans, key=lambda t: -t[1]):
        out = out[:s] + MASK[kind] + out[e:]
    return out
