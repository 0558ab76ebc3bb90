"""URL canonicalization for crawl-scale dedup (extension op — the
reference's only URL rewriting is the Amazon ``/ref=`` strip, C7).

A crawl frontier sees the same page under many spellings: scheme/host case,
default ports, fragments, trailing-slash-on-root, tracking parameters,
unsorted query strings.  ``canonical_url`` maps those spellings to one key
so latest-per-url dedup collapses them.  It deliberately does NOT touch
path case, percent-encoding, or non-tracking params — over-normalization
merges genuinely different pages, which is worse than missing a dup.

Pure function of the string → usable as the pipeline's dedup key (opt-in
``PipelineConfig.canonicalize_urls``) and trivially vectorizable.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

# tracking params safe to drop: they never select content
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = frozenset(
    ["gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref_src"]
)

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonical_url(url: str) -> str:
    """Canonical spelling of ``url``; returns the input unchanged when it
    does not parse or has no scheme+host (relative/opaque refs)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url

    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    default_port = _DEFAULT_PORTS.get(scheme)
    if default_port and netloc.endswith(default_port):
        netloc = netloc[: -len(default_port)]

    path = parts.path or "/"

    query = parts.query
    if query:
        kept = [
            (k, v)
            for k, v in parse_qsl(query, keep_blank_values=True)
            if not (k.lower().startswith(_TRACKING_PREFIXES) or k.lower() in _TRACKING_EXACT)
        ]
        kept.sort()
        query = urlencode(kept)

    # fragment never reaches the server — always dropped
    return urlunsplit((scheme, netloc, path, query, ""))
