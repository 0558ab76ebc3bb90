"""Relative→absolute URL resolution with Node legacy ``url.resolve`` parity.

The reference resolves link/image targets against the page URL with Node's
legacy resolver (/root/reference/src/converters.ts:153,188).  RFC-3986
``urljoin`` agrees with it on every case exercised by the reference's test
corpus (absolute paths, relative paths, ``..`` traversal, unknown schemes
passing through untouched); divergences are limited to exotic inputs
(backslashes, host-case normalization) and are documented here rather than
emulated.
"""

from __future__ import annotations

from urllib.parse import urljoin


def resolve_url(base: str, href: str) -> str:
    """Resolve ``href`` against ``base``; on any failure return ``href``
    unchanged (the reference warns and keeps the original,
    converters.ts:154-159)."""
    try:
        return urljoin(base, href)
    except Exception:
        return href
