"""Unicode sanitation for web-crawled text (ftfy-lite).

Web corpora routinely contain three classes of damage that survive HTML
extraction and poison downstream tokenizers:

1. **Mojibake** — UTF-8 bytes mis-decoded as cp1252/latin-1 somewhere in
   the serving chain ("â€™" where "’" was meant, "Ã©" for "é"),
   sometimes applied twice.  Repair = re-encode with the wrong codec and
   re-decode as UTF-8, accepted ONLY when it strictly reduces an
   explicit weirdness score (so legitimate Latin-1-range text like
   "déjà vu", which fails the UTF-8 re-decode, and CJK/Cyrillic text,
   which fails the cp1252 re-encode, are provably untouched).
2. **Control and zero-width characters** — C0/C1 controls (except tab
   and newline), zero-width (ZWSP/ZWNJ/ZWJ/BOM) and U+FFFD replacement
   chars left by lossy decoders.
3. **Denormalized forms** — combining sequences that NFC would compose;
   tokenizers treat "e\\u0301" and "é" as different tokens.

No analog exists in the reference (its extractor emits whatever bytes
the fetch produced); this is the curation-stage operator every
production pipeline (C4, CCNet, fineweb) runs before tokenization.
Pure function of the input string: the Spark stage (spark/arrow_udfs.py
``sanitize_text_udf``) maps it over Arrow batches, so Spark-vs-engine
byte equality is testable row-for-row.
"""

from __future__ import annotations

import re
import unicodedata

# cp1252 high-range specials + the Latin-1 lead bytes most frequent in
# UTF-8-as-cp1252 mojibake.  A character from this set appearing in text
# is only *suspicious*; repairs must strictly reduce the count.
_HINT_CHARS = frozenset(
    "€‚ƒ„…†‡ˆ‰Š‹"
    "ŒŽ‘’“”•–—˜™"
    "š›œžŸ"  # cp1252 0x80-0x9F printables
    "ÂÃÄÅâã"  # Â Ã Ä Å â ã lead bytes
    "�"
)

# C0 controls except \t\n (\r is normalized to \n first), C1 controls,
# zero-width characters and the BOM, and the replacement character.
_STRIP_RE = re.compile(
    "[\x00-\x08\x0b-\x1f\x7f-\x9f\u200b-\u200d\u2060\ufeff\ufffd]"
)

_MAX_REPAIR_PASSES = 3  # single + double mojibake; triple is noise

# cp1252 leaves five bytes undefined (0x81 0x8D 0x8F 0x90 0x9D); real-world
# mojibake carries them through as the corresponding C1 control characters
# ("sloppy cp1252", the same convention ftfy and WHATWG windows-1252 use).
_SLOPPY_BYTES = frozenset((0x81, 0x8D, 0x8F, 0x90, 0x9D))


def _weirdness(s: str) -> int:
    return sum(1 for ch in s if ch in _HINT_CHARS)


def _encode_sloppy_cp1252(s: str) -> bytes | None:
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in s:
        o = ord(ch)
        if o in _SLOPPY_BYTES:
            out.append(o)
        else:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                return None
    return bytes(out)


def _repair_once(s: str) -> str | None:
    """One wrong-codec round trip, or None if the bytes don't support it."""
    raw = _encode_sloppy_cp1252(s)
    if raw is None:
        try:
            raw = s.encode("latin-1")
        except UnicodeEncodeError:
            return None
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return None


def sanitize_text(s: str) -> tuple[str, int, int]:
    """Return ``(clean_text, n_mojibake_repairs, n_chars_removed)``.

    Deterministic, idempotent (``sanitize_text(clean)[0] == clean``),
    and conservative: a repair pass is kept only when it strictly
    reduces the mojibake-hint count, so text that merely *contains*
    curly quotes or accented Latin letters is never rewritten.
    """
    if not s:
        return "", 0, 0
    s = s.replace("\r\n", "\n").replace("\r", "\n")

    repairs = 0
    removed = 0
    # Run repair → NFC → strip to a FIXPOINT: stripping can UNLOCK a
    # repair (hypothesis find: '\x80â\xa0\xa0' — the stray C1 byte makes
    # the cp1252/latin-1 round trip undecodable, but once the strip pass
    # removes it, 'â\xa0\xa0' is repairable mojibake for U+2820), so a
    # single ordering of the stages is not idempotent.  Termination:
    # every changing round strictly decreases the weirdness count or the
    # length (repairs are accepted only on strict weirdness decrease,
    # strips strictly shorten, NFC is idempotent); the cap is
    # belt-and-braces.
    for _round in range(8):
        before = s
        score = _weirdness(s)
        while score > 0 and repairs < _MAX_REPAIR_PASSES:
            fixed = _repair_once(s)
            if fixed is None:
                break
            fixed_score = _weirdness(fixed)
            if fixed_score >= score:
                break
            s, score = fixed, fixed_score
            repairs += 1
        s = unicodedata.normalize("NFC", s)
        stripped = _STRIP_RE.sub("", s)
        removed += len(s) - len(stripped)
        s = stripped
        if s == before:
            break
    return s, repairs, removed
