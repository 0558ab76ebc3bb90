"""Deterministic minimal PDF writer (stdlib only).

Counterpart to engine/pdf.py: produces small, valid PDF 1.4 files so the
extractor can be exercised without any external fixtures or libraries —
the sandbox has no reportlab/fpdf, and determinism matters because the
Spark roundtrip query (text → PDF → extracted text) is oracle-checked for
byte identity per document.

Structure per the public PDF spec (ISO 32000-1): classic xref table,
Catalog → Pages → Page tree, one Flate-compressed content stream per page,
and a single Type0 font whose 2-byte codes index a per-document glyph
table with a ToUnicode CMap (bfchar entries, UTF-16BE) — this encodes
arbitrary unicode text, including non-BMP codepoints (surrogate pairs in
the CMap value), without any font-program bytes.

Layout contract (what pdf.py must reconstruct):
- each text line is one Tj at a fixed leading (T* between lines);
- a blank input line advances the baseline without showing text, so the
  extractor re-infers it from the leading multiple;
- page breaks land only where both adjoining lines are non-blank, so page
  texts joined with "\\n" reproduce the input exactly.

Documented roundtrip boundaries (geometry carries no signal): blank lines
at the very start or end of the document, blank runs longer than a page,
and contiguous text at ≥1.9× leading (see pdf._dominant_leading).
"""

from __future__ import annotations

import zlib


_LEADING = 14.0
_FONT_SIZE = 11.0
_TOP_Y = 756.0
_LEFT_X = 72.0
_MEDIA = "[0 0 612 792]"


def _wrap_line(line: str, width: int) -> list[str]:
    """Greedy word-wrap breaking ONLY at single spaces.

    Joining the output with a single space reproduces the input exactly
    when the input has no runs of spaces (the roundtrip query's contract).
    Words longer than `width` stay unbroken on their own line.
    """
    if len(line) <= width:
        return [line]
    words = line.split(" ")
    out: list[str] = []
    cur: str | None = None
    for w in words:
        if cur is None:
            cur = w  # may be "" (leading space) — must NOT be dropped
        elif len(cur) + 1 + len(w) <= width:
            cur += " " + w
        else:
            out.append(cur)
            cur = w
    out.append(cur if cur is not None else "")
    return out


def _glyph_table(lines: list[str]) -> dict[str, int]:
    """char → 2-byte CID, assigned in order of first appearance (CID 1+)."""
    table: dict[str, int] = {}
    for ln in lines:
        for ch in ln:
            if ch not in table:
                table[ch] = len(table) + 1
                if len(table) > 0xFFFE:
                    raise ValueError("glyph table overflow (>65534 distinct chars)")
    return table


def _tounicode_cmap(table: dict[str, int]) -> bytes:
    ent = []
    for ch, cid in table.items():
        dst = ch.encode("utf-16-be").hex().upper()
        ent.append(f"<{cid:04X}> <{dst}>")
    # bfchar blocks are capped at 100 entries by convention (§9.10.3)
    blocks = []
    for i in range(0, len(ent), 100):
        chunk = ent[i:i + 100]
        blocks.append(f"{len(chunk)} beginbfchar\n" + "\n".join(chunk) + "\nendbfchar")
    body = (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "/CMapName /SparkExtractorToUnicode def\n/CMapType 2 def\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        + "\n".join(blocks)
        + "\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    )
    return body.encode("ascii")


def _encode_line(line: str, table: dict[str, int]) -> str:
    return "<" + "".join(f"{table[ch]:04X}" for ch in line) + ">"


def _page_content(lines: list[str], table: dict[str, int]) -> bytes:
    ops = [f"BT /F1 {_FONT_SIZE:g} Tf {_LEADING:g} TL {_LEFT_X:g} {_TOP_Y:g} Td"]
    first = True
    for ln in lines:
        if not first:
            ops.append("T*")
        first = False
        if ln:
            ops.append(f"{_encode_line(ln, table)} Tj")
    ops.append("ET")
    return "\n".join(ops).encode("ascii")


def text_to_pdf(
    text: str,
    *,
    wrap: int | None = None,
    lines_per_page: int = 48,
    compress: bool = True,
) -> bytes:
    """Render `text` into a deterministic one-font PDF.

    wrap=None keeps input lines as-is (blank lines become leading skips);
    wrap=N word-wraps each input line at N chars, breaking only at single
    spaces so `extracted.replace("\\n", " ")` reproduces a single-line
    input exactly.
    """
    raw_lines = text.split("\n")
    lines: list[str] = []
    for ln in raw_lines:
        lines.extend(_wrap_line(ln, wrap) if wrap else [ln])
    if not lines:
        lines = [""]
    table = _glyph_table(lines)

    # Paginate at blank-safe boundaries: a blank line adjacent to a page
    # break produces no runs on either page and the extractor's leading
    # inference cannot see across pages, so require the last line of a page
    # and the first line of the next to both be non-blank (searching back
    # from the target size).  Unrecoverable boundaries, documented: a blank
    # run longer than a page, and blank lines at the very start or end of
    # the document (no baseline before/after to measure against).
    pages: list[list[str]] = []
    i = 0
    nl = len(lines)
    while i < nl:
        k = min(i + lines_per_page, nl)
        if k < nl:
            j = k
            while j > i + 1 and not (lines[j - 1] and lines[j]):
                j -= 1
            if lines[j - 1] and lines[j]:
                k = j
        pages.append(lines[i:k])
        i = k

    # object layout: 1 Catalog, 2 Pages, 3 Font, 4 ToUnicode,
    # then per page: (5+2i) Page, (6+2i) Contents
    objs: dict[int, bytes] = {}
    npages = len(pages)
    kid_refs = " ".join(f"{5 + 2 * i} 0 R" for i in range(npages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kid_refs}] /Count {npages} "
               f"/MediaBox {_MEDIA} >>").encode("ascii")
    objs[3] = (b"<< /Type /Font /Subtype /Type0 /BaseFont /SparkExtractorSans "
               b"/Encoding /Identity-H /ToUnicode 4 0 R "
               b"/DescendantFonts [<< /Type /Font /Subtype /CIDFontType2 "
               b"/BaseFont /SparkExtractorSans "
               b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> "
               b"/DW 500 >>] >>")
    objs[4] = _stream_obj(_tounicode_cmap(table), compress)
    for i, page_lines in enumerate(pages):
        pnum, cnum = 5 + 2 * i, 6 + 2 * i
        objs[pnum] = (f"<< /Type /Page /Parent 2 0 R /Contents {cnum} 0 R "
                      f"/Resources << /Font << /F1 3 0 R >> >> >>").encode("ascii")
        objs[cnum] = _stream_obj(_page_content(page_lines, table), compress)

    return _assemble(objs)


def _stream_obj(payload: bytes, compress: bool) -> bytes:
    if compress:
        data = zlib.compress(payload, 9)
        head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode("ascii")
    else:
        data = payload
        head = f"<< /Length {len(data)} >>".encode("ascii")
    return head + b"\nstream\n" + data + b"\nendstream"


def _assemble(objs: dict[int, bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("ascii") + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    maxnum = max(objs)
    out += f"xref\n0 {maxnum + 1}\n".encode("ascii")
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode("ascii")
        else:
            out += b"0000000000 65535 f \n"
    out += (f"trailer\n<< /Size {maxnum + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode("ascii")
    return bytes(out)
