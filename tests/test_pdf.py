"""PDF text/layout extraction (engine/pdf.py) + deterministic writer.

The reference has no PDF analog (north_rule names "PDF/layout parse"
directly); correctness is defined against the public PDF spec.  Two test
families:

1. writer→parser roundtrips over the writer's layout contract (unicode,
   blank lines, wrapping, multi-page);
2. hand-built PDFs exercising paths the writer never produces — 1-byte
   WinAnsi fonts, literal strings with escapes, TJ kerning arrays, Tm
   positioning, two-column layout, object streams, corrupt xref / wrong
   /Length — so the parser is validated as a general extractor, not just
   the writer's inverse.
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from extractor_spark.engine.pdf import (
    Name,
    PdfDocument,
    Ref,
    is_pdf,
    parse_object,
    pdf_to_pages,
    pdf_to_text,
)
from extractor_spark.engine.pdfwrite import text_to_pdf


# ---------------------------------------------------------------------------
# COS object lexer
# ---------------------------------------------------------------------------

def test_parse_scalars():
    assert parse_object(b" 42 ", 0)[0] == 42
    assert parse_object(b"-3.5", 0)[0] == -3.5
    assert parse_object(b".5", 0)[0] == 0.5
    assert parse_object(b"true", 0)[0] is True
    assert parse_object(b"null", 0)[0] is None
    assert parse_object(b"/Name#20With#2FEscapes", 0)[0] == Name("Name With/Escapes")


def test_parse_literal_string_escapes():
    obj, _ = parse_object(rb"(a\(b\)c \\ \n\t \101 \0053)", 0)
    # \101 = 'A'; \005 then literal '3' (3-digit octal max)
    assert obj == b"a(b)c \\ \n\t A \x053"


def test_parse_literal_string_nested_parens_and_continuation():
    obj, _ = parse_object(b"(outer (inner) tail\\\nnext)", 0)
    assert obj == b"outer (inner) tailnext"


def test_parse_hex_string_odd_padded():
    assert parse_object(b"<48656C6C6F2>", 0)[0] == b"Hello "


def test_parse_dict_array_ref():
    d, _ = parse_object(b"<< /A [1 2 R 3] /B << /C (x) >> /D 5 0 R >>", 0)
    assert d["A"] == [Ref(1, 2), 3]
    assert d["B"]["C"] == b"x"
    assert d["D"] == Ref(5, 0)


def test_comment_skipped():
    assert parse_object(b"% comment\n 7", 0)[0] == 7


# ---------------------------------------------------------------------------
# Writer → parser roundtrips (layout contract)
# ---------------------------------------------------------------------------

ROUNDTRIP_CASES = [
    "hello world",
    "line one\nline two\nline three",
    "para one\n\npara two after a blank\n\n\nthree newlines = two blanks",
    "x\ny\n\nz\nw",
    "unicode: café über 中文 \U0001f600 end",
    "tab\tand (parens) and \\backslash\\ and <angle>",
]


@pytest.mark.parametrize("text", ROUNDTRIP_CASES)
def test_roundtrip_exact(text):
    assert pdf_to_text(text_to_pdf(text)) == text


def test_roundtrip_uncompressed():
    t = ROUNDTRIP_CASES[2]
    assert pdf_to_text(text_to_pdf(t, compress=False)) == t


def test_lone_blank_pair_recovered_by_size_heuristic():
    # A single gap of 2x leading is geometrically ambiguous, but the
    # typographic band (leading ~1.15-1.5x font size) disambiguates: 28pt
    # at 11pt font is implausible as single-spacing, so one blank line is
    # re-inferred (_dominant_leading refinement).
    assert pdf_to_text(text_to_pdf("a\n\nb")) == "a\n\nb"


def test_uniform_alternating_blanks_recovered():
    # every gap is 2x leading (blank between every pair) — the GCD alone
    # reads as the leading; the font-size band halves it back
    t = "a\n\nb\n\nc\n\nd"
    assert pdf_to_text(text_to_pdf(t)) == t


def test_roundtrip_boundary_trailing_blank_documented():
    # Documented unrecoverable boundary: trailing blank lines leave no
    # baseline after them to measure against.
    assert pdf_to_text(text_to_pdf("a\nb\n")) == "a\nb"


def test_blank_line_at_page_boundary_preserved():
    # 48 non-blank lines then blank+line: pagination must not split at the
    # blank (the extractor cannot infer blanks across pages)
    t = "\n".join([f"x{i}" for i in range(48)] + ["", "y"])
    assert pdf_to_text(text_to_pdf(t, lines_per_page=48)) == t


def test_wrap_preserves_leading_space():
    t = " lead" + " word" * 30  # >72 chars, starts with a space
    got = pdf_to_text(text_to_pdf(t, wrap=72)).replace("\n", " ")
    assert got == t


def test_wrap_rejoin_identity():
    t = ("alpha beta gamma delta epsilon " * 50).strip()
    got = pdf_to_text(text_to_pdf(t, wrap=72)).replace("\n", " ")
    assert got == t


def test_multipage_break_at_line_boundary():
    t = "\n".join(f"line {i} of the corpus" for i in range(200))
    pdf = text_to_pdf(t, lines_per_page=48)
    pages = pdf_to_pages(pdf)
    assert len(pages) == 5  # ceil(200/48)
    assert pdf_to_text(pdf) == t


def test_glyph_table_reused_across_pages():
    # same chars on every page -> compact cmap; still roundtrips
    t = "\n".join("abc abc" for _ in range(100))
    assert pdf_to_text(text_to_pdf(t, lines_per_page=10)) == t


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                exclude_categories=("Cs", "Cc", "Zl", "Zp"),
                exclude_characters=" ",
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=60,
    )
)
def test_wrap_roundtrip_property(words):
    """Any single-space-joined word sequence survives write→wrap→extract."""
    t = " ".join(words)
    got = pdf_to_text(text_to_pdf(t, wrap=24)).replace("\n", " ")
    assert got == t


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_multiline_roundtrip_property(lines):
    """Non-blank lines (no blank-line ambiguity) roundtrip exactly."""
    t = "\n".join(lines)
    assert pdf_to_text(text_to_pdf(t)) == t


# ---------------------------------------------------------------------------
# Hand-built PDFs: paths the writer never produces
# ---------------------------------------------------------------------------

def _minimal_pdf(content: bytes, extra_objs: str = "", font: str = "/Type /Font /Subtype /Type1 /BaseFont /Helvetica") -> bytes:
    """Classic uncompressed 1-byte-font PDF around a raw content stream."""
    body = f"""%PDF-1.4
1 0 obj
<< /Type /Catalog /Pages 2 0 R >>
endobj
2 0 obj
<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>
endobj
3 0 obj
<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>
endobj
4 0 obj
<< /Length {len(content)} >>
stream
""".encode("latin-1") + content + f"""
endstream
endobj
5 0 obj
<< {font} >>
endobj
{extra_objs}""".encode("latin-1")
    # deliberately bogus xref: the loader's brute scan must not need it
    return body + b"\nxref\n0 1\ntrailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"


def test_simple_font_literal_strings():
    content = b"BT /F1 12 Tf 14 TL 72 720 Td (Hello, world!) Tj T* (Second line.) Tj ET"
    assert pdf_to_text(_minimal_pdf(content)) == "Hello, world!\nSecond line."


def test_winansi_high_bytes():
    # 0xE9 = e-acute in cp1252/WinAnsi
    content = b"BT /F1 12 Tf 72 720 Td (caf\xe9) Tj ET"
    assert pdf_to_text(_minimal_pdf(content)) == "café"


def test_tj_array_kerning_word_gap():
    # small kerning (-40) is intra-word; large (-250) is an elided space
    content = b"BT /F1 12 Tf 72 720 Td [(ker) -40 (ned) -250 (gap)] TJ ET"
    assert pdf_to_text(_minimal_pdf(content)) == "kerned gap"


def test_quote_operators_and_leading():
    content = b"BT /F1 12 Tf 16 TL 72 720 Td (one) Tj (two) ' 0 0 (three) \" ET"
    assert pdf_to_text(_minimal_pdf(content)) == "one\ntwo\nthree"


def test_tm_positioning_orders_lines_by_y():
    # emitted bottom line first; layout must re-sort by descending y
    content = (b"BT /F1 12 Tf 1 0 0 1 72 600 Tm (bottom) Tj "
               b"1 0 0 1 72 700 Tm (top) Tj ET")
    assert pdf_to_text(_minimal_pdf(content)) == "top\nbottom"


def test_adjacent_runs_same_line_gap_space():
    # two Tj runs on one baseline, second placed with a visible gap
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (left) Tj "
               b"1 0 0 1 200 700 Tm (right) Tj ET")
    assert pdf_to_text(_minimal_pdf(content)) == "left right"


def test_two_column_layout_reading_order():
    # left column x=72, right column x=340; 4 lines each, emitted interleaved
    ops = [b"BT /F1 10 Tf"]
    for i in range(4):
        y = 700 - 12 * i
        ops.append(b"1 0 0 1 72 %d Tm (L%d) Tj" % (y, i))
        ops.append(b"1 0 0 1 340 %d Tm (R%d) Tj" % (y, i))
    ops.append(b"ET")
    text = pdf_to_text(_minimal_pdf(b" ".join(ops)))
    assert text == "L0\nL1\nL2\nL3\nR0\nR1\nR2\nR3"


def test_single_column_not_split():
    # normal prose with word gaps must NOT trigger the gutter detector
    ops = [b"BT /F1 10 Tf"]
    for i in range(4):
        ops.append(b"1 0 0 1 72 %d Tm (word%d more text here) Tj" % (700 - 12 * i, i))
    ops.append(b"ET")
    assert pdf_to_text(_minimal_pdf(b" ".join(ops))) == "\n".join(
        f"word{i} more text here" for i in range(4)
    )


def test_wrong_length_falls_back_to_endstream_scan():
    content = b"BT /F1 12 Tf 72 720 Td (resilient) Tj ET"
    pdf = _minimal_pdf(content)
    broken = pdf.replace(f"/Length {len(content)}".encode(), b"/Length 7")
    assert pdf_to_text(broken) == "resilient"


def test_garbage_between_objects_tolerated():
    content = b"BT /F1 12 Tf 72 720 Td (survives) Tj ET"
    pdf = _minimal_pdf(content)
    mangled = pdf.replace(b"endobj\n2 0 obj", b"endobj\n\x00\xff GARBAGE \xfe\n2 0 obj")
    assert pdf_to_text(mangled) == "survives"


def test_truncated_trailer_tolerated():
    content = b"BT /F1 12 Tf 72 720 Td (no trailer) Tj ET"
    pdf = _minimal_pdf(content)
    cut = pdf[: pdf.rindex(b"xref")]
    assert pdf_to_text(cut) == "no trailer"


def test_incremental_update_later_object_wins():
    content_old = b"BT /F1 12 Tf 72 720 Td (old text) Tj ET"
    content_new = b"BT /F1 12 Tf 72 720 Td (new text) Tj ET"
    pdf = _minimal_pdf(content_old)
    appended = pdf + (
        f"4 0 obj\n<< /Length {len(content_new)} >>\nstream\n".encode()
        + content_new
        + b"\nendstream\nendobj\n"
    )
    assert pdf_to_text(appended) == "new text"


def test_object_stream_expansion():
    """Catalog/Pages/Page dicts hidden inside a /Type /ObjStm stream."""
    inner = (
        b"<< /Type /Catalog /Pages 2 0 R >>"
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>"
    )
    o1 = b"<< /Type /Catalog /Pages 2 0 R >>"
    o2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    header = f"1 0 2 {len(o1)} 3 {len(o1) + len(o2)} ".encode()
    payload = header + inner
    objstm = zlib.compress(payload)
    content = b"BT /F1 12 Tf 72 720 Td (from objstm) Tj ET"
    pdf = (
        b"%PDF-1.5\n"
        + f"9 0 obj\n<< /Type /ObjStm /N 3 /First {len(header)} /Length {len(objstm)} /Filter /FlateDecode >>\nstream\n".encode()
        + objstm
        + b"\nendstream\nendobj\n"
        + f"4 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
        + content
        + b"\nendstream\nendobj\n"
        + b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_to_text(pdf) == "from objstm"


def test_asciihex_filter():
    content = b"BT /F1 12 Tf 72 720 Td (hexed) Tj ET"
    hexed = content.hex().encode() + b">"
    pdf = _minimal_pdf(b"")  # placeholder; rebuild stream 4 by hand
    pdf = pdf.replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        f"<< /Length {len(hexed)} /Filter /ASCIIHexDecode >>\nstream\n".encode()
        + hexed
        + b"\nendstream",
    )
    assert pdf_to_text(pdf) == "hexed"


def test_inline_image_skipped():
    content = (b"BT /F1 12 Tf 72 720 Td (before) Tj ET "
               b"BI /W 2 /H 2 ID \x00\x01\x02\x03 EI "
               b"BT /F1 12 Tf 72 700 Td (after) Tj ET")
    assert pdf_to_text(_minimal_pdf(content)) == "before\nafter"


def test_is_pdf_sniff():
    assert is_pdf(b"%PDF-1.7\nrest")
    assert is_pdf(b"\xef\xbb\xbf  \n%PDF-1.4")  # BOM + whitespace ok
    assert not is_pdf(b"PK\x03\x04 not a pdf")
    # STRICT routing sniff: mentioning the magic mid-payload is not a PDF
    # (the lenient parser still accepts junk-prefixed PDFs when invoked)
    assert not is_pdf(b"<p>The %PDF- magic marks PDF files.</p>")
    assert pdf_to_text(b"junkjunk%PDF-1.4\n" + text_to_pdf("still parses")[9:]) == "still parses"


def test_tm_scaled_font_size_no_spurious_spaces():
    # 'Tf 1' with the size in the text matrix: the composite (tm x ctm)
    # vertical scale must drive gap thresholds, else a kern-sized 1pt gap
    # reads as a word break
    content = (b"BT /F1 1 Tf 12 0 0 12 72 700 Tm (Hel) Tj "
               b"12 0 0 12 91 700 Tm (lo) Tj ET")
    assert pdf_to_text(_minimal_pdf(content)) == "Hello"


def test_inline_image_with_embedded_ei_bytes():
    # image data contains the 2-byte sequence 'EI' — the skip must only end
    # at a whitespace-delimited EI token
    content = (b"BT /F1 12 Tf 72 720 Td (real) Tj ET "
               b"BI /W 4 /H 4 /BPC 8 ID \x10\x45\x49\x20(garbage)Tj\x00\x00 EI "
               b"BT /F1 12 Tf 72 700 Td (after) Tj ET")
    assert pdf_to_text(_minimal_pdf(content)) == "real\nafter"


def test_form_xobject_text_extracted():
    # page content is just 'q /Fm0 Do Q'; the text lives in a Form XObject
    inner = b"BT /F1 12 Tf 14 TL 72 720 Td (from the form) Tj T* (second) Tj ET"
    extra = (
        f"6 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
        f"/Resources << /Font << /F1 5 0 R >> >> /Length {len(inner)} >>\nstream\n".encode()
        + inner + b"\nendstream\nendobj\n"
    )
    pdf = _minimal_pdf(b"q /Fm0 Do Q", extra_objs=extra.decode("latin-1"))
    pdf = pdf.replace(
        b"/Resources << /Font << /F1 5 0 R >> >>",
        b"/Resources << /Font << /F1 5 0 R >> /XObject << /Fm0 6 0 R >> >>",
        1,  # only the PAGE resources; the form's own stay font-only
    )
    assert pdf_to_text(pdf) == "from the form\nsecond"


def test_short_length_with_nearby_endstream_rescans():
    # /Length short by 6: 'endstream' is within 20 bytes of the bogus end,
    # but only EOL slack may precede it — the extent must fall back to the
    # endstream scan instead of truncating the stream
    content = b"BT /F1 12 Tf 72 700 Td (HelloWorld) Tj ET"
    pdf = _minimal_pdf(content)
    broken = pdf.replace(
        f"/Length {len(content)}".encode(), f"/Length {len(content) - 6}".encode()
    )
    assert pdf_to_text(broken) == "HelloWorld"


def test_empty_and_garbage_inputs_do_not_raise():
    assert pdf_to_text(b"") == ""
    assert pdf_to_text(b"%PDF-1.4\ngarbage only") == ""
    assert pdf_to_pages(b"\x00" * 64) == []


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_mutation_fuzz_never_raises(data):
    """Crawl-facing contract: arbitrary corruption of a valid PDF may lose
    text but must never raise — a poisoned document cannot be allowed to
    fail a 100 TB task (the Spark stages rely on this via their own
    try/except, but the parser itself should already be total)."""
    base = text_to_pdf("fuzz target\n\nwith several lines\nof content here")
    n_mut = data.draw(st.integers(1, 8))
    buf = bytearray(base)
    for _ in range(n_mut):
        pos = data.draw(st.integers(0, len(buf) - 1))
        buf[pos] = data.draw(st.integers(0, 255))
    out = pdf_to_text(bytes(buf))
    assert isinstance(out, str)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_arbitrary_bytes_never_raise(blob):
    assert isinstance(pdf_to_text(b"%PDF-1.4\n" + blob), str)


# ---------------------------------------------------------------------------
# Link annotations → markdown links (HTML-path parity)
# ---------------------------------------------------------------------------

def _link_annot(rect, uri):
    return (f"<< /Subtype /Link /Rect [{rect[0]} {rect[1]} {rect[2]} {rect[3]}] "
            f"/A << /S /URI /URI ({uri}) >> >>")


def _pdf_with_annots(content: bytes, annots: list[str]) -> bytes:
    pdf = _minimal_pdf(content)
    return pdf.replace(
        b"/Contents 4 0 R",
        ("/Contents 4 0 R /Annots [" + " ".join(annots) + "]").encode("latin-1"),
    )


def test_link_annotation_becomes_markdown_link():
    # 'click here' at x=72..~140, y=700; rect covers it
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (see ) Tj "
               b"1 0 0 1 100 700 Tm (the docs) Tj "
               b"1 0 0 1 160 700 Tm ( after) Tj ET")
    pdf = _pdf_with_annots(content, [_link_annot((98, 694, 152, 712), "https://d.test/x")])
    assert pdf_to_text(pdf) == "see [the docs](https://d.test/x) after"


def test_adjacent_runs_same_link_merge():
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (two) Tj "
               b"1 0 0 1 110 700 Tm (words) Tj ET")
    pdf = _pdf_with_annots(content, [_link_annot((70, 694, 160, 712), "https://d.test/m")])
    # gap space lands INSIDE the link because both sides share the uri
    assert pdf_to_text(pdf) == "[two words](https://d.test/m)"


def test_link_uri_parens_escaped():
    content = b"BT /F1 12 Tf 72 700 Td (wiki) Tj ET"
    pdf = _pdf_with_annots(content, [_link_annot((70, 694, 120, 712), "https://w.test/a_(b)")])
    assert pdf_to_text(pdf) == "[wiki](https://w.test/a_\\(b\\))"


def test_annots_absent_or_malformed_ignored():
    content = b"BT /F1 12 Tf 72 700 Td (plain) Tj ET"
    pdf = _pdf_with_annots(content, ["<< /Subtype /Link /Rect [bad] >>",
                                     "<< /Subtype /Square >>"])
    assert pdf_to_text(pdf) == "plain"


def test_cid_w_array_drives_advance():
    """Type0 /W widths (both entry forms) control the text advance: CID 1
    ('A') is 2000/1000 wide, so two Tj'd glyphs with an interleaving Tm
    reposition must not gain a spurious gap space — and with the narrow
    default instead, the same geometry WOULD read as a gap."""
    # font: 2-byte Identity-H with ToUnicode A/B; /W gives CID1 width 2000
    cmap = (b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange "
            b"2 beginbfchar <0001> <0041> <0002> <0042> endbfchar "
            b"endcmap end end")
    font = (f"/Type /Font /Subtype /Type0 /BaseFont /T /Encoding /Identity-H "
            f"/ToUnicode 6 0 R /DescendantFonts [<< /Type /Font "
            f"/Subtype /CIDFontType2 /BaseFont /T "
            f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> "
            f"/DW 100 /W [1 [2000] 2 2 500] >>]")
    extra = (f"6 0 obj\n<< /Length {len(cmap)} >>\nstream\n".encode()
             + cmap + b"\nendstream\nendobj\n").decode("latin-1")
    # show 'A' at x=72 (advance 2000/1000*12=24 -> x_end=96), then 'B' at x=97:
    # gap 1pt < 0.3*size -> same word.  With DW=100 (x_end=73.2) gap would be 23.8.
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <0001> Tj 1 0 0 1 97 700 Tm <0002> Tj ET"
    pdf = _minimal_pdf(content, extra_objs=extra, font=font)
    assert pdf_to_text(pdf) == "AB"


def test_overflow_widths_do_not_raise():
    # /W with a 320-digit float literal (parses to inf; int(inf) would
    # overflow) and a huge-integer width: never-raise contract holds
    big = "9" * 320
    font = (f"/Type /Font /Subtype /Type0 /BaseFont /T /Encoding /Identity-H "
            f"/DescendantFonts [<< /Type /Font /Subtype /CIDFontType2 /BaseFont /T "
            f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> "
            f"/DW 100 /W [{big}.0 [500] 1 2 {big}] >>]")
    content = b"BT /F1 12 Tf 72 700 Td <0001> Tj ET"
    assert isinstance(pdf_to_text(_minimal_pdf(content, font=font)), str)


def test_overflow_rect_and_matrix_do_not_raise():
    big = b"9" * 400
    content = b"BT /F1 12 Tf " + big + b" 0 0 " + big + b" 72 700 Tm (x) Tj ET"
    pdf = _pdf_with_annots(content, [f"<< /Subtype /Link /Rect [0 0 {'9'*400} 10] "
                                     f"/A << /S /URI /URI (https://x.test) >> >>"])
    assert isinstance(pdf_to_text(pdf), str)


def test_link_body_markdown_specials_escaped():
    content = b"BT /F1 12 Tf 72 700 Td (see [12]) Tj ET"
    pdf = _pdf_with_annots(content, [_link_annot((70, 694, 140, 712), "https://d.test/c")])
    assert pdf_to_text(pdf) == "[see \\[12\\]](https://d.test/c)"


def test_garbage_keyword_does_not_clobber_valid_object():
    # an incremental 'update' of the Contents object that is pure text
    # garbage must NOT replace the earlier valid stream under later-wins
    content = b"BT /F1 12 Tf 72 700 Td (keep me) Tj ET"
    pdf = _minimal_pdf(content)
    appended = pdf + b"4 0 obj\ngarbagekeyword\nendobj\n"
    assert pdf_to_text(appended) == "keep me"


def test_flate_png_predictor_up_and_sub():
    """ObjStm whose Flate payload uses PNG row predictors (/DecodeParms
    /Predictor 12): the un-prediction must recover the object stream."""
    inner = (b"<< /Type /Catalog /Pages 2 0 R >>"
             b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
             b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
             b"/Resources << /Font << /F1 5 0 R >> >> >>")
    o1 = b"<< /Type /Catalog /Pages 2 0 R >>"
    o2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    header = f"1 0 2 {len(o1)} 3 {len(o1) + len(o2)} ".encode()
    payload = header + inner

    # PNG-encode with filter type 2 (Up), Columns=24
    cols = 24
    rows = [payload[i:i + cols].ljust(cols, b"\x00")
            for i in range(0, len(payload), cols)]
    enc = bytearray()
    prev = bytes(cols)
    for r in rows:
        enc.append(2)
        enc += bytes((r[i] - prev[i]) & 0xFF for i in range(cols))
        prev = r
    objstm = zlib.compress(bytes(enc))

    content = b"BT /F1 12 Tf 72 720 Td (predicted) Tj ET"
    pdf = (
        b"%PDF-1.5\n"
        + (f"9 0 obj\n<< /Type /ObjStm /N 3 /First {len(header)} "
           f"/Length {len(objstm)} /Filter /FlateDecode "
           f"/DecodeParms << /Predictor 12 /Columns {cols} >> >>\nstream\n").encode()
        + objstm + b"\nendstream\nendobj\n"
        + f"4 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
        + content + b"\nendstream\nendobj\n"
        + b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_to_text(pdf) == "predicted"


def test_page_rotate_90_reads_upright():
    """Landscape content (text advancing along +y, Tm rotation) on a page
    with /Rotate 90: composing the display rotation into the CTM must
    yield normal reading order, not one-glyph-per-line garbage."""
    content = (b"BT /F1 12 Tf 0 1 -1 0 100 72 Tm (first rotated line) Tj "
               b"0 1 -1 0 114 72 Tm (second rotated line) Tj ET")
    pdf = _minimal_pdf(content)
    rotated = pdf.replace(b"/Contents 4 0 R", b"/Contents 4 0 R /Rotate 90")
    assert pdf_to_text(rotated) == "first rotated line\nsecond rotated line"
    # same content WITHOUT /Rotate: vertical baselines -> not reading order
    assert pdf_to_text(pdf) != "first rotated line\nsecond rotated line"


def test_hostile_predictor_columns_cheap():
    """/Columns 2e9 on a tiny stream must not allocate GBs or loop for
    hours — the un-predictor bails when a row exceeds the stream."""
    import time
    payload = zlib.compress(b"\x02hello world")
    pdf = _minimal_pdf(b"")
    pdf = pdf.replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        (f"<< /Length {len(payload)} /Filter /FlateDecode "
         f"/DecodeParms << /Predictor 12 /Columns 2000000000 >> >>\nstream\n").encode()
        + payload + b"\nendstream",
    )
    t0 = time.time()
    assert isinstance(pdf_to_text(pdf), str)
    assert time.time() - t0 < 5.0


def test_rotate_inherited_from_pages_node():
    """/Rotate on the /Pages tree node (standard scanner output) must
    apply to leaf pages that lack their own /Rotate."""
    content = (b"BT /F1 12 Tf 0 1 -1 0 100 72 Tm (tree rotated) Tj "
               b"0 1 -1 0 114 72 Tm (second line) Tj ET")
    pdf = _minimal_pdf(content)
    rotated = pdf.replace(b"/Kids [3 0 R] /Count 1", b"/Kids [3 0 R] /Count 1 /Rotate 90")
    assert pdf_to_text(rotated) == "tree rotated\nsecond line"


def test_short_decodeparms_array_does_not_skip_filters():
    """/Filter [AHx Fl] with a one-element /DecodeParms array: zip
    truncation must not silently skip the Flate stage."""
    content = b"BT /F1 12 Tf 72 700 Td (both filters) Tj ET"
    payload = zlib.compress(content).hex().encode() + b">"
    pdf = _minimal_pdf(b"")
    pdf = pdf.replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        (f"<< /Length {len(payload)} /Filter [/ASCIIHexDecode /FlateDecode] "
         f"/DecodeParms [null] >>\nstream\n").encode() + payload + b"\nendstream",
    )
    assert pdf_to_text(pdf) == "both filters"


def test_tiff_predictor_2_reversed():
    raw = b"BT /F1 12 Tf 72 700 Td (tiffpred) Tj ET"
    cols = 16
    # TIFF horizontal differencing per row (colors=1)
    enc = bytearray()
    for start in range(0, len(raw), cols):
        row = raw[start:start + cols]
        enc.append(row[0])
        for i in range(1, len(row)):
            enc.append((row[i] - row[i - 1]) & 0xFF)
    payload = zlib.compress(bytes(enc))
    pdf = _minimal_pdf(b"")
    pdf = pdf.replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        (f"<< /Length {len(payload)} /Filter /FlateDecode "
         f"/DecodeParms << /Predictor 2 /Columns {cols} >> >>\nstream\n").encode()
        + payload + b"\nendstream",
    )
    assert pdf_to_text(pdf) == "tiffpred"


def test_encrypted_pdf_degrades_to_empty_not_garbage():
    """/Encrypt PDFs (RC4/AES streams) are not decryptable here by design;
    the pin: they must yield empty/garbage-free text without raising."""
    content = bytes(b ^ 0xA7 for b in b"BT /F1 12 Tf 72 700 Td (secret) Tj ET")
    pdf = _minimal_pdf(content)  # stream bytes are 'encrypted' garbage
    pdf = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt << /Filter /Standard /V 2 >>")
    out = pdf_to_text(pdf)
    assert isinstance(out, str)
    assert "secret" not in out
