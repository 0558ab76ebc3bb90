"""Turndown-7.2.2 semantics for constructs not covered by the reference's
own literals — golden expectations derived from the public turndown
package's default rules (commonmark-rules.js)."""

from extractor_spark.engine.convert import html_to_markdown as md


def test_hr():
    assert md("<p>a</p><hr><p>b</p>") == "a\n\n* * *\n\nb"


def test_atx_headings_h3_plus():
    assert md("<h3>three</h3>") == "### three"
    assert md("<h4>four</h4>") == "#### four"
    assert md("<h6>six</h6>") == "###### six"


def test_h2_setext():
    assert md("<h2>sub</h2>") == "sub\n---"


def test_ordered_list_with_start():
    assert md("<ol start='5'><li>a</li><li>b</li></ol>") == "5.  a\n6.  b"


def test_unordered_list_marker_and_indent():
    assert md("<ul><li>one</li><li>two</li></ul>") == "*   one\n*   two"


def test_nested_list_indentation():
    out = md("<ul><li>a<ul><li>b</li></ul></li></ul>")
    assert out == "*   a\n    *   b"


def test_blockquote_nested():
    assert md("<blockquote>x</blockquote>") == "> x"
    assert md("<blockquote><blockquote>y</blockquote></blockquote>") == "> > y"
    assert md("<blockquote><p>p1</p><p>p2</p></blockquote>") == "> p1\n> \n> p2"


def test_inline_code_backticks():
    assert md("<p>use <code>a`b</code></p>") == "use ``a`b``"
    assert md("<p><code>`lead</code></p>") == "`` `lead ``"


def test_pre_code_block_indented():
    assert md("<pre><code>line1\nline2</code></pre>") == "line1\n    line2"


def test_br_two_space_break():
    assert md("<p>l1<br>l2</p>") == "l1  \nl2"


def test_em_strong():
    assert md("<p><em>e</em> and <strong>s</strong></p>") == "_e_ and **s**"
    assert md("<p><em>  </em>x</p>") == "x"


def test_empty_block_elements():
    assert md("<p></p><div></div>") == ""


def test_table_default_rule():
    # turndown has no table rules by default: cells flow as blocks
    out = md("<table><tr><td>a</td><td>b</td></tr></table>")
    assert out == "a\n\nb"


def test_keep_footer_form_content():
    # tidy deliberately keeps footer/form/button/select/option/label
    out = md("<footer>foot</footer><form><button>Buy</button>"
             "<select><option>A</option></select><label>L</label></form>")
    for frag in ("foot", "Buy", "A", "L"):
        assert frag in out


def test_js_ws_chars_expansion_matches_regex_class():
    """_JS_WS_CHARS (the str.strip expansion used for the final output trim)
    must stay in lockstep with the _JS_WS regex class it replaces — a char
    added to one but not the other silently changes golden-locked output
    for documents ending in that character."""
    import re

    from extractor_spark.engine.turndown_md import _JS_WS_CHARS, _TRAIL_WS_RE

    from_class = {
        chr(c) for c in range(0x11000) if _TRAIL_WS_RE.fullmatch(chr(c))
    }
    assert from_class == set(_JS_WS_CHARS)


def test_index_stack_collapse_matches_pointer_walk():
    """The shipped collapse_whitespace is the index-stack rewrite of
    turndown's pointer walk (kept as _wc_next/_wc_remove for
    documentation). Reconstruct the original walk here and require
    identical trees on randomized DOMs — entry+ascent double-processing,
    removal, <pre> skipping and the trailing-text trim all included."""
    import random

    from extractor_spark.engine.dom import parse_document, serialize_inner
    from extractor_spark.engine.turndown_md import (
        _COLLAPSE_RE,
        _wc_next,
        _wc_remove,
        BLOCK_ELEMENTS,
        VOID_ELEMENTS,
        collapse_whitespace,
    )
    from extractor_spark.engine.dom import ELEMENT_NODE, TEXT_NODE

    def reference_collapse(element):
        if not element.children or element.tag == "pre":
            return
        prev_text = None
        keep_leading_ws = False
        prev = None
        node = _wc_next(None, element)
        while node is not element and node is not None:
            ntype = node.node_type
            if ntype == TEXT_NODE:
                data = node.data
                if "\n" in data or "  " in data or "\t" in data or "\r" in data:
                    text = _COLLAPSE_RE.sub(" ", data)
                else:
                    text = data
                if (
                    (prev_text is None or prev_text.data.endswith(" "))
                    and not keep_leading_ws
                    and text[:1] == " "
                ):
                    text = text[1:]
                if not text:
                    node = _wc_remove(node)
                    continue
                node.data = text
                prev_text = node
            elif ntype == ELEMENT_NODE:
                if node.tag in BLOCK_ELEMENTS or node.tag == "br":
                    if prev_text is not None and prev_text.data.endswith(" "):
                        prev_text.data = prev_text.data[:-1]
                    prev_text = None
                    keep_leading_ws = False
                elif node.tag in VOID_ELEMENTS or node.tag == "pre":
                    prev_text = None
                    keep_leading_ws = True
                elif prev_text is not None:
                    keep_leading_ws = False
            else:
                node = _wc_remove(node)
                continue
            nxt = _wc_next(prev, node)
            prev = node
            node = nxt
        if prev_text is not None:
            if prev_text.data.endswith(" "):
                prev_text.data = prev_text.data[:-1]
            if not prev_text.data:
                _wc_remove(prev_text)

    rng = random.Random(4242)
    pieces = [
        "<div>", "</div>", "<p>", "</p>", "<em>", "</em>", "<pre>", "</pre>",
        "<br>", "<img>", "<!--c-->", "  ", "\n", "\t", "a b", "x", " y ",
        "<span>", "</span>", "<ul><li>", "</li></ul>", "&amp;",
    ]
    for _ in range(1500):
        html = "".join(rng.choice(pieces) for _ in range(rng.randrange(0, 18)))
        a = parse_document(html).html
        b = parse_document(html).html
        collapse_whitespace(a)
        reference_collapse(b)
        assert serialize_inner(a) == serialize_inner(b), repr(html)
