"""Property-based robustness: the engine must never crash on garbage HTML
(a 10^12-page crawl contains every pathology), the fast path must stay
byte-equal to the two-pass plan, and the sanitizer's output must always
re-validate against its schema."""

import string

from hypothesis import given, settings, strategies as st

from extractor_spark.engine.convert import HtmlExtractionOptions as Opts, html_to_markdown
from extractor_spark.engine.jsonfix import json_repair
from extractor_spark.engine.sanitize import safe_sanitized_parser
from extractor_spark.engine.schema import UNDEFINED
from extractor_spark.engine.validate import SchemaValidationError, zod_parse

TAGS = [
    "div", "p", "span", "a", "img", "ul", "li", "ol", "table", "tr", "td",
    "h1", "h2", "h3", "pre", "code", "em", "strong", "br", "hr", "script",
    "style", "title", "blockquote", "svg", "figure", "picture", "source",
    "header", "footer", "nav", "aside", "form", "input", "textarea", "custom-x",
]

ATTRS = ["href", "src", "alt", "title", "class", "id", "aria-hidden", 'bro"ken', "start"]

_text = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n*_[]()#`\\<>&;\"'=-.~+áé中"
    , max_size=40,
)


@st.composite
def html_soup(draw, depth=0):
    n = draw(st.integers(0, 4 if depth < 3 else 1))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 5))
        if kind == 0 or depth >= 3:
            parts.append(draw(_text))
        elif kind == 1:
            tag = draw(st.sampled_from(TAGS))
            attrs = " ".join(
                f'{a}="{draw(_text)}"' for a in draw(st.lists(st.sampled_from(ATTRS), max_size=2))
            )
            inner = draw(html_soup(depth + 1))
            parts.append(f"<{tag} {attrs}>{inner}</{tag}>")
        elif kind == 2:
            parts.append(f"<{draw(st.sampled_from(TAGS))}>")  # unclosed
        elif kind == 3:
            parts.append(f"</{draw(st.sampled_from(TAGS))}>")  # stray close
        elif kind == 4:
            parts.append(draw(st.sampled_from(["<!-- c -->", "<![CDATA[x]]>", "<!DOCTYPE html>", "<?php x ?>", "&amp;", "&#x41;", "&bogus;", "<", ">", "<>", "< a >"])))
        else:
            parts.append(f"<p{draw(_text)}")  # broken tag soup
    return "".join(parts)


@settings(max_examples=200, deadline=None)
@given(html_soup(), st.booleans(), st.booleans())
def test_convert_never_crashes_and_paths_agree(html, include_images, main):
    opts = Opts(include_images=include_images, extract_main_html=main)
    slow = html_to_markdown(html, opts, "https://example.com/a/", fast_path=False)
    fast = html_to_markdown(html, opts, "https://example.com/a/", fast_path=True)
    assert isinstance(slow, str)
    assert fast == slow


# -- sanitizer property: output always re-validates -------------------------

_prims = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-10, 10**6),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)
_json_vals = st.recursive(
    _prims,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)

_schemas = st.recursive(
    st.sampled_from(
        [
            {"type": "string"},
            {"type": "string", "checks": [{"kind": "url"}]},
            {"type": "string", "checks": [{"kind": "email"}]},
            {"type": "number"},
            {"type": "number", "checks": [{"kind": "int"}, {"kind": "positive"}]},
            {"type": "boolean"},
            {"type": "enum", "values": ["a", "b"]},
            {"type": "record"},
            {"type": "any"},
        ]
    ),
    lambda children: st.one_of(
        st.builds(lambda c: {"type": "optional", "inner": c}, children),
        st.builds(lambda c: {"type": "nullable", "inner": c}, children),
        st.builds(lambda c: {"type": "array", "items": c}, children),
        st.builds(
            lambda props: {"type": "object", "properties": props},
            st.dictionaries(st.sampled_from(["x", "y", "z"]), children, max_size=3),
        ),
    ),
    max_leaves=8,
)


@settings(max_examples=300, deadline=None)
@given(_schemas, _json_vals)
def test_sanitizer_output_always_revalidates(schema, raw):
    result = safe_sanitized_parser(schema, raw)
    if result is None or result is UNDEFINED:
        return
    # whatever survives sanitization must parse cleanly
    zod_parse(schema, result)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_json_repair_never_hangs(text):
    import json

    try:
        repaired = json_repair(text)
    except ValueError:
        return
    except Exception as exc:  # only ValueError is part of the contract
        raise AssertionError(f"unexpected {type(exc).__name__}: {exc}")
    json.loads(repaired)


def test_pathological_nesting_and_width():
    """Crawl-robustness: deeply nested (9k levels) and very wide (20k
    sibling paragraphs) pages must convert, not RecursionError — the
    turndown walk recurses ~3 frames/level and the module raises the
    recursion limit at import (convert.py).  The Node reference handles
    comparable depth on its default stack."""
    from extractor_spark.engine.convert import convert_html_to_markdown

    deep = "<div>" * 9000 + "deep text" + "</div>" * 9000
    assert convert_html_to_markdown(deep) == "deep text"

    wide = "<p>" + "</p><p>".join(f"para {i}." for i in range(20000)) + "</p>"
    out = convert_html_to_markdown(wide)
    assert out.startswith("para 0.") and out.rstrip().endswith("para 19999.")
