"""markdown_to_text strips syntax positionally (ADVICE r1: the old
character-class translate corrupted in-word punctuation)."""

from extractor_spark.engine.convert import html_to_markdown
from extractor_spark.spark.stages import markdown_to_text


def _roundtrip(html):
    return markdown_to_text(html_to_markdown(html, None, "https://ex.com/"))


def test_in_word_punctuation_survives():
    assert (
        _roundtrip("<p>a well-known snake_case thing = 5 - 3</p>")
        == "a well-known snake_case thing = 5 - 3"
    )


def test_syntax_stripped():
    assert (
        _roundtrip("<h1>Title</h1><p><a href='https://x.y/z'>a link</a> <em>em</em> <strong>b</strong></p>")
        == "Title a link em b"
    )
    assert _roundtrip("<h2>Sub</h2><ul><li>item-one</li><li>item_two</li></ul>") == "Sub item-one item_two"


def test_code_spans_keep_content():
    assert _roundtrip("<p>code <code>x_y*z</code></p>") == "code x_y*z"


def test_blockquote_and_escapes():
    assert _roundtrip("<blockquote><p>quoted *stars* <b>b</b></p></blockquote>") == "quoted *stars* b"


def test_unrolled_link_patterns_match_spec_alternation():
    """The shipped link/image regexes are the unrolled-loop form of the
    spec's per-char alternation (perf); pin exact language equality so a
    future pattern edit can't silently change what counts as a link."""
    import random
    import re

    from extractor_spark.spark.stages import _MD_IMAGE, _MD_LINK

    spec_image = re.compile(r"!\[((?:\\.|[^\]\\])*)\]\((?:\\.|[^)\\])*\)")
    spec_link = re.compile(r"(?<!!)\[((?:\\.|[^\]\\])*)\]\((?:\\.|[^)\\])*\)")

    rng = random.Random(20260817)
    pool = list("ab\\*_`[]()! \n=-.#>")
    for _ in range(6000):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 30)))
        assert _MD_IMAGE.sub(r"\1", s) == spec_image.sub(r"\1", s), repr(s)
        assert _MD_LINK.sub(r"\1", s) == spec_link.sub(r"\1", s), repr(s)


def test_precheck_guards_do_not_change_output():
    """Docs with no links/backticks/escapes take the guarded fast exits;
    equality with the unguarded sequence is what the guards must preserve."""
    cases = [
        "plain paragraph text with no markdown syntax at all",
        "Title\n=====\n\npara one\n\npara two",
        "a [link](https://x.y/z) and ![img](u) and `code` and esc\\_ape",
        "",
        "===\n---\n* * *\n",
    ]
    import re

    for s in cases:
        from extractor_spark.spark.stages import (
            _MD_CODE_PROTECT,
            _MD_CODE_SPAN,
            _MD_IMAGE,
            _MD_LINE_PREFIX,
            _MD_LINK,
            _MD_MARKERS,
            _MD_SETEXT_OR_HR,
            _MD_UNESCAPE,
        )
        ref = _MD_SETEXT_OR_HR.sub("", s)
        ref = _MD_IMAGE.sub(r"\1", ref)
        ref = _MD_LINK.sub(r"\1", ref)
        ref = _MD_LINE_PREFIX.sub("", ref)
        ref = _MD_CODE_SPAN.sub(
            lambda m: _MD_CODE_PROTECT.sub(r"\\\1", m.group(1)), ref
        )
        ref = _MD_MARKERS.sub("", ref)
        ref = _MD_UNESCAPE.sub(r"\1", ref)
        ref = " ".join(ref.split())

        from extractor_spark.spark.stages import markdown_to_text

        assert markdown_to_text(s) == ref, repr(s)
