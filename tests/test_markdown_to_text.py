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
