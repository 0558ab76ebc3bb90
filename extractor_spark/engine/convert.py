"""HTML→markdown conversion driver (reference operator C1,
/root/reference/src/converters.ts:75-236)."""

from __future__ import annotations

from dataclasses import dataclass

from extractor_spark.engine.main_extract import extract_main_html
from extractor_spark.engine.tidy import tidy_html
from extractor_spark.engine.turndown_md import TurndownConverter, js_trim


@dataclass(frozen=True)
class HtmlExtractionOptions:
    """Mirrors the reference's HTMLExtractionOptions
    (/root/reference/src/types.ts:16-44); all default False."""

    extract_main_html: bool = False
    include_images: bool = False
    clean_urls: bool = False


def html_to_markdown(
    html: str,
    options: HtmlExtractionOptions | None = None,
    source_url: str | None = None,
) -> str:
    """Tidy → turndown-convert → optional main-content heuristic.

    Byte-compatible with the reference's ``htmlToMarkdown``
    (converters.ts:75-236) including the 20%/500-char main-vs-full decision.
    """
    opts = options or HtmlExtractionOptions()
    tidied = tidy_html(html, opts.include_images)
    converter = TurndownConverter(
        include_images=opts.include_images,
        clean_urls=opts.clean_urls,
        source_url=source_url,
    )
    full_markdown = js_trim(converter.turndown(tidied))
    if not opts.extract_main_html:
        return full_markdown

    main_html = extract_main_html(tidied)
    main_markdown = js_trim(converter.turndown(main_html))
    # Heuristic (converters.ts:224-232): fall back to the full conversion when
    # the main extraction is empty, or both <20% of full and <500 chars.
    if len(main_markdown) == 0 or (
        len(main_markdown) < len(full_markdown) * 0.2 and len(main_markdown) < 500
    ):
        return full_markdown
    return main_markdown


def convert_html_to_markdown(
    html: str,
    options: HtmlExtractionOptions | None = None,
    source_url: str | None = None,
) -> str:
    """Public standalone export (reference A2, /root/reference/src/index.ts:76-82)."""
    return html_to_markdown(html, options, source_url)
