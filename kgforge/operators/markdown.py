"""HTML → Markdown conversion: structure-preserving text extraction.

Plain ``extract_text`` flattens a page to prose; LLM-pretraining corpora
increasingly keep the DOCUMENT STRUCTURE — headings, lists, links,
emphasis — as Markdown, which tokenizes compactly and preserves the
semantics boilerplate-stripping would otherwise erase. ``md_from_html``
is the deterministic stdlib-only converter (same purity contract as
``kgforge.html.extract_text``: same bytes in, same string out, forever);
``pages_to_markdown`` lifts it over the corpus as ONE Arrow-batched
mapInPandas pass — per-page work, embarrassingly parallel, no shuffle.

Conversion rules (applied in this order, regex-driven like the reference
text path — reference parity note: parser-shacl has no text layer at all;
this generalizes its raw-content passthrough, `src/ShaclParser.php:65-74`
``rawContent``, into a structured corpus surface):

1. comments and boilerplate subtrees dropped (shared ``kgforge.html``
   tag inventory: script/style/nav/header/footer/...),
2. inline first — ``<a href=X>text</a>`` → ``[text](X)``,
   ``<strong>/<b>`` → ``**text**``, ``<em>/<i>`` → ``*text*`` — so they
   survive inside the block conversions below,
3. ``<h1..h6>`` → ``#``-prefixed heading lines,
4. ``<li>`` → ``- `` bullet lines (flat; nesting depth not tracked),
6. remaining block tags → paragraph breaks, inline tags stripped,
7. entities unescaped, horizontal whitespace collapsed, ≥2 blank lines
   collapsed to one blank line, output stripped.
"""

from __future__ import annotations

import re
from html import unescape as html_unescape

import pandas as pd
from pyspark.sql import DataFrame

from kgforge.html import _COMMENT_RE, _DROP_BLOCKS, _DROP_RE

_HEADING_RE = re.compile(
    r"<h([1-6])\b[^>]*>(.*?)</h\1\s*>", re.S | re.I
)
_LI_RE = re.compile(r"<li\b[^>]*>(.*?)</li\s*>", re.S | re.I)
_A_RE = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a\s*>""", re.S | re.I
)
_BOLD_RE = re.compile(r"<(strong|b)\b[^>]*>(.*?)</\1\s*>", re.S | re.I)
_EM_RE = re.compile(r"<(em|i)\b[^>]*>(.*?)</\1\s*>", re.S | re.I)
_BLOCK_RE = re.compile(
    r"</?(?:p|div|br|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|thead|tbody|td|th|section|"
    r"article|main|blockquote|pre|figure|figcaption|form|fieldset|hr|address|"
    r"dl|dt|dd)\b[^>]*>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")
_LINE_EDGE_RE = re.compile(r" ?\n ?")
_MULTI_NL_RE = re.compile(r"\n{3,}")

_INLINE_TAG_RE = re.compile(r"<[^>]+>")
_INLINE_WS_RE = re.compile(r"\s+")


def _inline(s: str) -> str:
    """Flatten an inline fragment: strip tags, collapse whitespace."""
    return _INLINE_WS_RE.sub(" ", _INLINE_TAG_RE.sub("", s)).strip()


def md_from_html(html: bytes | str | None) -> str:
    """Pure HTML→Markdown converter. Deterministic, stdlib-only."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", html)
    for tag in _DROP_BLOCKS:
        pat = _DROP_RE[tag]
        prev = None
        while prev != s:
            prev = s
            s = pat.sub("", s)
    # inline conversions FIRST so links/emphasis survive inside headings
    # and list items (those flatten their body via _inline afterwards)
    s = _A_RE.sub(lambda m: "[" + _inline(m.group(2)) + "](" + m.group(1) + ")", s)
    s = _BOLD_RE.sub(lambda m: "**" + _inline(m.group(2)) + "**", s)
    s = _EM_RE.sub(lambda m: "*" + _inline(m.group(2)) + "*", s)
    s = _HEADING_RE.sub(
        lambda m: "\n\n" + "#" * int(m.group(1)) + " " + _inline(m.group(2)) + "\n\n", s
    )
    s = _LI_RE.sub(lambda m: "\n- " + _inline(m.group(1)), s)
    s = _BLOCK_RE.sub("\n\n", s)
    s = _TAG_RE.sub("", s)
    s = html_unescape(s)
    s = _HSPACE_RE.sub(" ", s)
    s = _LINE_EDGE_RE.sub("\n", s)
    s = _MULTI_NL_RE.sub("\n\n", s)
    return s.strip()


def pages_to_markdown(
    pages: DataFrame, html_col: str = "html", out_col: str = "markdown"
) -> DataFrame:
    """pages(url, html, ...) -> (url, markdown): one Arrow-batched
    mapInPandas pass, per-page pure-Python work only (the conversion is
    regex CPU, no lookups) — scales linearly with executors, no shuffle.
    """

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    out_col: [md_from_html(h) for h in pdf[html_col]],
                }
            )

    return pages.select("url", html_col).mapInPandas(
        fn, schema=f"url string, {out_col} string"
    )
