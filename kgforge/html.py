"""Deterministic HTML processing: boilerplate-stripping text extraction and
embedded-RDF payload discovery.

``extract_text`` is THE reference text extractor for this engine — the
per-url byte-identical invariant (BASELINE.json input_hint) is defined
against this exact function, so it must stay pure, dependency-free, and
version-stable: same bytes in, same string out, forever. Do not "improve"
its whitespace behavior without migrating the golden corpus.

``find_rdf_payloads`` locates the machine-readable blocks a Common-Crawl-style
page can embed: <script type="text/turtle">, <script type="application/
ld+json">, and RDFa attribute markup in the page body.
"""

from __future__ import annotations

import re
from html import unescape as html_unescape

# tags whose entire subtree is boilerplate / non-content
_DROP_BLOCKS = ("script", "style", "noscript", "template", "nav", "header", "footer", "aside")
# tags that imply a line break when stripped
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|thead|tbody|td|th|section|article|"
    "main|blockquote|pre|figure|figcaption|form|fieldset|hr|address|dl|dt|dd"
)

_DROP_RE = {
    tag: re.compile(rf"<{tag}\b[^>]*>.*?</{tag}\s*>", re.S | re.I) for tag in _DROP_BLOCKS
}
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_RE = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_SPACES_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r" ?\n ?")
_MULTI_NL_RE = re.compile(r"\n{2,}")


def extract_text(html: bytes | str | None) -> str:
    """Boilerplate-stripped page text. Pure, deterministic, stdlib-only."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", html)
    # drop boilerplate subtrees to a fixpoint (handles sequential blocks;
    # same-tag nesting is invalid HTML for these elements)
    for tag in _DROP_BLOCKS:
        pat = _DROP_RE[tag]
        prev = None
        while prev != s:
            prev = s
            s = pat.sub("", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = html_unescape(s)
    s = _SPACES_RE.sub(" ", s)
    s = _NL_RE.sub("\n", s)
    s = _MULTI_NL_RE.sub("\n", s)
    return s.strip()


_SCRIPT_PAYLOAD_RE = re.compile(
    r"<script\b[^>]*\btype\s*=\s*[\"'](?P<type>text/turtle|application/ld\+json|"
    r"application/n-triples)[\"'][^>]*>(?P<body>.*?)</script\s*>",
    re.S | re.I,
)
_RDFA_HINT_RE = re.compile(r"\b(?:typeof|property|vocab)\s*=", re.I)
_MICRODATA_HINT_RE = re.compile(r"\bitemscope\b", re.I)

_TYPE_TO_FMT = {
    "text/turtle": "turtle",
    "application/ld+json": "json-ld",
    "application/n-triples": "ntriples",
}


def find_rdf_payloads(html: bytes | str | None) -> list[tuple[str, str]]:
    """-> list of (format, content). RDFa returns the whole page as payload."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    out: list[tuple[str, str]] = []
    for m in _SCRIPT_PAYLOAD_RE.finditer(html):
        out.append((_TYPE_TO_FMT[m.group("type").lower()], m.group("body").strip()))
    stripped = _SCRIPT_PAYLOAD_RE.sub("", html)
    if _RDFA_HINT_RE.search(stripped):
        out.append(("rdfa", html))
    if _MICRODATA_HINT_RE.search(stripped):
        out.append(("microdata", html))
    return out
