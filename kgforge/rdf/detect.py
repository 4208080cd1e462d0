"""Format detection + dispatch — reference parity.

Detection rules characterized at
/root/reference/tests/Characterization/ShaclParserTest.php:197-290:

- turtle   : '@prefix' or SPARQL-style 'PREFIX' (case-insensitive)
- rdf/xml  : '<rdf:RDF' element (with or without XML declaration)
- json-ld  : '{' + '@context'
- ntriples : every non-comment line matches '<s> <p> o .'
- empty / whitespace-only content -> ParseError ('empty'),
  unrecognizable -> FormatDetectionError
  (tests/Unit/ShaclParserTest.php:147-162). At corpus scale errors become
  per-row status columns, never exceptions that kill the job (SURVEY §2.1 S4).
"""

from __future__ import annotations

import re

from .jsonld import parse_jsonld
from .microdata import parse_microdata
from .ntriples import parse_ntriples
from .rdfa import parse_rdfa
from .trig import trig_default_graph
from .turtle import parse_turtle
from .xmlrdf import parse_rdfxml

FORMAT_TURTLE = "turtle"
FORMAT_RDFXML = "rdf/xml"
FORMAT_JSONLD = "json-ld"
FORMAT_NTRIPLES = "ntriples"
FORMAT_RDFA = "rdfa"
FORMAT_MICRODATA = "microdata"
FORMAT_TRIG = "trig"

_TURTLE_RE = re.compile(r"(?:^|\n)\s*(?:@prefix|@base|prefix\s+[\w-]*\s*:|base\s+<)", re.I)
_NT_LINE_RE = re.compile(r"^\s*(?:<[^>]*>|_:\S+)\s+<[^>]*>\s+.+\.\s*$")
# TriG = Turtle + graph blocks: a '{' outside string literals, comments,
# and IRIs (or a top-level GRAPH keyword) distinguishes the two. The mask
# removes every token that may legally CONTAIN '{' or a confusing quote:
# long strings first (so "" inside """...""" can't close early), then
# short strings (newline-bounded so a stray apostrophe's damage stops at
# end of line), IRIREFs (a '#'-carrying IRI must not start a comment),
# and '#' comments (an apostrophe in a comment — "TopBraid's" — must NOT
# open a single-quoted string; this exact case misclassified a reference
# fixture as TriG). re.sub scans left to right, so at each position the
# earliest alternative wins, which is precisely tokenizer behavior.
_STRING_MASK_RE = re.compile(
    r'"""(?:[^"\\]|\\.|"(?!""))*"""'
    r"|'''(?:[^'\\]|\\.|'(?!''))*'''"
    r'|"(?:[^"\\\n]|\\.)*"'
    r"|'(?:[^'\\\n]|\\.)*'"
    r"|<[^>\s]*>"
    r"|#[^\n]*"
)
_GRAPH_KW_RE = re.compile(r"(?:^|\n)\s*GRAPH\s*[<_a-zA-Z]", re.I)


def _has_graph_block(content: str) -> bool:
    return "{" in _STRING_MASK_RE.sub('""', content)


class ParseError(ValueError):
    """Empty / unparseable content (reference: ParseException)."""


class FormatDetectionError(ValueError):
    """No handler recognizes the content (reference: FormatDetectionException)."""


def detect_format(content: str) -> str:
    if content is None or content.strip() == "":
        raise ParseError("empty content")
    stripped = content.lstrip()
    if _TURTLE_RE.search(content):
        return FORMAT_TRIG if _has_graph_block(content) else FORMAT_TURTLE
    if "<rdf:RDF" in content or "<RDF" in content:
        return FORMAT_RDFXML
    if stripped.startswith(("{", "[")) and '"@context"' in content:
        return FORMAT_JSONLD
    if _GRAPH_KW_RE.search(content) and _has_graph_block(content):
        return FORMAT_TRIG
    lines = [ln for ln in content.split("\n") if ln.strip() and not ln.lstrip().startswith("#")]
    if lines and all(_NT_LINE_RE.match(ln) for ln in lines):
        return FORMAT_NTRIPLES
    # bare TriG graph block without directives: '<g> {' / '{' opener
    if stripped.startswith(("<", "{")) and _has_graph_block(content) and "." in content:
        return FORMAT_TRIG
    # bare turtle without directives (full-IRI statements)
    if stripped.startswith("<") and "." in content:
        return FORMAT_TURTLE
    raise FormatDetectionError("unrecognized RDF content")


_PARSERS = {
    FORMAT_TRIG: lambda c: trig_default_graph(c),
    FORMAT_TURTLE: parse_turtle,
    FORMAT_RDFXML: lambda c: parse_rdfxml(c),
    FORMAT_JSONLD: lambda c: parse_jsonld(c),
    FORMAT_NTRIPLES: lambda c: parse_ntriples(c),
    FORMAT_RDFA: lambda c: parse_rdfa(c),
    FORMAT_MICRODATA: lambda c: parse_microdata(c),
}


def parse_rdf(content: str, fmt: str | None = None) -> tuple[list[tuple], dict[str, str], str]:
    """content -> (triples, prefixes, format). Raises ParseError/FormatDetectionError."""
    if fmt is None:
        fmt = detect_format(content)
    parser = _PARSERS.get(fmt)
    if parser is None:
        raise FormatDetectionError(f"unsupported format {fmt!r}")
    try:
        triples, prefixes = parser(content)
    except (ParseError, FormatDetectionError):
        raise
    except Exception as e:  # parser-level failure -> ParseError
        raise ParseError(f"{fmt} parse failed: {e}") from e
    return triples, prefixes, fmt
