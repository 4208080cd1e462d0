"""Property-based round-trip tests (hypothesis): arbitrary triples serialized
to N-Triples / Turtle must parse back identical through the pure-Python
parser stack that feeds the Spark scan operator."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.rdf.detect import parse_rdf
from kgforge.rdf.ntriples import parse_ntriples

# lexical spaces kept printable-ASCII-ish plus a few unicode letters; the
# escaping rules under test are quotes/backslashes/newlines/tabs
_lex = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), whitelist_characters='"\\\n\t.:<>@^'
    ),
    max_size=40,
)
_iri_path = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="/._-"),
    min_size=1,
    max_size=30,
)
_lang = st.sampled_from(["", "en", "de", "fr-be", "en-us"])


def _esc(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )


@st.composite
def triple(draw):
    s = "http://example.org/" + draw(_iri_path)
    p = "http://example.org/p/" + draw(_iri_path)
    kind = draw(st.sampled_from(["iri", "literal", "lang", "typed"]))
    if kind == "iri":
        o = ("http://example.org/o/" + draw(_iri_path), "iri", "", "")
        o_nt = f"<{o[0]}>"
    elif kind == "literal":
        lex = draw(_lex)
        o = (lex, "literal", "", "")
        o_nt = f'"{_esc(lex)}"'
    elif kind == "lang":
        lex = draw(_lex)
        lang = draw(st.sampled_from(["en", "de", "fr-be"]))
        o = (lex, "literal", "", lang)
        o_nt = f'"{_esc(lex)}"@{lang}'
    else:
        lex = draw(_lex)
        dt = "http://www.w3.org/2001/XMLSchema#" + draw(st.sampled_from(["integer", "string", "date"]))
        o = (lex, "literal", dt, "")
        o_nt = f'"{_esc(lex)}"^^<{dt}>'
    nt_line = f"<{s}> <{p}> {o_nt} ."
    return ((s, "iri", "", ""), (p, "iri", "", ""), o), nt_line


@settings(max_examples=200, deadline=None)
@given(st.lists(triple(), min_size=1, max_size=12))
def test_ntriples_roundtrip(items):
    expected = [t for t, _line in items]
    doc = "\n".join(line for _t, line in items)
    got, _prefixes = parse_ntriples(doc)
    assert got == expected


@settings(max_examples=100, deadline=None)
@given(st.lists(triple(), min_size=1, max_size=8))
def test_turtle_parse_of_ntriples_doc(items):
    """Every N-Triples doc is valid Turtle; the auto-detected parse must
    produce the same triples."""
    expected = [t for t, _line in items]
    doc = "\n".join(line for _t, line in items)
    got, _prefixes, fmt = parse_rdf(doc, "turtle")
    assert got == expected
