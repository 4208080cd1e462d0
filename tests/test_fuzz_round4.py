"""Property-based robustness for the round-4 continuation surfaces:
the converters must never raise on arbitrary input (a crawler sees
everything), and the RDF-star canonical form must round-trip through
its own serializer."""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

_text = st.text(max_size=400)
_binaryish = st.one_of(st.none(), _text, st.binary(max_size=400))


class TestNeverRaises:
    @settings(max_examples=200, deadline=None)
    @given(_binaryish)
    def test_md_from_html_total(self, s):
        from kgforge.operators.markdown import md_from_html

        out = md_from_html(s)
        assert isinstance(out, str)
        # whitespace policy: no trailing/leading blank, no 3+ newline runs
        assert out == out.strip()
        assert "\n\n\n" not in out

    @settings(max_examples=200, deadline=None)
    @given(st.one_of(st.none(), _text))
    def test_fix_mojibake_total_and_idempotent_on_clean(self, s):
        from kgforge.operators.cleaning import _fix_mojibake_one

        out = _fix_mojibake_one(s)
        assert out is None or isinstance(out, str)
        # ASCII text is always untouched
        if s is not None and s.isascii():
            assert out == s

    @settings(max_examples=150, deadline=None)
    @given(_text)
    def test_turtle_parser_raises_only_parse_error(self, s):
        from kgforge.rdf.turtle import TurtleParseError, parse_turtle

        try:
            parse_turtle(s)
        except TurtleParseError:
            pass  # structured failure is the contract; anything else fails


class TestRdfStarRoundTrip:
    @settings(max_examples=100, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF
            ),
            min_size=1,
            max_size=20,
        ),
        st.integers(min_value=0, max_value=10_000),
    )
    def test_quoted_triple_canonical_form_reparses(self, label, n):
        """Serializing a parsed quoted triple and feeding it back as the
        subject of a new statement yields the identical canonical form."""
        from kgforge.rdf.turtle import parse_turtle

        s = f"urn:s:{label}"
        ttl = f"<< <{s}> <urn:p:x> {n} >> <urn:conf> \"y\" ."
        triples, _ = parse_turtle(ttl)
        qt = triples[0][0][0]
        ttl2 = f"{qt} <urn:conf> \"y\" ."
        triples2, _ = parse_turtle(ttl2)
        assert triples2[0][0][0] == qt
