"""Turtle/N-Triples/JSON-LD/RDFa parser unit tests."""

import glob

import pytest

from kgforge.rdf.detect import FormatDetectionError, ParseError, detect_format, parse_rdf
from kgforge.rdf.terms import RDF_FIRST, RDF_NIL, RDF_REST, XSD_BOOLEAN, XSD_INTEGER
from kgforge.rdf.turtle import parse_turtle

SH = "http://www.w3.org/ns/shacl#"
EX = "http://example.org/"


def test_basic_triple():
    triples, prefixes = parse_turtle("@prefix ex: <http://example.org/> .\nex:a ex:p ex:b .")
    assert triples == [((EX + "a", "iri", "", ""), (EX + "p", "iri", "", ""), (EX + "b", "iri", "", ""))]
    assert prefixes == {"ex": EX}


def test_a_keyword_and_semicolons():
    t, _ = parse_turtle(
        "@prefix ex: <http://example.org/> .\nex:a a ex:T ; ex:p ex:b , ex:c ."
    )
    assert len(t) == 3
    assert t[0][1][0].endswith("#type")
    assert {x[2][0] for x in t[1:]} == {EX + "b", EX + "c"}


def test_literals():
    t, _ = parse_turtle(
        '@prefix ex: <http://example.org/> .\n'
        '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n'
        'ex:a ex:s "plain" ; ex:l "hoi"@nl-BE ; ex:i 42 ; ex:d 3.14 ; ex:e 1.0e3 ; '
        'ex:b true ; ex:t "x"^^xsd:token .'
    )
    objs = {x[1][0].rsplit("/", 1)[-1]: x[2] for x in t}
    assert objs["s"] == ("plain", "literal", "", "")
    assert objs["l"] == ("hoi", "literal", "", "nl-be")
    assert objs["i"] == ("42", "literal", XSD_INTEGER, "")
    assert objs["b"] == ("true", "literal", XSD_BOOLEAN, "")
    assert objs["t"][2].endswith("#token")


def test_long_strings_and_escapes():
    t, _ = parse_turtle(
        '@prefix ex: <http://example.org/> .\n'
        'ex:a ex:p """multi\nline "quoted" text""" ; ex:q "tab\\tnl\\n\\u00e9" .'
    )
    vals = [x[2][0] for x in t]
    assert 'multi\nline "quoted" text' in vals
    assert "tab\tnl\né" in vals


def test_blank_node_property_list_and_collection():
    t, _ = parse_turtle(
        "@prefix ex: <http://example.org/> .\nex:a ex:p [ ex:q ex:b ] ; ex:list (ex:x ex:y) ."
    )
    bnode_subjects = [x for x in t if x[0][1] == "bnode"]
    assert bnode_subjects
    firsts = [x for x in t if x[1][0] == RDF_FIRST]
    rests = [x for x in t if x[1][0] == RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    assert rests[-1][2][0] == RDF_NIL


def test_empty_collection_is_nil():
    t, _ = parse_turtle("@prefix ex: <http://example.org/> .\nex:a ex:p () .")
    assert t[0][2] == (RDF_NIL, "iri", "", "")


def test_base_resolution():
    t, _ = parse_turtle("@base <http://ex.org/dir/> .\n<a> <b> <../c> .")
    assert t[0][0][0] == "http://ex.org/dir/a"
    assert t[0][2][0] == "http://ex.org/c"


def test_case_insensitive_prefix_directive():
    t, p = parse_turtle("@PREFIX ex: <http://example.org/> .\nex:a ex:p ex:b .")
    assert p["ex"] == EX
    t, p = parse_turtle("PREFIX ex: <http://example.org/>\nex:a ex:p ex:b .")
    assert p["ex"] == EX


def test_all_reference_fixtures_parse():
    files = sorted(glob.glob("/root/reference/tests/Fixtures/**/*.ttl", recursive=True))
    assert len(files) >= 39
    for f in files:
        with open(f) as fh:
            triples, _ = parse_turtle(fh.read())
        assert triples, f


def test_format_detection():
    assert detect_format("@prefix ex: <http://e/> .") == "turtle"
    assert detect_format("PREFIX ex: <http://e/>\nex:a ex:b ex:c .") == "turtle"
    assert detect_format('<?xml version="1.0"?><rdf:RDF xmlns:rdf="x"/>') == "rdf/xml"
    assert detect_format('{"@context": {}, "@id": "x"}') == "json-ld"
    assert detect_format("<http://a> <http://b> <http://c> .") == "ntriples"
    with pytest.raises(ParseError):
        detect_format("   ")
    with pytest.raises(FormatDetectionError):
        detect_format("not valid content")


def test_parse_rdf_jsonld_nested_context():
    t, _, fmt = parse_rdf(
        '{"@context": {"ex": "http://example.org/", "sh": "http://www.w3.org/ns/shacl#"},'
        ' "@id": "ex:S", "@type": "sh:NodeShape", "sh:targetClass": {"@id": "ex:Person"}}'
    )
    assert fmt == "json-ld"
    assert ((EX + "S", "iri", "", ""), (SH + "targetClass", "iri", "", ""), (EX + "Person", "iri", "", "")) in t


def test_rdfa_basic():
    from kgforge.rdf.rdfa import parse_rdfa

    t, _ = parse_rdfa(
        '<div vocab="http://schema.org/" typeof="Person" about="http://e/alice">'
        '<span property="name">Alice</span></div>'
    )
    assert ("http://e/alice", "iri", "", "") in [x[0] for x in t]
    assert ("Alice", "literal", "", "") in [x[2] for x in t]
