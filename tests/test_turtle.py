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


# ---- N-Triples serializer (kgforge.rdf.serialize) ----

_RT_ROWS = [
    ("https://a.example/s", "https://a.example/p",
     ("https://a.example/o", "iri", "", "")),
    ("_:b0", "https://a.example/p", ("_:b1", "bnode", "", "")),
    ("https://a.example/s", "https://a.example/q",
     ('he said "hi" \\ twice\n\tdone\r', "literal", "", "")),
    ("https://a.example/s", "https://a.example/q",
     ("chat", "literal", "", "fr")),
    ("https://a.example/s", "https://a.example/q",
     ("chats", "literal", "", "fr-ca")),
    ("https://a.example/s", "https://a.example/q",
     ("42", "literal", "http://www.w3.org/2001/XMLSchema#integer", "")),
    # xsd:string is the implicit default — must serialize as a plain literal
    ("https://a.example/s", "https://a.example/q",
     ("plain", "literal", "http://www.w3.org/2001/XMLSchema#string", "")),
]


def _rt_df(spark):
    from pyspark.sql.types import StringType, StructField, StructType

    obj = StructType([StructField(f, StringType(), True)
                      for f in ("value", "kind", "datatype", "lang")])
    schema = StructType([
        StructField("subject", StringType(), False),
        StructField("predicate", StringType(), False),
        StructField("object", obj, False),
    ])
    return spark.createDataFrame(_RT_ROWS, schema)


def test_ntriples_serializer_roundtrip(spark):
    from kgforge.rdf.ntriples import parse_ntriples
    from kgforge.rdf.serialize import to_ntriples_lines

    lines = [r["line"] for r in to_ntriples_lines(_rt_df(spark)).collect()]
    parsed, _ = parse_ntriples("\n".join(lines))
    got = [(s[0], p[0], o) for s, p, o in parsed]
    want = [
        (s, p, (v, k, "" if d == "http://www.w3.org/2001/XMLSchema#string" else d, l))
        for s, p, (v, k, d, l) in _RT_ROWS
    ]
    assert sorted(got) == sorted(want)
    # spot-check the escaping arm byte-for-byte
    esc = next(l for l in lines if "he said" in l)
    assert '"he said \\"hi\\" \\\\ twice\\n\\tdone\\r"' in esc


def test_write_ntriples_sink(spark, tmp_path):
    import glob as _glob

    from kgforge.rdf.ntriples import parse_ntriples
    from kgforge.rdf.serialize import write_ntriples

    out = str(tmp_path / "graph.nt")
    write_ntriples(_rt_df(spark), out, partitions=3)
    text = "\n".join(
        open(f).read().rstrip("\n") for f in sorted(_glob.glob(f"{out}/part-*"))
        if open(f).read().strip()
    )
    parsed, _ = parse_ntriples(text)
    assert len(parsed) == len(_RT_ROWS)
