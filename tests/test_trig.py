"""TriG parsing: graph blocks, detection, quad-scan routing."""

import pytest

from kgforge.rdf.detect import detect_format, parse_rdf
from kgforge.rdf.trig import parse_trig, trig_default_graph
from kgforge.rdf.turtle import TurtleParseError

DOC = """
@prefix ex: <http://e/> .
ex:s ex:p ex:o .
GRAPH ex:g1 { ex:s ex:p "lit"@en . ex:s2 a ex:T }
ex:g2 { [ ex:q 42 ] . }
{ ex:d ex:p ex:o2 }
"""


def test_parse_trig_graph_scoping():
    quads, pfx = parse_trig(DOC)
    assert pfx == {"ex": "http://e/"}
    graphs = [g for *_t, g in quads]
    assert graphs == ["", "http://e/g1", "http://e/g1", "http://e/g2", ""]
    # named-graph literal keeps its lang tag
    s, p, o, g = quads[1]
    assert o == ("lit", "literal", "", "en") and g == "http://e/g1"
    # bnode subject inside a block, typed integer object
    s, p, o, g = quads[3]
    assert s[1] == "bnode" and o[2].endswith("#integer")


def test_trig_bare_label_and_graph_keyword_equivalent():
    a, _ = parse_trig("@prefix ex: <http://e/> . GRAPH ex:g { ex:s ex:p ex:o . }")
    b, _ = parse_trig("@prefix ex: <http://e/> . ex:g { ex:s ex:p ex:o }")
    assert a == b


def test_trig_optional_final_dot_and_unterminated():
    quads, _ = parse_trig("<http://g> { <http://s> <http://p> <http://o> }")
    assert quads == [
        (
            ("http://s", "iri", "", ""),
            ("http://p", "iri", "", ""),
            ("http://o", "iri", "", ""),
            "http://g",
        )
    ]
    with pytest.raises(TurtleParseError):
        parse_trig("<http://g> { <http://s> <http://p> <http://o> ")


def test_trig_default_graph_merges():
    triples, _ = trig_default_graph(DOC)
    assert len(triples) == 5 and all(len(t) == 3 for t in triples)


def test_detect_format_trig_vs_turtle():
    assert detect_format(DOC) == "trig"
    assert detect_format("@prefix ex: <http://e/> . ex:s ex:p ex:o .") == "turtle"
    # '{' inside a literal is NOT a graph block
    assert (
        detect_format('@prefix ex: <http://e/> . ex:s ex:p "curly { brace" .')
        == "turtle"
    )
    # bare graph block without directives
    assert detect_format("<http://g> { <http://s> <http://p> <http://o> . }") == "trig"
    triples, _, fmt = parse_rdf(DOC)
    assert fmt == "trig" and len(triples) == 5


def test_parse_quad_docs_routes_trig(spark):
    from kgforge.operators.quads import parse_quad_docs

    nq = '<http://s> <http://p> <http://o> <http://gq> .'
    docs = spark.createDataFrame(
        [("u1", DOC), ("u2", nq), ("u3", "ex:broken {")],
        "url string, content string",
    )
    rows = parse_quad_docs(docs).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url["u1"]) == 5
    assert {r["graph"] for r in by_url["u1"]} == {"", "http://e/g1", "http://e/g2"}
    assert by_url["u2"][0]["graph"] == "http://gq"
    assert by_url["u3"][0]["status"] == "parse_error"
