"""Shape induction — hand-computable golden cases."""

from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _triples(spark, rows):
    """rows: (subject, predicate, value, kind)."""
    data = [
        (s, p, {"value": v, "kind": k, "datatype": "", "lang": ""})
        for (s, p, v, k) in rows
    ]
    return spark.createDataFrame(
        data,
        "subject string, predicate string, "
        "object struct<value:string,kind:string,datatype:string,lang:string>",
    ).select(
        F.lit("u://x").alias("url"), "subject", "predicate", "object",
        F.lit("ok").alias("status"),
    )


def test_induce_coverage_and_cardinality(spark):
    from kgforge.operators.induction import induce_shapes

    t = _triples(spark, [
        ("s1", RDF_TYPE, "C", "iri"),
        ("s2", RDF_TYPE, "C", "iri"),
        ("s3", RDF_TYPE, "C", "iri"),
        # p:a on all three members, s1 twice -> min 1 max 2, coverage 1.0
        ("s1", "p:a", "x", "literal"),
        ("s1", "p:a", "y", "literal"),
        ("s2", "p:a", "x", "literal"),
        ("s3", "p:a", "z", "literal"),
        # p:b on one member only -> min_count forced to 0, coverage 1/3
        ("s1", "p:b", "q", "iri"),
    ])
    got = {r["path"]: r for r in induce_shapes(t).collect()}
    a, b = got["p:a"], got["p:b"]
    assert (a["n_members"], a["n_subjects"]) == (3, 3)
    assert (a["min_count"], a["max_count"]) == (1, 2)
    assert abs(a["coverage"] - 1.0) < 1e-12
    assert a["node_kind"] == "literal"
    assert (b["n_subjects"], b["min_count"], b["max_count"]) == (1, 0, 1)
    assert abs(b["coverage"] - 1 / 3) < 1e-12
    assert b["node_kind"] == "iri"


def test_induce_in_candidates_and_cap(spark):
    from kgforge.operators.induction import induce_shapes

    rows = [("s%d" % i, RDF_TYPE, "C", "iri") for i in range(8)]
    # p:small takes 2 distinct values -> sh:in candidate, sorted
    rows += [("s%d" % i, "p:small", "vb" if i % 2 else "va", "literal")
             for i in range(8)]
    # p:big takes 8 distinct values -> above the cap, in_values NULL
    rows += [("s%d" % i, "p:big", "w%d" % i, "literal") for i in range(8)]
    got = {r["path"]: r for r in induce_shapes(_triples(spark, rows),
                                               max_in_values=5).collect()}
    assert got["p:small"]["in_values"] == "va,vb"
    assert got["p:small"]["n_distinct_values"] == 2
    assert got["p:big"]["in_values"] is None
    assert got["p:big"]["n_distinct_values"] == 8


def test_induce_mixed_kind_multiclass_and_min_members(spark):
    from kgforge.operators.induction import induce_shapes

    t = _triples(spark, [
        ("s1", RDF_TYPE, "C", "iri"),
        ("s1", RDF_TYPE, "D", "iri"),  # multi-typed: contributes to both
        ("s2", RDF_TYPE, "C", "iri"),
        ("s1", "p:m", "urn:x", "iri"),
        ("s2", "p:m", "plain", "literal"),
    ])
    got = {(r["target_class"], r["path"]): r for r in induce_shapes(t).collect()}
    assert got[("C", "p:m")]["node_kind"] == "mixed"
    assert got[("D", "p:m")]["node_kind"] == "iri"  # only s1's assertion
    assert got[("D", "p:m")]["n_members"] == 1
    # min_members drops the singleton class D entirely
    only_c = induce_shapes(t, min_members=2).select("target_class").distinct()
    assert [r["target_class"] for r in only_c.collect()] == ["C"]


def _page(spark, ttl, url="https://ex.example.org/ind"):
    import datetime as dt
    from kgforge.html import extract_text
    from kgforge.schema import PAGES_SCHEMA

    html = (
        "<html><head><title>t</title></head><body>"
        f'<script type="text/turtle">\n{ttl}\n</script>'
        "</body></html>"
    ).encode()
    rows = [(url, dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc),
             html, extract_text(html.decode()), "en")]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


DATA_TTL = """\
@prefix ex: <http://example.org/> .
ex:alice a ex:Person ;
    ex:status "active" ;
    ex:knows ex:bob .
ex:bob a ex:Person ;
    ex:status "inactive" ;
    ex:knows ex:alice .
"""

DRIFT_TTL = """\
@prefix ex: <http://example.org/> .
ex:carol a ex:Person ;
    ex:status "weird" ;
    ex:knows ex:alice .
"""


def test_induced_shapes_round_trip_through_validator(spark):
    """The closed loop: induce a shape from the corpus, serialize it as
    SHACL Turtle, re-ingest it through the engine's OWN parser/extractor,
    and validate — the corpus must satisfy its own induced shape, and a
    drifted batch (a status outside the induced sh:in vocabulary) must be
    rejected by exactly that constraint."""
    from kgforge.operators.induction import induce_shapes, induced_to_ttl
    from kgforge.operators.parse import extract_shapes_df, parse_pages
    from kgforge.operators.validate import split_validated, validate_triples

    data = parse_pages(_page(spark, DATA_TTL))
    induced = induce_shapes(data).collect()
    ttl = induced_to_ttl(induced)
    assert "sh:targetClass <http://example.org/Person>" in ttl
    assert 'sh:in ( "active" "inactive" )' in ttl

    shapes = extract_shapes_df(_page(spark, ttl, url="https://ex.example.org/shapes"))
    assert shapes.count() == 1

    validated = validate_triples(data, shapes, same_url_scope=False)
    _acc, rejected = split_validated(validated)
    assert rejected.count() == 0

    drift = parse_pages(_page(spark, DRIFT_TTL, url="https://ex.example.org/drift"))
    _acc2, rej2 = split_validated(
        validate_triples(drift, shapes, same_url_scope=False)
    )
    bad = {(r["subject"], r["predicate"]) for r in rej2.collect()}
    assert ("http://example.org/carol", "http://example.org/status") in bad
