"""Execution of sh:qualifiedValueShape + qualifiedMin/MaxCount (W3C §4.5.3)
for class-constrained value shapes — the reference extracts these as opaque
metadata (qualifiedValueShape-001.ttl); the engine also executes them."""

from __future__ import annotations

import datetime as dt

from kgforge.html import extract_text
from kgforge.operators.parse import extract_shapes_df, parse_pages, qualified_rules_df
from kgforge.operators.validate import qualified_cardinality_violations
from kgforge.schema import PAGES_SCHEMA

TTL = """\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .

ex:QualifiedShape
    a sh:NodeShape ;
    sh:targetClass ex:Person ;
    sh:property [
        sh:path ex:address ;
        sh:qualifiedValueShape [ sh:class ex:HomeAddress ] ;
        sh:qualifiedMinCount 1 ;
        sh:qualifiedMaxCount 2 ;
    ] .

ex:a1 a ex:HomeAddress .
ex:a2 a ex:HomeAddress .
ex:a3 a ex:HomeAddress .
ex:w1 a ex:WorkAddress .

ex:ok a ex:Person ; ex:address ex:a1 , ex:w1 .
ex:none a ex:Person ; ex:address ex:w1 .
ex:toomany a ex:Person ; ex:address ex:a1 , ex:a2 , ex:a3 .
"""


def test_qualified_cardinality(spark):
    html = (
        "<html><head><title>t</title></head><body>"
        f'<script type="text/turtle">\n{TTL}\n</script>'
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://ex.example.org/qual", dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc),
          html, extract_text(html.decode()), "en")],
        PAGES_SCHEMA,
    )
    triples = parse_pages(pages)
    qrules = qualified_rules_df(pages)
    assert qrules.count() == 1
    r = qrules.collect()[0]
    assert r["q_class"] == "http://example.org/HomeAddress"
    assert (r["q_min"], r["q_max"]) == (1, 2)

    viol = qualified_cardinality_violations(triples, qrules)
    got = {r["subject"].rsplit("/", 1)[-1]: (r["violations"][0], r["n_conforming"]) for r in viol.collect()}
    assert got == {
        "none": ("qualifiedMinCount", 0),
        "toomany": ("qualifiedMaxCount", 3),
    }


DISJOINT_TTL = """\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .

ex:ParentShape a sh:NodeShape ;
    sh:targetClass ex:Child ;
    sh:property [
        sh:path ex:parent ;
        sh:qualifiedValueShape [ sh:class ex:Female ] ;
        sh:qualifiedMinCount 1 ;
        sh:qualifiedValueShapesDisjoint true ;
    ] ;
    sh:property [
        sh:path ex:parent ;
        sh:qualifiedValueShape [ sh:class ex:Male ] ;
        sh:qualifiedMinCount 1 ;
        sh:qualifiedValueShapesDisjoint true ;
    ] .

ex:mom a ex:Female .
ex:dad a ex:Male .
ex:both a ex:Female , ex:Male .

ex:okkid a ex:Child ; ex:parent ex:mom , ex:dad .
ex:ambig a ex:Child ; ex:parent ex:both , ex:dad .
"""


def test_qualified_disjoint(spark):
    """sh:qualifiedValueShapesDisjoint (VERDICT r2 item 9): a value
    conforming to a SIBLING qualified shape must not count. ex:both is
    typed Female AND Male, so under disjointness it counts for neither
    rule — ex:ambig then misses its Female parent (qualifiedMinCount),
    while ex:okkid (disjoint parents) conforms to both rules."""
    import datetime as dt

    html = (
        "<html><head><title>t</title></head><body>"
        f'<script type="text/turtle">\n{DISJOINT_TTL}\n</script>'
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://ex.example.org/disj", dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc),
          html, extract_text(html.decode()), "en")],
        PAGES_SCHEMA,
    )
    qrules = qualified_rules_df(pages)
    rows = qrules.collect()
    assert len(rows) == 2 and all(r["disjoint"] for r in rows)
    assert all(len(r["siblings"]) == 1 for r in rows)

    viol = qualified_cardinality_violations(parse_pages(pages), qrules)
    got = {
        (r["subject"].rsplit("/", 1)[-1], r["ps_idx"]): (r["violations"][0], r["n_conforming"])
        for r in viol.collect()
    }
    female_idx = next(r["ps_idx"] for r in rows if r["q_class"].endswith("Female"))
    assert got == {("ambig", female_idx): ("qualifiedMinCount", 0)}
