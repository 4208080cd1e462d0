"""rdfs:subPropertyOf / owl:equivalentProperty / owl:equivalentClass
entailment (inference.subproperty_inference + lower_equivalences) —
delta/anti-join semantics in the style of the transitive suite.

Reference scope: parser-shacl extracts ontology metadata
(src/ShaclParser.php:65-74) but never entails; these are the OWL 2 RL
rules prp-spo1, prp-eqp1/2, cax-eqc1/2 and RDFS rdfs5/rdfs7 a corpus-scale
materializer runs over the schema graph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.operators.inference import (
    lower_equivalences,
    rdfs_type_closure,
    subproperty_inference,
)


def _tri(spark, rows):
    """rows: (subject, predicate, kind, value)"""
    return spark.createDataFrame(
        [(s, p, {"kind": k, "value": v}) for s, p, k, v in rows],
        "subject string, predicate string, "
        "object struct<kind:string, value:string>",
    )


def _sp(spark, rows):
    return spark.createDataFrame(rows, "sub string, sup string")


def _delta(df):
    return {
        (r["subject"], r["predicate"], r["object"]["value"])
        for r in df.collect()
    }


class TestSubPropertyInference:
    def test_chain_entails_all_strict_ancestors(self, spark):
        tri = _tri(spark, [("s1", "p", "iri", "o1")])
        sub = _sp(spark, [("p", "q"), ("q", "r")])
        got = _delta(subproperty_inference(tri, sub))
        assert got == {("s1", "q", "o1"), ("s1", "r", "o1")}

    def test_literal_objects_participate(self, spark):
        # rdfs7 applies to ANY triple, unlike the IRI-only inverse rules
        tri = _tri(spark, [("s1", "name", "literal", "Ada")])
        sub = _sp(spark, [("name", "label")])
        got = _delta(subproperty_inference(tri, sub))
        assert got == {("s1", "label", "Ada")}

    def test_asserted_triples_excluded_from_delta(self, spark):
        tri = _tri(
            spark,
            [("s1", "p", "iri", "o1"), ("s1", "q", "iri", "o1")],
        )
        sub = _sp(spark, [("p", "q"), ("q", "r")])
        got = _delta(subproperty_inference(tri, sub))
        # (s1, q, o1) is asserted -> only the r-level entailments remain
        assert got == {("s1", "r", "o1")}

    def test_equivalence_entails_both_directions(self, spark):
        eq = spark.createDataFrame([("e", "p")], "a string, b string")
        sub = _sp(spark, [("p", "q")])
        via_e = _delta(
            subproperty_inference(
                _tri(spark, [("s1", "e", "iri", "o1")]), sub, equiv_props=eq
            )
        )
        # e ≡ p ⊑ q: asserting e entails p AND q
        assert via_e == {("s1", "p", "o1"), ("s1", "q", "o1")}
        via_p = _delta(
            subproperty_inference(
                _tri(spark, [("s2", "p", "iri", "o2")]), sub, equiv_props=eq
            )
        )
        # asserting p entails its alias e and its super q
        assert via_p == {("s2", "e", "o2"), ("s2", "q", "o2")}

    def test_cycles_fixpoint_terminate(self, spark):
        # a ⊑ b ⊑ c ⊑ a: all three mutually equivalent by closure
        tri = _tri(spark, [("s1", "a", "iri", "o1")])
        sub = _sp(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        got = _delta(subproperty_inference(tri, sub))
        assert got == {("s1", "b", "o1"), ("s1", "c", "o1")}

    def test_unrelated_predicates_untouched(self, spark):
        tri = _tri(spark, [("s1", "x", "iri", "o1")])
        sub = _sp(spark, [("p", "q")])
        assert _delta(subproperty_inference(tri, sub)) == set()


class TestEquivalentClass:
    def test_lowered_equivalence_feeds_type_closure(self, spark):
        # cax-eqc1/2: A ≡ B lowered to mutual subsumption, then the
        # existing rdfs_type_closure stamps both classes on any instance
        types = spark.createDataFrame(
            [("ent1", "A"), ("ent2", "B")], "entity string, cls string"
        )
        subclass = _sp(spark, [("B", "C")])
        eq = spark.createDataFrame([("A", "B")], "a string, b string")
        edges = subclass.unionByName(lower_equivalences(eq))
        got = {
            (r["entity"], r["cls"])
            for r in rdfs_type_closure(types, edges).collect()
        }
        assert got == {
            ("ent1", "A"), ("ent1", "B"), ("ent1", "C"),
            ("ent2", "A"), ("ent2", "B"), ("ent2", "C"),
        }

    def test_lower_equivalences_shape(self, spark):
        eq = spark.createDataFrame([("A", "B"), ("C", "D")], "a string, b string")
        got = {(r["sub"], r["sup"]) for r in lower_equivalences(eq).collect()}
        assert got == {("A", "B"), ("B", "A"), ("C", "D"), ("D", "C")}


class TestPropertyAxiomViolations:
    def test_irreflexive_self_loops_flagged(self, spark):
        from kgforge.operators.inference import property_axiom_violations

        tri = _tri(
            spark,
            [("a", "p", "iri", "a"), ("b", "p", "iri", "c"),
             ("d", "q", "iri", "d")],  # q not declared -> ignored
        )
        got = {
            (r["subject"], r["object"], r["axiom"])
            for r in property_axiom_violations(tri, irreflexive=["p"]).collect()
        }
        assert got == {("a", "a", "irreflexive")}

    def test_asymmetric_reports_both_directions(self, spark):
        from kgforge.operators.inference import property_axiom_violations

        tri = _tri(
            spark,
            [("a", "p", "iri", "b"), ("b", "p", "iri", "a"),
             ("a", "p", "iri", "c")],  # one-way edge: fine
        )
        got = {
            (r["subject"], r["object"])
            for r in property_axiom_violations(tri, asymmetric=["p"]).collect()
        }
        assert got == {("a", "b"), ("b", "a")}

    def test_mixed_axioms_and_literals_excluded(self, spark):
        from kgforge.operators.inference import property_axiom_violations

        tri = _tri(
            spark,
            [("a", "ir", "iri", "a"), ("x", "as", "iri", "y"),
             ("y", "as", "iri", "x"), ("s", "ir", "literal", "s")],
        )
        got = {
            (r["predicate"], r["axiom"])
            for r in property_axiom_violations(
                tri, irreflexive=["ir"], asymmetric=["as"]
            ).collect()
        }
        assert got == {("ir", "irreflexive"), ("as", "asymmetric")}

    def test_no_axioms_raises(self, spark):
        import pytest as _pytest

        from kgforge.operators.inference import property_axiom_violations

        with _pytest.raises(ValueError):
            property_axiom_violations(_tri(spark, []), None, None)
