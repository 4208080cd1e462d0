"""VoID-style predicate partition profile (operators/profile.py)."""

from pyspark.sql import functions as F


def _triples(spark, rows):
    return spark.createDataFrame(
        [(u, s, p, {"value": v, "kind": k, "datatype": None, "lang": None})
         for (u, s, p, v, k) in rows],
        "url string, subject string, predicate string, "
        "object struct<value:string,kind:string,datatype:string,lang:string>",
    )


def test_predicate_profile_counts_and_kinds(spark):
    from kgforge.operators.profile import predicate_profile

    rows = [
        ("u1", "s1", "p:name", "Ada", "literal"),
        ("u1", "s1", "p:name", "Ada B", "literal"),
        ("u1", "s1", "p:knows", "ex:s2", "iri"),
        ("u2", "s2", "p:name", "Bart", "literal"),
        ("u2", "s2", "p:mixed", "ex:x", "iri"),
        ("u2", "s3", "p:mixed", "plain", "literal"),
        ("u2", "s3", "p:mixed", "_:b0", "bnode"),
    ]
    got = {
        r["predicate"]: (r["n"], r["n_docs"], r["max_per_doc"], r["obj_kinds"])
        for r in predicate_profile(_triples(spark, rows)).collect()
    }
    assert got == {
        "p:name": (3, 2, 2, "literal"),
        "p:knows": (1, 1, 1, "iri"),
        "p:mixed": (3, 1, 3, "bnode,iri,literal"),  # mixed-kind flag
    }


def test_predicate_profile_is_vocabulary_sized(spark):
    """Output rows == distinct predicates, independent of corpus size."""
    from kgforge.operators.profile import predicate_profile

    rows = [(f"u{i}", f"s{i}", "p:only", str(i), "literal") for i in range(50)]
    out = predicate_profile(_triples(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n"] == 50 and out[0]["n_docs"] == 50 and out[0]["max_per_doc"] == 1
