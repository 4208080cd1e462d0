"""Predicate alignment (instance-based schema matching) vs hand-computed
Jaccard overlaps."""

import pytest


PV = [
    # email and mail share 3 of 4 values
    ("p:email", "a@x.com"), ("p:email", "b@x.com"), ("p:email", "c@x.com"),
    ("p:email", "d@x.com"),
    ("p:mail", "a@x.com"), ("p:mail", "b@x.com"), ("p:mail", "c@x.com"),
    # age shares nothing
    ("p:age", "31"), ("p:age", "45"),
    # dup rows must not inflate counts
    ("p:email", "a@x.com"), ("p:mail", "a@x.com"),
]


def test_alignment_hand_computed(spark):
    from kgforge.operators.fusion import align_predicates

    df = spark.createDataFrame(PV, "predicate string, value string")
    rows = {
        (r["pred_a"], r["pred_b"]): r
        for r in align_predicates(df, min_jaccard=0.0).collect()
    }
    assert set(rows) == {("p:email", "p:mail")}
    r = rows[("p:email", "p:mail")]
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (4, 3, 3)
    assert r["jaccard"] == pytest.approx(3 / 4)


def test_alignment_threshold_filters(spark):
    from kgforge.operators.fusion import align_predicates

    df = spark.createDataFrame(PV, "predicate string, value string")
    assert align_predicates(df, min_jaccard=0.8).count() == 0
    assert align_predicates(df, min_jaccard=0.0, min_shared=4).count() == 0
