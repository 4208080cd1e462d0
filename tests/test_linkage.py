"""Fellegi-Sunter linkage vs a pure-Python reimplementation."""

import math

import pytest

ROWS = [
    # (id, block, city, zip)
    (1, "A", "springfield", "11111"),
    (2, "A", "springfield", "11111"),
    (3, "A", "shelbyville", "22222"),
    (4, "A", "springfield", "33333"),
    (5, "B", "ogdenville", "11111"),
    (6, "B", "ogdenville", "44444"),
    (7, "C", "lone", "55555"),  # singleton block -> no pairs
]

M = {"city": 0.95, "zip": 0.9}


def _py_scores(rows):
    n = len(rows)
    denom = n * (n - 1.0)
    eps = 1.0 / denom
    us = {}
    for fi, fname in ((2, "city"), (3, "zip")):
        counts = {}
        for r in rows:
            counts[r[fi]] = counts.get(r[fi], 0) + 1
        u = sum(c * (c - 1) for c in counts.values()) / denom
        us[fname] = min(max(u, eps), 1.0 - eps)
    out = {}
    for i, ra in enumerate(rows):
        for rb in rows[i + 1 :]:
            if ra[1] != rb[1]:
                continue
            w = 0.0
            flags = {}
            for fi, fname in ((2, "city"), (3, "zip")):
                agree = ra[fi] == rb[fi]
                flags[fname] = int(agree)
                m, u = M[fname], us[fname]
                w += math.log(m / u) if agree else math.log((1 - m) / (1 - u))
            out[(ra[0], rb[0])] = (flags["city"], flags["zip"], w)
    return out


def test_fs_scores_match_python(spark):
    from pyspark.sql import functions as F

    from kgforge.operators.linkage import fellegi_sunter_scores

    df = spark.createDataFrame(ROWS, "id long, blk string, city string, zip string")
    got = {
        (r["id_a"], r["id_b"]): (r["agree_city"], r["agree_zip"], r["match_weight"])
        for r in fellegi_sunter_scores(
            df, "id", ["blk"], {"city": F.col("city"), "zip": F.col("zip")}, M
        ).collect()
    }
    expect = _py_scores(ROWS)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][:2] == expect[k][:2]
        assert got[k][2] == pytest.approx(expect[k][2], abs=1e-9)
    # full agreement outranks partial outranks none
    assert got[(1, 2)][2] > got[(1, 4)][2] > got[(1, 3)][2]


def test_u_clamping_degenerate_fields(spark):
    from pyspark.sql import functions as F

    from kgforge.operators.linkage import fellegi_sunter_scores

    # one field all-identical (u -> 1 clamped), one all-distinct (u -> 0 clamped)
    rows = [(1, "A", "x", "p"), (2, "A", "x", "q"), (3, "A", "x", "r")]
    df = spark.createDataFrame(rows, "id long, blk string, s string, d string")
    out = fellegi_sunter_scores(
        df, "id", ["blk"], {"s": F.col("s"), "d": F.col("d")}, {"s": 0.9, "d": 0.9}
    ).collect()
    assert len(out) == 3
    for r in out:
        assert math.isfinite(r["match_weight"])


def test_er_pairwise_eval_hand_pin(spark):
    from kgforge.operators.linkage import er_pairwise_eval

    # truth: {1,2,3}, {4,5}, {6}; pred: {1,2}, {3,4}, {5}, {6}
    rows = [
        (1, "p1", "t1"), (2, "p1", "t1"), (3, "p2", "t1"),
        (4, "p2", "t2"), (5, "p3", "t2"), (6, "p4", "t3"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, pred string, truth string")
    got = er_pairwise_eval(df).collect()[0]
    # pred pairs: (1,2),(3,4) = 2; true pairs: 3+1 = 4; both: (1,2) only = 1
    assert (got["n_items"], got["pred_pairs"], got["true_pairs"],
            got["both_pairs"]) == (6, 2, 4, 1)
    assert got["precision"] == 0.5 and got["recall"] == 0.25
    assert got["f1"] == round(2 * 0.5 * 0.25 / 0.75, 6)


def test_er_pairwise_eval_perfect_and_degenerate(spark):
    from kgforge.operators.linkage import er_pairwise_eval

    perfect = spark.createDataFrame(
        [(1, "a", "a"), (2, "a", "a"), (3, "b", "b")],
        "doc_id bigint, pred string, truth string",
    )
    got = er_pairwise_eval(perfect).collect()[0]
    assert got["precision"] == 1.0 and got["recall"] == 1.0 and got["f1"] == 1.0

    singletons = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "doc_id bigint, pred string, truth string"
    )
    got = er_pairwise_eval(singletons).collect()[0]
    # no pairs anywhere: all metrics undefined, not a divide-by-zero kill
    assert got["precision"] is None and got["recall"] is None and got["f1"] is None
