"""Knowledge fusion (majority-vote fact resolution) and snapshot diff —
hand-computable golden cases."""

from pyspark.sql import functions as F


def _triples(spark, rows):
    """rows: (url, subject, predicate, value)."""
    data = [
        (u, s, p, {"value": v, "kind": "literal", "datatype": "", "lang": ""})
        for (u, s, p, v) in rows
    ]
    return spark.createDataFrame(
        data,
        "url string, subject string, predicate string, "
        "object struct<value:string,kind:string,datatype:string,lang:string>",
    ).withColumn("status", F.lit("ok"))


def test_fuse_majority_wins(spark):
    from kgforge.operators.fusion import fuse_facts

    t = _triples(spark, [
        ("u1", "e1", "p", "alice"),
        ("u2", "e1", "p", "alice"),
        ("u3", "e1", "p", "bob"),
        ("u1", "e2", "p", "x"),
    ])
    got = {(r["subject"], r["value"]): r for r in fuse_facts(t).collect()}
    assert set(got) == {("e1", "alice"), ("e2", "x")}
    r = got[("e1", "alice")]
    assert (r["votes"], r["total_votes"], r["n_values"]) == (2, 3, 2)
    assert abs(r["confidence"] - 2 / 3) < 1e-12


def test_fuse_tie_breaks_to_smallest_value(spark):
    from kgforge.operators.fusion import fuse_facts

    t = _triples(spark, [
        ("u1", "e1", "p", "zeta"),
        ("u2", "e1", "p", "alpha"),
    ])
    [r] = fuse_facts(t).collect()
    assert r["value"] == "alpha" and r["votes"] == 1


def test_fuse_page_votes_vs_row_votes(spark):
    from kgforge.operators.fusion import fuse_facts

    # one page spamming the same assertion 3x counts ONCE under page
    # voting but 3x under row voting
    t = _triples(spark, [
        ("u1", "e1", "p", "spam"),
        ("u1", "e1", "p", "spam"),
        ("u1", "e1", "p", "spam"),
        ("u2", "e1", "p", "real"),
        ("u3", "e1", "p", "real"),
    ])
    [by_page] = fuse_facts(t, count_pages=True).collect()
    assert (by_page["value"], by_page["votes"]) == ("real", 2)
    [by_row] = fuse_facts(t, count_pages=False).collect()
    assert (by_row["value"], by_row["votes"]) == ("spam", 3)


def test_fuse_min_votes_floor(spark):
    from kgforge.operators.fusion import fuse_facts

    t = _triples(spark, [
        ("u1", "e1", "p", "a"), ("u2", "e1", "p", "a"),
        ("u3", "e2", "p", "lone"),
    ])
    got = {r["subject"] for r in fuse_facts(t, min_votes=2).collect()}
    assert got == {"e1"}


def test_kg_diff_added_removed_unchanged(spark):
    from kgforge.operators.fusion import kg_diff

    old = _triples(spark, [
        ("u1", "e1", "p", "keep"),
        ("u1", "e1", "p", "gone"),
        ("u2", "e2", "p", "gone2"),
    ])
    new = _triples(spark, [
        ("u9", "e1", "p", "keep"),   # same fact from another page: unchanged
        ("u1", "e1", "p", "fresh"),
        ("u1", "e1", "p", "fresh"),  # duplicated row must not inflate
    ])
    got = {(r["subject"], r["value"], r["change"]) for r in kg_diff(old, new).collect()}
    assert got == {
        ("e1", "fresh", "added"),
        ("e1", "gone", "removed"),
        ("e2", "gone2", "removed"),
    }
    assert kg_diff(old, old).count() == 0


def test_latest_facts_recency_and_tie(spark):
    from kgforge.operators.fusion import latest_facts

    t = _triples(spark, [
        ("u1", "e1", "p", "old"),
        ("u2", "e1", "p", "mid"),
        ("u3", "e1", "p", "new"),
        ("u4", "e2", "p", "aa"),
        ("u5", "e2", "p", "zz"),  # same ts as aa -> larger value wins
    ]).withColumn(
        "fetched_at",
        F.when(F.col("url") == "u1", 10).when(F.col("url") == "u2", 20)
        .when(F.col("url") == "u3", 30).otherwise(5),
    )
    got = {r["subject"]: r for r in latest_facts(t).collect()}
    assert (got["e1"]["value"], got["e1"]["as_of"], got["e1"]["n_versions"]) == ("new", 30, 3)
    assert (got["e2"]["value"], got["e2"]["as_of"]) == ("zz", 5)
