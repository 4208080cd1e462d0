"""Bucketed sink: the join it exists for must be exchange-free, and the
values must equal the plain shuffle join's."""

from __future__ import annotations

import pytest

from kgforge.sinks.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    left = docs.selectExpr("doc_id", "lang", "n_chars")
    right = docs.selectExpr("doc_id", "source")
    write_bucketed(left, "b_left", ["doc_id"], n_buckets=8, sort_cols=["doc_id"])
    write_bucketed(right, "b_right", ["doc_id"], n_buckets=8, sort_cols=["doc_id"])
    yield "b_left", "b_right"
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join strategy that would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bucketed_join(spark, lt, rt, ["doc_id"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_values_match_shuffle_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expected = sorted(
        map(
            tuple,
            docs.selectExpr("doc_id", "lang", "n_chars")
            .join(docs.selectExpr("doc_id", "source"), "doc_id")
            .collect(),
        )
    )
    got = sorted(map(tuple, bucketed_join(spark, lt, rt, ["doc_id"]).collect()))
    assert got == expected and len(got) == 500


def test_bucketed_side_skips_shuffle_against_plain_side(spark, bucketed_tables):
    """Asymmetric case: only the bucketed side avoids its exchange; the
    plain side is repartitioned INTO the bucket count."""
    lt, _ = bucketed_tables
    plain = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").selectExpr(
        "doc_id", "source"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = spark.table(lt).join(plain, "doc_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
