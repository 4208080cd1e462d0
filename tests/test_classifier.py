"""NB log-odds classifier: closed-form fit, scoring semantics, plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from kgforge.operators.classifier import nb_train_weights, score_documents


def _corpus(spark):
    rows = []
    for i in range(30):
        rows.append((i, f"good clean prose sentence number {i % 3}", True))
    for i in range(30, 60):
        rows.append((i, f"spam spam buy now click {i % 3}", False))
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def test_separates_train_corpus(spark):
    docs = _corpus(spark)
    w, b = nb_train_weights(docs, "y", buckets=256)
    out = {r["doc_id"]: r for r in score_documents(docs, w, b, buckets=256).collect()}
    assert all(out[i]["keep"] for i in range(30))
    assert all(not out[i]["keep"] for i in range(30, 60))
    assert all(out[i]["prob"] > 0.5 < 1 - out[j]["prob"] for i, j in [(0, 30)])


def test_bias_is_class_prior_log_odds(spark):
    docs = _corpus(spark)
    _, b = nb_train_weights(docs, "y", buckets=256)
    assert b == pytest.approx(math.log(30 / 30)) == 0.0


def test_empty_doc_scores_bias_alone(spark):
    docs = _corpus(spark).union(
        spark.createDataFrame([(99, "", True)], "doc_id long, text string, y boolean")
    )
    w, b = nb_train_weights(docs, "y", buckets=256)
    scored = {r["doc_id"]: r for r in score_documents(docs, w, b, buckets=256).collect()}
    assert scored[99]["score"] == pytest.approx(round(b, 6))


def test_single_class_raises(spark):
    docs = spark.createDataFrame(
        [(1, "a b", True), (2, "c d", True)], "doc_id long, text string, y boolean"
    )
    with pytest.raises(ValueError):
        nb_train_weights(docs, "y")


def test_weight_table_bounded_by_buckets(spark):
    docs = _corpus(spark)
    w, _ = nb_train_weights(docs, "y", buckets=16)
    assert w.count() <= 16


def test_scoring_broadcasts_model(spark):
    docs = _corpus(spark)
    w, b = nb_train_weights(docs, "y", buckets=256)
    plan = (
        score_documents(docs, w, b, buckets=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
