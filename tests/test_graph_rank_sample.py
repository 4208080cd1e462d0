"""PageRank / TF-IDF / deterministic sampling operator tests.

PageRank is cross-checked against a dense numpy power iteration on the same
transition matrix; sampling is checked for exact per-stratum counts and for
partition-layout independence (the property Spark's .sample lacks)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgforge.operators.graph import normalize_edges, pagerank, user_event_graph
from kgforge.operators.ranking import doc_terms, tfidf_top_terms
from kgforge.operators.sampling import hash_sample, stratified_sample


def test_pagerank_matches_numpy(spark):
    edges = [
        ("a", "b", 1.0),
        ("a", "c", 3.0),
        ("b", "c", 1.0),
        ("c", "a", 1.0),
        ("d", "a", 2.0),
    ]
    t = normalize_edges(spark.createDataFrame(edges, ["src", "dst", "weight"]), symmetrize=True)
    got = {r["node"]: r["pr"] for r in pagerank(t, iterations=4, damping=0.85).collect()}

    # dense reference on the symmetrized weighted graph
    names = sorted(got)
    idx = {n: i for i, n in enumerate(names)}
    W = np.zeros((len(names), len(names)))
    for s, d, w in edges:
        W[idx[s], idx[d]] += w
        W[idx[d], idx[s]] += w
    P = W / W.sum(axis=1, keepdims=True)
    pr = np.full(len(names), 1.0 / len(names))
    for _ in range(4):
        pr = (1 - 0.85) / len(names) + 0.85 * (P.T @ pr)
    for n in names:
        assert got[n] == pytest.approx(pr[idx[n]], abs=1e-12)
    # probability mass conserved (no dangling leakage by construction)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_hub_ranks_highest(spark):
    ev = spark.createDataFrame(
        [(i, 1000 + i % 50, "view" if i % 5 else "buy", ) for i in range(500)],
        ["event_id", "user_id", "event_type"],
    )
    t = normalize_edges(user_event_graph(ev), symmetrize=True)
    rows = pagerank(t, iterations=3).collect()
    top = max(rows, key=lambda r: r["pr"])["node"]
    assert top == "t:view"  # 400 of 500 interactions


def test_tfidf_prefers_rare_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common unique"),
            (2, "common words here"),
            (3, "common words there"),
        ],
        ["doc_id", "text"],
    )
    top = tfidf_top_terms(docs, k=1).collect()
    by_doc = {r["doc_id"]: r["term"] for r in top}
    # 'common' appears in every doc -> idf ln(4/4)=0; doc 1's top must be 'unique'
    assert by_doc[1] == "unique"
    terms = {(r["doc_id"], r["term"]): r["tf"] for r in doc_terms(docs).collect()}
    assert terms[(1, "common")] == 3 and (1, "unique") in terms


def test_stratified_sample_exact_counts_and_layout_free(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    df1 = spark.createDataFrame(rows, ["doc_id", "lang"])
    df8 = spark.createDataFrame(rows, ["doc_id", "lang"]).repartition(8)
    s1 = stratified_sample(df1, "lang", 0.10)
    s8 = stratified_sample(df8, "lang", 0.10)
    got1 = sorted((r["lang"], r["doc_id"]) for r in s1.collect())
    got8 = sorted((r["lang"], r["doc_id"]) for r in s8.collect())
    assert got1 == got8  # identical sample at any partitioning
    from collections import Counter

    per = Counter(lang for lang, _ in got1)
    assert per == {"en": 10, "de": 10, "fr": 10}


def test_hash_sample_deterministic_and_unbiased(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    a = set(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    b = set(r["doc_id"] for r in hash_sample(df.repartition(16), 0.25).collect())
    assert a == b
    assert 0.23 < len(a) / 20000 < 0.27
