"""Inverted index + BM25 (operators/search.py): hand-computed scores,
index-table invariants, pre-built-postings equivalence."""

import math

import pytest

from kgforge.operators.search import (
    bm25_topk,
    build_lexicon,
    build_postings,
    doc_lengths,
)


def _docs(spark):
    rows = [
        ("d1", "the quick brown fox jumps over the lazy dog"),
        ("d2", "quick quick quick brown"),
        ("d3", "a lazy afternoon nap"),
        ("d4", "fox hunting season opens"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _bm25_hand(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_postings_and_lexicon(spark):
    p = build_postings(_docs(spark))
    rows = {(r.term, r.doc_id): r.tf for r in p.collect()}
    assert rows[("quick", "d2")] == 3
    assert rows[("the", "d1")] == 2
    lex = {r.term: r.df for r in build_lexicon(p).collect()}
    assert lex["quick"] == 2 and lex["fox"] == 2 and lex["nap"] == 1
    dl = {r.doc_id: r.dl for r in doc_lengths(p).collect()}
    assert dl == {"d1": 9, "d2": 4, "d3": 4, "d4": 4}


def test_bm25_matches_hand_computation(spark):
    docs = _docs(spark)
    out = {r.doc_id: (r.score, r.rank) for r in
           bm25_topk(docs, "quick fox", k=10).collect()}
    # doc lengths: 9,4,4,4 -> avgdl = 21/4
    avgdl = 21 / 4
    exp_d2 = _bm25_hand(3, 2, 4, 4, avgdl)  # quick only
    exp_d4 = _bm25_hand(1, 2, 4, 4, avgdl)  # fox only
    exp_d1 = _bm25_hand(1, 2, 4, 9, avgdl) + _bm25_hand(1, 2, 4, 9, avgdl)
    assert out["d2"][0] == pytest.approx(round(exp_d2, 6), abs=2e-6)
    assert out["d4"][0] == pytest.approx(round(exp_d4, 6), abs=2e-6)
    assert out["d1"][0] == pytest.approx(round(exp_d1, 6), abs=2e-6)
    assert "d3" not in out  # no query term
    # ranks follow the rounded scores, doc_id tiebreak
    ordered = sorted(out.items(), key=lambda kv: kv[1][1])
    scores = [s for _, (s, _) in ordered]
    assert scores == sorted(scores, reverse=True)


def test_bm25_k_truncates_and_prebuilt_postings_identical(spark):
    docs = _docs(spark)
    top1 = bm25_topk(docs, "quick fox", k=1).collect()
    assert len(top1) == 1 and top1[0].rank == 1
    pre = build_postings(docs)
    a = sorted(map(tuple, bm25_topk(docs, "lazy", k=5).collect()))
    b = sorted(map(tuple, bm25_topk(docs, "lazy", k=5, postings=pre).collect()))
    assert a == b


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), "!!! 123", k=3)


def test_duplicate_query_terms_count_once(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, bm25_topk(docs, "fox", k=5).collect()))
    b = sorted(map(tuple, bm25_topk(docs, "fox fox FOX", k=5).collect()))
    assert a == b


def test_phrase_topk_hand_case(spark):
    from kgforge.operators.search import phrase_topk

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "quick brown shoes and quick brown fox"),
            (3, "brown quick"),  # both words, wrong order: no match
            (4, "quick! brown."),  # punctuation splits: still adjacent
        ],
        "doc_id int, text string",
    )
    rows = phrase_topk(docs, "Quick Brown", k=10).collect()
    assert [(r["doc_id"], r["n_matches"]) for r in rows] == [(2, 2), (1, 1), (4, 1)]


def test_phrase_topk_duplicate_term_phrase(spark):
    from kgforge.operators.search import phrase_topk

    docs = spark.createDataFrame(
        [
            (1, "go go go"),  # overlapping occurrences: positions 0,1
            (2, "go stop go"),  # both tokens present, never adjacent
        ],
        "doc_id int, text string",
    )
    rows = phrase_topk(docs, "go go", k=10).collect()
    assert [(r["doc_id"], r["n_matches"]) for r in rows] == [(1, 2)]


def test_phrase_topk_prebuilt_postings_equivalent(spark):
    from kgforge.operators.search import phrase_topk, positional_postings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    direct = [tuple(r) for r in phrase_topk(docs, "fast scan", k=15).collect()]
    pp = positional_postings(docs).persist()
    viaidx = [tuple(r) for r in phrase_topk(docs, "fast scan", k=15, postings=pp).collect()]
    pp.unpersist()
    assert direct == viaidx and len(direct) == 15


def test_prebuilt_index_plan_only_and_identical(spark):
    """VERDICT r3 #7: with a prebuilt SearchIndex, bm25_topk launches ZERO
    jobs at query-build time (stats ride a broadcast 1-row table, no
    count/avgdl collect) and scores are byte-identical to the docs path."""
    from kgforge.operators.search import build_search_index

    docs = _docs(spark)
    base = [(r.doc_id, r.score, r.rank) for r in
            bm25_topk(docs, "quick fox", k=10).collect()]

    idx = build_search_index(docs)
    idx.stats.count()  # materialize the index (the at-rest analogue)
    sc = spark.sparkContext
    sc.setJobGroup("bm25-plan-only", "query build must launch no jobs")
    try:
        q1 = bm25_topk(None, "quick fox", k=10, index=idx)
        q2 = bm25_topk(None, "lazy dog", k=3, index=idx)
        jobs = sc.statusTracker().getJobIdsForGroup("bm25-plan-only")
    finally:
        sc.setJobGroup("", "")
    assert list(jobs) == [], f"query build launched jobs: {jobs}"
    got = [(r.doc_id, r.score, r.rank) for r in q1.collect()]
    assert got == base
    assert [r.doc_id for r in q2.collect()] == ["d1", "d3"]
    idx.unpersist()


def test_ranking_metrics_hand_computed(spark):
    import math

    from kgforge.operators.ranking import ranking_metrics

    res = spark.createDataFrame(
        [(0, "d1", 1), (0, "d2", 2), (0, "d3", 3), (1, "d1", 1), (1, "d2", 2)],
        "query_id int, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, "d2", 2), (0, "d3", 1), (0, "d9", 3), (1, "dX", 1)],
        "query_id int, doc_id string, rel int",
    )
    got = {r["query_id"]: r.asDict() for r in ranking_metrics(res, qrels, k=3).collect()}
    # q0: first relevant at rank 2 -> rr = 0.5
    assert got[0]["rr"] == 0.5
    dcg = 2 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert abs(got[0]["dcg"] - round(dcg, 6)) < 1e-9
    assert abs(got[0]["idcg"] - round(idcg, 6)) < 1e-9
    assert abs(got[0]["ndcg"] - round(round(dcg, 6) / round(idcg, 6), 6)) < 1e-9
    assert got[0]["hits"] == 2
    # q1: no retrieved doc is relevant -> zeros, idcg from its 1 judged doc
    assert got[1]["rr"] == 0.0 and got[1]["dcg"] == 0.0 and got[1]["hits"] == 0
    assert got[1]["ndcg"] == 0.0 and got[1]["idcg"] == 1.0


def test_ranking_metrics_k_cut_and_perfect_ranking(spark):
    from kgforge.operators.ranking import ranking_metrics

    res = spark.createDataFrame(
        [(0, f"d{i}", i) for i in range(1, 21)],
        "query_id int, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, "d1", 1), (0, "d15", 1)], "query_id int, doc_id string, rel int"
    )
    got = ranking_metrics(res, qrels, k=10).collect()[0]
    # d15 is outside the k=10 cut: only d1 counts, and the IDEAL list
    # still contains both judged docs (ndcg < 1 punishes the miss)
    assert got["hits"] == 1 and got["rr"] == 1.0
    assert got["ndcg"] < 1.0
    perfect = ranking_metrics(
        res, spark.createDataFrame([(0, "d1", 1)], "query_id int, doc_id string, rel int"), k=10
    ).collect()[0]
    assert perfect["ndcg"] == 1.0


def test_rrf_fuse_hand_pin(spark):
    from kgforge.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id bigint, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id bigint, rank int")
    got = {r["doc_id"]: (r["rrf"], r["n_lists"], r["rank"])
           for r in rrf_fuse([a, b], k=10).collect()}
    exp = {
        1: round(1 / 61 + 1 / 62, 9),
        2: round(1 / 62, 9),
        3: round(1 / 63 + 1 / 61, 9),
        9: round(1 / 63, 9),
    }
    assert {d: v[0] for d, v in got.items()} == exp
    assert got[1][1] == 2 and got[2][1] == 1  # n_lists
    # doc 1 (1/61+1/62) > doc 3 (1/61+1/63) > doc 2 > doc 9
    assert [d for d, v in sorted(got.items(), key=lambda kv: kv[1][2])] == [1, 3, 2, 9]


def test_rrf_fuse_k_cut_and_tiebreak(spark):
    from kgforge.operators.search import rrf_fuse

    a = spark.createDataFrame([(i, 1) for i in range(5)], "doc_id bigint, rank int")
    out = rrf_fuse([a], k=3).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [0, 1, 2]
    assert len(out) == 3
