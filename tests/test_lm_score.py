"""Unigram LM scoring (operators/lm_score.py): hand-computed probabilities,
OOV handling, and the capped-vocab broadcast path."""

import math

import pytest

from kgforge.operators.lm_score import unigram_lm_score, unigram_lm_train


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TRAIN = [
    (1, "a a b"),
    (2, "a c"),
    (3, "   "),  # blank: contributes nothing
]
# counts: a=3, b=1, c=1 -> T=5, V=3; denom = 5 + 0.5*4 = 7.0


def _logp(c):
    return math.log((c + 0.5) / 7.0)


def test_train_probabilities_and_oov_row(spark):
    lm = {r.token: r.logp for r in unigram_lm_train(_docs(spark, TRAIN)).collect()}
    assert set(lm) == {"a", "b", "c", None}
    assert lm["a"] == pytest.approx(_logp(3), rel=1e-12)
    assert lm["b"] == pytest.approx(_logp(1), rel=1e-12)
    assert lm[None] == pytest.approx(_logp(0), rel=1e-12)


def test_score_known_and_oov_tokens(spark):
    docs = _docs(spark, TRAIN)
    lm = unigram_lm_train(docs)
    scored = {
        r.doc_id: r
        for r in unigram_lm_score(
            _docs(spark, [(10, "a b"), (11, "zzz a"), (12, "")]), lm
        ).collect()
    }
    assert set(scored) == {10, 11}  # blank doc 12 produces no row
    assert scored[10].n_tokens == 2
    assert scored[10].sum_logp == pytest.approx(_logp(3) + _logp(1), rel=1e-12)
    # zzz is OOV -> the c=0 bucket
    assert scored[11].sum_logp == pytest.approx(_logp(0) + _logp(3), rel=1e-12)
    assert scored[11].avg_logp == pytest.approx((_logp(0) + _logp(3)) / 2, rel=1e-12)


def test_max_vocab_folds_tail_into_oov(spark):
    docs = _docs(spark, TRAIN)
    lm = unigram_lm_train(docs, max_vocab=1)  # keep only 'a'
    kept = {r.token for r in lm.collect()}
    assert kept == {"a", None}
    # T and V still count the full corpus: probabilities for 'a' unchanged
    scored = unigram_lm_score(_docs(spark, [(20, "a b")]), lm).collect()[0]
    assert scored.sum_logp == pytest.approx(_logp(3) + _logp(0), rel=1e-12)


def test_in_distribution_scores_higher(spark):
    docs = _docs(spark, [(i, "the cat sat on the mat") for i in range(5)])
    lm = unigram_lm_train(docs)
    scored = {
        r.doc_id: r.avg_logp
        for r in unigram_lm_score(
            _docs(spark, [(100, "the cat sat"), (101, "qq ww ee")]), lm
        ).collect()
    }
    assert scored[100] > scored[101]


def test_ccnet_buckets_terciles_and_ties(spark):
    from kgforge.operators.lm_score import ccnet_buckets

    # 9 docs in one language, distinct scores -3..-11 -> clean 3/3/3 split
    rows = [(i, "en", float(-3 - i)) for i in range(9)]
    # a second language where ALL docs tie -> everyone lands in head
    rows += [(100 + i, "de", -5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, avg_logp double")
    got = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(df).collect()}
    assert [got[i] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert all(got[100 + i] == "head" for i in range(4))


def test_ccnet_buckets_languages_are_independent(spark):
    from kgforge.operators.lm_score import ccnet_buckets

    # identical score distributions per language -> identical bucket layout,
    # regardless of the other language's presence
    rows = [(i, "en", float(-i)) for i in range(6)]
    rows += [(10 + i, "fr", float(-i)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, avg_logp double")
    got = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(df).collect()}
    assert [got[i] for i in range(6)] == [got[10 + i] for i in range(6)]


def test_bigram_lm_python_pin(spark):
    """Seen / context-backoff / unseen-context tiers vs hand arithmetic."""
    import math

    from kgforge.operators.lm_score import bigram_lm_score, bigram_lm_train

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id bigint, text string"
    )
    lm = bigram_lm_train(train)
    # counts: (a,b)=3, (b,a)=1, (b,c)=1; c_a: a=3, b=2; V=3
    score = spark.createDataFrame(
        [(10, "a b"),      # seen: (3+.5)/(3+.5*4)
         (11, "b z"),      # known context b, unseen token: .5/(2+2)
         (12, "q r"),      # unseen context: 1/(3+1)
         (13, "solo")],    # one token: no bigram -> no row
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(score, lm).collect()}
    assert set(got) == {10, 11, 12}
    assert abs(got[10]["sum_logp"] - math.log(3.5 / 5.0)) < 1e-12
    assert abs(got[11]["sum_logp"] - math.log(0.5 / 4.0)) < 1e-12
    assert abs(got[12]["sum_logp"] - math.log(1.0 / 4.0)) < 1e-12
    assert got[10]["n_bigrams"] == 1
