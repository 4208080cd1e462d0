"""TextRank keyword extraction: adjacency build + ranking sanity."""

from kgforge.operators.ranking import textrank_keywords


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id bigint, text string")


def test_textrank_filters_and_symmetry(spark):
    docs = _df(spark, [
        "alpha beta alpha beta",      # alpha-beta edge x3
        "gamma delta",                # gamma-delta edge x1
        "a b of 123 alpha!",          # short/non-letter tokens drop out
    ])
    rows = textrank_keywords(docs, top_n=10).collect()
    words = {r["word"] for r in rows}
    # 'alpha!' fails ^[a-z]{4,}$; short tokens and digits are gone
    assert words == {"alpha", "beta", "gamma", "delta"}
    pr = {r["word"]: r["pr"] for r in rows}
    # each connected pair is symmetric -> equal rank within the pair
    assert pr["alpha"] == pr["beta"]
    assert pr["gamma"] == pr["delta"]
    # ranks are a probability distribution over the 4 nodes
    assert abs(sum(pr.values()) - 1.0) < 1e-6


def test_textrank_hub_wins(spark):
    # 'linchpin' is adjacent to three distinct words; leaf words only to it
    docs = _df(spark, [
        "linchpin apple", "linchpin grape", "linchpin mango",
    ])
    rows = textrank_keywords(docs, top_n=4).collect()
    assert rows[0]["word"] == "linchpin"
    assert rows[0]["pr"] > rows[1]["pr"]


def test_textrank_single_token_docs_ignored(spark):
    docs = _df(spark, ["solo", "", "  ", "pair words"])
    rows = textrank_keywords(docs, top_n=10).collect()
    assert {r["word"] for r in rows} == {"pair", "words"}
