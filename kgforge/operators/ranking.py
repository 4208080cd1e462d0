"""Corpus term ranking: TF-IDF over the documents table.

Pure codegen expression pipeline (split/explode/agg/window) — no Python in
the hot path. At 100 TB the explode inflates rows ~100x, so the per-doc
term-frequency aggregation happens FIRST (map-side combined on
(doc_id, term)) before anything joins; the document-frequency table is
terms-cardinality (small relative to the corpus) and broadcast by AQE.

Determinism for oracle comparison: scores are rounded BEFORE the top-k
window ranks on them, so an ulp difference between ln() implementations
can't flip a rank; ties broken by term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_SPLIT_RE = "[^a-z]+"


def doc_terms(docs: DataFrame, min_len: int = 3) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, term, tf) — lowercase, split on
    non-letter runs, drop tokens shorter than ``min_len``."""
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), TOKEN_SPLIT_RE)).alias("term")
        )
        .filter(F.length("term") >= min_len)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3, min_len: int = 3) -> DataFrame:
    """-> (doc_id, term, score, rank): the top-k characteristic terms per
    document by tf * ln((N+1)/(df+1)) (smoothed idf; non-negative since
    df <= N). Rank is over the ROUNDED score (see module docstring)."""
    terms = doc_terms(docs, min_len=min_len)
    n_docs = docs.count()
    df_tbl = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = terms.join(df_tbl, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", "rank")
    )
