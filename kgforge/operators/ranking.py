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


def textrank_keywords(
    docs: DataFrame,
    top_n: int = 20,
    iterations: int = 3,
    damping: float = 0.85,
    min_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level TextRank keywords (Mihalcea & Tarau 2004): PageRank
    over the word-adjacency graph — nodes are words, an edge links each
    pair of ADJACENT tokens (window=2), edge weight = corpus-wide pair
    count. Returns (word, pr) top_n by rounded rank, ties by word.

    Scale shape: adjacent pairs come from one higher-order-function
    transform over the token array (NO posexplode self-join — the pair
    list is built in place per row, then exploded once); the edge agg is
    map-side combined on (w1, w2); the graph that PageRank iterates over
    is VOCABULARY-sized, orders of magnitude smaller than the corpus, so
    the three power iterations cost vocabulary-shaped shuffles regardless
    of corpus size. Word filter ``^[a-z]{min_len,}$`` keeps punctuation
    and numerals out of the graph (same predicate the oracle applies).
    """
    from kgforge.operators.graph import normalize_edges, pagerank

    tk = docs.select(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("tk")
    ).filter(F.size("tk") >= 2)
    pairs = tk.select(
        F.explode(
            F.expr("transform(sequence(1, size(tk)-1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))")
        ).alias("p")
    ).select("p.w1", "p.w2")
    word_re = "^[a-z]{%d,}$" % min_len
    edges = (
        pairs.filter(
            F.col("w1").rlike(word_re)
            & F.col("w2").rlike(word_re)
            & (F.col("w1") != F.col("w2"))
        )
        .select(
            F.least("w1", "w2").alias("src"), F.greatest("w1", "w2").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
        # persisted: normalize_edges consumes the edge table twice (the
        # row-stochastic join reads it on both sides) — without the cut
        # the corpus-shaped tokenize+pair agg runs twice
        .persist()
    )
    t = normalize_edges(edges, symmetrize=True)
    pr = pagerank(t, iterations=iterations, damping=damping)
    return (
        pr.select(F.col("node").alias("word"), F.round("pr", 9).alias("pr"))
        .orderBy(F.desc("pr"), "word")
        .limit(top_n)
    )


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """IR quality metrics per query: (query_id, rr, dcg, idcg, ndcg,
    hits) — reciprocal rank of the first relevant result, DCG@k /
    ideal-DCG@k / their ratio, and the relevant-result count in the top
    k. Standard definitions (Järvelin & Kekäläinen): dcg = sum rel_i /
    log2(rank_i + 1); idcg ranks the query's qrels by rel desc (doc-id
    tiebreak). Queries with no relevant documents report rr/dcg/ndcg 0.

    Scale shape: results are top-k-bounded per query, so the metric aggs
    are query-keyed and map-side combinable; the only window runs over
    QRELS per query (judgment lists, bounded by assessment effort, never
    corpus-sized). Doubles round to 6 so ln-ulp drift can't flip a
    comparison downstream.
    """
    joined = results.filter(F.col(rank_col) <= k).join(
        qrels.select(
            F.col(query_col), F.col(doc_col), F.col(rel_col).cast("double").alias("_rel")
        ),
        [query_col, doc_col],
        "left",
    )
    rel = F.coalesce("_rel", F.lit(0.0))
    per_q = joined.groupBy(query_col).agg(
        F.round(
            F.coalesce(
                F.max(
                    F.when(rel > 0, F.lit(1.0) / F.col(rank_col).cast("double"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("rr"),
        F.round(
            F.sum(rel / F.log2(F.col(rank_col).cast("double") + F.lit(1.0))), 6
        ).alias("dcg"),
        F.sum(F.when(rel > 0, 1).otherwise(0)).cast("bigint").alias("hits"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("_rel"), F.col(doc_col).asc()
    )
    ideal = (
        qrels.select(
            F.col(query_col),
            F.col(doc_col),
            F.col(rel_col).cast("double").alias("_rel"),
        )
        .filter(F.col("_rel") > 0)
        .withColumn("_i", F.row_number().over(w))
        .filter(F.col("_i") <= k)
        .groupBy(query_col)
        .agg(
            F.round(
                F.sum(F.col("_rel") / F.log2(F.col("_i").cast("double") + F.lit(1.0))),
                6,
            ).alias("idcg")
        )
    )
    out = per_q.join(ideal, query_col, "left")
    idcg = F.coalesce("idcg", F.lit(0.0))
    ndcg = F.when(idcg > 0, F.round(F.col("dcg") / idcg, 6)).otherwise(F.lit(0.0))
    return out.select(
        query_col, "rr", "dcg", idcg.alias("idcg"), ndcg.alias("ndcg"), "hits"
    )


def lexrank_sentences(
    docs: DataFrame,
    k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 3,
) -> DataFrame:
    """Extractive summarization per document — the degree-centrality
    variant of LexRank (Erkan & Radev 2004, §4.1: threshold/degree
    centrality is the power-iteration-free member of the family): a
    sentence's salience is the sum of its Jaccard word-set similarities
    to the document's OTHER sentences, and the top-k most central
    sentences are the summary. Returns (doc_id, rank, idx, score,
    sentence) with idx = the sentence's original position.

    Exactness regime: each pairwise similarity is quantized to integer
    micro-units — round(1e6 · |A∩B| / |A∪B|) — so the per-sentence score
    is an EXACT bigint sum (order-free), divided once for presentation.
    With word-set unions far below 128, 1e6·i/u can never land on an
    exact .5, so Spark's HALF_UP and DuckDB's half-away rounding agree
    and the oracle replays scores bit-for-bit.

    Scale shape: sentences explode to rows, the similarity join is
    DOC-CONFINED (a document's own sentences — the same page-local shape
    as the entity co-occurrence build), and the score aggregation is a
    combinable integer sum keyed (doc, sentence). The only window is the
    per-doc top-k, partitioned by the same doc key the join already
    used. No Python anywhere.
    """
    words = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col("sentence")), TOKEN_SPLIT_RE),
            lambda w: F.length(w) >= min_len,
        )
    )
    sent = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\\. ")).alias(
                "idx", "sentence"
            ),
        )
        .filter(F.col("sentence") != "")
        .select("doc_id", "idx", "sentence", words.alias("w"))
    )
    a = sent.select(
        "doc_id", F.col("idx").alias("i"), F.col("w").alias("wa")
    )
    b = sent.select(
        "doc_id", F.col("idx").alias("j"), F.col("w").alias("wb")
    )
    inter = F.size(F.array_intersect("wa", "wb")).cast("double")
    union = F.size(F.array_union("wa", "wb"))
    term = F.when(
        union > 0,
        F.round(F.lit(1000000.0) * inter / union.cast("double"), 0),
    ).otherwise(F.lit(0.0)).cast("bigint")
    scores = (
        a.join(b, "doc_id")
        .filter(F.col("i") != F.col("j"))
        .select("doc_id", "i", term.alias("t"))
        .groupBy("doc_id", "i")
        .agg(F.sum("t").cast("bigint").alias("micro"))
    )
    sc = scores.select(
        F.col("doc_id").alias("_sd"),
        F.col("i").alias("_si"),
        "micro",
    )
    ranked = (
        sent.join(
            sc,
            (F.col("doc_id") == F.col("_sd")) & (F.col("idx") == F.col("_si")),
            "left",
        )
        .select(
            "doc_id",
            "idx",
            "sentence",
            F.coalesce("micro", F.lit(0)).cast("bigint").alias("micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("micro"), F.asc("idx"))
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "rank",
            F.col("idx").cast("int").alias("idx"),
            F.round(F.col("micro").cast("double") / 1000000.0, 6).alias("score"),
            "sentence",
        )
    )
