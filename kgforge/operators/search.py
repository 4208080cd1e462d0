"""Full-text search over the corpus: inverted index + BM25 ranking.

A trained-on-web-text pipeline needs retrieval over its own corpus —
for eval-set decontamination audits, for RAG-style context lookup, and
for inspecting what the crawl actually contains. This module builds the
classic two-table search layout as DataFrames and ranks with BM25
(Robertson & Walker 1994; the idf variant is Lucene's non-negative
``ln(1 + (N - df + 0.5)/(df + 0.5))``).

Layout (both tables are the engine's materialize-ready outputs):

- postings: (term, doc_id, tf)   — the inverted index, one groupBy from
  the exploded token stream, map-side partial-aggregated so hot terms
  (stopword-ish survivors) combine before the single Exchange;
- lexicon:  (term, df)           — term document frequencies, vocabulary-
  sized (tiny vs the corpus), derived from postings with one more
  map-side-combined groupBy.

Query-time scale story: the query is a handful of terms — it broadcasts.
``bm25_topk`` filters the postings table to query terms FIRST (an
``isin`` literal filter that pushes into the postings scan — at rest,
straight into the parquet/bucketed-table file pruning since postings
materialize range-partitioned by term), then one per-doc aggregation and
a top-k. No stage ever touches non-matching documents.

Determinism for oracle comparison (same convention as `ranking.py`):
scores are rounded BEFORE the top-k window ranks on them, so an ulp
difference between ln() implementations can't flip a rank; ties broken
by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .ranking import TOKEN_SPLIT_RE


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             min_len: int = 1) -> DataFrame:
    """documents -> (doc_id, term) token stream: lowercase, split on
    non-letter runs, drop empties (and tokens shorter than ``min_len``)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("term"),
        )
        .filter(F.length("term") >= max(1, min_len))
    )


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_len: int = 1) -> DataFrame:
    """The inverted index: (term, doc_id, tf). One map-side-combined
    groupBy over the token stream — the explode inflates rows ~10²x, so
    the (doc_id, term) aggregation happens before anything shuffles
    wider."""
    return (
        tokenize(docs, id_col=id_col, text_col=text_col, min_len=min_len)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def build_lexicon(postings: DataFrame) -> DataFrame:
    """(term, df): document frequency per term — vocabulary-sized."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def doc_lengths(postings: DataFrame) -> DataFrame:
    """(doc_id, dl): token count per document, from the index itself."""
    return postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def corpus_stats(docs: DataFrame, postings: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl) corpus-statistics table: total document count
    (INCLUDING zero-token docs — they count toward N in the idf) and mean
    document length. Kept as a DataFrame, never collected — query plans
    crossJoin-broadcast it, so building a query is plan-only (mirrors
    lm_score's model-table pattern; VERDICT r3 #7)."""
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    a = doc_lengths(postings).agg(
        F.coalesce(F.avg("dl"), F.lit(1.0)).alias("avgdl")
    )
    return n.crossJoin(a)


class SearchIndex:
    """At-rest search index: persisted postings + doc lengths + lexicon +
    the 1-row stats table. Build ONCE per corpus (``build_search_index``),
    then every ``bm25_topk(index=...)`` call is pure plan construction —
    no count, no avgdl collect, no re-aggregation jobs (at cluster scale
    these four tables are the materialized sink layout; persist() is the
    in-memory test-scale equivalent)."""

    def __init__(self, postings: DataFrame, lengths: DataFrame,
                 lexicon: DataFrame, stats: DataFrame):
        self.postings = postings
        self.lengths = lengths
        self.lexicon = lexicon
        self.stats = stats

    def unpersist(self):
        for df in (self.postings, self.lengths, self.lexicon, self.stats):
            df.unpersist()


def build_search_index(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", min_len: int = 1,
                       cache: bool = True) -> SearchIndex:
    """Tokenize once, derive all four index tables, optionally persist."""
    postings = build_postings(docs, id_col=id_col, text_col=text_col,
                              min_len=min_len)
    if cache:
        postings = postings.persist()
    lengths = doc_lengths(postings)
    lexicon = build_lexicon(postings)
    stats = corpus_stats(docs, postings)
    if cache:
        lengths, lexicon, stats = (
            lengths.persist(), lexicon.persist(), stats.persist()
        )
    return SearchIndex(postings, lengths, lexicon, stats)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
    index: SearchIndex | None = None,
) -> DataFrame:
    """Top-k documents for ``query`` by BM25: (doc_id, score, rank).

    score(d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  (Lucene variant,
    always ≥ 0 so a corpus-dominating term can't turn negative).

    Pass a prebuilt ``SearchIndex`` (the at-rest path) and the call is
    PURE PLAN CONSTRUCTION — corpus stats ride a broadcast 1-row table
    instead of driver collects, so repeated queries launch zero
    re-aggregation jobs; or pass ``postings`` to skip re-tokenizing only;
    otherwise the whole index is built in-plan from ``docs``.

    Only documents containing ≥1 query term are scored — the isin filter
    on the postings table prunes everything else before the first
    shuffle. Duplicate query terms count once (set semantics, the
    standard short-query behavior).
    """
    if index is not None:
        postings, lengths = index.postings, index.lengths
        lex_all, stats = index.lexicon, index.stats
    else:
        if postings is None:
            postings = build_postings(docs, id_col=id_col, text_col=text_col)
        lengths = doc_lengths(postings)
        lex_all = build_lexicon(postings)
        stats = corpus_stats(docs, postings)
    terms = sorted({t for t in _split_query(query) if t})
    if not terms:
        raise ValueError("query has no indexable terms")

    matched = postings.filter(F.col("term").isin(terms))
    lex = lex_all.filter(F.col("term").isin(terms))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        matched.join(F.broadcast(lex), "term")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    # top-k FIRST via TakeOrderedAndProject (per-partition heaps, no
    # global sort); the rank window then runs over ≤ k rows — a global
    # row_number window over all matches would funnel every matching doc
    # through one task.
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )


def _split_query(query: str) -> list[str]:
    import re

    return re.split("[^a-z]+", query.lower())


def positional_postings(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", min_len: int = 1) -> DataFrame:
    """Positional inverted index: (term, doc_id, positions array<int>),
    positions 0-based in the FILTERED token stream (empties dropped
    before positions are assigned, so adjacency means adjacency of real
    tokens). Same single map-side-combined groupBy shape as
    ``build_postings``; positions arrays are sorted so downstream
    intersections are order-stable."""
    tk = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda t: F.length(t) >= max(1, min_len),
    )
    toks = docs.select(F.col(id_col).alias("doc_id"), F.posexplode(tk).alias("pos", "term"))
    return toks.groupBy("term", "doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def phrase_topk(docs: DataFrame, phrase: str, k: int = 10,
                id_col: str = "doc_id", text_col: str = "text",
                postings: DataFrame | None = None) -> DataFrame:
    """Exact phrase search: top-k documents by occurrence count of the
    consecutive-token ``phrase``, ties broken by doc_id. Pass a prebuilt
    ``positional_postings`` table to search an at-rest index instead of
    re-tokenizing the corpus.

    Plan shape: the index is filtered to the phrase's terms FIRST (a
    literal isin that pushes into the scan — non-matching documents and
    terms never leave the files), then one slice per phrase offset joins
    on doc_id with its positions shifted by -offset; a phrase occurrence
    is a position surviving the n-way sorted-array intersection, all
    inside codegen. An n-term phrase costs n-1 doc-keyed joins of
    single-term posting slices — each a sliver of the index — not a
    corpus scan."""
    terms = [t for t in __import__("re").split("[^a-z]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("empty phrase")
    pp = (postings if postings is not None
          else positional_postings(docs, id_col=id_col, text_col=text_col))
    pp = pp.filter(F.col("term").isin(*set(terms)))
    out = None
    for i, t in enumerate(terms):
        sl = pp.filter(F.col("term") == t).select(
            "doc_id",
            F.transform("positions", lambda p: p - F.lit(i)).alias(f"s{i}"),
        )
        out = sl if out is None else out.join(sl, "doc_id")
    acc = F.col("s0")
    for i in range(1, len(terms)):
        acc = F.array_intersect(acc, F.col(f"s{i}"))
    return (
        out.select("doc_id", F.size(acc).alias("n_matches"))
        .filter(F.col("n_matches") > 0)
        .orderBy(F.desc("n_matches"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    kappa: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine
    any number of ranked retrieval lists into one hybrid ranking by
    rrf(d) = Σ_lists 1/(kappa + rank_d). The standard way to marry a
    lexical (BM25) and a dense (embedding-cosine) retriever — RRF needs
    no score calibration between the lists, only their ranks, which is
    why it is the default hybrid in production search stacks.

    Each input must carry (id_col, rank) with rank starting at 1. Output:
    (id_col, rrf, n_lists, rank) — top-k by fused score, doc-id tiebreak.

    Scale shape: the inputs are top-k lists (bounded rows), so every step
    here is metadata-sized: one union, one combinable agg, a
    TakeOrderedAndProject(k), and a rank window over ≤ k rows. The
    rounded 1/(kappa+rank) contributions are single correctly-rounded
    IEEE divisions, so any engine reproduces the fused scores bitwise.
    """
    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(kappa)) + F.col("rank").cast("double"))).alias(
                "c"
            ),
        )
        for df in ranked_lists
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    fused = allc.groupBy(id_col).agg(
        F.round(F.sum("c"), 9).alias("rrf"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    top = fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rrf", "n_lists", "rank"
    )
