"""KG-embedding link-prediction scoring and filtered ranking evaluation.

The canonical downstream consumer of this engine's triples is a KG-embedding
trainer (TransE, DistMult, ...); the standard evaluation protocol (Bordes et
al. 2013) ranks each test triple's true tail against every candidate entity,
excluding other known-positive tails ("filtered setting"), then reports
MRR / Hits@k. The reference parser stops at extraction; this module closes
the loop so the pipeline's output can be scored end-to-end.

Scale shape — the whole point of doing this in Spark:

- NO global sort to obtain ranks. rank(t) = 1 + |{e : s(h,r,e) > s(h,r,t)}|
  (ties broken by entity id), which is one scan of the candidate entity
  table per query batch + one agg keyed by test triple. At 10^9 entities
  that is a map-side-combined count, not a 10^9-row-per-query sort.
- the (small) test-triple side — with its h/r vectors and the true tail's
  score already attached — is broadcast; the big entity-embedding table
  streams through exactly once. Candidate scoring is pure codegen
  (zip_with + aggregate higher-order functions over array<double>), no
  Python in the loop.
- the filtered-setting exclusion is a broadcast left-anti-shaped flag join
  on (h, r, candidate) against the known-positives table (small relative
  to entities; at 10^12 triples you'd semi-join per relation partition).

Scores are rounded (default 6 digits) BEFORE comparison so independently
computed IEEE sums (Spark's sequential fold vs any other engine's) agree —
same regime the similarity operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def distmult_col(h, r, t):
    """DistMult score sum_d h_d * r_d * t_d as a codegen column expression
    (Yang et al. 2015). Sequential left fold — deterministic order."""
    hr = F.zip_with(_as_double(h), _as_double(r), lambda a, b: a * b)
    return F.aggregate(
        F.zip_with(hr, _as_double(t), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def transe_col(h, r, t):
    """TransE score -||h + r - t||_2 (Bordes et al. 2013): higher is
    better, like distmult_col, so one ranking implementation serves both."""
    diff = F.zip_with(
        F.zip_with(_as_double(h), _as_double(r), lambda a, b: a + b),
        _as_double(t),
        lambda a, b: a - b,
    )
    return -F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )


_SCORERS = {"distmult": distmult_col, "transe": transe_col}


def filtered_rank(
    test: DataFrame,
    entities: DataFrame,
    relations: DataFrame,
    positives: DataFrame,
    score: str = "distmult",
    round_digits: int = 6,
) -> DataFrame:
    """Filtered tail ranking: for each test triple (h, r, t) return
    (h, r, t, score, rank, rr, hit10) where rank counts candidate entities
    e with a strictly better rounded score (ties -> lower entity id wins),
    candidates being every entity EXCEPT other known-positive tails of
    (h, r) — the filtered setting of Bordes et al. 2013.

    test      : (h bigint, r bigint, t bigint)
    entities  : (ent bigint, emb array<float|double>)
    relations : (rel bigint, emb array<float|double>)
    positives : (h, r, t) known-true triples (test triples included)
    """
    scorer = _SCORERS[score]
    ent_h = entities.select(F.col("ent").alias("h"), F.col("emb").alias("_eh"))
    ent_t = entities.select(F.col("ent").alias("t"), F.col("emb").alias("_et"))
    rel = relations.select(F.col("rel").alias("r"), F.col("emb").alias("_er"))
    # queries: tiny — broadcast through every downstream join so the big
    # entity table is never shuffled
    q = (
        test.join(F.broadcast(ent_h), "h")
        .join(F.broadcast(rel), "r")
        .join(F.broadcast(ent_t), "t")
        .withColumn(
            "score", F.round(scorer(F.col("_eh"), F.col("_er"), F.col("_et")), round_digits)
        )
        .select("h", "r", "t", "_eh", "_er", "score")
    )
    # one streaming pass over entities: score every (query, candidate) pair
    cand = (
        entities.select(F.col("ent").alias("e"), F.col("emb").alias("_ee"))
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cscore", F.round(scorer(F.col("_eh"), F.col("_er"), F.col("_ee")), round_digits)
        )
    )
    # filtered setting: drop candidates that are OTHER known-positive tails
    pos = positives.select("h", "r", F.col("t").alias("e"), F.lit(True).alias("_pos"))
    cand = cand.join(F.broadcast(pos), ["h", "r", "e"], "left").filter(
        (F.col("e") == F.col("t")) | F.col("_pos").isNull()
    )
    better = (F.col("cscore") > F.col("score")) | (
        (F.col("cscore") == F.col("score")) & (F.col("e") < F.col("t"))
    )
    out = (
        cand.groupBy("h", "r", "t", "score")
        .agg((F.lit(1) + F.sum(F.when(better, 1).otherwise(0))).cast("bigint").alias("rank"))
        .withColumn("rr", F.lit(1.0) / F.col("rank"))
        .withColumn("hit10", (F.col("rank") <= 10).cast("int"))
    )
    return out.select("h", "r", "t", "score", "rank", "rr", "hit10")


def kge_metrics(ranks: DataFrame) -> DataFrame:
    """(rank) rows -> one row (n, mrr, hits1, hits10). Single partial-final
    agg; suitable as the last stage after filtered_rank."""
    return ranks.agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg(F.lit(1.0) / F.col("rank")).alias("mrr"),
        F.avg((F.col("rank") <= 1).cast("double")).alias("hits1"),
        F.avg((F.col("rank") <= 10).cast("double")).alias("hits10"),
    )
