"""Feature-hashed linear text classifier: closed-form Naive-Bayes
log-odds training + broadcast weight-table scoring.

The fastText-style quality-classifier stage of a training-data pipeline
(CCNet / LLaMA-style "looks like Wikipedia" filters): documents are
bags of hashed token features, the model is one weight per hash bucket
plus a bias, the score is a dot product through a sigmoid. The reference
has no classifier surface; this extends the data-selection family
(``dsir.py``) with the *supervised* variant.

Training is CLOSED-FORM (multinomial Naive Bayes log-count ratios — the
"NB" half of NBSVM, Wang & Manning 2012): per bucket b,

    w_b = ln((pos_b + α) / (Σpos + α·B)) − ln((neg_b + α) / (Σneg + α·B))
    bias = ln(n_pos / n_neg)

which makes the whole fit three aggregations — no gradient loop, no
driver-side state beyond two scalar totals — and lets an ANSI-SQL oracle
replay the entire train+score path value-for-value.

Scale shape:

- Feature extraction is a codegen explode (tokens → md5-int64 buckets,
  the repo's cross-engine hash convention).
- Training = one groupBy(bucket, label) count (map-side combined; at
  most ``buckets`` result rows) + one 1-row totals aggregate (bounded
  scalar collect).
- Scoring = groupBy(doc, bucket) count, then a **broadcast** join
  against the ≤``buckets``-row weight table and a per-doc sum — the
  model table is always broadcast-sized by construction, so scoring
  cost is independent of corpus size beyond the one count shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_stats import _tokens_col

__all__ = ["nb_train_weights", "score_documents"]


def _bucket(col: Column, buckets: int) -> Column:
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"), F.lit(buckets)
    )


def _doc_buckets(docs: DataFrame, id_col: str, text_col: str, buckets: int) -> DataFrame:
    """(id, bucket, n) token-occurrence counts per hashed feature bucket."""
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(_tokens_col(F.col(text_col))).alias("__tok"),
    ).filter(F.col("__tok") != "")
    return (
        toks.select("__id", _bucket(F.col("__tok"), buckets).alias("__bucket"))
        .groupBy("__id", "__bucket")
        .agg(F.count("*").alias("__n"))
    )


def nb_train_weights(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> tuple[DataFrame, float]:
    """Fit NB log-count-ratio weights from a boolean ``label_col``.

    Returns (weights DataFrame (bucket, weight) with ≤ ``buckets`` rows —
    broadcast it into scoring — and the scalar class-prior bias). The two
    class token totals and document counts are the only driver-side
    values (bounded 1-row collects)."""
    lab = docs.select(
        F.col(id_col).alias("__id"), F.col(label_col).cast("boolean").alias("__y")
    )
    per_bucket = (
        _doc_buckets(docs, id_col, text_col, buckets)
        .join(lab, "__id")
        .groupBy("__bucket")
        .agg(
            F.sum(F.when(F.col("__y"), F.col("__n")).otherwise(F.lit(0))).alias("__pos"),
            F.sum(F.when(~F.col("__y"), F.col("__n")).otherwise(F.lit(0))).alias("__neg"),
        )
    )
    totals = per_bucket.agg(
        F.sum("__pos").alias("tp"), F.sum("__neg").alias("tn")
    ).collect()[0]
    tot_pos, tot_neg = float(totals["tp"] or 0), float(totals["tn"] or 0)
    n_pos, n_neg = (
        lab.agg(
            F.sum(F.col("__y").cast("long")).alias("p"),
            F.sum((~F.col("__y")).cast("long")).alias("n"),
        ).collect()[0]
    )
    if not n_pos or not n_neg:
        raise ValueError("nb_train_weights needs both classes present")
    weights = per_bucket.select(
        F.col("__bucket").alias("bucket"),
        (
            F.log((F.col("__pos") + alpha) / F.lit(tot_pos + alpha * buckets))
            - F.log((F.col("__neg") + alpha) / F.lit(tot_neg + alpha * buckets))
        ).alias("weight"),
    )
    return weights, math.log(n_pos / n_neg)


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    bias: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Score every document: (id, score, prob, keep). score = bias +
    Σ_b n_b·w_b (unseen buckets contribute 0 — their train-time smoothing
    mass is symmetric); prob = sigmoid(score), rounded so two engines
    agree bit-for-bit. Docs with no tokens score bias alone."""
    scored = (
        _doc_buckets(docs, id_col, text_col, buckets)
        .join(F.broadcast(weights.select(F.col("bucket").alias("__bucket"), "weight")), "__bucket", "left")
        .groupBy("__id")
        .agg(
            # order-free decimal reduction (see dsir_weights)
            F.sum(
                (F.col("__n") * F.coalesce(F.col("weight"), F.lit(0.0))).cast(
                    "decimal(38,12)"
                )
            )
            .cast("double")
            .alias("__dot")
        )
    )
    base = docs.select(F.col(id_col).alias("__id"))
    out = base.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.round(F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(bias), round_digits).alias("score"),
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))), round_digits)
    return out.select(
        id_col,
        "score",
        prob.alias("prob"),
        (prob >= threshold).alias("keep"),
    )
