"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Scores every raw document by how target-like it is under two smoothed
bag-of-hashed-n-gram language models: the importance weight is

    w(doc) = log p_target(doc) - log p_raw(doc)
           = Σ_buckets n_doc(b) · [ log p_t(b) - log p_r(b) ]

with unigram+bigram features hashed into a fixed number of buckets and
Laplace smoothing (α=1) on both distributions. Positive weight = more
target-like than the corpus average; downstream selection keeps top-k by
weight or samples ∝ exp(w) (Gumbel top-k). Here the target model is fit on
an in-corpus proxy subset (a boolean column — e.g. lang='en', a quality
flag, or a curated-domain marker), which is exactly how DSIR is run in
practice when the target is "pages that look like Wikipedia/books".

Hashing is md5-hex→int64 (the repo's cross-engine convention) so a DuckDB
oracle replays every bucket assignment bit-for-bit.

Scale:
- Gram explode is map-side; the heavy shuffle is one groupBy(doc, bucket)
  count — the same shape as TF-IDF's term count, partial-aggregated
  map-side by Catalyst.
- The bucket statistics table is at most `buckets` rows (default 4096):
  broadcast to the per-doc join, so scoring is one broadcast hash join +
  one final per-doc sum, no matter the corpus size.
- Model totals are two bounded scalars (one 1-row aggregate job).

The reference has no data-selection surface; this is part of the
training-data-pipeline tier built on top of KG construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_stats import _tokens_col, token_count_col, word_ngrams_col

__all__ = ["dsir_weights", "gumbel_topk"]


def _bucket(col: Column, buckets: int) -> Column:
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"), F.lit(buckets)
    )


_TWO60 = float(1 << 60)
_SEP = "\x1f"


def gumbel_topk(
    weights: DataFrame,
    k: int,
    seed: int = 7,
    id_col: str = "doc_id",
    weight_col: str = "dsir_weight",
    temperature: float = 1.0,
) -> DataFrame:
    """Deterministic Gumbel-top-k resampling (Kool et al. 2019): taking the
    k largest of w/T + Gumbel(0,1) samples k documents WITHOUT replacement
    with probability ∝ exp(w/T) — the DSIR paper's selection step. The
    Gumbel draw is -ln(-ln(u)) with u = (md5-hash(id ␟ seed) + 0.5) / 2^60,
    so the sample is reproducible across engines and resumable across runs.

    Scale: a global top-k compiles to TakeOrderedAndProject (per-partition
    heaps + one k-row driver merge), never a full sort. Ties break by id.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(_SEP, F.col(id_col).cast("string"), F.lit(str(seed)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(_TWO60)
    gumbel = -F.log(-F.log(u))
    score = F.col(weight_col) / F.lit(float(temperature)) + gumbel
    return (
        weights.select(id_col, weight_col, score.alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def dsir_weights(
    docs: DataFrame,
    target: Column,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_grams, dsir_weight) for every input document.

    `target` is a boolean Column over `docs` marking the rows the target
    n-gram model is fit on. Documents with no tokens get n_grams=0 and
    weight 0.0.
    """
    base = docs.select(F.col(id_col), F.col(text_col), target.alias("_is_tgt"))
    tk = _tokens_col(F.col(text_col))
    n = token_count_col(F.col(text_col))
    grams_arr = (
        F.when(n >= 2, F.concat(tk, word_ngrams_col(tk, n, 2)))
        .when(n >= 1, tk)
        .otherwise(F.array().cast("array<string>"))
    )
    grams = base.select(
        id_col, "_is_tgt", F.explode(grams_arr).alias("_g")
    ).withColumn("_b", _bucket(F.col("_g"), buckets))

    totals = grams.agg(
        F.count("*").alias("n_raw"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0)).alias("n_tgt"),
    ).collect()[0]
    n_raw, n_tgt = totals["n_raw"] or 0, totals["n_tgt"] or 0

    stats = grams.groupBy("_b").agg(
        F.count("*").alias("_cr"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0)).alias("_ct"),
    )
    # Laplace α=1: log p_t(b) - log p_r(b) with bucket-count smoothing
    lr = (
        F.log(F.col("_ct") + 1.0)
        - F.log(F.lit(float(n_tgt + buckets)))
        - F.log(F.col("_cr") + 1.0)
        + F.log(F.lit(float(n_raw + buckets)))
    )
    stats = stats.select("_b", lr.alias("_lr"))

    doc_bucket = grams.groupBy(id_col, "_b").agg(F.count("*").alias("_n"))
    scored = (
        doc_bucket.join(F.broadcast(stats), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_n").cast("long").alias("n_grams"),
            # order-free reduction: each per-bucket contribution rounds
            # once to decimal(38,12), decimal addition is exact — the 6-dp
            # compare cannot flip with summation order
            F.sum((F.col("_n") * F.col("_lr")).cast("decimal(38,12)"))
            .cast("double")
            .alias("dsir_weight"),
        )
    )
    return (
        base.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("dsir_weight", F.lit(0.0)).alias("dsir_weight"),
        )
    )
