"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969).

Scores blocked candidate pairs by the classic log-likelihood match weight:

    W(a, b) = Σ_fields  agree_f ? ln(m_f / u_f) : ln((1-m_f) / (1-u_f))

where m_f = P(field agrees | pair is a match) is supplied by the caller
(domain knowledge or offline EM), and u_f = P(field agrees | non-match) is
ESTIMATED FROM THE DATA as the exact random-pair agreement probability

    u_f = Σ_v n_v (n_v - 1) / (N (N - 1))

over the field's empirical value distribution — one groupBy per field, each
reduced to a single scalar (bounded driver metadata), clamped into
[ε, 1-ε] with ε = 1/(N(N-1)) so degenerate fields (all-distinct or
single-valued) can't produce infinite weights.

Pairs come from equality blocking on caller-chosen block columns (compose
with sorted_neighborhood_pairs / fuzzy_match_pairs for non-equality
blocking). Everything after the scalar u-estimation is pure codegen: one
self-equi-join on the block key + a per-pair CASE sum.

Scale: pair volume is Σ_blocks |block|² — the caller's blocking key choice
bounds it exactly as in every production linker; the u-estimation
aggregates are map-side-combinable counts. No Python UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["estimate_u_probabilities", "fellegi_sunter_scores"]


def estimate_u_probabilities(
    base: DataFrame, field_names: list[str], n_rows: int
) -> dict[str, float]:
    """Random-pair agreement probability per `_f_<name>` column, clamped to
    [ε, 1-ε], ε = 1/(N(N-1))."""
    denom = float(n_rows) * (n_rows - 1.0)
    eps = 1.0 / denom
    out = {}
    for name in field_names:
        row = (
            base.groupBy(f"_f_{name}")
            .agg(F.count("*").alias("_cnt"))
            .agg(F.sum(F.col("_cnt") * (F.col("_cnt") - 1)).alias("s"))
            .collect()[0]
        )
        u = (row["s"] or 0) / denom
        out[name] = min(max(u, eps), 1.0 - eps)
    return out


def fellegi_sunter_scores(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: dict[str, Column],
    m_probs: dict[str, float],
) -> DataFrame:
    """Score all within-block pairs (id_a < id_b).

    `fields`: name -> comparison-value Column over `df` (agreement =
    null-safe equality of the two sides' values). `m_probs`: name -> m_f.
    Output: id_a, id_b, agree_<name> (0/1) per field, match_weight.
    """
    if set(fields) != set(m_probs):
        raise ValueError("fields and m_probs must cover the same names")
    base = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        *[expr.alias(f"_f_{name}") for name, expr in fields.items()],
    )
    n = base.count()
    if n < 2:
        raise ValueError("need at least 2 rows to link")
    us = estimate_u_probabilities(base, list(fields), n)

    a, b = base.alias("a"), base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    pairs = a.join(b, cond).filter(F.col("a._id") < F.col("b._id"))

    agree_cols, weight = [], F.lit(0.0)
    for name in fields:
        m, u = m_probs[name], us[name]
        agree = F.col(f"a._f_{name}").eqNullSafe(F.col(f"b._f_{name}"))
        agree_cols.append(agree.cast("int").alias(f"agree_{name}"))
        weight = weight + F.when(
            agree, F.lit(math.log(m / u))
        ).otherwise(F.lit(math.log((1.0 - m) / (1.0 - u))))
    return pairs.select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        *agree_cols,
        weight.alias("match_weight"),
    )


def er_pairwise_eval(
    assignments: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred",
    truth_col: str = "truth",
) -> DataFrame:
    """Pairwise entity-resolution evaluation (the standard ER metric,
    Menestrina et al. 2010): precision / recall / F1 of a predicted
    clustering against a gold clustering, counted over item PAIRS —
    without ever materializing a pair. All three pair counts are sums of
    C(n,2) over group sizes: predicted groups, truth groups, and the
    (pred, truth) contingency cells, so the whole evaluation is three
    map-side-combinable aggregations over cluster-cardinality rows. This
    is how you score a 10^12-document dedup run: the naive pair join is
    O(Σ n²) rows; this is O(|clusters|).

    Returns ONE row: (n_items, pred_pairs, true_pairs, both_pairs,
    precision, recall, f1) — doubles rounded to 6, NULL when undefined
    (no positive pairs on that side).
    """
    a = assignments.select(
        F.col(id_col).alias("id"),
        F.col(pred_col).alias("pred"),
        F.col(truth_col).alias("truth"),
    )
    pairs = lambda n: (n * (n - F.lit(1))) / F.lit(2)  # noqa: E731
    n_items = a.agg(F.count(F.lit(1)).cast("bigint").alias("n_items"))
    pp = (
        a.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(pairs(F.col("n"))).cast("bigint").alias("pred_pairs"))
    )
    tp = (
        a.groupBy("truth").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(pairs(F.col("n"))).cast("bigint").alias("true_pairs"))
    )
    bp = (
        a.groupBy("pred", "truth").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(pairs(F.col("n"))).cast("bigint").alias("both_pairs"))
    )
    out = n_items.crossJoin(pp).crossJoin(tp).crossJoin(bp)
    prec = F.when(
        F.col("pred_pairs") > 0,
        F.round(F.col("both_pairs") / F.col("pred_pairs").cast("double"), 6),
    )
    rec = F.when(
        F.col("true_pairs") > 0,
        F.round(F.col("both_pairs") / F.col("true_pairs").cast("double"), 6),
    )
    return (
        out.withColumn("precision", prec)
        .withColumn("recall", rec)
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                F.round(
                    2 * F.col("precision") * F.col("recall")
                    / (F.col("precision") + F.col("recall")),
                    6,
                ),
            ),
        )
    )
