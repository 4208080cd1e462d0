"""Deterministic sequence packing: assign documents to fixed-token-budget
training bins by running token count, in stable doc-id order.

The pretraining packer concatenates documents into fixed-size training
sequences; the assignment step needs a GLOBAL running sum of token counts
in a stable order. The naive Spark expression —
``sum().over(Window.orderBy(id))`` with no partitionBy — collapses the
whole corpus into ONE window partition (Spark even warns), a guaranteed
single-task bottleneck at scale.

This operator computes the same global cumulative sum scalably, the
classic two-phase scan:

1. bucket documents by id range (``id // bucket_size`` — deterministic,
   data-independent, no layout dependence);
2. intra-bucket running sums via a window BOUNDED by the bucket
   (``partitionBy(bucket)`` — thousands of parallel window partitions);
3. bucket-level totals (a bucket-count-sized table) get their own
   exclusive running sum through the same window trick on the tiny
   table, then broadcast-join back as per-bucket offsets.

``bin_id = floor(cum_before / budget)`` — the streaming-packer rule: a
bin takes documents until their combined tokens reach the budget (the
last document may straddle; downstream chunking splits it). The output
is a pure function of (ids, token counts, budget): partition-layout-free
and exactly reproducible in one SQL window for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text_stats import token_count_col


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 100_000,
) -> DataFrame:
    """(id, n_tokens, cum_before, bin_id): global exclusive running token
    count in ``id`` order and the resulting budget-bin assignment."""
    base = docs.select(
        F.col(id_col), token_count_col(F.col(text_col)).alias("n_tokens")
    ).withColumn("_bucket", (F.col(id_col) / F.lit(bucket_size)).cast("bigint"))

    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = base.withColumn(
        "_cum_in", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )

    totals = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_tot"))
    w_b = (
        Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    )  # bucket table is bucket-count-sized: one window partition is FINE here
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("_bucket", "_offset")

    out = intra.join(F.broadcast(offsets), "_bucket").select(
        id_col,
        "n_tokens",
        (F.col("_cum_in") + F.col("_offset")).alias("cum_before"),
        F.floor((F.col("_cum_in") + F.col("_offset")) / F.lit(budget)).alias("bin_id"),
    )
    return out
