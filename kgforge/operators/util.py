"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions than
    the cluster has cores.

    Compute-heavy column work (minhash signatures, shingle transforms,
    hyperplane projections) inherits the scan's partitioning; a small
    single-file parquet table arrives as 1 partition and serializes the whole
    operator on one core. At real corpus scale (files >> maxPartitionBytes)
    the scan already yields >= cores partitions and this is a no-op — so the
    shuffle cost is only ever paid on inputs small enough for it to be cheap.
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
