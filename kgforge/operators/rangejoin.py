"""Banded interval (range) join.

Spark executes a plain non-equi join (``e.ts BETWEEN w.start AND w.end``)
as BroadcastNestedLoopJoin — O(|events| x |windows|) compared pairs, a
scale-killer the moment the windows side outgrows a broadcast. This
operator makes the range join an EQUI join by banding time into fixed
buckets:

1. each window is exploded to the buckets it overlaps (bounded window
   length => at most ceil(L/W)+1 rows, a small constant);
2. each probe row computes its single bucket;
3. an equi shuffle join on ``bucket`` (hash-partitioned, AQE-managed,
   map-side combinable) pairs only temporally-plausible rows;
4. the exact ``BETWEEN`` predicate filters inside the bucket.

That is the standard band-join strategy (cf. interval joins in stream
processors); shuffle volume scales with data + overlap, never |e| x |w|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    probe: DataFrame,
    windows: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Rows of ``probe`` paired with every window whose [start, end]
    (inclusive) contains ``ts``. ``bucket_seconds`` must be >= the maximum
    window length for the per-window explode to stay <= 2 buckets.

    Returns probe columns + the matched window's columns.
    """
    b = F.lit(bucket_seconds)
    w = windows.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    p = probe.withColumn("_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b))
    out = p.join(w, "_bucket").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return out.drop("_bucket")
