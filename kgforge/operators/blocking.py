"""Sorted-neighborhood blocking for entity resolution (Hernández & Stolfo
1995): sort all records by a blocking key, then emit every pair within a
fixed window of positions — the complement to hash-style blocking (MinHash
LSH, FastSS) for typo-heavy keys where similar records sort adjacently.

Scale: the global sort index is computed the scale-correct way — range
partition + per-partition local rank + broadcast prefix-sum offsets (one
integer of driver metadata per partition), never a single-partition global
window. Pair generation is an equi-join on window-sized position blocks
(each left row probes its own block and the next one), so a pair at
position distance <= w is found exactly once and the join never degenerates
into a range cross-join. Shuffle volume is O(rows), pair volume is
O(rows * w).

The caller's key should be a normalized blocking key (lowercased, stripped,
possibly phonetic); ties sort deterministically by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_index", "sorted_neighborhood_pairs"]


def global_row_index(df: DataFrame, order_by: list[str], num_parts: int | None = None) -> DataFrame:
    """Adds `_idx` = 0-based position of each row in the global sort order
    of `order_by` (which must be a total order — include a unique tiebreak).
    Same offsets technique as negatives.dense_index, generalized to rows."""
    spark = df.sparkSession
    p = num_parts or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(p, *[F.col(c) for c in order_by])
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_by])
    return with_pid.withColumn(
        "_idx", (F.row_number().over(w) - 1 + off_map[F.col("_pid")]).cast("long")
    ).drop("_pid")


def sorted_neighborhood_pairs(
    df: DataFrame, id_col: str, key_col: str, window: int = 3
) -> DataFrame:
    """Every pair of rows within `window` positions in the (key, id) sort
    order. Output: id_a, id_b, key_a, key_b, pos_dist (0 < pos_dist <= window),
    with id_a the earlier-sorted row."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    base = df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_key"))
    idxd = global_row_index(base, ["_key", "_id"])
    blocked = idxd.withColumn("_blk", (F.col("_idx") / window).cast("long"))
    left = blocked.withColumn(
        "_probe", F.explode(F.array(F.col("_blk"), F.col("_blk") + 1))
    )
    a, b = left.alias("a"), blocked.alias("b")
    return (
        a.join(b, F.col("a._probe") == F.col("b._blk"))
        .filter(
            (F.col("b._idx") > F.col("a._idx"))
            & (F.col("b._idx") - F.col("a._idx") <= window)
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._key").alias("key_a"),
            F.col("b._key").alias("key_b"),
            (F.col("b._idx") - F.col("a._idx")).alias("pos_dist"),
        )
    )
