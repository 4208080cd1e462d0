"""As-of join — an operator Spark lacks natively (guide: "As-of / range
join"), expressed as a composition of built-in DataFrame ops (no UDF).

``asof_join(left, right, ...)``: for each left row, attach the most recent
right row with ``right_ts <= left_ts`` per key (backward direction,
inclusive). Implementation is the classic union trick:

    tag left rows 1 / right rows 0, union on (key, ts, tag),
    last(value, ignorenulls) over (partition key order ts, tag
    rows unbounded-preceding..current), keep tag==1 rows.

One shuffle + one window sort — same cost envelope as a sort-merge join;
skew on hot keys is handled by AQE like any other window/sort. An
``applyInPandas`` + ``pd.merge_asof`` per key group is the alternative when
tolerance/nearest semantics are needed; this built-in form stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns left's columns plus, for each of ``value_cols``, the value from
    the latest right row with ``right_ts <= left_ts`` matching ``on``
    (null when no such row exists). ``tiebreakers`` (right-side columns)
    make the pick deterministic among right rows sharing a timestamp —
    the max tiebreaker wins.
    """
    from pyspark.sql.types import StructField, StructType

    tiebreakers = tiebreakers or []
    lcols = left.columns
    clashes = [v for v in value_cols if v in lcols and v not in on]
    if clashes:
        raise ValueError(
            f"value_cols {clashes} collide with left columns — alias them on the right side first"
        )

    # All value columns (plus tiebreakers, for a deterministic pick among
    # equal-ts right rows) travel as ONE struct, and ONE last(ignorenulls)
    # picks it: per-column last() would compose the output from DIFFERENT
    # right rows whenever the latest row holds a null in some value column —
    # pd.merge_asof / SQL semantics pick one whole row.
    vs_type = StructType(
        [StructField(v, right.schema[v].dataType, True) for v in value_cols]
    )
    l = (
        left.withColumn("_tag", F.lit(1))
        .withColumn("_ts", F.col(left_ts))
        .withColumn("_vs", F.lit(None).cast(vs_type))
    )
    for t in tiebreakers:
        l = l.withColumn(f"_tb_{t}", F.lit(None).cast(right.schema[t].dataType))

    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(v).alias(v) for v in value_cols]).alias("_vs"),
        *[F.col(t).alias(f"_tb_{t}") for t in tiebreakers],
    )
    for c in lcols:
        if c not in on and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    carry = ["_ts", "_tag", "_vs", *[f"_tb_{t}" for t in tiebreakers]]
    combined = l.select(*lcols, *carry).unionByName(r.select(*lcols, *carry))

    w = (
        Window.partitionBy(*on)
        # right rows (tag 0) sort before left at equal ts: inclusive match;
        # among equal-ts right rows the max tiebreaker lands last in frame
        .orderBy("_ts", "_tag", *[f"_tb_{t}" for t in tiebreakers])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = combined.withColumn("_vs", F.last("_vs", ignorenulls=True).over(w))
    return (
        out.filter(F.col("_tag") == 1)
        .select(*lcols, *[F.col(f"_vs.{v}").alias(v) for v in value_cols])
    )
