"""J5/U1: shape-dict merge — later source wins on key collision
(reference: array_merge(base.shapes, enhanced), ShaclParser.php:62).

DataFrame formulation: union with a source-priority column, then keep the
highest-priority row per (url, uri) via a window — deterministic and
shuffle-minimal (single hash partition by key)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_shapes(base: DataFrame, enhanced: DataFrame, key_cols=("url", "uri")) -> DataFrame:
    """Rows from ``enhanced`` replace same-key rows from ``base``."""
    tagged = base.withColumn("_prio", F.lit(0)).unionByName(
        enhanced.withColumn("_prio", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("_prio").desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )
