"""Mergeable cardinality sketches (HyperLogLog, Flajolet et al. 2007).

Distinct-count at 100 TB is a sketch problem: exact countDistinct shuffles
every distinct value, while an HLL register table is  m  integers per
stream that merges with a bucket-wise max — per-partition sketches, per-day
sketches, per-source sketches all combine without touching the data again.

This implementation is DETERMINISTIC and cross-engine replayable: the
value hash is the repo's md5-hex→int60 convention, bucket = h mod m,
rho = leading-zero count of the remaining (60-p)-bit field + 1 (computed
exactly via length(bin(w)) — no float log2 edge cases), so a DuckDB oracle
reproduces every register and the exact estimate, and a re-run over a
re-partitioned corpus produces the identical sketch (rand()-free).

Estimator: alpha_m · m² / Σ 2^-M[j] with the standard small-range
correction (E ≤ 2.5m and empty registers → linear counting m·ln(m/V)).
Absent buckets contribute 2⁻⁰ = 1, and a present register always has
rho ≥ 1, so V = m − present.

Scale: one map-side-combinable groupBy(bucket).max(rho) per sketch —
register tables are ≤ m rows regardless of corpus size; merging is the
same aggregate over unioned register tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_merge", "hll_estimate"]

# alpha_m for small m (HLL paper §4); >=128 uses the closed form
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_registers(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """(bucket, rho) register table — max rank per bucket, <= 2^p rows."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    width = 60 - p
    h = _hash60(F.col(col))
    bucket = F.pmod(h, F.lit(m))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union-of-streams sketch: bucket-wise max over register tables built
    with the same p. EXACT: merge(sketch(A), sketch(B)) == sketch(A ∪ B)."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """1-row (m, n_set, estimate) from a register table — computed in the
    plan (one aggregate + codegen arithmetic), no driver collect."""
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.agg(
        F.count("*").cast("long").alias("n_set"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
    )
    raw = F.lit(alpha * m * m) / (
        F.coalesce(F.col("_s"), F.lit(0.0)) + (F.lit(m) - F.col("n_set"))
    )
    zeros = F.lit(m) - F.col("n_set")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(F.lit(m).alias("m"), "n_set", est.alias("estimate"))
