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

__all__ = [
    "bottomk_sample",
    "cms_lookup",
    "cms_table",
    "histogram_merge",
    "histogram_quantiles",
    "hll_estimate",
    "hll_estimate_by",
    "hll_merge",
    "hll_registers",
    "hll_registers_by",
    "log_histogram",
    "weighted_sample",
]

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


def hll_registers_by(
    df: DataFrame, group_cols: list[str], col: str, p: int = 6
) -> DataFrame:
    """GROUPED register tables: (group..., bucket, rho), <= 2^p rows per
    key — the per-key cardinality sketch (distinct URLs per host,
    distinct tokens per language). Same determinism and merge algebra as
    the global sketch: per-shard grouped tables merge with a bucket-wise
    max per key; the agg is map-side combinable on (group, bucket)."""
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
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_by(
    registers: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """(group..., m, n_set, estimate) per key from a grouped register
    table — identical estimator arithmetic to hll_estimate (incl. the
    small-range linear-counting branch), one combinable agg per key."""
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_set"),
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
    return agg.select(
        *group_cols, F.lit(m).alias("m"), "n_set", est.alias("estimate")
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


def cms_table(df: DataFrame, col: str, depth: int = 3, width: int = 256) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): a depth×width
    counter table — (row, pos, cnt), <= depth·width rows at any corpus
    size, built by one map-side-combinable groupBy over a depth-way
    explode. Merge = elementwise sum (union the tables, groupBy sum).
    Deterministic row hashes (md5(v ␟ row)) make the sketch replayable."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    rows = df.filter(F.col(col).isNotNull()).select(
        F.col(col).alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    pos = F.pmod(
        _hash60(F.concat_ws("\x1f", F.col("_v"), F.col("row").cast("string"))),
        F.lit(width),
    )
    return (
        rows.select("row", pos.alias("pos"))
        .groupBy("row", "pos")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame, keys: DataFrame, key_col: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Point-frequency estimates: est = min over rows of the key's counter
    (>= true count, never under). The sketch is <= depth·width rows, so the
    probe join broadcasts it regardless of how many keys are probed."""
    probes = keys.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    pos = F.pmod(
        _hash60(F.concat_ws("\x1f", F.col(key_col), F.col("row").cast("string"))),
        F.lit(width),
    )
    probes = probes.withColumn("pos", pos)
    joined = probes.join(F.broadcast(cms), ["row", "pos"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("_c")
    )
    return joined.groupBy(key_col).agg(F.min("_c").cast("long").alias("est"))


def bottomk_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Mergeable uniform sample WITHOUT a shuffle of the corpus: keep the k
    rows with the smallest md5(key) — a bottom-k (KMV) sketch, so
    bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) exactly and samples
    from different partitions/days combine losslessly. Compiles to
    TakeOrderedAndProject (per-partition heaps), never a global sort.
    Deterministic: same corpus → same sample, any partitioning."""
    h = _hash60(F.col(key_col).cast("string"))
    return (
        df.withColumn("_h", h)
        .orderBy(F.col("_h"), F.col(key_col))
        .limit(k)
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis 2006):
    each row gets key u^(1/w) with u = deterministic md5-uniform(0,1); the
    k LARGEST keys are a weighted sample without replacement — the
    one-pass, mergeable, shuffle-free generalization of bottomk_sample
    (same TakeOrderedAndProject plan). Rows with weight <= 0 are excluded
    (their inclusion probability is 0). Deterministic: same corpus and
    weights → same sample under any partitioning."""
    u = (
        _hash60(F.col(key_col).cast("string")).cast("double") + 0.5
    ) / F.lit(float(1 << 60))
    es_key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_es_key", es_key)
        .orderBy(F.desc("_es_key"), F.col(key_col))
        .limit(k)
    )


def log_histogram(df: DataFrame, col: str, precision: int = 16) -> DataFrame:
    """Mergeable log-scale histogram (HDR-histogram-style) over a
    non-negative integer column -> (bucket bigint, n bigint).

    Bucketing (``precision`` = 2^b sub-buckets per power of two — a fixed
    <= 1/precision relative error at any magnitude): value v >= 1 lands in
    bucket e*precision + sub, where e = floor(log2(v)) is computed EXACTLY
    as length(bin(v)) - 1 (never a float log — cross-engine log2 rounding
    at power-of-two boundaries would shift a bucket), and sub is the b
    bits directly below the leading bit, read straight out of the binary
    string: conv(rpad(substring(bin(v), 2, b), b, '0'), 2, 10). 0 -> bucket
    -1; NULL/negative rows are dropped. Pure integer/string arithmetic —
    any engine replays it bit-identically (the DuckDB twin can use
    (v * precision) // (1 << e) - precision, the same value).

    Scale: ONE map-side-combinable groupBy — the table is <= 64*precision
    rows whatever the corpus size; per-shard/per-day histograms merge by
    summing n on bucket (same property the HLL register table has).
    """
    b = precision.bit_length() - 1
    if precision <= 0 or (1 << b) != precision:
        raise ValueError("precision must be a power of two")
    v = F.col("_lh_v")
    e = (F.length(F.bin(v)) - 1).cast("bigint")
    sub = F.conv(F.rpad(F.substring(F.bin(v), 2, b), b, "0"), 2, 10).cast("bigint")
    bucket = F.when(v < 1, F.lit(-1)).otherwise(e * precision + sub).cast("bigint")
    return (
        df.select(F.col(col).cast("bigint").alias("_lh_v"))
        .filter(v.isNotNull() & (v >= 0))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def histogram_merge(*tables: DataFrame) -> DataFrame:
    """Union per-shard histograms and re-sum — the mergeability property."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.sum("n").cast("bigint").alias("n"))


def histogram_quantiles(
    hist: DataFrame, qs: tuple[float, ...] = (0.5, 0.9, 0.99), precision: int = 16
) -> DataFrame:
    """(bucket, n) -> (q, est): quantile estimates from the histogram —
    the bucket's LOWER BOUND value (2^(bucket div precision) *
    (1 + (bucket mod precision)/precision); bucket -1 -> 0), i.e. a
    deterministic under-estimate within 1/precision relative error.

    Plan: one window cumsum over the (tiny, <= 64*precision-row) histogram
    — a single-partition sort of sketch rows, never of data rows — then a
    min() per requested quantile. Cross-engine determinism: rank
    boundaries are integer counts, bounds are exact dyadic doubles.
    """
    from pyspark.sql import Window

    total = hist.agg(F.sum("n").alias("_tot"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("_cum", F.sum("n").over(w)).crossJoin(F.broadcast(total))
    lo = F.when(F.col("bucket") < 0, F.lit(0.0)).otherwise(
        F.pow(F.lit(2.0), F.floor(F.col("bucket") / precision))
        * (F.lit(1.0) + (F.col("bucket") % precision).cast("double") / precision)
    )
    parts = []
    for q in qs:
        parts.append(
            cum.filter(F.col("_cum") >= F.ceil(F.col("_tot") * F.lit(q)))
            .agg(F.min(lo).alias("est"))
            .select(F.lit(q).alias("q"), "est")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
