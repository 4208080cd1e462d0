"""Negative sampling for KG-embedding training data.

Knowledge-graph embedding models (TransE / DistMult / ComplEx family) train
on (positive triple, k corrupted triples) batches; producing the corrupted
triples at corpus scale is a data-pipeline job, not a modeling job. This
module generates FILTERED negatives (Bordes et al. 2013 §3; "filtered
setting" of Bordes/Usunier): for each positive (s, p, o) and sample index
i ∈ 1..k, replace one side with a pseudo-random entity drawn uniformly from
the entity vocabulary, then anti-join away any corruption that happens to be
a true triple.

Determinism: the draw is md5(s ␟ p ␟ o ␟ i ␟ seed) mod |V| — md5 so a SQL
oracle (DuckDB) reproduces every draw bit-for-bit (the repo-wide
cross-engine-hash convention, cf. exact_duplicates in dedup.py). 15 hex
chars < 2^60 keeps the parse inside int64.

Scale:
- The entity vocabulary gets a dense 0-based index by sort order via
  `dense_index` — range partition + per-partition local rank + broadcast
  prefix-sum offsets. NEVER a global single-partition window: Spark's
  `row_number() OVER (ORDER BY ...)` with no partitionBy collapses the
  whole vocabulary onto one task. The per-partition counts collected to
  the driver are bounded metadata (one int per partition).
- Candidate generation is a map-side explode (k rows per positive); the
  only shuffles are the idx→entity lookup join (uniform by construction —
  hash-mod spreads over the whole vocabulary, no hot key) and the
  anti-join against positives (keyed by (s, p, o-candidate) — skew bounded
  by real graph skew, which AQE skew-join handles).
- After filtering, a positive can carry fewer than k negatives (that IS
  the filtered setting — callers wanting exactly-k should over-sample
  k' > k and window-truncate downstream).

The reference (parser-shacl) has no training-data surface; this extends the
corpus-scale KG-construction pipeline toward its consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dense_index", "negative_samples"]

_SEP = "\x1f"


def dense_index(df: DataFrame, col: str, num_parts: int | None = None) -> DataFrame:
    """(value, idx) with idx = 0-based rank of `value` in global sort order.

    Equivalent to ``row_number() OVER (ORDER BY col) - 1`` but scale-correct:
    repartitionByRange gives contiguous ascending ranges per partition id,
    a window partitioned BY partition id ranks locally, and broadcast
    prefix-sum offsets (one integer per partition — bounded driver
    metadata) lift local ranks to the global index. Duplicate values are
    collapsed first, so the rank is unambiguous.
    """
    spark = df.sparkSession
    p = num_parts or spark.sparkContext.defaultParallelism
    vals = df.select(F.col(col).alias("entity")).distinct().repartitionByRange(p, "entity")
    with_pid = vals.withColumn("_pid", F.spark_partition_id())
    counts = {r["_pid"]: r["cnt"] for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy("entity")
    return with_pid.select(
        "entity",
        (F.row_number().over(w) - 1 + off_map[F.col("_pid")]).cast("long").alias("idx"),
    )


def negative_samples(
    triples: DataFrame,
    k: int = 3,
    seed: int = 42,
    corrupt: str = "object",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Filtered negative samples: k deterministic corruptions per positive.

    Input: a triple DataFrame with string columns (s_col, p_col, o_col).
    Output: (s, p, o, sample_i, neg) — `neg` replaces the corrupted side
    (``corrupt`` = 'object' or 'subject'); corruptions equal to the original
    term or forming a true triple are filtered out.
    """
    if corrupt not in ("object", "subject"):
        raise ValueError(f"corrupt must be 'object' or 'subject', got {corrupt!r}")
    pos = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).distinct()
    vocab = pos.select(F.col("s").alias("entity")).unionByName(
        pos.select(F.col("o").alias("entity"))
    )
    indexed = dense_index(vocab, "entity")
    n = indexed.count()  # bounded scalar (vocabulary size)

    cands = pos.select(
        "s", "p", "o",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("sample_i"),
    ).withColumn("sample_i", F.col("sample_i").cast("long"))
    digest = F.md5(
        F.concat_ws(
            _SEP, F.col("s"), F.col("p"), F.col("o"),
            F.col("sample_i").cast("string"), F.lit(str(seed)),
        )
    )
    h = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    cands = cands.withColumn("_idx", F.pmod(h, F.lit(n)))
    cands = cands.join(indexed, cands["_idx"] == indexed["idx"]).select(
        "s", "p", "o", "sample_i", F.col("entity").alias("neg")
    )

    orig = "o" if corrupt == "object" else "s"
    cands = cands.filter(F.col("neg") != F.col(orig))
    if corrupt == "object":
        truth = pos.select(
            F.col("s").alias("_ts"), F.col("p").alias("_tp"), F.col("o").alias("_to")
        )
        cond = (
            (F.col("s") == F.col("_ts"))
            & (F.col("p") == F.col("_tp"))
            & (F.col("neg") == F.col("_to"))
        )
    else:
        truth = pos.select(
            F.col("s").alias("_ts"), F.col("p").alias("_tp"), F.col("o").alias("_to")
        )
        cond = (
            (F.col("neg") == F.col("_ts"))
            & (F.col("p") == F.col("_tp"))
            & (F.col("o") == F.col("_to"))
        )
    return cands.join(truth, cond, "left_anti")
