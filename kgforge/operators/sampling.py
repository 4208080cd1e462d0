"""Deterministic sampling for training-corpus assembly.

A pretraining pipeline needs reproducible subsampling: the same corpus +
the same config must yield byte-identical samples across reruns, engines,
and cluster sizes (resume/lineage depends on it). Spark's ``DataFrame
.sample`` is seed-stable only per partitioning, so these operators derive
keep decisions from the ROW KEY alone via an arithmetic hash (Knuth
multiplicative), never from partition layout:

- ``hash_sample``: keep rows whose key-hash falls under fraction * 2^32 —
  a single codegen filter, no shuffle, scale-free.
- ``stratified_sample``: exact per-stratum counts — rank rows inside each
  stratum by key-hash and keep ceil(fraction * stratum_size). One window
  per stratum (sort by int64, map-side light); for 100-TB strata switch
  to hash_sample whose expected (not exact) rate needs no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_KNUTH = 2654435761  # 2^32 / golden ratio, odd -> bijective mod 2^32
_M32 = 4294967296


def sample_hash_col(key: str = "doc_id"):
    """int64 Knuth multiplicative hash of an integer key column — identical
    arithmetic is expressible in ANSI SQL for oracle parity."""
    return (F.col(key).cast("long") * F.lit(_KNUTH)) % F.lit(_M32)


def hash_sample(df: DataFrame, fraction: float, key: str = "doc_id") -> DataFrame:
    """Keep ~fraction of rows, decided per-row from the key hash only."""
    return df.filter(sample_hash_col(key) < F.lit(int(fraction * _M32)))


def stratified_sample(
    df: DataFrame, strata: str, fraction: float, key: str = "doc_id"
) -> DataFrame:
    """Exact-count stratified sample: ceil(fraction * n) rows per stratum,
    chosen as the lowest key-hashes (deterministic, engine-independent)."""
    w = Window.partitionBy(strata).orderBy(sample_hash_col(key).asc(), F.col(key).asc())
    cnt = Window.partitionBy(strata)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_take", F.ceil(F.count("*").over(cnt) * F.lit(fraction)))
        .filter(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
    )
