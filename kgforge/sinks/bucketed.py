"""Bucketed table sink: co-located, shuffle-free joins for the hot keys.

The KG pipeline joins on the same keys over and over — triples on
``subject`` (validation, canonical-id substitution, incremental merges),
the entity mapping on ``node``. At 100 TB each such join is a full
corpus shuffle unless the storage layout already clusters by the key.
``bucketBy`` persists that clustering: both sides of a join written with
the SAME bucket count and key join with ZERO exchanges (Spark matches
bucket files pairwise), and a bucketed-vs-unbucketed join still skips
the bucketed side's shuffle.

This complements ``materialize.write_stage`` (repartitionByRange = file
pruning for range predicates); bucketing is the layout for repeated
EQUI-JOIN access. Reference parity note: the reference (a single-file
PHP parser, see /root/reference/src/ShaclParser.php) has no storage
layer at all — this module is pure scale infrastructure.

Bucket-count guidance at 100 TB: pick buckets so one bucket of the
LARGEST table is a few hundred MB (e.g. 65536 buckets for ~30 TB of
triples); all tables that join together must share the count, so set it
once per key domain and record it in the manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """saveAsTable with bucketBy (+ optional per-bucket sortBy). Bucketing
    requires the table catalog — a plain .parquet(path) write cannot
    record bucket metadata, which is why this sink exists separately.

    What the layout buys (asserted in tests/test_bucketed_sink.py): the
    join's Exchanges disappear on every bucketed side. Spark 4 still
    inserts partition-LOCAL Sorts above the scans (it no longer trusts
    bucket sort order from file counts — verified: the legacy
    bucketedTableScanOutputOrdering flag has no effect here); that sort
    is per-bucket, spillable, and tiny next to the shuffle it replaces,
    and the sortBy data layout keeps those sorts nearly-sorted-input
    cheap plus enables parquet row-group min/max pruning on the key."""
    # one file per bucket: repartition on the bucket key with the bucket
    # count (same Murmur3 hash partitioning Spark's bucketing uses). With
    # multiple files per bucket Spark discards the sortBy metadata and
    # re-sorts at read; with one file the SMJ consumes buckets as-is.
    df = df.repartition(n_buckets, *bucket_cols)
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two bucketed tables on their bucket key. When both were
    written by ``write_bucketed`` with the same ``n_buckets`` and
    ``bucket_cols == on``, the physical plan contains no Exchange on
    either side (asserted by tests/test_bucketed_sink.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
