"""File-level min/max data skipping (sinks/materialize.py:
write_file_stats / pruned_read): pruned reads must equal full-scan
filters while opening strictly fewer files."""

from pyspark.sql import functions as F

from kgforge.sinks.materialize import (
    ManifestStore,
    pruned_read,
    write_file_stats,
    write_stage,
)


def _table(spark, tmp_path, n=1000, parts=8):
    df = spark.range(n).select(
        F.format_string("s%04d", F.col("id")).alias("subject"),
        (F.col("id") % 7).alias("v"),
    )
    ms = ManifestStore(str(tmp_path / "manifests"))
    path = str(tmp_path / "spo_s")
    write_stage(df, path, "s", "r1", ms, range_cols=["subject"], num_partitions=parts)
    return path


def test_stats_written_and_ranges_disjointish(spark, tmp_path):
    path = _table(spark, tmp_path)
    stats = spark.read.parquet(path + "_filestats").collect()
    assert len(stats) >= 4  # range partitioning produced multiple files
    for r in stats:
        assert r.min_subject <= r.max_subject


def test_point_lookup_prunes_and_matches_full_scan(spark, tmp_path):
    path = _table(spark, tmp_path)
    full = spark.read.parquet(path).filter(F.col("subject") == "s0123").collect()
    got = pruned_read(spark, path, "subject", "s0123").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, full))
    assert len(got) == 1
    # the pruned plan opened fewer files than exist
    stats = spark.read.parquet(path + "_filestats")
    n_files = stats.count()
    n_kept = stats.filter(
        ~((F.col("max_subject") < "s0123") | (F.col("min_subject") > "s0123"))
    ).count()
    assert 1 <= n_kept < n_files


def test_range_lookup_and_out_of_range(spark, tmp_path):
    path = _table(spark, tmp_path)
    full = (
        spark.read.parquet(path)
        .filter(F.col("subject").between("s0100", "s0199"))
        .count()
    )
    assert pruned_read(spark, path, "subject", "s0100", "s0199").count() == full == 100
    # predicate outside every file range -> empty, same schema
    empty = pruned_read(spark, path, "subject", "zzz")
    assert empty.count() == 0
    assert empty.columns == ["subject", "v"]


def test_fallback_without_stats(spark, tmp_path):
    df = spark.range(10).select(F.col("id").cast("string").alias("subject"))
    path = str(tmp_path / "nostats")
    df.write.parquet(path)
    got = pruned_read(spark, path, "subject", "3").collect()
    assert [r.subject for r in got] == ["3"]


def test_stats_refresh_on_rewrite(spark, tmp_path):
    path = _table(spark, tmp_path, n=100, parts=4)
    write_file_stats(path, spark, ["subject"])
    stats1 = spark.read.parquet(path + "_filestats").count()
    assert stats1 >= 2
