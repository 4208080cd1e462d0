"""Bloom-prefiltered incremental exact dedup: the no-false-negative
property, FP correction by exact verify, and equality with the plain
anti-join at adversarially tiny bitmap sizes."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_bloom_no_false_negatives(spark):
    from kgforge.operators.bloom import bloom_member_col, build_bloom

    docs = _docs(spark)
    bm = build_bloom(docs, "text", m_bits=1 << 16, k=5)
    probe = docs.withColumn(
        "hit", bloom_member_col(spark, F.col("text"), bm, k=5)
    )
    # every key that WAS inserted must probe positive
    assert probe.filter(~F.col("hit")).count() == 0


def test_bloom_rejects_most_unseen(spark):
    from kgforge.operators.bloom import bloom_member_col, build_bloom

    docs = _docs(spark)
    bm = build_bloom(docs, "text", m_bits=1 << 20, k=7)
    unseen = docs.select(
        F.concat(F.lit("UNSEEN-"), F.col("text")).alias("text")
    )
    hits = (
        unseen.withColumn("hit", bloom_member_col(spark, F.col("text"), bm, k=7))
        .filter(F.col("hit"))
        .count()
    )
    # generously sized bitmap: FP rate must be tiny (expected ~0)
    assert hits <= max(2, int(0.01 * docs.count()))


def _refetch_batch(docs):
    """Crawler re-fetch scenario: some pages replayed byte-identical (must
    dedup away), some genuinely changed (must survive)."""
    refetched = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    changed = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
    )
    return refetched.unionByName(changed)


def test_incremental_dedup_equals_anti_join(spark):
    from kgforge.operators.bloom import incremental_exact_dedup

    docs = _docs(spark)
    old = docs.select("doc_id", "text")
    new = _refetch_batch(docs)
    got = sorted(
        r["doc_id"] for r in incremental_exact_dedup(new, old).select("doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in new.join(
            old.select("text").distinct(), "text", "left_anti"
        ).select("doc_id").collect()
    )
    assert got == want and 0 < len(got) < new.count()


def test_incremental_dedup_exact_under_heavy_false_positives(spark):
    from kgforge.operators.bloom import incremental_exact_dedup

    docs = _docs(spark)
    old = docs.select("doc_id", "text")
    new = _refetch_batch(docs)
    # 64-bit bitmap: nearly everything probes positive -> the exact-verify
    # join must correct every false positive
    tiny = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(new, old, m_bits=64, k=2)
        .select("doc_id")
        .collect()
    )
    normal = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(new, old).select("doc_id").collect()
    )
    assert tiny == normal


def test_build_bloom_bitmap_is_union_of_partitions(spark):
    from kgforge.operators.bloom import build_bloom

    docs = _docs(spark)
    one = build_bloom(docs.coalesce(1), "text", m_bits=1 << 14, k=3)
    many = build_bloom(docs.repartition(16), "text", m_bits=1 << 14, k=3)
    assert np.array_equal(one, many)
