"""Distributed Bloom filter + Bloom-prefiltered incremental exact dedup.

The cross-snapshot hygiene primitive a rolling crawl needs: "which of this
batch's documents already exist in the accumulated corpus?" An exact
anti-join shuffles the WHOLE history every batch; a Bloom filter built
once over the history turns that into a map-side membership probe —
documents whose probe misses are provably new (Bloom filters have NO
false negatives), and only the small Bloom-positive remainder pays an
exact verification join. Output is therefore EXACT at any false-positive
rate; the FP rate only tunes how much of the batch reaches the join.

Scale notes: the bitmap is built with one pass over the history — k bit
positions per key computed JVM-side (xxhash64 with per-probe salt, so the
hash family is the engine's codegen hash, not Python), then a
per-partition numpy bitmap OR inside ``mapInPandas`` — and reduced on the
driver (num_partitions × m/8 bytes; at 10^12 keys use a multi-level
treeAggregate of the same partial bitmaps, same code shape). The
broadcast bitmap is m/8 bytes (1 GiB holds m=2^33 bits ≈ 10^9 keys at
~2% FP with k=7). The membership probe is an Arrow-batched pandas UDF
doing pure numpy bit indexing — no Python per row.

No reference counterpart (parser-shacl is per-file); this generalizes its
corpus hygiene to incremental operation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _positions(key_col, m_bits: int, k: int):
    """array<long> of the key's k Bloom bit positions, computed JVM-side:
    xxhash64(key, salt_i) mod m — codegen, deterministic, and identical
    between build and probe by construction."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = 1 << 23, k: int = 7
) -> np.ndarray:
    """One-pass distributed Bloom build over ``df[key_col]``; returns the
    m_bits/8-byte numpy uint8 bitmap (driver-held, broadcast by callers).
    Partial bitmaps are OR-reduced: associative + commutative, so the
    reduction tree's shape never changes the result."""
    assert m_bits % 8 == 0
    pos_df = df.select(_positions(F.col(key_col), m_bits, k).alias("pos"))

    def _partition_bitmap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        seen = False
        for b in batches:
            if len(b):
                seen = True
                p = np.concatenate(b["pos"].to_numpy())
                np.bitwise_or.at(bm, p // 8, np.uint8(1) << (p % 8).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = pos_df.mapInPandas(_partition_bitmap, "bm binary").collect()
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bm"], dtype=np.uint8)
    return out


def bloom_member_col(spark, key_col, bitmap: np.ndarray, k: int = 7):
    """Boolean column: MAY the key be in the set the bitmap was built over?
    False is definitive (no false negatives); True needs exact verify."""
    m_bits = bitmap.size * 8
    bc = spark.sparkContext.broadcast(bitmap)

    @pandas_udf("boolean")
    def _probe(pos: pd.Series) -> pd.Series:
        bm = bc.value
        if not len(pos):
            return pd.Series([], dtype=bool)
        # fixed fan-out k per row -> one (rows, k) matrix, pure numpy
        p = np.stack(pos.to_numpy())
        hit = (bm[p // 8] & (np.uint8(1) << (p % 8).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    return _probe(_positions(key_col, m_bits, k))


def incremental_exact_dedup(
    new_docs: DataFrame,
    old_docs: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 23,
    k: int = 7,
) -> DataFrame:
    """EXACT incremental dedup: rows of ``new_docs`` whose ``key_col`` does
    NOT appear in ``old_docs`` — identical output to the plain anti-join,
    but the history is touched once (Bloom build) instead of shuffled per
    batch, and the verification anti-join's probe side shrinks to the
    Bloom-positive sliver (true dups + FP-rate of the batch).

    The definitive-miss rows bypass the join entirely; Bloom-positive rows
    are verified with an exact left-anti join against the history keys, so
    false positives are corrected, never dropped silently."""
    spark = new_docs.sparkSession
    bitmap = build_bloom(old_docs, key_col, m_bits, k)
    flagged = new_docs.withColumn(
        "_maybe_dup", bloom_member_col(spark, F.col(key_col), bitmap, k)
    )
    definite_new = flagged.filter(~F.col("_maybe_dup")).drop("_maybe_dup")
    suspects = flagged.filter(F.col("_maybe_dup")).drop("_maybe_dup")
    old_keys = old_docs.select(F.col(key_col).alias("_k")).distinct()
    verified_new = suspects.join(
        old_keys, suspects[key_col] == old_keys["_k"], "left_anti"
    )
    return definite_new.unionByName(verified_new)
