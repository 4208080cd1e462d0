"""Skew- and shuffle-aware join strategies as first-class operators.

The north rule demands partitioning / shuffle / skew handled EXPLICITLY.
Most of this engine leans on AQE's runtime skew-join split (the right
default); these two operators are the cases where an explicit strategy
beats AQE:

- ``salted_join`` — pre-shuffle key salting for joins whose hot keys are
  KNOWN up front (e.g. a canonical entity that owns 1% of all triples):
  the big side gets a deterministic salt in [0, salt), the small side is
  exploded salt times, and the join key becomes (key, salt) — the hot
  key's rows now land on ``salt`` reducers instead of one. AQE can only
  split a skewed partition AFTER materializing its shuffle files;
  salting spreads the write path too. Result-identical to the plain
  join by construction (every left row meets every matching right row
  exactly once — its own salt's copy).

- ``bloom_semijoin`` — semi-join reduction via a broadcast Bloom filter
  (the classic distributed-DB technique, e.g. Bloom joins in R*): when
  the probe side is huge and the build side is small-ish but over the
  broadcast threshold, a bitmap of the build keys costs m/8 bytes
  broadcast and lets the probe side drop non-matching rows BEFORE the
  shuffle; the exact join afterwards removes the false positives, so
  the result is exactly the plain semi-join. Use when the join
  selectivity is low (most probe rows match nothing) — the shuffle
  shrinks by ~the miss rate.

Reference parity note: the reference is a single-file parser with no
join layer at all; these exist for the corpus-scale pipeline around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgforge.operators.bloom import bloom_member_col, build_bloom


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` (large, possibly hot-keyed) with ``right`` (small
    enough to replicate ``salt``×) on ``on``, spreading every key across
    ``salt`` reducers.

    The left salt is ``pmod(xxhash64(<key>, monotonically_increasing_id()),
    salt)`` — deterministic per task attempt, arbitrary per row, which is
    all correctness needs (any left row joins the one replicated right
    copy carrying its salt). Supported ``how``: inner, left, left_semi —
    the shapes where replication can't duplicate results.

    Scale shape: right grows ``salt``×(rows) BEFORE its shuffle — keep
    salt ≤ ~32 and the right side dimension-sized. The win: a key holding
    p% of left rows caps its largest reducer at p/salt% instead of p%.
    """
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(f"salted_join supports inner/left/left_semi, got {how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
            F.lit(int(salt)),
        ).cast("int"),
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(int(salt))]))
    )
    out = l.join(r, keys + ["__salt"], how)
    return out.drop("__salt")


def bloom_semijoin(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = 1 << 23,
    k: int = 7,
) -> DataFrame:
    """Exact left-semi join of ``probe`` against ``build`` keys, with a
    broadcast Bloom prefilter cutting the probe-side shuffle first.

    Two stages: (1) a one-pass distributed Bloom build over the build
    keys (numpy bitmap, OR-reduced, driver-held m/8 bytes, broadcast);
    (2) probe rows failing the bitmap drop map-side (no false negatives,
    so nothing correct is lost), survivors go through the exact
    left-semi join that removes the bitmap's false positives. The result
    is therefore EXACTLY ``probe.join(build, key, "left_semi")`` at a
    fraction of the shuffle.
    """
    build_key = build_key or probe_key
    # both sides hash/compare as STRING so the Bloom positions and the
    # exact join agree regardless of the columns' native types
    bkeys = build.select(F.col(build_key).cast("string").alias("__bk")).distinct()
    bitmap = build_bloom(bkeys, "__bk", m_bits=m_bits, k=k)
    spark = probe.sparkSession
    maybe = probe.filter(
        bloom_member_col(spark, F.col(probe_key).cast("string"), bitmap, k=k)
    )
    return maybe.join(
        bkeys,
        maybe[probe_key].cast("string") == F.col("__bk"),
        "left_semi",
    )
