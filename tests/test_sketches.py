"""HLL sketch: Python register pin, merge exactness, estimate accuracy."""

import hashlib
import math

import pytest


def _py_registers(values, p):
    m = 1 << p
    width = 60 - p
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        b = h % m
        w = h >> p
        rho = (width + 1) if w == 0 else (width + 1 - w.bit_length())
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_registers_match_python(spark):
    from kgforge.operators.sketches import hll_registers

    vals = [f"tok{i}" for i in range(300)] + ["tok0", "tok1"]  # dupes no-op
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["bucket"]: r["rho"] for r in hll_registers(df, "v", p=6).collect()}
    assert got == _py_registers(set(vals), 6)


def test_merge_equals_union_sketch(spark):
    from kgforge.operators.sketches import hll_merge, hll_registers

    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(150)], "v string")
    u = a.unionByName(b)
    merged = {
        r["bucket"]: r["rho"]
        for r in hll_merge(hll_registers(a, "v"), hll_registers(b, "v")).collect()
    }
    direct = {r["bucket"]: r["rho"] for r in hll_registers(u, "v").collect()}
    assert merged == direct


@pytest.mark.parametrize("n", [100, 1000, 5000])
def test_estimate_accuracy(spark, n):
    from kgforge.operators.sketches import hll_estimate, hll_registers

    df = spark.createDataFrame([(f"item-{i}",) for i in range(n)], "v string")
    row = hll_estimate(hll_registers(df, "v", p=6), p=6).collect()[0]
    # sigma ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert row["estimate"] == pytest.approx(n, rel=0.4)
    assert row["m"] == 64


def test_estimate_small_range_correction(spark):
    from kgforge.operators.sketches import hll_estimate, hll_registers

    df = spark.createDataFrame([(f"x{i}",) for i in range(10)], "v string")
    row = hll_estimate(hll_registers(df, "v", p=6), p=6).collect()[0]
    # linear-counting branch: m * ln(m / empty)
    empty = 64 - row["n_set"]
    assert empty > 0
    assert row["estimate"] == pytest.approx(64 * math.log(64 / empty), abs=1e-9)


def _py_cms_pos(v, row, width):
    return int(hashlib.md5(f"{v}\x1f{row}".encode()).hexdigest()[:15], 16) % width


def test_cms_never_underestimates_and_matches_python(spark):
    from kgforge.operators.sketches import cms_lookup, cms_table

    vals = ["a"] * 40 + ["b"] * 10 + [f"rare{i}" for i in range(60)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    cms = cms_table(df, "v", depth=3, width=32)
    # python reference counters
    counters = {}
    for v in vals:
        for row in range(3):
            key = (row, _py_cms_pos(v, row, 32))
            counters[key] = counters.get(key, 0) + 1
    got_tab = {(r["row"], r["pos"]): r["cnt"] for r in cms.collect()}
    assert got_tab == counters
    keys = spark.createDataFrame([(v,) for v in set(vals)], "v string")
    est = {r["v"]: r["est"] for r in cms_lookup(cms, keys, "v", depth=3, width=32).collect()}
    true = {v: vals.count(v) for v in set(vals)}
    for v in true:
        assert est[v] >= true[v]
        assert est[v] == min(
            counters.get((row, _py_cms_pos(v, row, 32)), 0) for row in range(3)
        )
    # heavy hitter estimated within the CMS epsilon bound (e·N, e = e/width)
    assert est["a"] - true["a"] <= math.ceil(math.e / 32 * len(vals))


def test_cms_merge_is_elementwise_sum(spark):
    from pyspark.sql import functions as F

    from kgforge.operators.sketches import cms_table

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, "v string")
    b = spark.createDataFrame([("x",)] * 3 + [("z",)] * 4, "v string")
    merged = (
        cms_table(a, "v", 3, 32)
        .unionByName(cms_table(b, "v", 3, 32))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    direct = cms_table(a.unionByName(b), "v", 3, 32)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_bottomk_merge_property_and_determinism(spark):
    from kgforge.operators.sketches import bottomk_sample

    a = spark.createDataFrame([(f"u{i}",) for i in range(0, 80)], "url string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(80, 200)], "url string")
    u = a.unionByName(b)
    direct = [r["url"] for r in bottomk_sample(u, "url", 10).collect()]
    via_parts = bottomk_sample(
        bottomk_sample(a, "url", 10).unionByName(bottomk_sample(b, "url", 10)),
        "url",
        10,
    )
    assert [r["url"] for r in via_parts.collect()] == direct
    # determinism under repartition
    re = [r["url"] for r in bottomk_sample(u.repartition(7), "url", 10).collect()]
    assert re == direct


def test_weighted_sample_matches_python_and_favors_heavy(spark):
    from kgforge.operators.sketches import weighted_sample

    rows = [(f"d{i}", 1.0 if i < 90 else 100.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id string, w double")
    got = [r["id"] for r in weighted_sample(df, "id", "w", 10).collect()]

    def key(i, w):
        h = int(hashlib.md5(f"d{i}".encode()).hexdigest()[:15], 16)
        u = (float(h) + 0.5) / float(1 << 60)
        return u ** (1.0 / w)

    expect = sorted(
        ((f"d{i}", key(i, w)) for i, (_, w) in enumerate(rows)),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert got == [d for d, _ in expect]
    # the 10 heavy rows dominate the sample
    heavy = sum(1 for d in got if int(d[1:]) >= 90)
    assert heavy >= 7


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from kgforge.operators.sketches import weighted_sample

    df = spark.createDataFrame(
        [("a", 0.0), ("b", -1.0), ("c", 2.0)], "id string, w double"
    )
    got = [r["id"] for r in weighted_sample(df, "id", "w", 3).collect()]
    assert got == ["c"]


# --------------------------- log histogram (HDR) ---------------------------


def _py_bucket(v, p=16):
    if v < 1:
        return -1
    e = v.bit_length() - 1
    return e * p + ((v * p) >> e) - p


def test_log_histogram_buckets_match_python(spark):
    from collections import Counter

    from kgforge.operators.sketches import log_histogram

    vals = list(range(0, 2000)) + [2**k for k in range(40)] + [2**k - 1 for k in range(2, 40)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["bucket"]: r["n"] for r in log_histogram(df, "v").collect()}
    assert got == dict(Counter(_py_bucket(v) for v in vals))


def test_log_histogram_drops_null_negative_requires_pow2(spark):
    import pytest as _pytest

    from kgforge.operators.sketches import log_histogram

    df = spark.createDataFrame([(None,), (-5,), (0,), (1,)], "v long")
    got = {r["bucket"]: r["n"] for r in log_histogram(df, "v").collect()}
    assert got == {-1: 1, 0: 1}  # null and -5 dropped; 0 -> -1; 1 -> 0
    with _pytest.raises(ValueError):
        log_histogram(df, "v", precision=12)


def test_log_histogram_merge_equals_whole(spark):
    from pyspark.sql import functions as F

    from kgforge.operators.sketches import histogram_merge, log_histogram

    whole = spark.range(0, 5000).select(F.col("id").alias("v"))
    a = spark.range(0, 1700).select(F.col("id").alias("v"))
    b = spark.range(1700, 5000).select(F.col("id").alias("v"))
    got = {
        r["bucket"]: r["n"]
        for r in histogram_merge(log_histogram(a, "v"), log_histogram(b, "v")).collect()
    }
    want = {r["bucket"]: r["n"] for r in log_histogram(whole, "v").collect()}
    assert got == want


def test_histogram_quantiles_lower_bound_within_relative_error(spark):
    from pyspark.sql import functions as F

    from kgforge.operators.sketches import histogram_quantiles, log_histogram

    n = 10000
    df = spark.range(1, n + 1).select(F.col("id").alias("v"))
    got = {r["q"]: r["est"] for r in histogram_quantiles(log_histogram(df, "v")).collect()}
    vals = list(range(1, n + 1))
    for q, est in got.items():
        true = vals[math.ceil(q * n) - 1]
        # est is the bucket LOWER bound: est <= true < est * (1 + 1/16) + 1
        assert est <= true, (q, est, true)
        assert true < est * (1.0 + 1.0 / 16.0) + 1.0, (q, est, true)


def test_grouped_hll_matches_global_per_key(spark):
    from kgforge.operators.sketches import (
        hll_estimate,
        hll_estimate_by,
        hll_registers,
        hll_registers_by,
    )

    rows = [("g1", f"a{i}") for i in range(200)] + [("g2", f"b{i}") for i in range(37)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        r["g"]: (r["n_set"], r["estimate"])
        for r in hll_estimate_by(hll_registers_by(df, ["g"], "v"), ["g"]).collect()
    }
    for g in ("g1", "g2"):
        solo = hll_estimate(
            hll_registers(df.filter(df.g == g), "v")
        ).collect()[0]
        assert got[g] == (solo["n_set"], solo["estimate"])


def test_grouped_hll_merge_per_key(spark):
    from kgforge.operators.sketches import hll_registers_by

    a = spark.createDataFrame(
        [("g", f"x{i}") for i in range(100)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"x{i}") for i in range(50, 150)], "g string, v string"
    )
    whole = a.unionByName(b)
    import pyspark.sql.functions as F

    merged = (
        hll_registers_by(a, ["g"], "v")
        .unionByName(hll_registers_by(b, ["g"], "v"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    got = {(r["g"], r["bucket"]): r["rho"] for r in merged.collect()}
    want = {
        (r["g"], r["bucket"]): r["rho"]
        for r in hll_registers_by(whole, ["g"], "v").collect()
    }
    assert got == want
