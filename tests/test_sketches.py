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
