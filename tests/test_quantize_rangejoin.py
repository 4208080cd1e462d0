"""int8 embedding quantization + banded interval join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_quantize_roundtrip_error_bounded(spark):
    """Dequantized values reconstruct originals within scale/254 per element
    (half-step of the code grid), and zero vectors are guarded."""
    rows = [
        (0, [0.5, -1.0, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [3.0]),
        (3, [-0.001, 0.002, 127.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from kgforge.operators.quantize import quantize_embeddings

    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[1]["scale"] == 0.0 and set(out[1]["q"]) == {0}
    for vid, vec in rows:
        r = out[vid]
        scale = r["scale"] or 1.0
        for x, q in zip(vec, r["q"]):
            assert abs(q) <= 127
            assert abs(x - q * scale / 127.0) <= scale / 254.0 + 1e-9
    assert out[2]["q"] == [127] and out[0]["q_max"] == 64 and out[0]["q_min"] == -127


def test_interval_join_equals_naive_between(spark):
    """Banded equi-join output == the naive non-equi BETWEEN join on a
    corpus where windows straddle bucket boundaries and overlap."""
    base = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=37 * i + (i % 3))) for i in range(400)],
        "event_id long, ts timestamp",
    )
    windows = spark.createDataFrame(
        [
            (j, base + dt.timedelta(seconds=290 * j), base + dt.timedelta(seconds=290 * j + 300))
            for j in range(40)
        ],
        "win_id long, w_start timestamp, w_end timestamp",
    )
    from kgforge.operators.rangejoin import interval_join

    banded = interval_join(events, windows, "ts", "w_start", "w_end", bucket_seconds=300)
    naive = events.join(
        windows, (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end"))
    )
    cols = ["event_id", "win_id"]
    assert banded.select(cols).exceptAll(naive.select(cols)).count() == 0
    assert naive.select(cols).exceptAll(banded.select(cols)).count() == 0
    assert banded.count() == naive.count() > 0


def test_interval_join_inclusive_boundaries(spark):
    """ts == w_start and ts == w_end both match (inclusive interval)."""
    base = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, base), (2, base + dt.timedelta(seconds=300)), (3, base + dt.timedelta(seconds=301))],
        "event_id long, ts timestamp",
    )
    windows = spark.createDataFrame(
        [(0, base, base + dt.timedelta(seconds=300))],
        "win_id long, w_start timestamp, w_end timestamp",
    )
    from kgforge.operators.rangejoin import interval_join

    got = sorted(
        r["event_id"]
        for r in interval_join(events, windows, "ts", "w_start", "w_end", 300).collect()
    )
    assert got == [1, 2]


def test_random_projection_matches_numpy_and_jl(spark):
    """random_projection equals an independent numpy reimplementation of
    the closed-form ±1 matrix, and the sketch roughly preserves relative
    distances (JL property) on a small sample."""
    import numpy as np

    from kgforge.operators.quantize import _KNUTH, _M31, _M32, random_projection

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 16).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = 12
    got = {r["vec_id"]: np.array(r["proj"]) for r in random_projection(df, k=k).collect()}

    sign = np.empty((k, 16))
    for j in range(k):
        for d in range(16):
            sign[j, d] = 1.0 if ((j * 8191 + d) * _KNUTH) % _M32 < _M31 else -1.0
    expect = vecs.astype(np.float64) @ sign.T
    for i in range(20):
        assert np.allclose(got[i], np.round(expect[i], 6), atol=1e-6)
    # JL sanity: projected pairwise distances correlate with the originals
    from itertools import combinations
    orig = [np.linalg.norm(vecs[a] - vecs[b]) for a, b in combinations(range(20), 2)]
    proj = [np.linalg.norm(got[a] - got[b]) for a, b in combinations(range(20), 2)]
    assert np.corrcoef(orig, proj)[0, 1] > 0.4
