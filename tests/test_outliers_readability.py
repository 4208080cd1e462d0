"""Centroid-distance outliers + Flesch readability pins."""

import math

import numpy as np

from pyspark.sql import functions as F

from kgforge.operators.similarity import centroid_outliers
from kgforge.operators.text_stats import readability_col


def test_centroid_outliers_pin(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(30, 4).astype(np.float32)
    vecs[7] += 50.0  # planted outlier
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id bigint, embedding array<float>",
    )
    rows = centroid_outliers(df, top_n=5).collect()
    assert rows[0]["vec_id"] == 7
    # numpy replay with the same rounding regime
    v = vecs.astype(np.float64)
    m = np.round(v.mean(axis=0), 6)
    d = np.round(np.sqrt(((v - m) ** 2).sum(axis=1)), 6)
    order = sorted(range(30), key=lambda i: (-d[i], i))[:5]
    assert [r["vec_id"] for r in rows] == order
    for r in rows:
        assert abs(r["dist"] - d[r["vec_id"]]) < 1e-9


def test_readability_pin(spark):
    texts = [
        (0, "The cat sat. The dog ran!"),   # 6 words, 2 sentences
        (1, ""),                              # blank -> NULL
        (2, "zzz bcd"),                       # no vowels/sentences -> min 1
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {r["doc_id"]: r["flesch"] for r in
           df.select("doc_id", readability_col(F.col("text")).alias("flesch")).collect()}

    def flesch(w, s, y):
        return round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4)

    # doc 0: words=6, sentences=2, vowel groups: e,a,a,e,o,a -> 6
    assert got[0] == flesch(6, 2, 6)
    assert got[1] is None
    assert got[2] == flesch(2, 1, 1)
