"""SemDeDup (cluster-then-prune semantic dedup) vs pure Python."""

import math

from kgforge.operators.similarity import semdedup


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 6)


def _py_semdedup(rows, n_clusters, threshold):
    seeds = [v for _, v in sorted(rows)[:n_clusters]]
    assign = {}
    for i, v in rows:
        best = min((-_cos(v, s), j) for j, s in enumerate(seeds))
        assign[i] = best[1]
    kept = {}
    for i, v in sorted(rows):
        dup = any(
            assign[i2] == assign[i] and i2 < i and _cos(v2, v) >= threshold
            for i2, v2 in rows
        )
        kept[i] = (assign[i], not dup)
    return kept


ROWS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0]),
    (2, [0.99, 0.05, 0.0]),   # near-dup of 0 -> dropped
    (3, [0.0, 0.98, 0.1]),    # near-dup of 1 -> dropped
    (4, [0.0, 0.0, 1.0]),     # own direction, nearest seed still 0 or 1
    (5, [0.97, 0.08, 0.02]),  # near-dup of 0 and 2 -> dropped
    (6, [-1.0, 0.2, 0.0]),
]


def test_semdedup_matches_python(spark):
    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in semdedup(df, n_clusters=2, threshold=0.95).collect()
    }
    rows64 = [(i, [float(x) for x in v]) for i, v in ROWS]
    assert got == _py_semdedup(rows64, 2, 0.95)
    assert [i for i, (_, k) in sorted(got.items()) if not k] == [2, 3, 5]


def test_semdedup_deterministic_under_repartition(spark):
    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, semdedup(df, 2, 0.95).collect()))
    b = sorted(map(tuple, semdedup(df.repartition(5), 2, 0.95).collect()))
    assert a == b


def test_semdedup_threshold_one_keeps_all_but_exact(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["kept"] for r in semdedup(df, 1, 1.0).collect()}
    assert got == {0: True, 1: False, 2: True}


def test_embedding_diversity_matches_naive_pairwise(spark):
    """The centroid identity vs a brute-force all-pairs average."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    rows = [(int(i), "g" + str(i % 2), [float(x) for x in vecs[i]])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, label string, embedding array<float>")
    from kgforge.operators.similarity import embedding_diversity

    got = {r["label"]: r for r in embedding_diversity(df).collect()}
    for g in ("g0", "g1"):
        sub = vecs[[i for i in range(40) if "g" + str(i % 2) == g]].astype("float64")
        n = len(sub)
        naive = sum(
            float(np.sum((sub[i] - sub[j]) ** 2))
            for i in range(n) for j in range(n)
        ) / (n * n)
        assert abs(got[g]["avg_sq_dist"] - naive) < 1e-4
        assert got[g]["n"] == n


def test_embedding_diversity_collapsed_corpus_is_zero(spark):
    from kgforge.operators.similarity import embedding_diversity

    rows = [(i, "g", [1.0, 2.0, 3.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id bigint, label string, embedding array<float>")
    got = embedding_diversity(df).collect()[0]
    assert got["avg_sq_dist"] == 0.0  # identical vectors: zero diversity
