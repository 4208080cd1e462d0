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
