"""Adamic-Adar link prediction vs a pure-Python reimplementation."""

import math
from itertools import combinations

from kgforge.operators.graph import adamic_adar


def _py_aa(edges, max_degree=None):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    for w, ns in adj.items():
        if len(ns) < 2 or (max_degree is not None and len(ns) > max_degree):
            continue
        for u, v in combinations(sorted(ns), 2):
            if (u, v) not in und:
                scores[(u, v)] = scores.get((u, v), 0.0) + 1.0 / math.log(len(ns))
    return {k: round(v, 6) for k, v in scores.items()}


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"),
    ("e", "f"), ("f", "a"), ("c", "f"), ("b", "d"), ("g", "c"),
    ("g", "h"), ("h", "a"), ("b", "a"),  # duplicate reversed edge
    ("e", "e"),  # self loop must be ignored
]


def test_adamic_adar_matches_python(spark):
    df = spark.createDataFrame(EDGES, "a string, b string")
    got = {
        (r["a"], r["b"]): r["aa_score"]
        for r in adamic_adar(df, top_n=100).collect()
    }
    assert got == _py_aa(EDGES)


def test_adamic_adar_top_n_ordering(spark):
    df = spark.createDataFrame(EDGES, "a string, b string")
    rows = adamic_adar(df, top_n=3).collect()
    full = sorted(_py_aa(EDGES).items(), key=lambda t: (-t[1], t[0]))
    assert [((r["a"], r["b"]), r["aa_score"]) for r in rows] == full[:3]


def test_adamic_adar_degree_cap_drops_hub_centers(spark):
    # star: hub s connected to x0..x9, plus a 2-path u-m-v; capping at 5
    # removes every wedge through s but keeps the one through m
    edges = [("s", f"x{i}") for i in range(10)] + [("u", "m"), ("m", "v")]
    df = spark.createDataFrame(edges, "a string, b string")
    got = {
        (r["a"], r["b"]): r["aa_score"]
        for r in adamic_adar(df, top_n=100, max_degree=5).collect()
    }
    assert got == _py_aa(edges, max_degree=5)
    assert got == {("u", "v"): round(1.0 / math.log(2), 6)}
