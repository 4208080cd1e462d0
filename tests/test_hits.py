"""HITS vs a pure-Python reimplementation."""

import math

import pytest


EDGES = [
    ("h1", "a1"), ("h1", "a2"), ("h2", "a1"),
    ("h2", "a3"), ("h3", "a2"), ("a1", "h1"),
]


def _py_hits(edges, iterations):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    auth = {n: 1.0 for n in nodes}
    hub = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        auth = {n: sum(hub[s] for s, d in e if d == n) for n in nodes}
        za = math.sqrt(sum(v * v for v in auth.values()))
        auth = {n: v / za for n, v in auth.items()}
        hub = {n: sum(auth[d] for s, d in e if s == n) for n in nodes}
        zh = math.sqrt(sum(v * v for v in hub.values()))
        hub = {n: v / zh for n, v in hub.items()}
    return auth, hub


@pytest.mark.parametrize("k", [1, 2, 3])
def test_hits_matches_python(spark, k):
    from kgforge.operators.graph import hits

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: (r["auth"], r["hub"]) for r in hits(df, iterations=k).collect()}
    auth, hub = _py_hits(EDGES, k)
    assert set(got) == set(auth)
    for n in auth:
        assert got[n][0] == pytest.approx(auth[n], abs=1e-12), n
        assert got[n][1] == pytest.approx(hub[n], abs=1e-12), n
    # a1 (two in-links from hubs) is a top authority (ties with a2 allowed)
    best = max(v[0] for v in got.values())
    assert got["a1"][0] == pytest.approx(best, abs=1e-12)
