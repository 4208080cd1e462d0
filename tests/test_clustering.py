"""Local clustering coefficient vs a pure-Python reimplementation."""

from itertools import combinations

from kgforge.operators.graph import clustering_coefficient


def _py_cc(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, ns in adj.items():
        deg = len(ns)
        tri = sum(
            1 for u, w in combinations(sorted(ns), 2) if (min(u, w), max(u, w)) in und
        )
        cc = (2.0 * tri) / (deg * (deg - 1)) if deg >= 2 else 0.0
        out[v] = (deg, tri, cc)
    return out


EDGES = [
    # a triangle (x,y,z), a pendant (z,p), a square (q,r,s,t) with one
    # diagonal (q,s), duplicates and a self-loop that must be ignored
    ("x", "y"), ("y", "z"), ("z", "x"), ("z", "p"),
    ("q", "r"), ("r", "s"), ("s", "t"), ("t", "q"), ("q", "s"),
    ("y", "x"),  # duplicate reversed
    ("p", "p"),  # self loop
]


def test_clustering_matches_python(spark):
    df = spark.createDataFrame(EDGES, "a string, b string")
    got = {
        r["node"]: (r["deg"], r["n_triangles"], r["clustering"])
        for r in clustering_coefficient(df).collect()
    }
    assert got == _py_cc(EDGES)


def test_clustering_known_values(spark):
    df = spark.createDataFrame(EDGES, "a string, b string")
    got = {r["node"]: r["clustering"] for r in clustering_coefficient(df).collect()}
    # triangle corners x, y are in exactly one triangle over one neighbor pair
    assert got["x"] == 1.0 and got["y"] == 1.0
    # z has neighbors {x, y, p}: one connected pair of three -> 1/3
    assert abs(got["z"] - 1.0 / 3.0) < 1e-12
    # pendant p: deg 1 -> 0 by convention
    assert got["p"] == 0.0
    # q has neighbors {r, t, s}: pairs (r,s) and (s,t) connected -> 2/3
    assert abs(got["q"] - 2.0 / 3.0) < 1e-12
    # r has neighbors {q, s} connected -> 1.0
    assert got["r"] == 1.0


def test_condense_graph_hand_pin(spark):
    from kgforge.operators.canonicalize import condense_graph

    # clusters: {a1,a2}->A, {b1}->B, {c1}->C
    mapping = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("c1", "C")],
        "node string, component string",
    )
    edges = spark.createDataFrame(
        [("a1", "b1"), ("a2", "b1"),   # two alias edges -> one weighted A-B
         ("a1", "a2"),                  # intra-cluster: dropped
         ("c1", "a1")],                 # normalized to (A, C)
        "a string, b string",
    )
    got = {(r["comp_a"], r["comp_b"]): r["weight"]
           for r in condense_graph(edges, mapping).collect()}
    assert got == {("A", "B"): 2, ("A", "C"): 1}
