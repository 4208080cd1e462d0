"""Synchronous LPA vs a pure-Python reimplementation."""


EDGES = [
    # two triangles bridged by one edge + a pendant
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("x", "y"), ("y", "z"), ("x", "z"),
    ("c", "x"),
    ("z", "w"),
]


def _py_lpa(edges, iterations):
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    nodes = {s for s, _ in und}
    labels = {n: n for n in nodes}
    for _ in range(iterations):
        new = {}
        for n in nodes:
            counts = {}
            for s, d in und:
                if d == n:
                    lbl = labels[s]
                    counts[lbl] = counts.get(lbl, 0) + 1
            new[n] = min(counts, key=lambda lbl: (-counts[lbl], lbl))
        labels = new
    return labels


def test_lpa_matches_python(spark):
    from kgforge.operators.community import label_propagation

    df = spark.createDataFrame(EDGES, "src string, dst string")
    for k in (1, 2, 3, 4):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=k).collect()
        }
        assert got == _py_lpa(EDGES, k), f"iterations={k}"


def test_lpa_triangle_converges_to_min_label(spark):
    from kgforge.operators.community import label_propagation

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: r["label"] for r in label_propagation(df, iterations=3).collect()
    }
    # first triangle settles on its minimum member label
    assert got["a"] == got["b"] == got["c"]


def test_lpa_zero_iterations_identity(spark):
    from kgforge.operators.community import label_propagation

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: r["label"] for r in label_propagation(df, iterations=0).collect()
    }
    assert got == {n: n for n in got}
