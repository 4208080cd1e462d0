"""Deterministic random walks vs a pure-Python reimplementation."""

import hashlib


EDGES = [
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("c", "d"), ("d", "e"),
    ("f", "a"),
]


def _py_walks(edges, num_walks, walk_length, seed):
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    nbrs = {}
    for s, d in sorted(und):
        nbrs.setdefault(s, []).append(d)
    out = {}
    for start in nbrs:
        for w in range(1, num_walks + 1):
            cur, path = start, [start]
            for t in range(1, walk_length + 1):
                key = "\x1f".join([start, str(w), str(t), str(seed)])
                h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
                cur = nbrs[cur][h % len(nbrs[cur])]
                path.append(cur)
            out[(start, w)] = ">".join(path)
    return out


def test_walks_match_python(spark):
    from kgforge.operators.walks import random_walks

    df = spark.createDataFrame(EDGES, "src string, dst string")
    for nw, wl in ((1, 1), (2, 3), (3, 5)):
        got = {
            (r["start"], r["walk_id"]): r["path"]
            for r in random_walks(df, num_walks=nw, walk_length=wl, seed=13).collect()
        }
        assert got == _py_walks(EDGES, nw, wl, 13), (nw, wl)


def test_walks_are_valid_paths(spark):
    from kgforge.operators.walks import random_walks

    df = spark.createDataFrame(EDGES, "src string, dst string")
    und = set()
    for s, d in EDGES:
        und.add((s, d))
        und.add((d, s))
    for r in random_walks(df, num_walks=2, walk_length=4, seed=99).collect():
        hops = r["path"].split(">")
        assert len(hops) == 5
        assert hops[0] == r["start"]
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in und
