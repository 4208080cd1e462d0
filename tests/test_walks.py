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


def _py_node2vec(edges, num_walks=2, walk_length=3, p=2.0, q=0.5, seed=13):
    import hashlib

    SEP = "\x1f"
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    nbrs = {}
    for s, d in und:
        nbrs.setdefault(s, []).append(d)
    for k in nbrs:
        nbrs[k].sort()

    def h60(*parts):
        return int(hashlib.md5(SEP.join(parts).encode()).hexdigest()[:15], 16)

    out = {}
    for start in nbrs:
        for w in range(1, num_walks + 1):
            cur, prev, path = start, None, [start]
            i = h60(start, str(w), "1", str(seed)) % len(nbrs[cur])
            prev, cur = cur, nbrs[cur][i]
            path.append(cur)
            for t in range(2, walk_length + 1):
                best = None
                for x in nbrs[cur]:
                    u = (h60(start, str(w), str(t), str(seed), x) + 0.5) / float(1 << 60)
                    key = u * u if x == prev else (u if (prev, x) in und else u ** 0.5)
                    c = (-key, x)
                    if best is None or c < best:
                        best = c
                prev, cur = cur, best[1]
                path.append(cur)
            out[(start, w)] = ">".join(path)
    return out


def test_node2vec_matches_python_replay(spark):
    from kgforge.operators.walks import node2vec_walks

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("e", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["start"], r["walk_id"]): r["path"]
        for r in node2vec_walks(df, num_walks=2, walk_length=3).collect()
    }
    assert got == _py_node2vec(edges)


def test_node2vec_bias_departs_from_uniform_walks(spark):
    """p=2/q=0.5 must actually change behavior vs DeepWalk on the same
    graph and seed (otherwise the bias plumbing is dead code)."""
    from kgforge.operators.walks import node2vec_walks, random_walks

    edges = [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(17)] + [
        (f"n{i}", f"n{(i + 1) % 17}") for i in range(17)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    biased = {
        (r["start"], r["walk_id"]): r["path"]
        for r in node2vec_walks(df, num_walks=1, walk_length=4).collect()
    }
    uniform = {
        (r["start"], r["walk_id"]): r["path"]
        for r in random_walks(df, num_walks=1, walk_length=4).collect()
    }
    assert biased != uniform
    # every step stays on a real edge
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    for path in biased.values():
        hops = path.split(">")
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in und
