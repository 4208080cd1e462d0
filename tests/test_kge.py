"""KG-embedding filtered ranking vs a pure-numpy reimplementation."""

import numpy as np

from kgforge.operators.kge import filtered_rank, kge_metrics


def _fixtures(spark, n_ent=20, dim=8):
    rng = np.random.RandomState(7)
    vecs = rng.randn(n_ent, dim).astype(np.float32)
    ents = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n_ent)],
        "ent bigint, emb array<float>",
    )
    rels = spark.createDataFrame(
        [(j, [float(x) for x in vecs[j]]) for j in range(2)],
        "rel bigint, emb array<float>",
    )
    test = [(i, i % 2, (i * 3 + 5) % n_ent) for i in range(6)]
    extra = [(h, r, (h * 7 + 1) % n_ent) for h, r, _ in test]
    tdf = spark.createDataFrame(test, "h bigint, r bigint, t bigint")
    pdf = spark.createDataFrame(
        sorted(set(test + extra)), "h bigint, r bigint, t bigint"
    )
    return vecs.astype(np.float64), ents, rels, tdf, pdf, test, set(test + extra)


def _py_rank(vecs, test, pos, score, nd=6):
    out = {}
    n = len(vecs)
    for h, r, t in test:
        def s(e):
            if score == "distmult":
                v = float(np.sum(vecs[h] * vecs[r] * vecs[e]))
            else:
                v = -float(np.linalg.norm(vecs[h] + vecs[r] - vecs[e]))
            return round(v, nd)
        st = s(t)
        cands = [e for e in range(n) if e == t or (h, r, e) not in pos]
        rank = 1 + sum(
            1 for e in cands if s(e) > st or (s(e) == st and e < t)
        )
        out[(h, r, t)] = rank
    return out


def test_filtered_rank_both_scores(spark):
    vecs, ents, rels, tdf, pdf, test, pos = _fixtures(spark)
    for score in ("distmult", "transe"):
        got = {
            (r["h"], r["r"], r["t"]): r["rank"]
            for r in filtered_rank(tdf, ents, rels, pdf, score=score).collect()
        }
        assert got == _py_rank(vecs, test, pos, score)


def test_filtered_setting_excludes_other_positives(spark):
    # two entities at the SAME point as the true tail; one is a known
    # positive (filtered out), the other stays and ties -> id tie-break
    vecs = {0: [1.0, 0.0], 1: [0.0, 1.0], 2: [1.0, 1.0], 3: [1.0, 1.0], 4: [1.0, 1.0]}
    ents = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "ent bigint, emb array<float>"
    )
    rels = spark.createDataFrame([(0, [1.0, 1.0])], "rel bigint, emb array<float>")
    tdf = spark.createDataFrame([(0, 0, 4)], "h bigint, r bigint, t bigint")
    # (0,0,2) known positive -> excluded; 3 ties with 4 and has lower id
    pdf = spark.createDataFrame([(0, 0, 4), (0, 0, 2)], "h bigint, r bigint, t bigint")
    rows = filtered_rank(tdf, ents, rels, pdf, score="distmult").collect()
    assert len(rows) == 1
    # h*r = [1,0] so score(e) = e[0]: entities 0 and 3 tie the true tail's
    # score 1.0 with lower ids; 2 would too but is filtered out -> rank 3
    assert rows[0]["rank"] == 3


def test_kge_metrics(spark):
    ranks = spark.createDataFrame([(1,), (2,), (10,), (50,)], "rank bigint")
    m = kge_metrics(ranks).collect()[0]
    assert m["n"] == 4
    assert abs(m["mrr"] - (1.0 + 0.5 + 0.1 + 0.02) / 4) < 1e-12
    assert m["hits1"] == 0.25
    assert m["hits10"] == 0.75
