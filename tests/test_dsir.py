"""DSIR importance weights vs a pure-Python reimplementation."""

import hashlib
import math

import pytest  # noqa: F401

B = 64

DOCS = [
    (0, "the cat sat on the mat", True),
    (1, "der hund ist nicht da", False),
    (2, "the dog sat on the log", True),
    (3, "el gato es una casa", False),
    (4, "the the the the", False),
    (5, "", False),           # blank -> 0 grams, weight 0
    (6, "cat", False),        # single token -> unigram only
]


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B


def _grams(text: str):
    t = text.strip().lower().split()
    return t + [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]


def _py_dsir(docs):
    cr, ct = {}, {}
    n_raw = n_tgt = 0
    per_doc = {}
    for did, text, is_tgt in docs:
        gs = _grams(text)
        bs = {}
        for g in gs:
            b = _bucket(g)
            bs[b] = bs.get(b, 0) + 1
            cr[b] = cr.get(b, 0) + 1
            n_raw += 1
            if is_tgt:
                ct[b] = ct.get(b, 0) + 1
                n_tgt += 1
        per_doc[did] = bs
    out = {}
    for did, bs in per_doc.items():
        w = sum(
            c
            * (
                math.log(ct.get(b, 0) + 1.0)
                - math.log(n_tgt + B)
                - math.log(cr[b] + 1.0)
                + math.log(n_raw + B)
            )
            for b, c in bs.items()
        )
        out[did] = (sum(bs.values()), w)
    return out


def test_gumbel_topk_matches_python(spark):
    from kgforge.operators.dsir import dsir_weights, gumbel_topk
    from pyspark.sql import functions as F

    df = spark.createDataFrame(DOCS, "doc_id long, text string, is_tgt boolean")
    w = dsir_weights(df, F.col("is_tgt"), buckets=B)
    got = [(r["doc_id"], r["score"]) for r in gumbel_topk(w, k=3, seed=5).collect()]

    py_w = _py_dsir(DOCS)

    def g(doc_id):
        h = int(
            hashlib.md5(f"{doc_id}\x1f5".encode()).hexdigest()[:15], 16
        )
        u = (float(h) + 0.5) / float(1 << 60)
        return -math.log(-math.log(u))

    scores = sorted(
        ((did, py_w[did][1] + g(did)) for did in py_w),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [d for d, _ in got] == [d for d, _ in scores]
    for (gd, gs), (ed, es) in zip(got, scores):
        assert gs == pytest.approx(es, abs=1e-9)


def test_dsir_matches_python(spark):
    from pyspark.sql import functions as F

    from kgforge.operators.dsir import dsir_weights

    df = spark.createDataFrame(DOCS, "doc_id long, text string, is_tgt boolean")
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_weight"])
        for r in dsir_weights(df, F.col("is_tgt"), buckets=B).collect()
    }
    expect = _py_dsir(DOCS)
    assert set(got) == set(expect)
    for did in expect:
        assert got[did][0] == expect[did][0], did
        assert got[did][1] == pytest.approx(expect[did][1], abs=1e-9), did
    # target-looking docs score higher than off-target ones
    assert got[2][1] > got[3][1]
    # blank doc: zero grams, zero weight
    assert got[5] == (0, 0.0)
