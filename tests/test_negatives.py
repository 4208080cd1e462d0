"""Negative sampling vs a pure-Python reimplementation; dense_index vs the
naive global-sort rank."""

import hashlib


def _py_hash(s: str, p: str, o: str, i: int, seed: int) -> int:
    key = "\x1f".join([s, p, o, str(i), str(seed)])
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


TRIPLES = [
    ("e1", "knows", "e2"),
    ("e1", "knows", "e3"),
    ("e2", "knows", "e3"),
    ("e3", "knows", "e1"),
    ("e4", "likes", "e1"),
    ("e4", "knows", "e5"),
]


def _py_negatives(triples, k, seed, corrupt):
    pos = sorted(set(triples))
    vocab = sorted({t[0] for t in pos} | {t[2] for t in pos})
    truth = set(pos)
    out = set()
    for s, p, o in pos:
        for i in range(1, k + 1):
            neg = vocab[_py_hash(s, p, o, i, seed) % len(vocab)]
            if corrupt == "object":
                if neg == o or (s, p, neg) in truth:
                    continue
            else:
                if neg == s or (neg, p, o) in truth:
                    continue
            out.add((s, p, o, i, neg))
    return out


def test_dense_index_matches_global_rank(spark):
    from kgforge.operators.negatives import dense_index

    vals = [("b",), ("a",), ("z",), ("m",), ("a",), ("c",)]  # with a dup
    df = spark.createDataFrame(vals, "v string")
    got = {(r["entity"], r["idx"]) for r in dense_index(df, "v", num_parts=3).collect()}
    expect = {(v, i) for i, v in enumerate(sorted({v for (v,) in vals}))}
    assert got == expect


def test_negative_samples_object_matches_python(spark):
    from kgforge.operators.negatives import negative_samples

    df = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    got = {
        (r["s"], r["p"], r["o"], r["sample_i"], r["neg"])
        for r in negative_samples(df, k=4, seed=7).collect()
    }
    assert got == _py_negatives(TRIPLES, 4, 7, "object")
    assert len(got) > 0


def test_negative_samples_subject_mode(spark):
    from kgforge.operators.negatives import negative_samples

    df = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    got = {
        (r["s"], r["p"], r["o"], r["sample_i"], r["neg"])
        for r in negative_samples(df, k=3, seed=11, corrupt="subject").collect()
    }
    assert got == _py_negatives(TRIPLES, 3, 11, "subject")


def test_no_true_triples_or_identity_in_output(spark):
    from kgforge.operators.negatives import negative_samples

    df = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    rows = negative_samples(df, k=8, seed=1).collect()
    truth = set(TRIPLES)
    for r in rows:
        assert r["neg"] != r["o"]
        assert (r["s"], r["p"], r["neg"]) not in truth
