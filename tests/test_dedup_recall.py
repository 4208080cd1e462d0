"""Quantitative correctness for the approximate (sketch-blocked) operators,
vs their exact, already-oracled twins (VERDICT round-1 item 1).

Precision of every verified path is 1.0 BY CONSTRUCTION (candidates are
re-checked with exact Jaccard / exact cosine); these tests pin the recall
side and the exact-path equivalences:

- minhash-LSH @0.8 / simhash-banded @0.9 == exact pair set (recall 1.0 at
  this corpus: the >=0.8 population sits at Jaccard >=0.92, deep inside the
  LSH s-curve / pigeonhole band guarantee)
- prefix-filtered jaccard_similarity_join == all-pairs (exact by theorem;
  asserted anyway)
- blocked distributed GEMM == broadcast GEMM (exact all-pairs, two plans)
- hyperplane-bucketed near-dup: precision 1.0 always; recall ~1 in its
  design regime (planted high-cosine near-dups), monotone in probe_bits in
  the out-of-regime low-threshold setting
- lsh_topk: planted near-dup queries recover their source vector
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


def _pairs(df):
    return {(r["a"], r["b"]): round(r["jaccard"], 6) for r in df.collect()}


def test_minhash_equals_exact(spark, docs):
    from kgforge.operators.dedup import minhash_duplicate_pairs, ngram_jaccard_pairs

    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.8))
    mh = _pairs(minhash_duplicate_pairs(docs, threshold=0.8))
    assert mh == exact and len(exact) > 0  # recall 1.0 AND precision 1.0


def test_simhash_equals_exact(spark, docs):
    from kgforge.operators.dedup import ngram_jaccard_pairs, simhash_verified_pairs

    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.9))
    sh = _pairs(simhash_verified_pairs(docs, max_hamming=8, band_bits=8, threshold=0.9))
    assert sh == exact and len(exact) > 0


def test_prefix_filter_join_equals_all_pairs(spark, docs):
    from kgforge.operators.dedup import jaccard_similarity_join, ngram_jaccard_pairs

    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.5))
    pf = _pairs(jaccard_similarity_join(docs, threshold=0.5))
    assert pf == exact and len(exact) > 1000


def test_prefix_filter_join_capped_rank_dict(spark, docs):
    """Simulate a high-cardinality gram domain (100 TB multilingual corpus,
    10^7+ distinct grams): cap the driver rank dict far below the corpus's
    actual distinct-gram count so almost every gram falls back to the
    default rank. Output must STILL equal the all-pairs formulation — the
    prefix-filter theorem holds under any total global order, and
    (rank, gram-hash) stays total under the cap."""
    from kgforge.operators.dedup import jaccard_similarity_join, ngram_jaccard_pairs

    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.5))
    capped = _pairs(jaccard_similarity_join(docs, threshold=0.5, gram_rank_cap=5))
    assert capped == exact and len(exact) > 1000


def test_blocked_gemm_equals_broadcast(spark, emb):
    from kgforge.operators.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_blocked,
    )

    bro = {(r["a"], r["b"]): r["cosine"] for r in embedding_cosine_pairs(emb, threshold=0.35).collect()}
    blk = {(r["a"], r["b"]): r["cosine"]
           for r in embedding_cosine_pairs_blocked(emb, threshold=0.35, num_blocks=3).collect()}
    assert blk == bro and len(bro) > 100


def _planted(spark, emb, n=40, eps=0.02, id_offset=100_000):
    """Copies of the first n embeddings with tiny deterministic noise —
    true near-duplicates (cosine ~0.999) the LSH regime is designed for."""
    rows = emb.orderBy("vec_id").limit(n).collect()
    out = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        rng = np.random.RandomState(int(r["vec_id"]))
        p = v + eps * rng.randn(v.shape[0]) * np.linalg.norm(v) / np.sqrt(v.shape[0])
        out.append((int(r["vec_id"]) + id_offset, [float(x) for x in p]))
    return out


def test_bucketed_neardup_recall_in_regime(spark, emb):
    """Planted cosine-~0.999 pairs: the hyperplane-bucketed path must find
    nearly all of them (design regime), with exact-verified precision."""
    from kgforge.operators.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_bucketed,
    )

    planted = _planted(spark, emb)
    pdf = spark.createDataFrame(planted, "vec_id long, embedding array<double>").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    union = emb.select("vec_id", "embedding").unionByName(pdf)
    truth = {(p[0] - 100_000, p[0]) for p in planted}
    exact = {(r["a"], r["b"]) for r in embedding_cosine_pairs(union, threshold=0.99).collect()}
    assert truth <= exact  # sanity: the plants really are >=0.99 pairs
    got = {(r["a"], r["b"])
           for r in embedding_cosine_pairs_bucketed(union, threshold=0.99, probe_bits=1).collect()}
    assert got <= exact  # precision 1.0 (exact verify)
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"in-regime recall {recall}"


def test_bucketed_neardup_out_of_regime_envelope(spark, emb):
    """threshold 0.35 (~70-degree angles) is OUTSIDE the sign-LSH regime:
    assert the documented envelope — precision stays 1.0, recall is nonzero
    and monotone in probe_bits (measured 0.15 / 0.28 on this corpus)."""
    from kgforge.operators.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_bucketed,
    )

    exact = {(r["a"], r["b"]) for r in embedding_cosine_pairs(emb, threshold=0.35).collect()}
    r1 = {(r["a"], r["b"]) for r in embedding_cosine_pairs_bucketed(emb, threshold=0.35, probe_bits=1).collect()}
    r2 = {(r["a"], r["b"]) for r in embedding_cosine_pairs_bucketed(emb, threshold=0.35, probe_bits=2).collect()}
    assert r1 <= exact and r2 <= exact  # precision 1.0
    assert len(r1 & exact) / len(exact) >= 0.10
    assert len(r2 & exact) >= len(r1 & exact)  # multi-probe monotonicity
    assert len(r2 & exact) / len(exact) >= 0.20


def test_lsh_topk_recovers_planted_neighbor(spark, emb):
    """Each planted query's true nearest neighbor is its source vector
    (cosine ~0.999): lsh_topk must place the source in the top-5 for nearly
    every query — the ANN contract in its design regime."""
    from kgforge.operators.similarity import lsh_topk

    planted = _planted(spark, emb, n=30)
    queries = spark.createDataFrame(planted, "vec_id long, embedding array<double>").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    res = lsh_topk(emb, queries, k=5, dim=64).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(1 for qid, _ in planted if (qid - 100_000) in by_q.get(qid, set()))
    assert hit / len(planted) >= 0.9, f"planted recall {hit}/{len(planted)}"


def test_lsh_topk_weak_neighbor_floor(spark, emb):
    """Don't-regress floor on the real (weak-neighbor) corpus: recall@5 vs
    brute force, deterministic hashing => deterministic value (measured 0.20
    at sf0.001). Pinned loosely so param tweaks surface as test diffs."""
    from kgforge.operators.similarity import brute_force_topk, lsh_topk

    q = emb.filter(F.col("vec_id") < 5)
    ex, ap = {}, {}
    for r in brute_force_topk(emb, q, k=5, round_digits=4).collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in lsh_topk(emb, q, k=5, dim=64, round_digits=4).collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recs = [len(ex[k] & ap.get(k, set())) / len(ex[k]) for k in ex]
    assert sum(recs) / len(recs) >= 0.1


def test_lsh_exhaustive_probe_equals_exact(spark, emb):
    """probe_radius == planes probes all 2^planes buckets, so lsh_topk
    degenerates to exact search: identical (id, cosine, rank) rows to brute
    force — the regime q_knn_lsh uses so the brute-force SQL is its true
    oracle. Also: the default radius-1 result is a SUBSET of exact top-k
    candidates' re-rank universe (precision of returned cosines is exact)."""
    from kgforge.operators.similarity import brute_force_topk, lsh_topk

    q = emb.filter(F.col("vec_id") < 5)
    ex = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in brute_force_topk(emb, q, k=5, round_digits=4).collect()
    )
    ap = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in lsh_topk(
            emb, q, k=5, dim=64, planes=4, probe_radius=4, round_digits=4
        ).collect()
    )
    assert ap == ex
    # radius-1 (approximate) rows report EXACT cosines for whatever
    # neighbors they return (precision-of-value check)
    exact_cos = {(a, b): c for a, b, c, _ in ex}
    full = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, q, k=10**9, round_digits=4).collect()
    }
    for r in lsh_topk(emb, q, k=5, dim=64, planes=4, probe_radius=1, round_digits=4).collect():
        assert full[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_ivf_topk_recall(spark, emb):
    """IVF coarse-quantizer ANN: with nprobe covering half the cells on the
    weak-neighbor corpus, recall@5 vs brute force should be substantial;
    with nprobe = n_centroids it degenerates to exact search (recall 1.0) —
    both pins, plus determinism of the trained centroids."""
    from kgforge.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivf_train_centroids,
    )

    cents = ivf_train_centroids(emb, n_centroids=16)
    cents2 = ivf_train_centroids(emb, n_centroids=16)
    assert np.allclose(cents, cents2)  # deterministic training

    q = emb.filter(F.col("vec_id") < 5)
    ex = {}
    for r in brute_force_topk(emb, q, k=5, round_digits=4).collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(nprobe):
        ap = {}
        res = ivf_topk(emb, q, k=5, n_centroids=16, nprobe=nprobe,
                       round_digits=4, centroids=cents).collect()
        for r in res:
            ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recs = [len(ex[k_] & ap.get(k_, set())) / len(ex[k_]) for k_ in ex]
        return sum(recs) / len(recs)

    assert recall(16) == 1.0  # all cells probed == exact
    r8 = recall(8)
    assert r8 >= 0.5


def _cpairs(df):
    return {(r["src"], r["dst"]): round(r["containment"], 6) for r in df.collect()}


def _naive_containment(docs, threshold, id_col="doc_id", text_col="text", unit="word"):
    """All-pairs ordered-containment twin (test scale only)."""
    from kgforge.operators.canonicalize import (
        _hashed_ngram_set,
        _hashed_token_shingle_set,
    )

    gram = (
        _hashed_token_shingle_set(F.col(text_col), 4)
        if unit == "word"
        else _hashed_ngram_set(F.col(text_col), 3)
    )
    g = docs.select(F.col(id_col).alias("id"), gram.alias("grams"))
    return (
        g.alias("a")
        .join(g.alias("b"), F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            (
                F.size(F.array_intersect("a.grams", "b.grams"))
                / F.size(F.col("a.grams"))
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def test_containment_join_equals_all_pairs(spark, docs):
    from kgforge.operators.dedup import containment_join

    exact = _cpairs(_naive_containment(docs, 0.8))
    pf = _cpairs(containment_join(docs, threshold=0.8))
    assert pf == exact and len(exact) > 0


def test_containment_join_equals_all_pairs_char_unit(spark, docs):
    from kgforge.operators.dedup import containment_join

    exact = _cpairs(_naive_containment(docs, 0.8, unit="char"))
    pf = _cpairs(containment_join(docs, threshold=0.8, n=3, unit="char"))
    assert pf == exact and len(exact) > 0


def test_containment_join_finds_asymmetric_quote(spark):
    from kgforge.operators.dedup import containment_join

    long_text = " ".join(f"tok{w} mid{w * 7 % 31}" for w in range(120))
    quote = " ".join(long_text.split()[8:40])  # token-aligned excerpt
    rows = [
        (1, long_text),
        (2, quote),
        (3, "completely different content about other things entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = _cpairs(containment_join(docs, threshold=0.9))
    assert (2, 1) in got and got[(2, 1)] >= 0.9  # quote contained in source
    assert (1, 2) not in got  # NOT symmetric: source not inside the quote
    assert all(3 not in pair for pair in got)


def test_containment_join_capped_rank_dict(spark, docs):
    from kgforge.operators.dedup import containment_join

    exact = _cpairs(_naive_containment(docs, 0.8))
    capped = _cpairs(containment_join(docs, threshold=0.8, gram_rank_cap=5))
    assert capped == exact


def test_select_canonical_hand_case(spark):
    from kgforge.operators.dedup import select_canonical

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7)], "doc_id long, score long"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in select_canonical(docs, clusters, "score").collect()
    }
    # cluster 1: docs 2 and 3 tie on score 50 -> smallest doc_id (2) wins
    assert out == {1: (1, False), 2: (1, True), 3: (1, False), 4: (4, True)}


def test_broadcast_guard_fires_before_collect(spark, monkeypatch):
    """The max_broadcast_rows guard must refuse an over-sized corpus
    BEFORE any driver-side materialization: a spy on DataFrame.collect
    proves zero rows are ever collected when the ValueError fires."""
    import pyspark.sql as pssql
    import pytest as _pytest

    from kgforge.operators.similarity import embedding_cosine_pairs

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    calls = []
    orig = pssql.DataFrame.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(pssql.DataFrame, "collect", spy)
    with _pytest.raises(ValueError, match="max_broadcast_rows"):
        embedding_cosine_pairs(emb, threshold=0.9, max_broadcast_rows=10)
    assert calls == []  # guard decided from a count, never a collect
