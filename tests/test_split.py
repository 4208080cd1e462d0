"""Leakage-safe split: cluster-atomic invariant + deterministic hash pin."""

import hashlib


def _split_of(cluster_id: int, seed: int, val_pct: int) -> str:
    key = f"split\x1f{cluster_id}\x1f{seed}"
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 100
    return "val" if h < val_pct else "train"


def test_split_respects_clusters_and_hash(spark):
    from kgforge.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(20)], "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5)], "doc_id long, cluster_id long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in leakage_safe_split(docs, clusters, val_pct=30, seed=21).collect()
    }
    assert len(rows) == 20
    # cluster-atomic: whole cluster on the same side
    assert rows[0] == rows[1] == rows[2]
    assert rows[5] == rows[6]
    # singletons: cluster = own id
    assert rows[7][0] == 7
    # exact hash pin for every row
    for did, (cid, split) in rows.items():
        assert split == _split_of(cid, 21, 30), did


def test_split_derives_clusters_from_near_dups(spark):
    from kgforge.operators.sampling import leakage_safe_split

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + "tail"),          # near-dup of 1
            (3, "completely different words entirely " * 10),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in leakage_safe_split(docs, val_pct=50, seed=3).collect()
    }
    # near-dups share a cluster and therefore a split
    assert rows[1][0] == rows[2][0]
    assert rows[1][1] == rows[2][1]
    assert rows[3][0] == 3


def test_distribution_drift_psi_pin(spark):
    """PSI terms vs a hand computation incl. a one-sided bin."""
    import math

    from kgforge.operators.sampling import distribution_drift

    a = spark.createDataFrame([("en",)] * 8 + [("de",)] * 2, "lang string")
    b = spark.createDataFrame([("en",)] * 5 + [("fr",)] * 5, "lang string")
    got = {r["bin"]: r for r in distribution_drift(a, b, "lang").collect()}
    assert set(got) == {"en", "de", "fr"}
    k = 3.0
    for bin_, na, nb in [("en", 8, 5), ("de", 2, 0), ("fr", 0, 5)]:
        pa = (na + 0.5) / (10 + 0.5 * k)
        pb = (nb + 0.5) / (10 + 0.5 * k)
        assert got[bin_]["n_a"] == na and got[bin_]["n_b"] == nb
        assert got[bin_]["share_a"] == round(pa, 6)
        assert got[bin_]["psi_term"] == round((pa - pb) * math.log(pa / pb), 6)
    # identical snapshots -> every term 0
    same = distribution_drift(a, a, "lang").collect()
    assert all(r["psi_term"] == 0.0 for r in same)
