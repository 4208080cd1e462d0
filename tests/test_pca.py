"""Distributed Gramian/covariance/PCA vs numpy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgforge.operators.pca import covariance_matrix, pca_components, pca_project


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud so PCA has a well-separated spectrum
    X = rng.normal(size=(200, 6)) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    X = X + np.array([1.0, -2.0, 0.0, 3.0, 0.0, 0.5])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    return X, df


def test_covariance_matches_numpy(spark, data):
    X, df = data
    truth = np.cov(X, rowvar=False, bias=True)  # population covariance
    got = {
        (r.i, r.j): r.cov
        for r in covariance_matrix(df, scale_bits=None).collect()
    }
    assert len(got) == 6 * 7 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(truth[i, j], abs=1e-9)


def test_covariance_fixed_point_partition_invariant(spark, data):
    """The default (quantized) path must produce BIT-IDENTICAL covariances
    under any partition/batch layout — the property the DuckDB value
    oracle depends on — while staying within quantization error of the
    float truth (|x| ~ 15 here, so ~1e-4 at scale_bits=20)."""
    X, df = data
    truth = np.cov(X, rowvar=False, bias=True)
    layouts = [
        df.coalesce(1),
        df.repartition(7),
        df.repartition(32, "vec_id"),
    ]
    results = []
    for lay in layouts:
        got = {
            (r.i, r.j): r.cov for r in covariance_matrix(lay).collect()
        }
        results.append(got)
    assert results[0] == results[1] == results[2]  # exact, not approx
    for (i, j), v in results[0].items():
        assert v == pytest.approx(truth[i, j], abs=1e-4)


def test_components_match_numpy_eigh(spark, data):
    X, df = data
    mean, comps = pca_components(df, k=3)
    assert mean == pytest.approx(X.mean(axis=0), abs=1e-9)
    truth_vals, truth_vecs = np.linalg.eigh(np.cov(X, rowvar=False, bias=True))
    for r in range(3):
        tv = truth_vecs[:, ::-1][:, r]
        # same axis up to sign
        assert abs(abs(comps[r] @ tv) - 1.0) < 1e-9
        # sign convention: largest-|.| coordinate positive
        assert comps[r, np.argmax(np.abs(comps[r]))] > 0


def test_projection_matches_numpy(spark, data):
    X, df = data
    mean, comps = pca_components(df, k=2)
    truth = (X - X.mean(axis=0)) @ comps.T
    got = {r.vec_id: r.pc for r in pca_project(df, k=2).collect()}
    assert len(got) == 200
    for i in range(200):
        assert np.asarray(got[i]) == pytest.approx(truth[i], abs=1e-9)


def test_projection_variance_is_eigenvalue_ordered(spark, data):
    X, df = data
    out = pca_project(df, k=3).select(F.explode("pc").alias("v"), F.lit(1))
    # variance along pc0 >= pc1 >= pc2 (computed from collected projections)
    P = np.asarray([r.pc for r in pca_project(df, k=3).collect()])
    var = P.var(axis=0)
    assert var[0] > var[1] > var[2] > 0


def test_partial_reduction_is_corpus_size_free(spark, data):
    _, df = data
    from kgforge.operators.pca import gramian_partials

    parts = gramian_partials(df).collect()
    # one partial row per non-empty input partition, not per input row
    assert 0 < len(parts) <= 5
    assert sum(p.n for p in parts) == 200


def test_jl_projection_matches_numpy_and_preserves_distances(spark):
    import numpy as np
    from kgforge.operators.pca import jl_project, jl_sign_matrix

    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 64))
    df = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(X)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    R = jl_sign_matrix(64, 16)
    got = {r.vec_id: np.asarray(r.pc) for r in jl_project(df, k=16, dim=64).collect()}
    truth = X @ R
    for i in range(300):
        assert got[i] == pytest.approx(truth[i], abs=1e-12)
    # JL property: pairwise sq-distances preserved within a loose factor
    pairs = [(0, 1), (5, 99), (200, 250), (17, 18)]
    for a, b in pairs:
        d_orig = ((X[a] - X[b]) ** 2).sum()
        d_proj = ((truth[a] - truth[b]) ** 2).sum()
        assert 0.35 < d_proj / d_orig < 1.9


def test_jl_sign_matrix_is_deterministic_and_balanced():
    import numpy as np
    from kgforge.operators.pca import jl_sign_matrix

    A = jl_sign_matrix(64, 8)
    B = jl_sign_matrix(64, 8)
    assert (A == B).all()
    signs = np.sign(A)
    # md5 parity should be near-balanced
    assert abs(signs.sum()) < 0.25 * signs.size
