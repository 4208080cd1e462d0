"""Distributed PCA over the embedding column: Gramian partials + bounded
driver eigendecomposition.

Embedding-space analytics (SemDeDup clustering, IVF centroid quality, ANN
recall triage, drift monitoring) all want the corpus' second-moment
structure. At 100 TB you cannot ship vectors to the driver — but you never
need to: for dim-d embeddings the covariance is a d x d matrix, and X^T X
is an *associative* per-partition partial. The classic two-step:

1. **Gramian partials** (distributed, Arrow-vectorized): each input batch
   contributes (n, sum-vector, X^T X flattened) computed by one numpy GEMM
   — thousands of FLOPs per row, exactly the workload numpy beats codegen
   at, batch-at-a-time so nothing materializes per row. Partials are then
   reduced by a posexplode + groupBy-index sum: the shuffle carries ONE row
   of d + d^2 doubles per Arrow batch, independent of corpus size.
2. **Covariance assembly / eigendecomposition** (bounded): cov_ij =
   g_ij/n - mean_i*mean_j (population form, mirrored by the DuckDB oracle
   as avg(xi*xj) - avg(xi)*avg(xj)). ``pca_components`` collects the d x d
   matrix — bounded metadata, NOT data — runs ``numpy.linalg.eigh`` on the
   driver, and broadcasts the top-k components back for projection.

Eigenvector sign is fixed deterministically (the largest-|.| coordinate of
each component is made positive) so projections are reproducible across
runs and numpy versions.

The reference has no embedding surface at all; this belongs to the
engine's LLM-data-pipeline mandate (similarity/dedup family, next to
similarity.py and quantize.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gramian_partials(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One row per Arrow batch: (n, s = column sums, g = X^T X flattened
    row-major). The only data-dependent cost is the per-batch GEMM."""

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    return emb.select(vec_col).mapInPandas(
        part, schema="n long, s array<double>, g array<double>"
    )


def covariance_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """-> (i, j, cov) for the upper triangle i <= j (population covariance).

    Reduction shape: partials posexplode to (index, value) and groupBy-sum —
    at most (d^2 + d) * n_batches shuffled doubles, corpus-size-free."""
    partials = gramian_partials(emb, vec_col).persist()

    n_row = partials.agg(F.sum("n").alias("n"))
    sums = (
        partials.select(F.posexplode("s").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("s"))
    )
    grams = (
        partials.select(F.posexplode("g").alias("ij", "v"))
        .groupBy("ij")
        .agg(F.sum("v").alias("g"))
    )
    dim = F.col("dim")
    out = (
        grams.crossJoin(F.broadcast(n_row))
        .crossJoin(F.broadcast(sums.agg(F.count("*").alias("dim"))))
        .withColumn("i", (F.col("ij") / dim).cast("int"))
        .withColumn("j", (F.col("ij") % dim).cast("int"))
        .filter(F.col("i") <= F.col("j"))
        .join(F.broadcast(sums.select(F.col("i"), F.col("s").alias("si"))), "i")
        .join(
            F.broadcast(sums.select(F.col("i").alias("j"), F.col("s").alias("sj"))),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.col("g") / F.col("n")
                - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n"))
            ).alias("cov"),
        )
    )
    return out


def pca_components(
    emb: DataFrame, k: int, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """-> (mean[d], components[k, d]) — top-k eigenvectors of the population
    covariance, sign-fixed. Driver traffic is the d x d matrix only."""
    partials = gramian_partials(emb, vec_col)
    agg = partials.select(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("s"),
            F.expr("null").cast("array<double>"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.zip_with(acc, x, lambda a, b: a + b)
            ),
        ).alias("s"),
        F.aggregate(
            F.collect_list("g"),
            F.expr("null").cast("array<double>"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.zip_with(acc, x, lambda a, b: a + b)
            ),
        ).alias("g"),
    ).first()
    n, s, g = agg["n"], np.asarray(agg["s"]), np.asarray(agg["g"])
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :k].T  # rows = components, descending eigenvalue
    # deterministic sign: largest-|.| coordinate positive
    for r in range(comps.shape[0]):
        if comps[r, np.argmax(np.abs(comps[r]))] < 0:
            comps[r] = -comps[r]
    return mean, comps


def jl_sign_matrix(dim: int, k: int) -> np.ndarray:
    """Deterministic Johnson-Lindenstrauss sign matrix R[dim, k]: entry
    (i, j) is +-1/sqrt(k) by the parity of the repo's standard md5-hex ->
    int64 key (md5(f"{i}\\x1f{j}")[:15] as hex). Achlioptas (2003) shows
    +-1 entries satisfy the JL lemma; deriving them from a hash instead of
    an RNG makes the sketch reproducible across engines — DuckDB rebuilds
    the identical matrix in SQL, so the projection is value-oracle-able."""
    import hashlib

    R = np.empty((dim, k), dtype=np.float64)
    for i in range(dim):
        for j in range(k):
            h = int(hashlib.md5(f"{i}\x1f{j}".encode()).hexdigest()[:15], 16)
            R[i, j] = 1.0 if h % 2 == 0 else -1.0
    return R / np.sqrt(k)


def jl_project(
    emb: DataFrame,
    k: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = None,
) -> DataFrame:
    """-> (id_col, pc array<double>[k]): distance-preserving JL sketch.

    Map-only: the k x dim matrix rides the closure (a few KB), projection
    is one numpy GEMM per Arrow batch — the cheap front-end for ANN
    pre-filtering or dedup blocking when d is large."""
    R = jl_sign_matrix(dim, k)

    def proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = X @ R
            if round_digits is not None:
                P = P.round(round_digits)
            yield pd.DataFrame({id_col: pdf[id_col], "pc": list(map(list, P))})

    return emb.select(id_col, vec_col).mapInPandas(
        proj, schema=f"{id_col} long, pc array<double>"
    )


def pca_project(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = None,
) -> DataFrame:
    """-> (id_col, pc array<double>[k]): mean-centered projection onto the
    top-k principal components. Components ride the closure as a broadcast
    ~k*d doubles; the projection itself is one numpy GEMM per batch."""
    mean, comps = pca_components(emb, k, vec_col)
    ct = comps.T.copy()

    def proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = (X - mean) @ ct
            if round_digits is not None:
                P = P.round(round_digits)
            yield pd.DataFrame({id_col: pdf[id_col], "pc": list(map(list, P))})

    return emb.select(id_col, vec_col).mapInPandas(
        proj, schema=f"{id_col} long, pc array<double>"
    )
