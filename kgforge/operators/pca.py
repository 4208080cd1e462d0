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


def gramian_partials(
    emb: DataFrame, vec_col: str = "embedding", scale_bits: int | None = None
) -> DataFrame:
    """One row per Arrow batch: (n, s = column sums, g = X^T X flattened
    row-major). The only data-dependent cost is the per-batch GEMM.

    With ``scale_bits`` set, inputs are first quantized to fixed-point
    integers ``xq = floor(x * 2**scale_bits + 0.5)`` and the partials are
    EXACT int64 sums: x * 2**b is an exact IEEE op (power-of-two multiply
    only shifts the exponent), and + 0.5 / floor round identically in any
    IEEE engine — so Spark and a SQL oracle derive bit-identical integers
    from the same input, and integer sums are order-free. In-batch int64
    headroom: n_batch * (max|x| * 2**b)**2 must stay < 2**63 — for unit-
    scale embeddings at b=20 that allows ~10**6-row batches (Arrow batches
    are 10**4); cross-batch reduction widens to decimal(38,0) upstream."""

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if scale_bits is not None:
                Xq = np.floor(X * float(2**scale_bits) + 0.5).astype(np.int64)
                yield pd.DataFrame(
                    {
                        "n": [len(Xq)],
                        "s": [Xq.sum(axis=0, dtype=np.int64).tolist()],
                        "g": [(Xq.T @ Xq).ravel().tolist()],
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "n": [len(X)],
                        "s": [X.sum(axis=0).tolist()],
                        "g": [(X.T @ X).ravel().tolist()],
                    }
                )

    elem = "long" if scale_bits is not None else "double"
    return emb.select(vec_col).mapInPandas(
        part, schema=f"n long, s array<{elem}>, g array<{elem}>"
    )


def covariance_matrix(
    emb: DataFrame, vec_col: str = "embedding", scale_bits: int | None = 20
) -> DataFrame:
    """-> (i, j, cov) for the upper triangle i <= j (population covariance).

    Reduction shape: partials posexplode to (index, value) and groupBy-sum —
    at most (d^2 + d) * n_batches shuffled values, corpus-size-free.

    Default ``scale_bits=20`` selects the PARTITION-INVARIANT fixed-point
    path: inputs quantize to exact integers (see :func:`gramian_partials`),
    per-index sums accumulate in decimal(38,0) — exact and order-free under
    ANY partitioning/batch layout — and only the final covariance assembly
    touches floats, via one fixed expression ``(g/n - (s_i/n)(s_j/n)) /
    2**(2*scale_bits)`` that a SQL oracle replays bit-for-bit. The float32
    quantization error (~2**-(scale_bits+1) per value) is far below the
    6-dp reporting precision; ``scale_bits=None`` keeps the raw float64
    path (order-sensitive in the last ulp, for numpy-parity use)."""
    partials = gramian_partials(emb, vec_col, scale_bits=scale_bits).persist()

    def _acc(v):
        return v.cast("decimal(38,0)") if scale_bits is not None else v

    n_row = partials.agg(F.sum("n").alias("n"))
    sums = (
        partials.select(F.posexplode("s").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum(_acc(F.col("v"))).alias("s"))
    )
    grams = (
        partials.select(F.posexplode("g").alias("ij", "v"))
        .groupBy("ij")
        .agg(F.sum(_acc(F.col("v"))).alias("g"))
    )
    if scale_bits is not None:
        g_d, si_d, sj_d = (
            F.col("g").cast("double"),
            F.col("si").cast("double"),
            F.col("sj").cast("double"),
        )
        descale = F.lit(float(2 ** (2 * scale_bits)))
    else:
        g_d, si_d, sj_d = F.col("g"), F.col("si"), F.col("sj")
        descale = F.lit(1.0)
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
                (g_d / F.col("n") - (si_d / F.col("n")) * (sj_d / F.col("n")))
                / descale
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
    pre-filtering or dedup blocking when d is large.

    With ``round_digits`` set (the value-oracled mode) the projection is
    PARTITION- and SUMMATION-ORDER-INVARIANT: the ±1/sqrt(k) matrix
    factors as sign matrix over 1/sqrt(k), inputs quantize to exact
    fixed-point ints (floor(x·2^20+0.5)), the dot against ±1 signs is an
    EXACT int64 GEMM, and one fixed float expression
    dot / (sqrt(k)·2^20) descales — bit-replayable in SQL regardless of
    BLAS/SQL accumulation order (the covariance idiom)."""
    R = jl_sign_matrix(dim, k)

    def proj(batches):
        signs = np.rint(R * np.sqrt(k)).astype(np.int64)  # exact ±1
        denom = np.sqrt(float(k)) * 1048576.0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if round_digits is not None:
                Xq = np.floor(X * 1048576.0 + 0.5).astype(np.int64)
                P = ((Xq @ signs).astype(np.float64) / denom).round(
                    round_digits
                )
            else:
                P = X @ R
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
