"""Sliding-window token chunking — the pretraining-prep step that turns
variable-length documents into model-sized pieces.

Standard LLM data-prep (GPT-2/3 style packing pipelines, RAG indexers)
slices each document into windows of ``chunk_size`` tokens advancing by
``chunk_size - overlap`` so adjacent chunks share ``overlap`` tokens of
context; the last window may be short but every token is covered exactly
once by some window start.

Pure codegen — split / sequence / explode / slice / array_join, no
Python per row, no shuffle at all: chunking is document-confined, so the
operator preserves the input partitioning (at 100 TB it pipelines into
whatever scan produced the documents). Tokenization matches
text_stats.token_count_col (trim + split on whitespace).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_text): chunk k covers tokens
    [1 + k*stride, ... + chunk_size), stride = chunk_size - overlap;
    n_chunks = 1 + ceil(max(0, n - chunk_size) / stride). Blank documents
    produce no chunks."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    trimmed = F.trim(F.col(text_col))
    toks = F.split(trimmed, r"\s+")
    n = F.size(toks)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.lit(0), n - F.lit(chunk_size)) / F.lit(stride)
    ).cast("int")
    chunks = (
        docs.filter(trimmed != "")
        .select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_size
            ).alias("_chunk"),
        )
    )
    return chunks.select(
        id_col,
        "chunk_id",
        F.size("_chunk").alias("n_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )
