"""Byte-pair-encoding subword tokenization: distributed merge learning.

BPE (Sennrich et al. 2016) is the tokenizer family behind most LLM vocabs;
a training-data engine needs it both to COUNT tokens accurately and to
BUILD vocabularies from the corpus it curates. The classic scale insight
makes this Spark-friendly: after ONE corpus-shaped aggregation (word ->
count), everything iterates on the word-frequency table, which is
vocabulary-sized (10^6-ish rows at any corpus size) — so 100 TB of text
costs one tokenize+agg pass, and each merge iteration is a small,
AQE-managed shuffle over the vocab table, independent of corpus size.

Per iteration:
  1. adjacent-symbol pairs exploded from each word's symbol array,
     weighted by word count, aggregated map-side-combined;
  2. the argmax pair via ONE 1-row max(struct) agg (count desc, then
     lexicographic (a, b) for determinism) — collected to the driver as
     bounded metadata (one row per merge, the codebase's scalar
     convention);
  3. the merge applied to every word's symbol array as a pure codegen
     left fold (F.aggregate) — leftmost-first, non-overlapping, exactly
     the reference semantics; no Python touches the vocab table.

The word table is localCheckpointed every few merges to keep the plan
from growing linearly with merge count (same idiom as the CC operator).

Encoding with a LEARNED merge list is inherently per-word-iterative, so
``bpe_encode`` runs it in an Arrow-batched pandas UDF over the (small)
distinct-word table and broadcast-joins the result back to the corpus —
the corpus itself never passes through Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: whitespace words (lowercased) -> (word, cnt)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def _symbolize(words: DataFrame) -> DataFrame:
    """(word, cnt) -> (word, cnt, syms array<string>): character symbols
    with a '</w>' end-of-word marker glued to the last char, per the
    original BPE formulation (keeps word-final merges distinct)."""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    syms = F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit("</w>"))),
    )
    single = F.array(F.concat(F.element_at(chars, -1), F.lit("</w>")))
    return words.select(
        "word", "cnt", F.when(n == 1, single).otherwise(syms).alias("syms")
    )


def pair_counts(symbolized: DataFrame) -> DataFrame:
    """(word, cnt, syms) -> (a, b, pair_cnt): adjacent-symbol pair counts
    weighted by word frequency. Pure codegen: in-row transform builds the
    pair list (no posexplode self-join), one map-side-combined agg."""
    pairs = symbolized.filter(F.size("syms") >= 2).select(
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms)-1), i -> struct(syms[i-1] AS a, syms[i] AS b))"
            )
        ).alias("p"),
    )
    return (
        pairs.select("cnt", "p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.sum("cnt").cast("bigint").alias("pair_cnt"))
    )


def _apply_merge(syms, a: str, b: str):
    """Codegen left fold merging adjacent (a, b) -> a||b, leftmost-first,
    non-overlapping: the merged symbol can never re-match ``a`` (it is
    strictly longer), so 'replace the tail if it is a pending a' is exact."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_learn(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns
    [(a, b, rank)] in merge order. Ties break lexicographically on (a, b)
    so the result is deterministic on any partitioning."""
    words = _symbolize(word_counts(docs, text_col=text_col))
    # single-action lineage cut: the vocab table is re-derived every
    # iteration otherwise (each merge adds a fold on top)
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for rank in range(num_merges):
        top = (
            pair_counts(words)
            .agg(
                F.max(
                    F.struct(
                        F.col("pair_cnt"),
                        # deterministic tie-break: lexicographically
                        # LARGEST (a, b) among equal counts — one
                        # combinable max(struct), no sort
                        F.col("a"),
                        F.col("b"),
                    )
                ).alias("m")
            )
            .collect()  # bounded: exactly one row per merge iteration
        )
        if not top or top[0]["m"] is None:
            break
        m = top[0]["m"]
        if m["pair_cnt"] is None or m["pair_cnt"] < 1:
            break
        a, b = m["a"], m["b"]
        merges.append((a, b, rank))
        words = words.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if (rank + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    return spark.createDataFrame(merges, "a string, b string, rank int")


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference single-word BPE encode: repeatedly merge the best-ranked
    adjacent pair. O(len^2 * merges) worst case — fine per word."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + "</w>"]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms = syms[:best] + [syms[best] + syms[best + 1]] + syms[best + 2 :]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text) -> (id, n_words, n_bpe_tokens): encode with a learned
    merge list. The per-word merge loop runs in an Arrow-batched pandas
    UDF over the DISTINCT-word table only (vocab-sized — the corpus never
    enters Python), then broadcast/AQE-joins token lengths back onto the
    exploded corpus and re-aggregates per document."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    ranks = {(a, b): r for a, b, r in merges}

    # NOTE: no type hints — the module's `from __future__ import
    # annotations` would stringify them and break pyspark's hint resolver;
    # the explicit returnType selects the scalar Arrow eval type instead
    def _tok_len(words):
        return words.map(lambda w: len(_encode_word(w, ranks)))

    tok_len = pandas_udf(_tok_len, IntegerType())

    corpus = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    vocab = corpus.select("word").distinct().withColumn("n_tok", tok_len("word"))
    return (
        corpus.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
        )
    )
