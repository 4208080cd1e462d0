"""Unigram language-model document scoring (CCNet-style quality signal).

The canonical web-corpus quality filter (Wenzek et al., CCNet; GPT-3 /
CommonCrawl filtering) scores each document by a language model trained on
a trusted corpus and drops the worst tail. This module implements the
distributed unigram variant: train = one global token-count aggregate;
score = join each document's tokens against the model and sum log
probabilities. (The reference parses one file at a time and has no corpus
statistics layer; this is training-data infrastructure the north rule's
crawl-scale input needs.)

Model: add-alpha-smoothed unigram, p(t) = (c_t + a) / (T + a*(V+1)),
with one shared OOV bucket taking c=0 — so probabilities sum to <1 over
the open vocabulary and unseen tokens at score time get a proper mass.

Scale design (the 100-TB shape):
- TRAIN is one explode + one map-side-combined groupBy(token): Zipf means
  almost all mass combines in the map phase; the reduce side sees the
  vocab, not the corpus. Totals (T, V) ride a 1-row cross join — no
  driver collect in the plan.
- `max_vocab` caps the model at the top-K tokens by count (one vocab-sized
  top-K, corpus never re-scanned); the tail folds into the OOV bucket.
  A capped model broadcasts, making SCORE a zero-shuffle-per-token pass:
  explode -> broadcast-hash join -> per-doc partial agg. Uncapped models
  shuffle-join on token with AQE handling the Zipf-head skew.
- Tokenization matches text_stats.token_count_col (trim + split on \\s+),
  so n_tokens agrees with every other token-counted surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def unigram_lm_train(
    docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    max_vocab: int | None = None,
) -> DataFrame:
    """Token model table: (token, logp) plus one OOV row (token NULL).
    logp = ln((c + alpha) / (T + alpha*(V+1))); the OOV row carries c=0.
    V and T always count the FULL vocabulary/corpus — capping only limits
    which tokens keep a dedicated row (the tail scores as OOV)."""
    trimmed = F.trim(F.col(text_col))
    tokens = docs.filter(trimmed != "").select(
        F.explode(F.split(trimmed, r"\s+")).alias("token")
    )
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("T"), F.count(F.lit(1)).alias("V")
    )
    if max_vocab is not None:
        counts = counts.orderBy(F.col("c").desc(), F.col("token")).limit(max_vocab)
    kept = counts.crossJoin(F.broadcast(totals))
    oov = totals.select(F.lit(None).cast("string").alias("token"), F.lit(0).alias("c"), "T", "V")
    denom = F.col("T") + F.lit(alpha) * (F.col("V") + 1)
    return kept.unionByName(oov).select(
        "token",
        F.log((F.col("c") + F.lit(alpha)) / denom).alias("logp"),
    )


def unigram_lm_score(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document LM score: (id, n_tokens, sum_logp, avg_logp). Blank
    documents produce no row (no tokens, no evidence). avg_logp is the
    negative cross-entropy in nats — higher is more in-distribution;
    filter on it like CCNet's perplexity cut."""
    trimmed = F.trim(F.col(text_col))
    toks = docs.filter(trimmed != "").select(
        F.col(id_col), F.explode(F.split(trimmed, r"\s+")).alias("token")
    )
    known = lm.filter(F.col("token").isNotNull())
    if broadcast_model:
        known = F.broadcast(known)
    oov_logp = lm.filter(F.col("token").isNull()).select(
        F.col("logp").alias("oov_logp")
    )
    scored = (
        toks.join(known, "token", "left")
        .crossJoin(F.broadcast(oov_logp))
        .select(F.col(id_col), F.coalesce("logp", "oov_logp").alias("logp"))
    )
    # ORDER-FREE per-doc reduction: each logp rounds once to a
    # decimal(38,12) (deterministic for a given double), decimal addition
    # is exact, and avg is one final float division — so the 6-dp compare
    # cannot flip with partition/summation order (the covariance idiom)
    sum_dec = F.sum(F.col("logp").cast("decimal(38,12)"))
    n = F.count(F.lit(1))
    return scored.groupBy(id_col).agg(
        n.alias("n_tokens"),
        sum_dec.cast("double").alias("sum_logp"),
        (sum_dec.cast("double") / n).alias("avg_logp"),
    )


def ccnet_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    score_col: str = "avg_logp",
    head_frac: float = 1.0 / 3.0,
    middle_frac: float = 1.0 / 3.0,
    decimals: int = 6,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. §4.4): per language,
    the best ``head_frac`` of documents by LM score -> 'head', the next
    ``middle_frac`` -> 'middle', the rest -> 'tail'. Input rows carry
    (id, lang, score); output (id, lang, score_r, bucket).

    Scale design — NO per-language sort of data rows: scores are rounded
    to ``decimals`` (also what makes the boundary robust to cross-engine
    last-ulp float drift), aggregated to a per-(lang, score) HISTOGRAM,
    and the cutoffs come from a cumulative sum over histogram rows only —
    the window partitions by language and touches score-cardinality rows
    (bounded by score-range * 10^decimals), not document rows. Cutoffs
    broadcast back; assignment is a pure comparison. Tie semantics:
    every document sharing the boundary score lands in the better bucket
    (deterministic, slightly overfills head/middle).
    """
    from pyspark.sql import Window

    s_r = F.round(F.col(score_col), decimals)
    # persisted: the rounded score table is read TWICE (histogram build +
    # final bucket assignment); unpersisted, the upstream LM scoring
    # (token explode + model join) would run once per consumer. At
    # cluster scale write it as a stage table instead.
    base = scored.select(
        F.col(id_col), F.col(lang_col), s_r.alias("score_r")
    ).persist()
    hist = base.groupBy(lang_col, "score_r").agg(F.count(F.lit(1)).alias("cnt"))
    n = hist.groupBy(lang_col).agg(F.sum("cnt").alias("n"))
    w = (
        Window.partitionBy(lang_col)
        .orderBy(F.desc("score_r"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("ccnt", F.sum("cnt").over(w)).join(n, lang_col)
    cuts = cum.groupBy(lang_col).agg(
        F.max(
            F.when(
                F.col("ccnt") >= F.ceil(F.col("n") * F.lit(head_frac)),
                F.col("score_r"),
            )
        ).alias("cut1"),
        F.max(
            F.when(
                F.col("ccnt")
                >= F.ceil(F.col("n") * F.lit(head_frac + middle_frac)),
                F.col("score_r"),
            )
        ).alias("cut2"),
    )
    bucket = (
        F.when(F.col("score_r") >= F.col("cut1"), F.lit("head"))
        .when(F.col("score_r") >= F.col("cut2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return base.join(F.broadcast(cuts), lang_col).select(
        id_col, lang_col, "score_r", bucket.alias("bucket")
    )


def bigram_lm_train(
    docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Bigram model table: (prev, token, logp) for every seen bigram,
    plus one (prev, NULL) backoff row per seen context (the mass an
    unseen continuation of a known context gets) and one (NULL, NULL)
    row for unseen contexts (uniform 1/(V+1)). Add-alpha smoothing:
    p(b|a) = (c_ab + alpha) / (c_a + alpha*(V+1)).

    Scale shape: bigrams are built IN-ROW (arrays_zip of two slices of
    the token array — no window, no self-join), then ONE map-side-
    combined (prev, token) count; context counts reduce the bigram table
    itself; V/T ride a broadcast 1-row agg. Zipf mass combines map-side
    exactly like the unigram trainer.
    """
    trimmed = F.trim(F.col(text_col))
    tk = F.split(trimmed, r"\s+")
    pairs = docs.filter(trimmed != "").select(
        F.explode(
            F.arrays_zip(
                F.slice(tk, 1, F.size(tk) - 1).alias("prev"),
                F.slice(tk, 2, F.size(tk) - 1).alias("token"),
            )
        ).alias("bg")
    ).select(F.col("bg.prev").alias("prev"), F.col("bg.token").alias("token"))
    counts = pairs.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("c_ab"))
    ctx = counts.groupBy("prev").agg(F.sum("c_ab").alias("c_a"))
    tokens = docs.filter(trimmed != "").select(F.explode(tk).alias("t"))
    totals = tokens.agg(F.count_distinct("t").alias("V"))
    a = F.lit(float(alpha))
    denom = F.col("c_a") + a * (F.col("V") + 1)
    seen = (
        counts.join(ctx, "prev")
        .crossJoin(F.broadcast(totals))
        .select("prev", "token", F.log((F.col("c_ab") + a) / denom).alias("logp"))
    )
    miss = ctx.crossJoin(F.broadcast(totals)).select(
        "prev",
        F.lit(None).cast("string").alias("token"),
        F.log(a / denom).alias("logp"),
    )
    unseen = totals.select(
        F.lit(None).cast("string").alias("prev"),
        F.lit(None).cast("string").alias("token"),
        F.log(F.lit(1.0) / (F.col("V") + 1)).alias("logp"),
    )
    return seen.unionByName(miss).unionByName(unseen)


def bigram_lm_score(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram LM score: (id, n_bigrams, sum_logp, avg_logp).
    Documents with fewer than two tokens produce no row (no bigram, no
    evidence). Lookup order: seen bigram -> known-context backoff ->
    uniform unseen-context mass — all three rows come from the same model
    table, so scoring is two keyed joins + one broadcast scalar, never
    Python."""
    trimmed = F.trim(F.col(text_col))
    tk = F.split(trimmed, r"\s+")
    pairs = docs.filter(trimmed != "").select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(tk, 1, F.size(tk) - 1).alias("prev"),
                F.slice(tk, 2, F.size(tk) - 1).alias("token"),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.token").alias("token"))
    seen = lm.filter(F.col("token").isNotNull()).select(
        "prev", "token", F.col("logp").alias("lp_seen")
    )
    miss = lm.filter(F.col("token").isNull() & F.col("prev").isNotNull()).select(
        "prev", F.col("logp").alias("lp_miss")
    )
    unseen = lm.filter(F.col("prev").isNull()).select(
        F.col("logp").alias("lp_unseen")
    )
    scored = (
        pairs.join(seen, ["prev", "token"], "left")
        .join(miss, "prev", "left")
        .crossJoin(F.broadcast(unseen))
        .select(
            id_col,
            F.coalesce("lp_seen", "lp_miss", "lp_unseen").alias("logp"),
        )
    )
    # order-free decimal reduction — see unigram_lm_score
    sum_dec = F.sum(F.col("logp").cast("decimal(38,12)"))
    n = F.count(F.lit(1))
    return scored.groupBy(id_col).agg(
        n.cast("bigint").alias("n_bigrams"),
        sum_dec.cast("double").alias("sum_logp"),
        (sum_dec.cast("double") / n).alias("avg_logp"),
    )
