"""Deterministic sampling for training-corpus assembly.

A pretraining pipeline needs reproducible subsampling: the same corpus +
the same config must yield byte-identical samples across reruns, engines,
and cluster sizes (resume/lineage depends on it). Spark's ``DataFrame
.sample`` is seed-stable only per partitioning, so these operators derive
keep decisions from the ROW KEY alone via an arithmetic hash (Knuth
multiplicative), never from partition layout:

- ``hash_sample``: keep rows whose key-hash falls under fraction * 2^32 —
  a single codegen filter, no shuffle, scale-free.
- ``stratified_sample``: exact per-stratum counts — rank rows inside each
  stratum by key-hash and keep ceil(fraction * stratum_size). One window
  per stratum (sort by int64, map-side light); for 100-TB strata switch
  to hash_sample whose expected (not exact) rate needs no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_KNUTH = 2654435761  # 2^32 / golden ratio, odd -> bijective mod 2^32
_M32 = 4294967296


def sample_hash_col(key: str = "doc_id"):
    """int64 Knuth multiplicative hash of an integer key column — identical
    arithmetic is expressible in ANSI SQL for oracle parity."""
    return (F.col(key).cast("long") * F.lit(_KNUTH)) % F.lit(_M32)


def hash_sample(df: DataFrame, fraction: float, key: str = "doc_id") -> DataFrame:
    """Keep ~fraction of rows, decided per-row from the key hash only."""
    return df.filter(sample_hash_col(key) < F.lit(int(fraction * _M32)))


def stratified_sample(
    df: DataFrame, strata: str, fraction: float, key: str = "doc_id"
) -> DataFrame:
    """Exact-count stratified sample: ceil(fraction * n) rows per stratum,
    chosen as the lowest key-hashes (deterministic, engine-independent)."""
    w = Window.partitionBy(strata).orderBy(sample_hash_col(key).asc(), F.col(key).asc())
    cnt = Window.partitionBy(strata)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_take", F.ceil(F.count("*").over(cnt) * F.lit(fraction)))
        .filter(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
    )


def domain_mix(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-domain corpus mix + temperature-scaled sampling weights:
    (domain, n_docs, n_tokens, token_share, sample_weight) where
    sample_weight ~ token_share^alpha renormalized (alpha<1 upsamples the
    tail, alpha=1 is proportional -- the standard multi-domain pretraining
    rebalance). Shares/weights rounded to 6 dp for engine-independence.

    Scale shape: one map-side-combined groupBy(domain) computes docs +
    token sums (the token expression is pure codegen,
    text_stats.token_count_col); the two global scalars (total tokens,
    share^alpha normalizer) are 1-row aggregates over the POST-aggregation
    domain table (cardinality = #domains, not #docs) crossJoin-broadcast
    back -- no driver collect, no second pass over the corpus.
    """
    from kgforge.operators.text_stats import token_count_col

    per = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_col(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("_tot"))
    # degenerate all-empty corpus (total tokens = 0): defined output instead
    # of NULL shares — every domain gets share 0.0 and a uniform weight
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "_share",
        F.when(F.col("_tot") > 0, F.col("n_tokens") / F.col("_tot")).otherwise(
            F.lit(0.0)
        ),
    )
    z = shared.agg(
        F.sum(F.pow("_share", F.lit(alpha))).alias("_z"),
        F.count("*").cast("double").alias("_nd"),
    )
    return (
        shared.crossJoin(F.broadcast(z))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            F.round("_share", 6).alias("token_share"),
            F.round(
                F.when(
                    F.col("_z") > 0, F.pow("_share", F.lit(alpha)) / F.col("_z")
                ).otherwise(F.lit(1.0) / F.col("_nd")),
                6,
            ).alias("sample_weight"),
        )
    )


def domain_rates(mix: DataFrame, budget: float = 0.5) -> DataFrame:
    """(domain, keep_rate) realizing :func:`domain_mix`'s target
    composition at ``budget`` fraction of the corpus tokens: a domain
    whose target share (sample_weight) exceeds its natural share
    (token_share) is kept at a higher rate, capped at 1.0 (you cannot
    upsample past keeping everything with a filter — the remainder is an
    epochs/repeat decision downstream). keep_rate = min(1, budget *
    sample_weight / token_share), 6-dp rounded for engine independence;
    degenerate zero-token domains keep nothing."""
    rate = F.when(
        F.col("token_share") > 0,
        F.least(
            F.lit(1.0),
            F.lit(float(budget)) * F.col("sample_weight") / F.col("token_share"),
        ),
    ).otherwise(F.lit(0.0))
    return mix.select("domain", F.round(rate, 6).alias("keep_rate"))


def rate_sample(
    docs: DataFrame,
    rates: DataFrame,
    domain_col: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Per-domain deterministic rate sampling — the stage that CONSUMES
    the :func:`domain_mix` -> :func:`domain_rates` plan: keep a row iff
    its Knuth key-hash falls under its domain's keep_rate. Decisions are a
    pure function of (key, domain rate): partition-layout-free,
    re-runnable, and oracle-able in ANSI SQL.

    Scale: the rates table has one row per domain — broadcast join, no
    shuffle of the corpus; the hash filter is codegen arithmetic."""
    r = F.broadcast(rates.select(F.col("domain"), F.col("keep_rate")))
    return (
        docs.join(r, docs[domain_col] == r["domain"], "inner")
        .filter(sample_hash_col(key) < F.col("keep_rate") * F.lit(float(_M32)))
        .drop("domain", "keep_rate")
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame | None = None,
    val_pct: int = 10,
    seed: int = 21,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/validation split that can NEVER leak a near-duplicate across
    the boundary: the split decision is hashed from the document's
    near-dup CLUSTER id, not the document id, so every member of a cluster
    lands on the same side (the failure mode this prevents — val examples
    whose near-copies sit in train — silently inflates eval scores at
    scale, cf. Lee et al. 2022 §6).

    `clusters` is an optional (id, cluster_id) DataFrame (e.g. from
    minhash pairs + connected_components); documents not covered are
    singletons (cluster = own id). When omitted, it is derived here with
    the repo's default MinHash-LSH + CC pipeline — the same construction
    as q_cluster_canonical, so labels are the min member id.

    Split = 'val' iff md5('split' ␟ cluster ␟ seed) mod 100 < val_pct —
    deterministic, layout-free, resumable, and replayable by a SQL oracle.
    Output: (id, cluster_id, split).
    """
    if not 0 <= val_pct <= 100:
        raise ValueError(f"val_pct must be in [0, 100], got {val_pct}")
    if clusters is None:
        from .canonicalize import connected_components
        from .dedup import minhash_duplicate_pairs

        pairs = minhash_duplicate_pairs(docs, id_col=id_col, text_col=text_col)
        pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")  # noqa: E731
        comp = connected_components(
            pairs.select(pad("a").alias("src"), pad("b").alias("dst"))
        )
        clusters = comp.select(
            F.col("node").cast("bigint").alias(id_col),
            F.col("component").cast("bigint").alias("cluster_id"),
        )
    lab = (
        docs.select(id_col)
        .join(clusters, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
    h = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.lit("split"),
                        F.col("cluster_id").cast("string"),
                        F.lit(str(seed)),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    return lab.withColumn(
        "split", F.when(h < val_pct, F.lit("val")).otherwise(F.lit("train"))
    )


def domain_quota(
    docs: DataFrame,
    budget_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_bits: int = 20,
) -> DataFrame:
    """Hard per-domain token caps: keep each domain's documents — in the
    deterministic key-hash order every sampler here uses — until the
    domain's running token count reaches ``budget_tokens`` (the document
    that CROSSES the budget is still kept, so every non-empty domain
    contributes at least one document). The quota stage a mixture recipe
    ("at most N tokens of domain X") compiles to after ``domain_mix``
    picks the proportions.

    Scale shape — the packing.py two-phase cumsum, per domain: the hash
    order key is uniform, so its high bits RANGE-partition each domain's
    order; phase 1 windows over (domain, hash-bucket) sub-partitions,
    phase 2 computes bucket offsets on the (domain, bucket) totals table
    (domain-cardinality * 2^(32-bucket_bits) rows — metadata-sized), and
    the exclusive prefix sum is intra + offset. No domain-wide or global
    sort of document rows anywhere, so a hot domain cannot straddle one
    window partition.

    Output: (id, domain, n_tokens, cum_before, kept)."""
    from .text_stats import token_count_col

    k = sample_hash_col(id_col)
    base = docs.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
        k.alias("_k"),
    ).withColumn("_bucket", F.shiftright("_k", 32 - bucket_bits))

    w_in = (
        Window.partitionBy("domain", "_bucket")
        .orderBy(F.col("_k").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = base.withColumn(
        "_cum_in", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )
    totals = base.groupBy("domain", "_bucket").agg(F.sum("n_tokens").alias("_tot"))
    w_b = (
        Window.partitionBy("domain")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # totals is (domain, bucket)-sized metadata: this window never sees docs
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("domain", "_bucket", "_offset")
    cum = (F.col("_cum_in") + F.col("_offset")).alias("cum_before")
    return intra.join(offsets, ["domain", "_bucket"]).select(
        id_col,
        "domain",
        "n_tokens",
        cum,
        (F.col("_cum_in") + F.col("_offset") < F.lit(budget_tokens)).alias("kept"),
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    bin_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Population-stability-index drift between two corpus snapshots over
    a categorical column (language, source domain, quality bucket, ...):
    per bin, psi_term = (p_a - p_b) * ln(p_a / p_b) with Laplace-smoothed
    shares p = (n + alpha) / (total + alpha * k) over the UNION of bins,
    so a bin present in only one snapshot contributes a finite term
    instead of ln(0). Σ psi_term is the PSI; the usual reading: < 0.1
    stable, 0.1–0.25 drifting, > 0.25 shifted — the monitoring gate a
    recurring crawl runs before appending a new snapshot to the training
    mix.

    Output: (bin, n_a, n_b, share_a, share_b, psi_term), one row per
    bin in either snapshot, doubles rounded to 6.

    Scale shape: one combinable count agg per snapshot (bin-cardinality
    rows), one full outer join on the bin key, totals as 1-row aggs
    crossJoin-broadcast into the plan — no collects, no windows; the
    whole comparison is bin-cardinality-sized whatever the corpus size.
    """
    ca = a.groupBy(F.col(bin_col).alias("bin")).agg(F.count(F.lit(1)).alias("n_a"))
    cb = b.groupBy(F.col(bin_col).alias("bin")).agg(F.count(F.lit(1)).alias("n_b"))
    joined = (
        ca.join(cb, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
    )
    tot = joined.agg(
        F.sum("n_a").cast("double").alias("ta"),
        F.sum("n_b").cast("double").alias("tb"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    al = F.lit(float(alpha))
    pa = (F.col("n_a") + al) / (F.col("ta") + al * F.col("k"))
    pb = (F.col("n_b") + al) / (F.col("tb") + al * F.col("k"))
    return joined.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        F.round(pa, 6).alias("share_a"),
        F.round(pb, 6).alias("share_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )


def repetition_budget(
    domains: DataFrame,
    budget_tokens: float,
    max_epochs: float = 4.0,
    domain_col: str = "domain",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Epoch allocation under a training-token budget with a repetition
    cap (the data-constrained-scaling recipe of Muennighoff et al. 2023:
    repeating data beyond ~4 epochs returns ~nothing, so cap repeats and
    surface the shortfall instead of silently over-sampling).

    Input: one row per domain with its unique-token count. Output per
    domain: (domain, n_tokens, share, epochs, alloc_tokens, budget_share)
    where epochs = min(max_epochs, budget/total_unique) is the UNIFORM
    repeat factor (every domain repeats equally — mixture shape is
    preserved, only scale changes), alloc_tokens = n_tokens * epochs, and
    budget_share = alloc_tokens / budget. When the cap binds the
    budget_shares sum to < 1 — the visible shortfall that tells the
    curator to go get MORE DATA rather than more epochs. Ratios rounded
    to 6.

    Scale shape: input is already domain-cardinality-sized; one 1-row
    global agg broadcast-crossed back — no window, no collect.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be > 0")
    d = domains.select(
        F.col(domain_col).alias("domain"),
        F.col(tokens_col).cast("double").alias("n_tokens"),
    )
    tot = d.agg(F.sum("n_tokens").alias("_tot"))
    epochs = F.least(
        F.lit(float(max_epochs)), F.lit(float(budget_tokens)) / F.col("_tot")
    )
    alloc = F.col("n_tokens") * epochs
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(F.col("n_tokens") / F.col("_tot"), 6).alias("share"),
            F.round(epochs, 6).alias("epochs"),
            F.round(alloc, 6).alias("alloc_tokens"),
            F.round(alloc / F.lit(float(budget_tokens)), 6).alias("budget_share"),
        )
    )


# P(Poisson(1) <= k) for k = 0..7, hardcoded so the Spark expression and
# the DuckDB oracle share bit-identical literals; weights cap at 8
# (P(X > 8) ~ 1e-6 — negligible mass, bounded fan-out by construction).
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
]


def bootstrap_means(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    replicates: int = 20,
    seed: int = 7,
) -> DataFrame:
    """Poisson bootstrap for corpus metrics (Chamandy et al. 2012,
    "Estimating Uncertainty for Massive Data Streams": resampling WITH
    replacement is infeasible at 10^12 rows, but Poisson(1) weights per
    (row, replicate) approximate it arbitrarily well and are
    embarrassingly parallel). One row per replicate:
    (replicate, n_eff, boot_mean) — replicate 0 is the unresampled point
    estimate; the caller's CI is e.g. mean ± 1.96 · stddev(boot_means).

    Determinism: weights come from the repo's md5-uniform stream
    (hash of id | replicate | seed) inverted through hardcoded
    Poisson(1) CDF literals, and for INTEGER-valued metrics both
    Σ w·x and Σ w are exact bigints, so each replicate mean is a single
    IEEE division — the oracle replays every row bit-for-bit (the
    integer-ratio trick the modularity and LexRank operators use).

    Scale shape: the replicate dimension explodes BEFORE one combinable
    (map-side-partial) aggregation, so the shuffle carries B rows per
    partition, not B copies of the corpus; no window, no collect, no
    Python.
    """
    u_src = F.concat_ws(
        "\x1f",
        F.col("_id").cast("string"),
        F.col("replicate").cast("string"),
        F.lit(str(seed)),
    )
    h = F.conv(F.substring(F.md5(u_src), 1, 15), 16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    w = F.lit(0)
    for t in POISSON1_CDF:
        w = w + (u > F.lit(t)).cast("int")
    w = F.when(F.col("replicate") == 0, F.lit(1)).otherwise(w)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("bigint").alias("_x"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(replicates)))
        ).alias("replicate"),
    ).select("_id", "_x", "replicate", w.cast("bigint").alias("_w"))
    return (
        base.groupBy("replicate")
        .agg(
            F.sum("_w").cast("bigint").alias("n_eff"),
            F.sum(F.col("_w") * F.col("_x")).cast("bigint").alias("_sum"),
        )
        .select(
            F.col("replicate").cast("int").alias("replicate"),
            "n_eff",
            F.when(
                F.col("n_eff") > 0,
                F.round(
                    F.col("_sum").cast("double") / F.col("n_eff").cast("double"),
                    6,
                ),
            ).alias("boot_mean"),
        )
    )
