"""Temporal KG: collapse an observation stream into validity intervals
(SCD2 / "triple versioning").

A crawl re-visits pages: the same (subject, predicate) is observed many
times, sometimes with a new object value. A KG that stores only the latest
value loses history; one that stores every observation explodes. The
standard warehouse answer is SCD2 — keep one row per *value run* with
``[valid_from, valid_to)`` bounds — and it applies verbatim to triples
keyed by (subject, predicate) observed at ``warc_ts``. The reference has no
temporal story (single-shot file parser, /root/reference/src/
ShaclParser.php); this is part of the engine's corpus generalization
(BASELINE.json north_star: resumable corpus-scale pipeline over recrawls).

Semantics (deterministic, the DuckDB oracle mirrors them exactly):

- Observations are ordered per key by (ts, value) — the value tiebreak
  makes same-timestamp duplicates deterministic.
- A *run* is a maximal streak of consecutive observations with the same
  value. Each run emits one row: ``valid_from`` = first observation ts of
  the run, ``valid_to`` = first ts of the NEXT run (NULL for the last run
  = still current), ``n_obs`` = observations in the run, ``is_current``.
- A value that disappears and later returns starts a NEW run (this is what
  distinguishes SCD2 from distinct-values).

Scale shape: both windows are partitioned by the key — never a global
window — so the whole operator is one hash-partition shuffle on the key
followed by codegen window evaluation and a filter. Hot keys (an entity
re-crawled millions of times) are bounded by the crawl's per-url revisit
cadence, orders of magnitude below partition capacity; skewed key sets
beyond that are AQE territory, not a new plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    obs: DataFrame,
    key_cols: list[str],
    value_col: str,
    ts_col: str,
) -> DataFrame:
    """Observations -> SCD2 value runs per key.

    Returns key_cols + (value, valid_from, valid_to, n_obs, is_current).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, value_col)
    val = F.col(value_col)

    # run boundaries: value differs (null-safely) from the previous
    # observation; lag of a constant distinguishes "no previous row" from
    # "previous value is NULL"
    marked = obs.select(
        *key_cols,
        val.alias("value"),
        F.col(ts_col).alias("_ts"),
        (
            F.lag(F.lit(1)).over(w).isNull()
            | ~F.lag(val).over(w).eqNullSafe(val)
        ).alias("_start"),
    )
    w2 = Window.partitionBy(*key_cols).orderBy("_ts", "value")
    marked = marked.withColumn("_run", F.sum(F.col("_start").cast("long")).over(w2))

    runs = marked.groupBy(*key_cols, "_run").agg(
        F.first("value").alias("value"),
        F.min("_ts").alias("valid_from"),
        F.count("*").alias("n_obs"),
    )

    wk = Window.partitionBy(*key_cols).orderBy("valid_from", "_run")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(wk))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_run")
        .select(*key_cols, "value", "valid_from", "valid_to", "n_obs", "is_current")
    )


def recrawl_priority(
    obs: DataFrame,
    key_cols: list[str],
    value_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-key change-rate estimation for recrawl scheduling (Cho &
    Garcia-Molina 2003, "Estimating Frequency of Change"): from a
    re-observation stream (key, ts, value) — e.g. content fingerprints of
    recrawled URLs — estimate how often each page REALLY changes, given
    that a crawler only sees change-or-not between consecutive visits.

    r_hat = -ln((n - x + 0.5) / (n + 0.5))   (their bias-corrected
    estimator; n = observations, x = detected changes) is the expected
    number of true changes per access interval; changes_per_day scales it
    by the observed mean interval. next_due_days = 1 / changes_per_day —
    the uniform-refresh target. Keys observed once, never seen changing,
    or observed within a zero span get NULL rate (no evidence).

    Scale shape: ONE per-key window (lag over each key's own recrawl
    history — bounded by visits per URL, never corpus-wide) + ONE
    combinable agg. ln-based values round to 6 so engines agree.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, value_col)
    val = F.col(value_col)
    marked = obs.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        (
            F.lag(F.lit(1)).over(w).isNotNull()
            & ~F.lag(val).over(w).eqNullSafe(val)
        ).alias("_chg"),
    )
    agg = marked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(F.col("_chg").cast("long")).cast("bigint").alias("n_changes"),
        (
            F.unix_timestamp(F.max("_ts")) - F.unix_timestamp(F.min("_ts"))
        ).cast("bigint").alias("span_sec"),
    )
    n = F.col("n_obs").cast("double")
    x = F.col("n_changes").cast("double")
    r_hat = F.round(-F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))), 6)
    usable = (F.col("n_obs") > 1) & (F.col("span_sec") > 0) & (F.col("n_changes") > 0)
    out = agg.withColumn("r_hat", F.when(usable, r_hat))
    interval_days = F.col("span_sec").cast("double") / (n - F.lit(1.0)) / F.lit(86400.0)
    cpd = F.round(F.col("r_hat") / interval_days, 6)
    out = out.withColumn("changes_per_day", F.when(usable, cpd))
    return out.withColumn(
        "next_due_days",
        F.when(
            F.col("changes_per_day") > 0,
            F.round(F.lit(1.0) / F.col("changes_per_day"), 6),
        ),
    )


def burst_detection(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Hourly burst detection per event type: bucket events into hours,
    z-score each observed hour against the type's own hourly distribution
    (population mean/std over OBSERVED hours — an all-quiet type with one
    spike still flags), and mark hours whose z >= threshold. The
    ops-monitoring primitive for crawl anomalies: a host suddenly serving
    10× its baseline, a parser error type exploding after a deploy.

    Output: (event_type, hour, n, mean_n, z, is_burst); z is NULL for a
    constant series (zero variance is "no evidence of abnormality", not a
    divide-by-zero job kill).

    Scale shape: one map-side-combinable (type, hour) count — the only
    corpus-sized shuffle — then type-keyed moment aggs over
    hour-cardinality rows joined back broadcast. Doubles rounded to 6.
    """
    hourly = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mean_n"),
        F.stddev_pop("n").alias("sd"),
    )
    z = F.when(
        F.col("sd") > 0,
        F.round((F.col("n") - F.col("mean_n")) / F.col("sd"), 6),
    )
    return hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour",
        "n",
        F.round("mean_n", 6).alias("mean_n"),
        z.alias("z"),
        F.coalesce(z >= F.lit(z_threshold), F.lit(False)).alias("is_burst"),
    )


def retention_cohorts(
    events: DataFrame,
    cohort_event: str = "signup",
    activity_event: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly retention cohorts: users grouped by the ISO week of their
    FIRST ``cohort_event``; for each later week, the share of the cohort
    with any activity (``activity_event`` filters the activity stream,
    None counts every event type).

    Scale shape: one min-agg for cohort assignment, one distinct over
    (user, week) that collapses per-user event volume BEFORE the join
    with cohort weeks (both keyed on the user), then a combinable
    count-distinct per (cohort_week, weeks_since) — the output is
    weeks² -sized. No windows, no per-user sequences.

    Output: cohort_week, weeks_since (0 = the signup week itself),
    n_cohort, n_active, retention.
    """
    firsts = (
        events.filter(F.col(type_col) == cohort_event)
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week"))
    )
    cohort_sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    act = events
    if activity_event is not None:
        act = act.filter(F.col(type_col) == activity_event)
    active_weeks = act.select(
        F.col(user_col).alias("user"),
        F.date_trunc("week", F.col(ts_col)).alias("act_week"),
    ).distinct()
    grid = (
        active_weeks.join(firsts, "user", "inner")
        .withColumn(
            "weeks_since",
            (
                (F.unix_timestamp("act_week") - F.unix_timestamp("cohort_week"))
                / F.lit(604800)
            ).cast("long"),
        )
        .filter(F.col("weeks_since") >= 0)
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user").alias("n_active"))
    )
    return grid.join(cohort_sizes, "cohort_week", "inner").select(
        "cohort_week",
        "weeks_since",
        "n_cohort",
        "n_active",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


def interval_join(
    a: DataFrame, b: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Temporal intersection join of two SCD2 validity tables (the
    temporal-KG alignment step: "what was the user's state AND band
    during each overlapping stretch"): both inputs carry key_cols +
    (value, valid_from, valid_to) half-open [from, to) intervals with
    NULL valid_to meaning open/current (:func:`scd2_history`'s output
    shape). Emits one row per overlapping pair with the intersection
    segment — key_cols + (value_a, value_b, seg_from, seg_to), seg_to
    NULL when both sides are open.

    Scale shape: ONE key-equi sort-merge join with the overlap predicate
    evaluated as a join residual — never a cross-key range join; per-key
    fan-out is version_count_a × version_count_b in the worst case but
    overlap bounds it to ~(runs_a + runs_b) for genuinely sequential
    histories. Null-aware overlap avoids sentinel timestamps entirely.
    """
    A = a.select(
        *key_cols,
        F.col("value").alias("value_a"),
        F.col("valid_from").alias("_fa"),
        F.col("valid_to").alias("_ta"),
    )
    B = b.select(
        *key_cols,
        F.col("value").alias("value_b"),
        F.col("valid_from").alias("_fb"),
        F.col("valid_to").alias("_tb"),
    )
    overlap = (F.col("_tb").isNull() | (F.col("_fa") < F.col("_tb"))) & (
        F.col("_ta").isNull() | (F.col("_fb") < F.col("_ta"))
    )
    seg_to = (
        F.when(F.col("_ta").isNull(), F.col("_tb"))
        .when(F.col("_tb").isNull(), F.col("_ta"))
        .otherwise(F.least("_ta", "_tb"))
    )
    return (
        A.join(B, key_cols).filter(overlap)
        .select(
            *key_cols,
            "value_a",
            "value_b",
            F.greatest("_fa", "_fb").alias("seg_from"),
            seg_to.alias("seg_to"),
        )
    )
