"""Funnel (ordered event-sequence) analysis over event streams.

The sequential-conversion primitive: given an ordered list of step event
types, find each user's earliest completion chain — first step-0 event,
then the first step-1 event strictly after it, and so on. Standard
product-analytics surface; over a crawl-events table the same operator
answers "fetched -> parsed -> validated" style pipeline funnels.

Scale shape: step k is ONE user-keyed min-aggregation over the events
filtered to that step's type, joined against the step-(k-1) frontier —
every join and agg keys on the user column (co-partitioned chain; AQE
merges the tiny late-step sides into broadcasts). No window over the
event stream, no per-user sort: min(ts) is map-side combinable, so the
reduce side sees user cardinality, not event cardinality. Steps unroll
lazily (k is small); the frontier stays user-sized throughout.

Determinism: ties inside a step resolve by min(ts); successive steps
require STRICTLY increasing timestamps (a same-timestamp pair does not
chain — documented, matches the SQL replay exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user who completed step 0: (user, t0..t{k-1},
    steps_completed). t_i is the earliest step-i timestamp strictly after
    t_{i-1}; NULL once the chain breaks. Users without a step-0 event do
    not appear (they are the complement of the funnel's entry set)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ts"),
    )
    cur = (
        base.filter(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("ts").alias("t0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            base.filter(F.col("etype") == step)
            .join(cur.select("user", f"t{i - 1}"), "user")
            .filter(F.col("ts") > F.col(f"t{i - 1}"))
            .groupBy("user")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "user", "left")
    completed = F.lit(1)
    for i in range(1, len(steps)):
        completed = completed + F.col(f"t{i}").isNotNull().cast("int")
    return cur.select(
        F.col("user").alias(user_col),
        *[f"t{i}" for i in range(len(steps))],
        completed.alias("steps_completed"),
    )


def funnel_counts(funnel: DataFrame, n_steps: int) -> DataFrame:
    """(step, n_users): how many users reached each step — the funnel
    chart. One combinable agg over the user-sized funnel table."""
    agg = funnel.agg(
        *[
            F.count(F.col(f"t{i}")).cast("bigint").alias(f"_n{i}")
            for i in range(n_steps)
        ]
    )
    rows = None
    for i in range(n_steps):
        r = agg.select(F.lit(i).alias("step"), F.col(f"_n{i}").alias("n_users"))
        rows = r if rows is None else rows.unionByName(r)
    return rows


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    count every consecutive (prev_state -> state) hop inside a key's
    timeline and normalize rows to probabilities — the navigation /
    funnel-free view of user behavior, and the model behind "what does a
    crawler fetch after a sitemap?" style questions.

    Output: (prev_state, state, n, prob) with prob = n / Σ_row n,
    rounded to 6.

    Scale shape: ONE lag window per key (each key's own timeline — the
    event-order primitive every sequence op here uses, never a global
    window), then two stacked combinable aggs: hop counts, then row
    totals joined back broadcast (state-vocabulary-sized). Ties order by
    ``tiebreak_col`` so the matrix is deterministic under any
    partitioning.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    hops = (
        events.select(
            F.lag(F.col(state_col)).over(w).alias("prev_state"),
            F.col(state_col).alias("state"),
        )
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = hops.groupBy("prev_state").agg(F.sum("n").alias("row_total"))
    return hops.join(F.broadcast(totals), "prev_state").select(
        "prev_state",
        "state",
        "n",
        F.round(F.col("n") / F.col("row_total").cast("double"), 6).alias("prob"),
    )
