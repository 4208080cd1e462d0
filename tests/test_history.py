"""SCD2 validity intervals — hand-computed run collapsing."""

import datetime

import pytest
from pyspark.sql import functions as F

from kgforge.operators.history import scd2_history


def ts(m):
    return datetime.datetime(2026, 1, 1, 0, m)


@pytest.fixture(scope="module")
def obs(spark):
    rows = [
        # key k1: a a b a  -> 3 runs (a returns => NEW run)
        ("s1", "p", "a", ts(0)),
        ("s1", "p", "a", ts(1)),
        ("s1", "p", "b", ts(2)),
        ("s1", "p", "a", ts(3)),
        # key k2: single observation
        ("s2", "p", "x", ts(5)),
    ]
    return spark.createDataFrame(rows, "subject string, predicate string, obj string, ts timestamp")


def test_runs_collapse_and_reopen(spark, obs):
    out = scd2_history(obs, ["subject", "predicate"], "obj", "ts")
    k1 = [
        (r.value, r.valid_from.minute, r.valid_to.minute if r.valid_to else None, r.n_obs, r.is_current)
        for r in out.filter(F.col("subject") == "s1").orderBy("valid_from").collect()
    ]
    assert k1 == [
        ("a", 0, 2, 2, False),
        ("b", 2, 3, 1, False),
        ("a", 3, None, 1, True),
    ]


def test_single_observation_is_current(spark, obs):
    r = scd2_history(obs, ["subject", "predicate"], "obj", "ts").filter(
        F.col("subject") == "s2"
    ).first()
    assert (r.value, r.valid_to, r.n_obs, r.is_current) == ("x", None, 1, True)


def test_null_values_form_their_own_runs(spark):
    rows = [("k", None, ts(0)), ("k", None, ts(1)), ("k", "v", ts(2))]
    df = spark.createDataFrame(rows, "k string, v string, ts timestamp")
    out = scd2_history(df, ["k"], "v", "ts").orderBy("valid_from").collect()
    assert [(r.value, r.n_obs) for r in out] == [(None, 2), ("v", 1)]


def test_same_timestamp_ties_are_deterministic(spark):
    rows = [("k", "b", ts(0)), ("k", "a", ts(0)), ("k", "b", ts(1))]
    df = spark.createDataFrame(rows, "k string, v string, ts timestamp")
    out = scd2_history(df, ["k"], "v", "ts").orderBy("valid_from", "value").collect()
    # ordered by (ts, value): a@0, b@0, b@1 -> runs a[0,0) then b[0,..)
    assert [(r.value, r.n_obs, r.is_current) for r in out] == [
        ("a", 1, False),
        ("b", 2, True),
    ]


def test_no_global_window_in_plan(spark, obs):
    plan = (
        scd2_history(obs, ["subject", "predicate"], "obj", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Exchange must be hashpartitioning on the key — no SinglePartition
    assert "SinglePartition" not in plan


def test_recrawl_priority_estimator_pin(spark):
    """Cho & Garcia-Molina r_hat vs a hand computation."""
    import math
    from datetime import datetime

    from kgforge.operators.history import recrawl_priority

    t0 = datetime(2026, 1, 1)
    rows = [
        ("u", datetime(2026, 1, 1, 0, 0, 0), "A"),
        ("u", datetime(2026, 1, 1, 1, 0, 0), "A"),
        ("u", datetime(2026, 1, 1, 2, 0, 0), "B"),   # change 1
        ("u", datetime(2026, 1, 1, 3, 0, 0), "B"),
        ("u", datetime(2026, 1, 1, 4, 0, 0), "A"),   # change 2
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v string")
    got = recrawl_priority(df, ["k"], "v", "ts").collect()[0]
    assert (got["n_obs"], got["n_changes"], got["span_sec"]) == (5, 2, 4 * 3600)
    r = -math.log((5 - 2 + 0.5) / (5 + 0.5))
    assert got["r_hat"] == round(r, 6)
    interval_days = (4 * 3600) / 4 / 86400.0
    assert got["changes_per_day"] == round(round(r, 6) / interval_days, 6)
    assert got["next_due_days"] == round(1.0 / got["changes_per_day"], 6)


def test_recrawl_priority_no_evidence_rows(spark):
    from datetime import datetime

    from kgforge.operators.history import recrawl_priority

    rows = [
        ("once", datetime(2026, 1, 1), "A"),                # single obs
        ("static", datetime(2026, 1, 1), "A"),              # never changes
        ("static", datetime(2026, 1, 2), "A"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v string")
    got = {r["k"]: r for r in recrawl_priority(df, ["k"], "v", "ts").collect()}
    assert got["once"]["r_hat"] is None and got["once"]["next_due_days"] is None
    assert got["static"]["n_changes"] == 0 and got["static"]["r_hat"] is None


def test_burst_detection_spike_flagged(spark):
    from datetime import datetime, timedelta

    from kgforge.operators.history import burst_detection

    t0 = datetime(2026, 1, 1)
    rows = []
    # type A: 1 event/hour for 20 hours, then a 50-event spike hour
    for h in range(20):
        rows.append((t0 + timedelta(hours=h), "A"))
    rows += [(t0 + timedelta(hours=20), "A")] * 50
    # type B: perfectly constant -> zero variance -> z NULL, never a burst
    for h in range(5):
        rows.append((t0 + timedelta(hours=h), "B"))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {(r["event_type"], r["hour"].hour): r for r in burst_detection(df).collect()
           if r["hour"].day == 1}
    bursts = [(k, v) for k, v in got.items() if v["is_burst"]]
    assert len(bursts) == 1 and bursts[0][0] == ("A", 20)
    import statistics
    ns = [1] * 20 + [50]
    mu = statistics.mean(ns)
    sd = statistics.pstdev(ns)
    assert got[("A", 20)]["z"] == round((50 - mu) / sd, 6)
    assert got[("B", 0)]["z"] is None and got[("B", 0)]["is_burst"] is False


def _events(spark, rows):
    """rows: (user_id, event_type, ts_seconds)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    data = [(u, e, base + dt.timedelta(seconds=s)) for (u, e, s) in rows]
    return spark.createDataFrame(data, "user_id long, event_type string, ts timestamp")


def test_retention_cohorts_golden(spark):
    """Hand-computed weekly retention: week-0 self-retention is 1.0 by
    construction (the signup itself is activity), later weeks count any
    event type, pre-signup activity never counts."""
    from kgforge.operators.history import retention_cohorts

    # 2024-01-01 is a Monday -> clean week boundaries
    ev = _events(spark, [
        # cohort week 0: u1, u2 sign up; u1 active week 1; u2 never again
        (1, "signup", 0), (1, "view", 7 * 86400 + 60),
        (2, "signup", 3600),
        # u3 signs up in week 1, has PRE-signup activity in week 0
        (3, "view", 60), (3, "signup", 7 * 86400 + 120),
        (3, "click", 14 * 86400 + 60),
    ])
    rows = {
        (r["cohort_week"].day, r["weeks_since"]): r
        for r in retention_cohorts(ev).collect()
    }
    w0 = rows[(1, 0)]   # cohort of Jan 1 week, week 0
    assert (w0["n_cohort"], w0["n_active"], w0["retention"]) == (2, 2, 1.0)
    w0_1 = rows[(1, 1)]
    assert (w0_1["n_active"], w0_1["retention"]) == (1, 0.5)
    # u3's cohort is the Jan 8 week; its week-0 activity is the signup,
    # week-1 the click; the pre-signup view created NO (cohort, -1) row
    assert rows[(8, 0)]["n_active"] == 1
    assert rows[(8, 1)]["n_active"] == 1
    assert (1, -1) not in rows and (8, -1) not in rows


def test_retention_cohorts_activity_filter(spark):
    from kgforge.operators.history import retention_cohorts

    ev = _events(spark, [
        (1, "signup", 0), (1, "view", 7 * 86400 + 60),
        (2, "signup", 0), (2, "purchase", 7 * 86400 + 60),
    ])
    got = {
        r["weeks_since"]: r
        for r in retention_cohorts(ev, activity_event="purchase").collect()
    }
    # week 0 has no purchases at all -> no row; week 1 only u2
    assert 0 not in got
    assert (got[1]["n_cohort"], got[1]["n_active"]) == (2, 1)
