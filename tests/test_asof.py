"""asof_join unit tests: backward-inclusive match, no-match nulls, and
deterministic tiebreak at equal timestamps."""

from __future__ import annotations

import datetime as dt


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    from kgforge.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", _ts("2024-01-10T12:00:00")),
         ("u1", _ts("2024-01-01T00:00:00")),  # before any event -> null
         ("u2", _ts("2024-01-05T00:00:00"))],
        "user string, t timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-02T00:00:00"), 1, "a"),
         ("u1", _ts("2024-01-10T12:00:00"), 2, "b"),   # equal ts: inclusive
         ("u1", _ts("2024-01-10T12:00:00"), 3, "c"),   # tie: max id wins
         ("u1", _ts("2024-01-11T00:00:00"), 4, "d"),   # after: excluded
         ("u2", _ts("2024-01-04T00:00:00"), 5, "e")],
        "user string, ts timestamp, eid int, etype string",
    )
    out = asof_join(
        left, right, on=["user"], left_ts="t", right_ts="ts",
        value_cols=["eid", "etype"], tiebreakers=["eid"],
    )
    got = {(r["user"], r["t"].isoformat()): (r["eid"], r["etype"]) for r in out.collect()}
    assert got == {
        ("u1", "2024-01-10T12:00:00"): (3, "c"),
        ("u1", "2024-01-01T00:00:00"): (None, None),
        ("u2", "2024-01-05T00:00:00"): (5, "e"),
    }
