"""Funnel steps: chain ordering, strictness, broken chains, counts."""

import datetime as dt


def _ts(m):
    return dt.datetime(2026, 1, 1, 0, m)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, _ts(m)) for (u, t, m) in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_earliest_chain_and_strict_order(spark):
    from kgforge.operators.funnel import funnel_steps

    ev = _events(
        spark,
        [
            (1, "view", 1), (1, "click", 2), (1, "purchase", 3),   # full chain
            (1, "view", 0),                                        # earlier view wins
            (2, "click", 1), (2, "view", 2), (2, "purchase", 3),   # click BEFORE view: no t1... but purchase after view
            (3, "view", 5), (3, "click", 5),                       # same ts: strict > breaks chain
            (4, "click", 1), (4, "purchase", 2),                   # never viewed: excluded
        ],
    )
    got = {
        r["user_id"]: (r["t0"], r["t1"], r["t2"], r["steps_completed"])
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    assert got[1] == (_ts(0), _ts(2), _ts(3), 3)
    assert got[2] == (_ts(2), None, None, 1)  # click preceded view
    assert got[3] == (_ts(5), None, None, 1)  # tie does not chain
    assert 4 not in got
    assert len(got) == 3


def test_funnel_counts(spark):
    from kgforge.operators.funnel import funnel_counts, funnel_steps

    ev = _events(
        spark,
        [
            (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
            (2, "view", 1), (2, "click", 2),
            (3, "view", 1),
        ],
    )
    f = funnel_steps(ev, ["view", "click", "purchase"])
    got = {r["step"]: r["n_users"] for r in funnel_counts(f, 3).collect()}
    assert got == {0: 3, 1: 2, 2: 1}
