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


def test_transition_matrix_hand_pin(spark):
    from datetime import datetime

    from kgforge.operators.funnel import transition_matrix

    t = datetime(2026, 1, 1)
    rows = [
        # user 1: A -> B -> A
        (1, 1, datetime(2026, 1, 1, 0), "A"),
        (2, 1, datetime(2026, 1, 1, 1), "B"),
        (3, 1, datetime(2026, 1, 1, 2), "A"),
        # user 2: A -> A (hops never cross users)
        (4, 2, datetime(2026, 1, 1, 0), "A"),
        (5, 2, datetime(2026, 1, 1, 1), "A"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    got = {(r["prev_state"], r["state"]): (r["n"], r["prob"])
           for r in transition_matrix(df).collect()}
    # from A: ->B once, ->A once (row sums to 1); from B: ->A once
    assert got == {("A", "B"): (1, 0.5), ("A", "A"): (1, 0.5), ("B", "A"): (1, 1.0)}


def test_transition_matrix_tie_determinism(spark):
    from datetime import datetime

    from kgforge.operators.funnel import transition_matrix

    ts = datetime(2026, 1, 1)
    rows = [(i, 1, ts, s) for i, s in [(1, "X"), (2, "Y"), (3, "Z")]]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    got = {(r["prev_state"], r["state"]) for r in transition_matrix(df).collect()}
    # same-ts ties order by event_id: X -> Y -> Z
    assert got == {("X", "Y"), ("Y", "Z")}
