"""Distant-supervision relation labeling: normalization + label joins."""


def test_normalize_facts_direction_marks_and_multirel(spark):
    from kgforge.operators.distant import normalize_facts

    facts = spark.createDataFrame(
        [
            ("E1", "knows", "E2"),
            ("E2", "employs", "E1"),  # reversed direction -> ^-1 mark
            ("E1", "knows", "E2"),  # duplicate collapses
            ("E3", "knows", "E3"),  # self-loop dropped
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r["entity_a"], r["entity_b"]): r["relations"]
        for r in normalize_facts(facts).collect()
    }
    assert got == {("E1", "E2"): ["employs^-1", "knows"]}


def test_distant_pairs_labels_positive_and_negative(spark):
    from kgforge.operators.distant import distant_supervision_pairs

    mentions = spark.createDataFrame(
        [("d1", "E1"), ("d1", "E2"), ("d1", "E3"), ("d2", "E2"), ("d2", "E3")],
        "url string, entity_id string",
    )
    facts = spark.createDataFrame(
        [("E1", "knows", "E2")], "subj string, pred string, obj string"
    )
    got = {
        (r["url"], r["entity_a"], r["entity_b"]): (r["label"], list(r["relations"]))
        for r in distant_supervision_pairs(mentions, facts).collect()
    }
    assert got[("d1", "E1", "E2")] == (True, ["knows"])
    assert got[("d1", "E1", "E3")] == (False, [])
    assert got[("d1", "E2", "E3")] == (False, [])
    assert got[("d2", "E2", "E3")] == (False, [])
    assert len(got) == 4


def test_distant_pairs_positives_only_and_cap(spark):
    from kgforge.operators.distant import distant_supervision_pairs

    mentions = spark.createDataFrame(
        [("d1", e) for e in ["E1", "E2", "E3", "E4"]],
        "url string, entity_id string",
    )
    facts = spark.createDataFrame(
        [("E1", "knows", "E2"), ("E3", "knows", "E4")],
        "subj string, pred string, obj string",
    )
    pos = distant_supervision_pairs(mentions, facts, positives_only=True).collect()
    assert {(r["entity_a"], r["entity_b"]) for r in pos} == {("E1", "E2"), ("E3", "E4")}
    assert all(r["label"] for r in pos)
    # cap=2 keeps only the two lowest entity ids -> a single pair
    capped = distant_supervision_pairs(
        mentions, facts, max_entities_per_doc=2
    ).collect()
    assert {(r["entity_a"], r["entity_b"]) for r in capped} == {("E1", "E2")}
