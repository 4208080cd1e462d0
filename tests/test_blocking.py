"""Sorted-neighborhood blocking vs a brute-force positional oracle."""


ROWS = [
    (10, "smith john"),
    (11, "smyth john"),
    (12, "adams bob"),
    (13, "smith jon"),
    (14, "adams bob"),   # duplicate key — id tiebreak
    (15, "zeta z"),
    (16, "brown amy"),
]


def _brute(rows, w):
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ia, ka) in enumerate(ordered):
        for d in range(1, w + 1):
            if i + d < len(ordered):
                ib, kb = ordered[i + d]
                out.add((ia, ib, ka, kb, d))
    return out


def test_global_row_index_is_total_order(spark):
    from kgforge.operators.blocking import global_row_index

    df = spark.createDataFrame(ROWS, "id long, key string")
    got = {
        (r["_id"], r["_idx"])
        for r in global_row_index(
            df.selectExpr("id as _id", "key as _key"), ["_key", "_id"], num_parts=3
        ).collect()
    }
    ordered = sorted(ROWS, key=lambda r: (r[1], r[0]))
    expect = {(rid, i) for i, (rid, _) in enumerate(ordered)}
    assert got == expect


def test_sorted_neighborhood_matches_brute(spark):
    from kgforge.operators.blocking import sorted_neighborhood_pairs

    df = spark.createDataFrame(ROWS, "id long, key string")
    for w in (1, 2, 3):
        got = {
            tuple(r)
            for r in sorted_neighborhood_pairs(df, "id", "key", window=w).collect()
        }
        assert got == _brute(ROWS, w), f"window={w}"
