"""Sequence packing (operators/packing.py): the two-phase cumulative sum
must equal the naive global running sum regardless of bucketing/layout."""

from pyspark.sql import functions as F

from kgforge.operators.packing import pack_documents


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(parts) if parts else df


def test_hand_computed_bins(spark):
    rows = [
        (1, "a b c"),        # 3 tokens, cum_before 0  -> bin 0
        (2, "d e"),          # 2 tokens, cum_before 3  -> bin 0
        (3, "f g h i"),      # 4 tokens, cum_before 5  -> bin 1
        (4, "j"),            # 1 token,  cum_before 9  -> bin 2
        (5, ""),             # 0 tokens, cum_before 10 -> bin 2
    ]
    got = {
        r.doc_id: (r.n_tokens, r.cum_before, r.bin_id)
        for r in pack_documents(_docs(spark, rows), budget=4).collect()
    }
    assert got == {
        1: (3, 0, 0),
        2: (2, 3, 0),
        3: (4, 5, 1),
        4: (1, 9, 2),
        5: (0, 10, 2),
    }


def test_two_phase_equals_naive_global_window(spark):
    rows = [(i, " ".join("w" * 1) * ((i * 7) % 13 + 1)) for i in range(200)]
    docs = _docs(spark, [(i, " ".join(["w"] * ((i * 7) % 13 + 1))) for i in range(200)], parts=7)
    # tiny bucket_size forces MANY buckets -> the offset path really runs
    got = pack_documents(docs, budget=50, bucket_size=16).collect()
    from pyspark.sql import Window

    naive = (
        docs.select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .withColumn(
            "cum",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .collect()
    )
    naive_map = {r.doc_id: r.cum for r in naive}
    for r in got:
        assert r.cum_before == naive_map[r.doc_id], r
        assert r.bin_id == naive_map[r.doc_id] // 50


def test_layout_independence(spark):
    rows = [(i, " ".join(["t"] * (i % 5 + 1))) for i in range(60)]
    a = {r.doc_id: r.bin_id for r in pack_documents(_docs(spark, rows, parts=2), budget=13, bucket_size=7).collect()}
    b = {r.doc_id: r.bin_id for r in pack_documents(_docs(spark, rows, parts=11), budget=13, bucket_size=7).collect()}
    assert a == b
