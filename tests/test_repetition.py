"""Gopher-style repetition signals: hand-computed values on crafted docs
(including the derived fraction columns the driver projection excludes),
and the exact-integer driver query vs its DuckDB oracle at sf0.001."""

from __future__ import annotations

import duckdb

from kgforge.operators.text_stats import repetition_stats


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> top ab=3, tot 5;
            # trigrams [aba, bab, aba, bab] -> all duplicated: dup 4, tot 4
            (1, "a b a b a b"),
            # all-distinct words: top bigram 1, no duplicated trigram
            (2, "one two three four five"),
            (3, "x y"),  # < 3 tokens: excluded by contract
            # case/whitespace normalization folds "The the"
            (4, "The the THE the"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(out) == {1, 2, 4}
    r1 = out[1]
    assert (r1["top_bigram_count"], r1["total_bigrams"]) == (3, 5)
    assert (r1["dup_trigram_count"], r1["total_trigrams"]) == (4, 4)
    assert r1["top_bigram_frac"] == 0.6 and r1["dup_trigram_frac"] == 1.0
    r2 = out[2]
    assert (r2["top_bigram_count"], r2["total_bigrams"]) == (1, 4)
    assert (r2["dup_trigram_count"], r2["dup_trigram_frac"]) == (0, 0.0)
    r4 = out[4]  # "the the" x3 after lowering -> top 3 of 3
    assert (r4["top_bigram_count"], r4["total_bigrams"]) == (3, 3)


def test_q_repetition_stats_matches_oracle(spark):
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    sdf = e.queries()["q_repetition_stats"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    odf = con.execute(e.oracle_sql()["q_repetition_stats"]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    o = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(s) == len(o) and len(s) > 100
    assert (s.values == o.values).all()
