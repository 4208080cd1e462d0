"""Corpus mining operators: hand-computed values on crafted docs, plus the
driver queries vs their DuckDB oracles at sf0.001."""

from __future__ import annotations

import math

import duckdb
import pytest


def _oracle_match(spark, name: str, sf: str = "/root/testdata/sf0.001", min_rows: int = 1):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    odf = con.execute(e.oracle_sql()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o) and len(s) >= min_rows
    for c in cols:
        if s[c].dtype.kind == "f" or o[c].dtype.kind == "f":
            assert (s[c].astype(float).round(6) == o[c].astype(float).round(6)).all(), c
        else:
            assert (s[c].astype(str) == o[c].astype(str)).all(), c


def test_contamination_overlap_hand_computed(spark):
    from kgforge.operators.corpus_mining import contamination_overlap

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # shares trigram "alpha beta gamma"
            (2, "beta gamma alpha delta"),  # same words, no shared trigram
            (3, "x y"),  # too short for trigrams: never contaminated
            (4, "zz alpha beta gamma delta qq"),  # two overlapping trigrams
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "beta gamma delta")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in contamination_overlap(train, ev, n=3).collect()
    }
    # doc 4 matches "alpha beta gamma" AND "beta gamma delta"; doc 1 both too
    assert out == {1: 2, 4: 2}


def test_contamination_shuffle_join_same_result(spark):
    """broadcast_eval=False must be a pure strategy change."""
    from kgforge.operators.corpus_mining import contamination_overlap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tr, ev = docs.filter("doc_id % 97 != 0"), docs.filter("doc_id % 97 = 0")
    a = sorted(map(tuple, contamination_overlap(tr, ev, n=3).collect()))
    b = sorted(
        map(tuple, contamination_overlap(tr, ev, n=3, broadcast_eval=False).collect())
    )
    assert a == b and len(a) > 0


def test_chunk_dup_stats_hand_computed(spark):
    from kgforge.operators.corpus_mining import chunk_dup_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # chunks(2): [a b][c d][e f]
            (2, "a b c d x"),  # chunks: [a b][c d] (trailing "x" dropped)
            (3, "a b a b"),  # chunks: [a b][a b] -> both globally dup'd
            (4, "q"),  # < chunk tokens: excluded
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"])
        for r in chunk_dup_stats(docs, chunk=2).collect()
    }
    # "a b" occurs 4x globally (docs 1,2,3,3); "c d" 2x (docs 1,2); "e f" 1x
    assert out == {1: (3, 2), 2: (2, 2), 3: (2, 2)}


def test_pmi_pairs_hand_computed(spark):
    from kgforge.operators.corpus_mining import pmi_pairs

    # one doc: bigrams "a b" x2 and "b a" x2; unigrams a=3, b=2, N1=5, N2=4.
    # The two pairs tie on pmi exactly -> the gram tiebreak orders them.
    docs = spark.createDataFrame([(1, "a b a b a")], ["doc_id", "text"])
    rows = pmi_pairs(docs, top_k=5, min_count=2).collect()
    assert [r["g"] for r in rows] == ["a b", "b a"]
    expected = math.log((2 / 4) / ((3 / 5) * (2 / 5)))
    for r in rows:
        assert r["pair_count"] == 2
        assert r["pmi"] == pytest.approx(round(expected, 6), abs=1e-6)


def test_token_percentiles_hand_computed(spark):
    from kgforge.operators.corpus_mining import token_percentiles

    docs = spark.createDataFrame(
        [(i, "en", "w " * (i + 1)) for i in range(4)] + [(9, "de", "x y z")],
        ["doc_id", "lang", "text"],
    )
    out = {r["lang"]: r for r in token_percentiles(docs).collect()}
    # en token counts 1..4: p50 = 2.5 (linear interpolation), p90 = 3.7
    assert out["en"]["n_docs"] == 4
    assert out["en"]["p50_tokens"] == 2.5
    assert out["en"]["p90_tokens"] == pytest.approx(3.7, abs=1e-6)
    assert out["de"]["p50_tokens"] == 3.0


@pytest.mark.parametrize(
    "name,min_rows",
    [
        ("q_decontaminate", 2),
        ("q_chunk_dedup", 40),
        ("q_pmi_terms", 25),
        ("q_token_percentiles", 5),
        # CC over the minhash pair graph vs a recursive-CTE closure
        ("q_dedup_clusters", 40),
        # ExactSubstr maximal duplicated spans vs string-gram windows
        ("q_span_dedup", 40),
    ],
)
def test_driver_queries_match_oracle(spark, name, min_rows):
    _oracle_match(spark, name, min_rows=min_rows)


def test_remove_duplicate_paragraphs_hand_case(spark):
    from kgforge.operators.corpus_mining import remove_duplicate_paragraphs

    rows = [
        (1, "unique one\n\nCOMMON FOOTER\n\nalso unique"),
        (2, "COMMON FOOTER\n\nsecond doc body"),
        (3, "third doc\n\nCOMMON FOOTER"),
        (4, "COMMON FOOTER"),  # fully boilerplate -> comes back empty
        (5, ""),  # empty text -> zero paragraphs
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.text, r.n_paragraphs, r.n_removed)
        for r in remove_duplicate_paragraphs(docs).collect()
    }
    assert got[1] == ("unique one\n\nalso unique", 3, 1)
    assert got[2] == ("second doc body", 2, 1)
    assert got[3] == ("third doc", 2, 1)
    assert got[4] == ("", 1, 1)
    assert got[5] == ("", 0, 0)


def test_remove_duplicate_paragraphs_max_freq_and_order(spark):
    from kgforge.operators.corpus_mining import remove_duplicate_paragraphs

    rows = [
        (1, "twice\n\na1\n\nz9"),
        (2, "twice\n\nb2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # max_freq=2 tolerates the pair; order of survivors is positional
    got = {
        r.doc_id: r.text
        for r in remove_duplicate_paragraphs(docs, max_freq=2).collect()
    }
    assert got == {1: "twice\n\na1\n\nz9", 2: "twice\n\nb2"}
    strict = {
        r.doc_id: r.text
        for r in remove_duplicate_paragraphs(docs, max_freq=1).collect()
    }
    assert strict == {1: "a1\n\nz9", 2: "b2"}


def test_remove_duplicate_paragraphs_trim_keyed(spark):
    from kgforge.operators.corpus_mining import remove_duplicate_paragraphs

    # same footer with different surrounding whitespace still collapses
    rows = [(1, "  FOOT  \n\nkeep1"), (2, "FOOT\n\nkeep2")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.text, r.n_removed)
        for r in remove_duplicate_paragraphs(docs).collect()
    }
    assert got == {1: ("keep1", 1), 2: ("keep2", 1)}


def test_duplicated_spans_hand_case(spark):
    from kgforge.operators.corpus_mining import duplicated_spans

    shared = "one two three four five six"  # 6 tokens shared by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, f"u1a u1b {shared} u1c u1d"),
            (2, f"v1 v2 v3 {shared} v4"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8"),  # all unique: no spans
        ],
        "doc_id int, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(docs, k=6, min_freq=2).collect()
    }
    # only the exact shared 6-gram positions qualify: doc1 pos 2, doc2 pos 3
    assert got == {(1, 2, 8, 6), (2, 3, 9, 6)}


def test_duplicated_spans_merge_overlapping(spark):
    from kgforge.operators.corpus_mining import duplicated_spans

    run = " ".join(f"s{i}" for i in range(10))  # 10-token shared run
    docs = spark.createDataFrame(
        [(1, f"a1 {run} a2"), (2, f"{run} b1 b2 b3")],
        "doc_id int, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, k=4, min_freq=2).collect()
    }
    # seven overlapping 4-gram windows merge into ONE maximal 10-token span
    assert got == {(1, 1, 11), (2, 0, 10)}


def test_duplicated_spans_within_doc_repeat(spark):
    from kgforge.operators.corpus_mining import duplicated_spans

    # the phrase repeats inside one document; occurrence-count >= 2 within
    # a single doc must flag BOTH occurrences (the ExactSubstr criterion)
    docs = spark.createDataFrame(
        [(1, "p q r s x y z p q r s")],
        "doc_id int, text string",
    )
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, k=4, min_freq=2).collect()
    )
    assert got == [(0, 4), (7, 11)]


def test_remove_duplicate_spans_rewrite(spark):
    from kgforge.operators.corpus_mining import remove_duplicate_spans

    shared = "one two three four five six"
    docs = spark.createDataFrame(
        [
            (1, f"u1a u1b {shared} u1c u1d"),
            (2, f"v1 v2 v3 {shared} v4"),
            (3, "w1 w2   w3"),  # untouched doc: whitespace normalized only
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["dup_tokens"])
        for r in remove_duplicate_spans(docs, k=6, min_freq=2).collect()
    }
    assert out[1] == ("u1a u1b u1c u1d", 10, 6)
    assert out[2] == ("v1 v2 v3 v4", 10, 6)
    assert out[3] == ("w1 w2 w3", 3, 0)


def test_remove_duplicate_spans_fully_duplicated_doc(spark):
    from kgforge.operators.corpus_mining import remove_duplicate_spans

    run = "c1 c2 c3 c4 c5 c6"
    docs = spark.createDataFrame(
        [(1, run), (2, run)], "doc_id int, text string"
    )
    out = {r["doc_id"]: r["text"] for r in remove_duplicate_spans(docs, k=6).collect()}
    assert out == {1: "", 2: ""}  # rows survive with empty text, not dropped


def test_bitext_candidates_url_twins(spark):
    from kgforge.operators.corpus_mining import bitext_candidates

    pages = spark.createDataFrame(
        [
            ("https://s.org/en/article/7", "en"),
            ("https://s.org/de/article/7", "de"),
            ("https://s.org/fr/article/7", "fr"),
            ("https://s.org/en/article/9", "en"),      # no twin
            ("https://t.org/en/article/7", "en"),      # other site: own key
            ("https://s.org/en/about", "en"),          # no lang segment match? en/ stripped
        ],
        "url string, lang string",
    )
    out = bitext_candidates(pages).collect()
    pairs = {(r["doc_key"], r["lang_a"], r["lang_b"]) for r in out}
    assert pairs == {
        ("https://s.org/article/7", "de", "en"),
        ("https://s.org/article/7", "de", "fr"),
        ("https://s.org/article/7", "en", "fr"),
    }
    row = next(r for r in out if r["lang_a"] == "de" and r["lang_b"] == "en")
    assert row["url_a"] == "https://s.org/de/article/7"
    assert row["url_b"] == "https://s.org/en/article/7"


def test_bitext_candidates_rep_is_min_url(spark):
    from kgforge.operators.corpus_mining import bitext_candidates

    pages = spark.createDataFrame(
        [
            ("https://s.org/en/a/2", "en"),
            ("https://s.org/en/a/1", "en"),   # two en variants of /a/{n}? no —
            ("https://s.org/de/a/1", "de"),   # keys differ by trailing id
        ],
        "url string, lang string",
    )
    out = {(r["doc_key"], r["lang_a"], r["lang_b"]): (r["url_a"], r["url_b"])
           for r in bitext_candidates(pages).collect()}
    assert out == {
        ("https://s.org/a/1", "de", "en"):
            ("https://s.org/de/a/1", "https://s.org/en/a/1"),
    }


def test_remove_host_boilerplate_host_scoped(spark):
    from kgforge.operators.corpus_mining import remove_host_boilerplate

    rows = [
        # host A: footer on 3/3 pages -> dropped; bodies unique -> kept
        (1, "A", "FOOTER\nbody one"),
        (2, "A", "FOOTER\nbody two"),
        (3, "A", "FOOTER\nbody three"),
        # host B: the SAME footer text on only 1/2 pages -> kept (host-scoped)
        (4, "B", "FOOTER\nbeta"),
        (5, "B", "gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    got = {r["doc_id"]: r for r in remove_host_boilerplate(df).collect()}
    assert got[1]["text"] == "body one" and got[1]["n_removed"] == 1
    assert got[2]["text"] == "body two"
    assert got[4]["text"] == "FOOTER\nbeta" and got[4]["n_removed"] == 0
    assert got[5]["text"] == "gamma"


def test_remove_host_boilerplate_all_template_page(spark):
    from kgforge.operators.corpus_mining import remove_host_boilerplate

    rows = [(1, "A", "NAV"), (2, "A", "NAV"), (3, "A", "NAV\nreal content")]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    got = {r["doc_id"]: r for r in remove_host_boilerplate(df).collect()}
    assert got[1]["text"] == "" and got[1]["n_removed"] == 1  # fully boilerplate
    assert got[3]["text"] == "real content"
    assert len(got) == 3  # every input row comes back


def test_remove_host_boilerplate_order_and_empty_lines(spark):
    from kgforge.operators.corpus_mining import remove_host_boilerplate

    rows = [
        (1, "A", "T\n\nalpha\nT2\nbeta"),
        (2, "A", "T\n\nother\nT2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    got = {r["doc_id"]: r for r in remove_host_boilerplate(df).collect()}
    # T and T2 recur on 2/2 pages -> dropped; empty lines dropped; order kept
    assert got[1]["text"] == "alpha\nbeta"
    assert got[2]["text"] == "other"
