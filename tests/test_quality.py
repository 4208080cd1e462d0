"""Gopher quality rules: hand-computed metric pins on crafted texts
(multi-line, bullets, ellipses, symbols, empty/degenerate docs) plus the
filter composition. The corpus-scale value check is the driver-oracled
q_gopher_quality (DuckDB twin at sf0.01)."""

from __future__ import annotations

import pytest

from kgforge.operators.quality import gopher_filter, gopher_profile

DOCS = [
    # (doc_id, text)
    (0, "the cat and the dog have been to town with all of that noise"),
    (1, ""),  # degenerate: everything zero, keep=0
    (2, "- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n- nine\n- ten"),
    (3, "word " * 10 + "trailing...\nanother line...\nplain line"),
    (4, "## ## ## ## markdown #heavy# symbols here"),
    (5, "a b c d e f g h i j"),  # mean word length 1 -> fails word-len rule
    (6, "1 2 3 4 5 6 7 8 9 10"),  # no alphabetic words
]


@pytest.fixture(scope="module")
def prof(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = gopher_profile(df, min_words=5, min_stop_hits=2).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_clean_english_doc_keeps(prof):
    r = prof[0]
    assert r["n_words"] == 14
    # the,and,have,to,with,of,that present (be absent) = 7 distinct hits
    assert r["stop_hits"] == 7
    assert r["alpha_frac"] == 1.0
    assert r["keep"] == 1


def test_empty_doc_all_zero_no_nulls(prof):
    r = prof[1]
    assert r["n_words"] == 0
    assert r["mean_word_len"] == 0.0
    assert r["symbol_ratio"] == 0.0
    assert r["alpha_frac"] == 0.0
    assert None not in r.values()
    assert r["keep"] == 0


def test_bullet_rule(prof):
    r = prof[2]
    assert r["bullet_frac"] == 1.0  # 10/10 lines start with '-'
    assert r["ok_bullets"] == 0 and r["keep"] == 0


def test_ellipsis_lines(prof):
    r = prof[3]
    # 3 lines, 2 end with '...'
    assert r["ellipsis_frac"] == round(2 / 3, 6)
    assert r["ok_ellipsis"] == 0


def test_symbol_ratio(prof):
    r = prof[4]
    # 8 '#' in '## ## ## ##' + 2 in '#heavy#' = 10 hashes, 8 words
    # ('## ## ## ## markdown #heavy# symbols here')
    assert r["n_words"] == 8
    assert r["symbol_ratio"] == round(10 / 8, 6)
    assert r["ok_symbols"] == 0


def test_mean_word_length_bounds(prof):
    assert prof[5]["mean_word_len"] == 1.0
    assert prof[5]["ok_word_len"] == 0


def test_alpha_fraction(prof):
    assert prof[6]["alpha_frac"] == 0.0
    assert prof[6]["ok_alpha"] == 0


def test_gopher_filter_semi_join(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    kept = gopher_filter(df, min_words=5, min_stop_hits=2)
    assert [r["doc_id"] for r in kept.collect()] == [0]
    assert kept.columns == df.columns


def test_host_curation_rollup_and_decision(spark):
    from kgforge.operators.quality import host_curation

    long = "tok " * 30  # 30 tokens (trailing space trimmed)
    rows = (
        # hostA: 4 long unique pages -> keep
        [(i, "A", long + str(i)) for i in range(4)]
        # hostB: 4 pages, 3 identical -> dup_share 0.75 -> drop
        + [(10, "B", long + "x"), (11, "B", "same page"), (12, "B", "same page"),
           (13, "B", "same page")]
        # hostC: short pages -> mean tokens < 20 -> drop
        + [(20, "C", "a b c"), (21, "C", "d e"), (22, "C", "f g h i")]
        # hostD: below evidence floor -> keep is NULL
        + [(30, "D", long), (31, "D", "tiny")]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    got = {r["host"]: r for r in host_curation(df).collect()}
    assert got["A"]["keep"] is True and got["A"]["dup_share"] == 0.0
    assert got["B"]["keep"] is False and got["B"]["dup_share"] == 0.75
    assert got["C"]["keep"] is False and got["C"]["mean_tokens"] == 3.0
    assert got["D"]["keep"] is None and got["D"]["n_docs"] == 2


def test_corpus_card_hand_pin(spark):
    from kgforge.operators.quality import corpus_card

    rows = [
        (1, "a b c", "en"), (2, "d e", "en"), (3, "f", "de"),
        (4, "same", "en"), (5, "same", "fr"),   # exact dup pair
        (6, "", "en"),                            # blank: 0 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = corpus_card(df).collect()[0]
    assert got["n_docs"] == 6 and got["n_tokens"] == 3 + 2 + 1 + 1 + 1 + 0
    assert got["n_langs"] == 3 and got["top_lang"] == "en"
    assert got["top_lang_share"] == round(4 / 6, 6)
    assert got["dup_share"] == round(2 / 6, 6)
    assert got["mean_tokens"] == round(8 / 6, 6)
