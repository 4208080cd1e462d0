"""Unicode text cleaning: control/zero-width strip, NFC composition,
whitespace collapse. Cross-engine parity is pinned by q_text_clean's
DuckDB twin (nfc_normalize); these tests pin the Python-side semantics."""

from pyspark.sql import functions as F

from kgforge.operators.cleaning import clean_text, clean_text_cols


def _clean_one(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return clean_text(df, **kw).collect()[0]["text"]


def test_zero_width_and_controls_stripped(spark):
    dirty = "a\u200Bb\u200Cc\u200Dd\uFEFFe \x00f\x07g\x7Fh"
    assert _clean_one(spark, dirty) == "abcde fgh"


def test_nfc_composes_decomposed_accents(spark):
    out = _clean_one(spark, "cafe\u0301 voila\u0300")
    assert out == "caf\u00E9 voil\u00E0"
    assert len(out) == len("cafe voila")  # composed: one char per accent


def test_whitespace_collapse_includes_nbsp_and_trim(spark):
    dirty = " \t a \u00A0 b \r\n c\u00A0\u00A0d \n"
    assert _clean_one(spark, dirty) == "a b c d"


def test_tab_newline_survive_as_single_space(spark):
    # \t and \n are word separators, not controls to delete
    assert _clean_one(spark, "a\tb\nc") == "a b c"


def test_nfc_false_is_pure_codegen(spark):
    df = spark.createDataFrame([("a  b",)], "text string")
    out = clean_text(df, nfc=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert out.collect()[0]["text"] == "a b"


def test_null_text_passes_through(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert clean_text(df).collect()[0]["text"] is None


def test_idempotent(spark):
    dirty = "x\u200B cafe\u0301 \u00A0y z \r\n"
    once = _clean_one(spark, dirty)
    assert _clean_one(spark, once) == once
