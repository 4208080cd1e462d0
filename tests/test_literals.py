"""Typed-literal normalization — golden cases per datatype family."""

from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"


def _triples(spark, rows):
    """rows: (value, kind, datatype, lang)."""
    data = [
        ("s%d" % i, {"value": v, "kind": k, "datatype": d, "lang": lg})
        for i, (v, k, d, lg) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "subject string, "
        "object struct<value:string,kind:string,datatype:string,lang:string>",
    ).select(
        F.lit("u://x").alias("url"), "subject", F.lit("p").alias("predicate"),
        "object", F.lit("ok").alias("status"),
    )


def _norm(spark, rows):
    from kgforge.operators.literals import normalize_literals

    out = normalize_literals(_triples(spark, rows)).orderBy("subject")
    return out.collect()


def test_numeric_normalization(spark):
    rows = [
        ("042", "literal", XSD + "integer", ""),     # leading zeros fine
        ("+42", "literal", XSD + "integer", ""),     # sign fine
        ("42.5", "literal", XSD + "integer", ""),    # fractional -> invalid
        ("42.5", "literal", XSD + "decimal", ""),    # fine as decimal
        ("1e3", "literal", XSD + "double", ""),      # exponent fine
        ("n/a", "literal", XSD + "integer", ""),     # junk -> invalid
    ]
    got = _norm(spark, rows)
    assert [r["lit_kind"] for r in got] == ["numeric"] * 6
    assert [r["num_value"] for r in got] == [42.0, 42.0, None, 42.5, 1000.0, None]
    assert [r["valid"] for r in got] == [True, True, False, True, True, False]
    # canonical join key: "042" and "+42" now meet
    assert got[0]["num_value"] == got[1]["num_value"]


def test_boolean_and_date_normalization(spark):
    rows = [
        ("true", "literal", XSD + "boolean", ""),
        ("1", "literal", XSD + "boolean", ""),
        ("0", "literal", XSD + "boolean", ""),
        ("yes", "literal", XSD + "boolean", ""),      # outside lexical space
        ("1970-01-02", "literal", XSD + "date", ""),
        ("2026-02-30", "literal", XSD + "date", ""),  # no such day
        ("199", "literal", XSD + "date", ""),         # not ISO
    ]
    got = _norm(spark, rows)
    assert [r["bool_value"] for r in got[:4]] == [True, True, False, None]
    assert [r["valid"] for r in got[:4]] == [True, True, True, False]
    assert got[4]["epoch_day"] == 1 and got[4]["valid"]
    assert got[5]["epoch_day"] is None and not got[5]["valid"]
    assert got[6]["epoch_day"] is None and not got[6]["valid"]


def test_lang_canonicalization_and_passthrough(spark):
    rows = [
        ("hi", "literal", "", "EN-us"),     # region uppercased, lang lowered
        ("hallo", "literal", "", "DE"),     # plain tag lowered
        ("x", "literal", "", "zh-Hant"),    # 4-letter script: lowered whole
        ("urn:x", "iri", "", ""),           # non-literal untouched, valid
    ]
    got = _norm(spark, rows)
    assert got[0]["lang_canonical"] == "en-US"
    assert got[1]["lang_canonical"] == "de"
    assert got[2]["lang_canonical"] == "zh-hant"
    assert got[3]["lit_kind"] == "non_literal" and got[3]["valid"]
    assert all(r["valid"] for r in got)
