"""PII scrub: detection counts, redaction rewrites, rule-order semantics,
idempotence.

Reference scope note: parser-shacl never inspects document text
(src/ShaclParser.php parses RDF only); PII scrubbing is part of the
corpus-scale training-data generalization, same family as the C4/Gopher
stages. Cross-engine value parity is pinned by q_pii_scrub's DuckDB twin."""

import pytest
from pyspark.sql import functions as F

from kgforge.operators.pii import PII_RULES, scrub_pii


def _scrub(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    return {
        r["doc_id"]: r
        for r in scrub_pii(df, keep_cols=["doc_id"]).collect()
    }


def test_each_kind_detected_and_redacted(spark):
    rows = _scrub(
        spark,
        [
            "mail jo.smith+x@mail4.example.com now",
            "server at 10.0.3.7 answered",
            "ssn 123-45-6789 on file",
            "call +1 (415) 555-0134 today",
        ],
    )
    assert (rows[0]["n_email"], rows[0]["redacted"]) == (1, "mail [EMAIL] now")
    assert (rows[1]["n_ip"], rows[1]["redacted"]) == (1, "server at [IP] answered")
    assert (rows[2]["n_ssn"], rows[2]["redacted"]) == (1, "ssn [SSN] on file")
    assert (rows[3]["n_phone"], rows[3]["redacted"]) == (1, "call [PHONE] today")


def test_rule_order_prevents_double_counting(spark):
    # an IPv4 is digit-runs-with-separators: without sequential redaction
    # the phone rule would also match it; an email's digits likewise
    rows = _scrub(spark, ["ip 192.168.0.1 mail a9@b9.co end"])
    r = rows[0]
    assert r["n_email"] == 1 and r["n_ip"] == 1
    assert r["n_phone"] == 0 and r["n_ssn"] == 0
    assert r["redacted"] == "ip [IP] mail [EMAIL] end"


def test_embedded_version_string_not_an_ip(spark):
    # \b blocks the match inside v1.2.3.4 (word char before the first digit)
    rows = _scrub(spark, ["v1.2.3.4 released; 8.8.8.8 pinged"])
    assert rows[0]["n_ip"] == 1
    assert rows[0]["redacted"] == "v1.2.3.4 released; [IP] pinged"


def test_redaction_idempotent(spark):
    texts = [
        "a@b.co 10.1.2.3 123-45-6789 +1 (415) 555-0134 mixed together",
        "no pii at all",
    ]
    once = _scrub(spark, texts)
    twice = _scrub(spark, [once[i]["redacted"] for i in range(len(texts))])
    for i in range(len(texts)):
        assert twice[i]["redacted"] == once[i]["redacted"]
        for kind, _, _ in PII_RULES:
            assert twice[i][f"n_{kind}"] == 0


def test_map_only_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "doc_id int, text string")
    plan = scrub_pii(df, keep_cols=["doc_id"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_keep_cols_default_preserves_non_text(spark):
    df = spark.createDataFrame(
        [(1, "u", "a@b.co")], "doc_id int, url string, text string"
    )
    out = scrub_pii(df)
    assert set(out.columns) == {"doc_id", "url", "n_email", "n_ip", "n_ssn", "n_phone", "redacted"}
