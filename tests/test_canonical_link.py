"""<link rel="canonical"> extraction edge cases."""

from kgforge.operators.links import extract_canonical


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_canonical_both_attribute_orders_and_resolution(spark):
    rows = [
        # rel before href, relative target
        ("https://a.org/p?utm_source=x",
         '<html><link rel="canonical" href="/p"><body>x</body></html>'),
        # href before rel, absolute messy target
        ("https://b.org/q",
         "<link href='HTTPS://B.ORG:443/q2#frag' rel='canonical'>"),
        # no declaration -> no row
        ("https://c.org/r", "<html><link rel='stylesheet' href='/s.css'>"),
    ]
    got = {r["url"]: r for r in extract_canonical(_df(spark, rows)).collect()}
    assert set(got) == {"https://a.org/p?utm_source=x", "https://b.org/q"}
    a = got["https://a.org/p?utm_source=x"]
    # utm param stripped from the PAGE url by canonicalization => self
    assert a["canonical_url"] == "https://a.org/p" and a["is_self"]
    b = got["https://b.org/q"]
    assert b["canonical_url"] == "https://b.org/q2" and not b["is_self"]


def test_canonical_first_declaration_wins(spark):
    rows = [
        ("https://a.org/p",
         '<link rel="canonical" href="/one"><link rel="canonical" href="/two">'),
    ]
    got = extract_canonical(_df(spark, rows)).collect()
    assert got[0]["canonical_url"] == "https://a.org/one"


def test_canonical_binary_html(spark):
    df = spark.createDataFrame(
        [("https://a.org/p", b'<link rel="canonical" href="/x">')],
        "url string, html binary",
    )
    got = extract_canonical(df).collect()
    assert got[0]["canonical_url"] == "https://a.org/x"
