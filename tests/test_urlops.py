"""URL canonicalization: hand-picked RFC-3986-normalization cases and the
driver query vs its formula oracle."""

from __future__ import annotations

import duckdb

from kgforge.operators.urlops import canonical_url_col, host_col


CASES = [
    # (raw, canonical, host)
    ("HTTPS://WWW.Example.ORG/Path/X", "https://www.example.org/Path/X", "www.example.org"),
    ("https://a.org:443/x", "https://a.org/x", "a.org"),
    ("http://a.org:80/x", "http://a.org/x", "a.org"),
    # non-default / mismatched ports are KEPT
    ("http://a.org:8080/x", "http://a.org:8080/x", "a.org"),
    ("http://a.org:443/x", "http://a.org:443/x", "a.org"),
    ("https://a.org/x#frag", "https://a.org/x", "a.org"),
    ("https://a.org/x?utm_source=s&utm_medium=m", "https://a.org/x", "a.org"),
    ("https://a.org/x?b=2&a=1&utm_c=1&gclid=g", "https://a.org/x?a=1&b=2", "a.org"),
    ("https://a.org/x?", "https://a.org/x", "a.org"),
    # path case preserved; empty path preserved
    ("https://A.org", "https://a.org", "a.org"),
    # opaque non-URL keys pass through unchanged
    ("urn:uuid:1234", "urn:uuid:1234", ""),
    ("not a url", "not a url", ""),
]


def test_canonicalization_hand_cases(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], ["url"])
    rows = df.select(
        "url",
        canonical_url_col("url").alias("c"),
        host_col("url").alias("h"),
    ).collect()
    got = {r["url"]: (r["c"], r["h"]) for r in rows}
    for raw, want_c, want_h in CASES:
        assert got[raw] == (want_c, want_h), raw


def test_canonical_collapses_spellings_to_one_key(spark):
    spellings = [
        "https://a.org/x?b=2&a=1",
        "HTTPS://A.ORG/x?a=1&b=2",
        "https://a.org:443/x?a=1&b=2#top",
        "https://a.org/x?utm_source=t&a=1&b=2",
    ]
    df = spark.createDataFrame([(s,) for s in spellings], ["url"])
    assert df.select(canonical_url_col("url").alias("c")).distinct().count() == 1


def test_q_url_canonical_matches_oracle(spark):
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    sdf = e.queries()["q_url_canonical"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    odf = con.execute(e.oracle_sql()["q_url_canonical"]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns) and len(sdf) == len(odf) == 500
    s = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    o = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert (s.values == o.values).all()


def test_url_templates_digit_collapse_and_host_count(spark):
    from kgforge.operators.urlops import url_templates

    urls = spark.createDataFrame(
        [
            ("https://a1.example.org/art/17?x=1",),
            ("https://a2.example.org/art/9",),
            ("https://a1.example.org/art/17#frag",),
            ("https://b.example.org/static/css",),
        ],
        "dst_url string",
    )
    got = {
        r["template"]: (r["n"], r["n_hosts"], r["sample_url"])
        for r in url_templates(urls).collect()
    }
    assert got == {
        "a{n}.example.org/art/{n}": (3, 2, "https://a1.example.org/art/17#frag"),
        "b.example.org/static/css": (1, 1, "https://b.example.org/static/css"),
    }


def test_url_templates_trap_family_collapses_to_one_row(spark):
    """A 200-URL calendar trap reduces to a single template row."""
    from kgforge.operators.urlops import url_templates

    urls = spark.createDataFrame(
        [(f"https://t.example.org/cal/2026/{m}/{d}",)
         for m in range(1, 11) for d in range(1, 21)],
        "dst_url string",
    )
    out = url_templates(urls).collect()
    assert len(out) == 1
    assert out[0]["template"] == "t.example.org/cal/{n}/{n}/{n}"
    assert out[0]["n"] == 200
