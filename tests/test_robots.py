"""robots.txt exclusion: hand-written policies, missing-host convention,
Allow/Disallow interplay, audit-flag mode."""

from __future__ import annotations

from kgforge.operators.robots import robots_filter

# NOTE rule ORDER matters: urllib.robotparser implements the original
# first-match REP semantics (not Google's longest-match), so the Allow
# must precede the broader Disallow to take effect
ROBOTS_A = """
User-agent: *
Allow: /private/ok
Disallow: /private/
Disallow: /tmp
"""

ROBOTS_B = """
User-agent: googlebot
Disallow: /

User-agent: *
Disallow:
"""


def _pages(spark):
    rows = [
        ("https://a.org/public/x",),     # allowed (no matching rule)
        ("https://a.org/private/x",),    # disallowed
        ("https://a.org/private/ok/y",), # Allow listed first -> wins
        ("https://a.org/tmp2",),         # prefix match: /tmp matches /tmp2
        ("https://b.org/anything",),     # * is unrestricted for b.org
        ("https://c.org/whatever",),     # no robots row -> allowed
    ]
    return spark.createDataFrame(rows, ["url"])


def _robots(spark):
    return spark.createDataFrame(
        [("a.org", ROBOTS_A), ("b.org", ROBOTS_B)], ["host", "robots_txt"]
    )


def test_filtering(spark):
    kept = sorted(
        r["url"] for r in robots_filter(_pages(spark), _robots(spark)).collect()
    )
    assert kept == [
        "https://a.org/private/ok/y",
        "https://a.org/public/x",
        "https://b.org/anything",
        "https://c.org/whatever",
    ]


def test_audit_mode_keeps_flag(spark):
    rows = robots_filter(
        _pages(spark), _robots(spark), keep_disallowed=True
    ).collect()
    flags = {r["url"]: r["allowed"] for r in rows}
    assert len(rows) == 6
    assert flags["https://a.org/private/x"] is False
    assert flags["https://a.org/tmp2"] is False
    assert flags["https://c.org/whatever"] is True


def test_specific_agent(spark):
    kept = [
        r["url"]
        for r in robots_filter(
            _pages(spark).filter("url like '%b.org%'"),
            _robots(spark),
            agent="googlebot",
        ).collect()
    ]
    assert kept == []  # googlebot is fully disallowed on b.org


def test_sitemap_directives_harvest(spark):
    from kgforge.operators.robots import sitemap_directives

    txt = ("User-agent: *\nDisallow: /x\n"
           "Sitemap: https://h.org/a.xml\n"
           "sitemap:\t/rel/b.xml\n"
           "  SITEMAP:  HTTPS://H.ORG:443/c.xml\n"
           "# Sitemap: https://h.org/commented.xml\n")
    df = spark.createDataFrame([("h.org", txt)], "host string, robots_txt string")
    got = sorted(r["sitemap_url"] for r in sitemap_directives(df).collect())
    assert got == [
        "https://h.org/a.xml",
        "https://h.org/c.xml",       # canonicalized case + default port
        "https://h.org/rel/b.xml",   # resolved against the robots base
    ]


def test_sitemap_directives_none(spark):
    from kgforge.operators.robots import sitemap_directives

    df = spark.createDataFrame(
        [("h.org", "User-agent: *\nAllow: /")], "host string, robots_txt string"
    )
    assert sitemap_directives(df).count() == 0
