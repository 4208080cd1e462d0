"""robots.txt exclusion filtering: drop pages a crawler may not fetch.

A compliant corpus pipeline re-checks captured URLs against each host's
robots policy (policies change after capture; Common Crawl ships the
robots.txt responses alongside the crawl for exactly this). This
operator joins pages to their host's robots.txt body and evaluates the
``*`` user-agent rules with stdlib ``urllib.robotparser`` inside an
Arrow-batched UDF.

Plan shape: hosts are extracted with the codegen ``urlops.host_col``;
the robots table is one small row per host (a crawl of 10^8 hosts is a
few GB — broadcast-joinable, AQE decides), so the only Python work is
the per-row ``can_fetch``. Parsers are memoized per (host, body) within
each batch: a batch holds many pages of one host after the join, so the
parse cost amortizes to ~once per host per task.

Pages whose host has NO robots row are allowed (the crawl convention:
no robots.txt means no restrictions). Malformed robots bodies fall back
to allow-all, matching urllib's lenient parser. Matching semantics are
urllib's: FIRST matching rule wins (the original 1996 REP draft), not
Google's longest-match — pinned by pytest against hand-written
policies; no SQL oracle (rule interplay is not reasonably expressible
in ANSI SQL).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .urlops import host_col


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    keep_disallowed: bool = False,
) -> DataFrame:
    """pages + robots(host, robots_txt) -> pages with an ``allowed`` bool
    column; rows are filtered to allowed unless ``keep_disallowed`` (then
    the caller reads the flag, e.g. to materialize an audit trail)."""
    withhost = pages.withColumn("__host", host_col(F.col(url_col)))
    joined = withhost.join(
        robots.select(F.col("host").alias("__host"), "robots_txt"), "__host", "left"
    )

    out_fields = [f for f in joined.schema.fields if f.name != "robots_txt"]
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields
    ) + ", allowed boolean"
    names = [f.name for f in out_fields]

    def fn(batches):
        import urllib.robotparser

        memo: dict[int, urllib.robotparser.RobotFileParser] = {}

        def parser_for(body: str):
            key = hash(body)
            if key not in memo:
                rp = urllib.robotparser.RobotFileParser()
                rp.parse(body.splitlines())
                memo[key] = rp
            return memo[key]

        for pdf in batches:
            allowed = [
                True
                if body is None or (isinstance(body, float) and pd.isna(body))
                else parser_for(body).can_fetch(agent, u)
                for u, body in zip(pdf[url_col], pdf["robots_txt"])
            ]
            res = pdf[names].copy()
            res["allowed"] = allowed
            yield res

    flagged = joined.mapInPandas(fn, schema=schema).drop("__host")
    return flagged if keep_disallowed else flagged.filter("allowed").drop("allowed")


def sitemap_directives(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """Harvest ``Sitemap:`` directives from robots.txt bodies — the
    protocol-blessed entry point of sitemap discovery (sitemaps.org:
    robots.txt is where crawlers are TOLD where the sitemaps live; this
    feeds `sitemaps.parse_sitemaps`, which feeds the frontier). One row
    per directive: (host, sitemap_url), resolved against the host's
    canonical robots location and canonicalized with the shared RFC 3986
    machinery so discovered sitemap URLs dedup against fetched ones.

    Pure codegen: one case-insensitive line-anchored regexp_extract_all +
    explode; map-only, no Python, no shuffle.
    """
    from .links import canonical_url_col, resolve_href_col

    base = F.concat(F.lit("https://"), F.col(host_col), F.lit("/robots.txt"))
    raw = F.explode(
        F.regexp_extract_all(
            F.col(txt_col), F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), 1
        )
    )
    return (
        robots.select(F.col(host_col).alias("host"), raw.alias("raw"), base.alias("b"))
        .select(
            "host",
            canonical_url_col(resolve_href_col(F.col("raw"), F.col("b"))).alias(
                "sitemap_url"
            ),
        )
        .filter(F.col("sitemap_url").isNotNull())
    )
