"""Sitemap ingestion (sitemaps.org protocol): urlset / sitemapindex XML
-> one row per entry, the crawl-frontier seed source that complements
robots.txt filtering (reference scope: the reference parses web-served
RDF documents; sitemap discovery is how a crawler finds them).

Pure-codegen parsing: entry BLOCKS are harvested with one
``regexp_extract_all`` and exploded, then each field is a per-block
``regexp_extract`` — fields may be absent per entry, so positional
zipping of independent field harvests (the anchor-text trick) would
mis-align; block-then-field never can. Map-only until a caller
aggregates; fan-out bounded by entries-per-sitemap (the protocol caps a
sitemap at 50k URLs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .links import canonical_url_col, host_col, resolve_href_col

# one <url>...</url> or <sitemap>...</sitemap> entry block (group 2),
# group 1 = the tag name, distinguishing child-URL rows from child-SITEMAP rows
_ENTRY_RE = r"(?is)<(url|sitemap)\b[^>]*>(.*?)</\1>"


def _field(block, tag: str):
    return F.nullif(
        F.regexp_extract(block, rf"(?is)<{tag}\b[^>]*>\s*([^<]*?)\s*</{tag}>", 1),
        F.lit(""),
    )


def _xml_unescape(c):
    # the 5 predefined XML entities the sitemap spec REQUIRES in <loc>
    # (&amp; last so "&amp;lt;" decodes to "&lt;", not "<")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_sitemaps(
    sitemaps: DataFrame, xml_col: str = "xml", url_col: str = "url"
) -> DataFrame:
    """(sitemap_url, host, kind, loc, lastmod_date, changefreq, priority):
    one row per <url> (kind='url') or child <sitemap> (kind='sitemap' —
    feed these back as the next fetch frontier) entry. ``loc`` is resolved
    against the sitemap's own URL and canonicalized with the same RFC 3986
    machinery as link extraction, so sitemap URLs and harvested links
    dedup against each other. Entries without <loc> are dropped (the spec
    requires it); lastmod keeps its W3C-datetime DATE prefix (null when
    absent/garbage), priority is a double (null when absent/garbage)."""
    xml = F.decode(F.col(xml_col), "UTF-8") if dict(sitemaps.dtypes)[
        xml_col
    ] == "binary" else F.col(xml_col)
    entries = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(xml, F.lit(_ENTRY_RE), 1).alias("tag"),
                F.regexp_extract_all(xml, F.lit(_ENTRY_RE), 2).alias("block"),
            )
        ).alias("e"),
    ).select(
        "sitemap_url",
        F.lower(F.col("e.tag")).alias("kind"),
        F.col("e.block").alias("block"),
    )
    out = (
        entries.withColumn(
            "loc",
            canonical_url_col(
                resolve_href_col(
                    _xml_unescape(_field(F.col("block"), "loc")), F.col("sitemap_url")
                )
            ),
        )
        .filter(F.col("loc").isNotNull())
        .select(
            "sitemap_url",
            host_col("sitemap_url").alias("host"),
            "kind",
            "loc",
            F.try_to_date(F.substring(_field(F.col("block"), "lastmod"), 1, 10)).alias(
                "lastmod_date"
            ),
            _field(F.col("block"), "changefreq").alias("changefreq"),
            _field(F.col("block"), "priority").try_cast("double").alias("priority"),
        )
    )
    return out
