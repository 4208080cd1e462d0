"""RSS 2.0 / Atom feed ingestion: <item>/<entry> blocks -> one row per
feed entry — the freshness-oriented discovery source that complements
sitemap ingestion (sitemaps enumerate a site; feeds announce what just
changed, which is what an incremental crawl polls). Reference scope: the
reference parses web-served RDF documents; feed discovery is how a
crawler finds new ones between full recrawls.

Same pure-codegen discipline as sitemaps.py: entry BLOCKS are harvested
with one ``regexp_extract_all`` and exploded, then each field is a
per-block ``regexp_extract`` — block-then-field can never mis-align
optional fields. Map-only until a caller aggregates; fan-out bounded by
entries-per-feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .links import canonical_url_col, host_col, resolve_href_col

# one RSS <item> or Atom <entry> block (group 2); group 1 = the tag name
_ENTRY_RE = r"(?is)<(item|entry)\b[^>]*>(.*?)</\1>"


def _field(block, tag: str):
    return F.nullif(
        F.regexp_extract(block, rf"(?is)<{tag}\b[^>]*>\s*([^<]*?)\s*</{tag}>", 1),
        F.lit(""),
    )


def _xml_unescape(c):
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_feeds(
    feeds: DataFrame, xml_col: str = "xml", url_col: str = "url"
) -> DataFrame:
    """(feed_url, host, kind, link, title, published_ts, guid): one row
    per RSS <item> (kind='item') or Atom <entry> (kind='entry').

    The entry link is RSS's ``<link>text</link>`` or Atom's
    ``<link href="..."/>`` (whichever matches), resolved against the
    feed's own URL and canonicalized with the same RFC 3986 machinery as
    link extraction, so feed URLs dedup against harvested links and
    sitemap locs. published_ts try-parses RFC 822 (RSS pubDate) and ISO
    8601 (Atom published/updated) forms — garbage degrades to NULL, never
    a job kill. Entries without a link are dropped (they can't seed a
    fetch).
    """
    xml = (
        F.decode(F.col(xml_col), "UTF-8")
        if dict(feeds.dtypes)[xml_col] == "binary"
        else F.col(xml_col)
    )
    # ONE regex pass over each feed document: extract whole <item>/<entry>
    # matches (group 0), then split tag/body per MATCH — the per-element
    # regexp_extract runs on short block strings, not the full XML (the
    # former two-group formulation scanned every document twice)
    entries = feeds.select(
        F.col(url_col).alias("feed_url"),
        F.explode(F.regexp_extract_all(xml, F.lit(_ENTRY_RE), 0)).alias("m"),
    ).select(
        "feed_url",
        F.lower(F.regexp_extract(F.col("m"), _ENTRY_RE, 1)).alias("kind"),
        F.regexp_extract(F.col("m"), _ENTRY_RE, 2).alias("block"),
    )
    b = F.col("block")
    rss_link = _field(b, "link")
    atom_link = F.nullif(
        F.regexp_extract(b, r'(?is)<link\b[^>]*\bhref\s*=\s*["\']([^"\']*)["\']', 1),
        F.lit(""),
    )
    raw_link = _xml_unescape(F.coalesce(rss_link, atom_link))
    # RSS 2.0 pubDate is RFC 822; Atom published/updated are ISO 8601
    raw_ts = F.coalesce(
        _field(b, "pubDate"), _field(b, "published"), _field(b, "updated")
    )
    # Spark >= 3 refuses day-of-week parse patterns ('EEE'): strip the
    # RFC 822 weekday prefix instead and parse the unambiguous remainder
    rfc822 = F.regexp_replace(raw_ts, r"^[A-Za-z]{3},\s*", "")
    ts = F.coalesce(
        F.try_to_timestamp(rfc822, F.lit("dd MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(raw_ts, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(raw_ts, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
    )
    out = entries.select(
        "feed_url",
        "kind",
        canonical_url_col(
            resolve_href_col(raw_link, F.col("feed_url"))
        ).alias("link"),
        _xml_unescape(_field(b, "title")).alias("title"),
        ts.alias("published_ts"),
        F.coalesce(_xml_unescape(_field(b, "guid")), _xml_unescape(_field(b, "id"))).alias("guid"),
    ).filter(F.col("link").isNotNull())
    return out.select(
        "feed_url", host_col("feed_url").alias("host"), "kind",
        "link", "title", "published_ts", "guid",
    )
