"""Page-layout fingerprinting: cluster pages by their HTML TAG SEQUENCE.

Pages generated from one server-side template share an (almost) identical
tag skeleton even when every visible string differs — so hashing the tag
sequence clusters a host's pages into templates. That powers wrapper
induction (learn one extractor per template), boilerplate scoping, and
"this host is 99% one template" spam signals, all without rendering.

Pure codegen: the tag harvest is one regexp_extract_all, the fingerprint
one md5 over the joined sequence — both SQL-replayable, so the operator
carries a value-level DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# opening tags only: closing tags mirror them, and attribute values are
# exactly the template-variable noise the fingerprint must ignore
_TAG_RE = r"(?i)<([a-zA-Z][a-zA-Z0-9]*)"


def layout_fingerprint_col(html_str_col):
    """md5 hex of the lowercased opening-tag sequence of a page."""
    tags = F.regexp_extract_all(F.lower(html_str_col), F.lit(_TAG_RE.lower()), 1)
    return F.md5(F.array_join(tags, " "))


def layout_clusters(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    host_col_name: str | None = None,
) -> DataFrame:
    """Per layout fingerprint: (fingerprint, n_pages, n_hosts,
    sample_url) — one row per TEMPLATE in the corpus instead of one per
    page. Grouping key is the md5 of the tag sequence; host diversity
    distinguishes a sitewide template (1 host) from a shared CMS theme
    (many hosts).

    Scale shape: harvest + hash fuse into the scan's codegen span; ONE
    map-side-combinable agg keyed on the 32-char fingerprint; output is
    template-cardinality-sized. sample_url = min(url), combinable.
    """
    html_str = F.decode(F.col(html_col), "UTF-8")
    host = (
        F.col(host_col_name)
        if host_col_name
        else F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/?#]+)", 1)
    )
    return (
        pages.select(
            layout_fingerprint_col(html_str).alias("fingerprint"),
            host.alias("host"),
            F.col(url_col).alias("u"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.countDistinct("host").cast("bigint").alias("n_hosts"),
            F.min("u").alias("sample_url"),
        )
    )
