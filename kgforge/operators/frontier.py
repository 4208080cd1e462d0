"""Crawl-frontier construction: which URLs to fetch next.

The crawl loop's core set operation: take every outlink discovered this
batch, drop what's already crawled, and rank what remains by link
evidence (how many distinct hosts point at it — the classic indegree
prior for frontier scheduling). Composes the link extractor
(`links.extract_links`) with the canonical URL key (`urlops`) so "already
crawled" means canonical-form equality, not string equality.

Scale shape: one LEFT ANTI join on the canonical url (AQE picks broadcast
when the crawled set is a seed list; shuffle-hash at billions of rows —
both sides are keyed by url, the natural crawl partitioning) + one
map-side-combined aggregate over dst_url. No Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .urlops import canonical_url_col


def crawl_frontier(links: DataFrame, crawled: DataFrame, url_col: str = "url") -> DataFrame:
    """(dst_url, dst_host, n_links, n_src_hosts) for every linked-to URL
    not in ``crawled`` (compared on canonical form), ranked by evidence:
    n_src_hosts = distinct linking hosts (host-level indegree — resistant
    to one site linking the same target a million times), n_links = raw
    link count."""
    seen = crawled.select(
        canonical_url_col(F.col(url_col)).alias("dst_url")
    ).distinct()
    return (
        links.join(seen, "dst_url", "left_anti")
        .groupBy("dst_url", "dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src_host").alias("n_src_hosts"),
        )
    )
