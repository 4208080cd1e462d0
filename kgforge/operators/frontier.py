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


def politeness_schedule(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    n_workers: int = 64,
    url_col: str = "dst_url",
    host_col_name: str = "dst_host",
    default_delay_sec: int = 1,
    bucket_bits: int = 12,
) -> DataFrame:
    """Compile a frontier into a per-host SERIALIZED fetch schedule.

    Politeness requires one fetch per host per crawl-delay window, so a
    host must never split across fetch workers. Output per URL:
    ``worker`` (= hash(host) % n_workers — host-sticky shard),
    ``fetch_seq`` (the URL's position in its host's deterministic fetch
    order), and ``fetch_at_sec`` (= fetch_seq * the host's crawl delay,
    the earliest offset a compliant worker may issue the fetch).
    ``delays`` is an optional (host, crawl_delay_sec) table (e.g. parsed
    from robots.txt Crawl-delay lines); hosts without a row get
    ``default_delay_sec``.

    Scale shape — the domain_quota two-phase idiom, keyed by host: the
    md5 order key's HIGH bits range-partition each host's fetch order, so
    phase 1's row_number windows over (host, bucket) sub-partitions and
    phase 2 offsets ride the metadata-sized (host, bucket) count table. A
    host with 10^8 frontier URLs never lands in one window partition. The
    delays join is host-keyed against a host-cardinality table — AQE
    broadcasts it.
    """
    from pyspark.sql import Window

    key = F.conv(F.substring(F.md5(F.col(url_col)), 1, 15), 16, 10).cast("long")
    base = frontier.select(
        F.col(url_col).alias("url"),
        F.col(host_col_name).alias("host"),
        key.alias("_k"),
    ).withColumn("_bucket", F.shiftright("_k", 60 - bucket_bits))

    w_in = Window.partitionBy("host", "_bucket").orderBy(
        F.col("_k").asc(), F.col("url").asc()
    )
    intra = base.withColumn("_seq_in", F.row_number().over(w_in) - F.lit(1))
    totals = base.groupBy("host", "_bucket").agg(F.count(F.lit(1)).alias("_n"))
    w_b = (
        Window.partitionBy("host")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # (host, bucket) totals: metadata-sized, never document rows
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_b), F.lit(0))
    ).select("host", "_bucket", "_offset")

    seq = (F.col("_seq_in") + F.col("_offset")).cast("bigint").alias("fetch_seq")
    out = intra.join(offsets, ["host", "_bucket"]).select("url", "host", seq)

    if delays is not None:
        out = out.join(
            delays.select("host", "crawl_delay_sec"), "host", "left"
        ).withColumn(
            "crawl_delay_sec",
            F.coalesce(F.col("crawl_delay_sec"), F.lit(default_delay_sec)).cast(
                "bigint"
            ),
        )
    else:
        out = out.withColumn(
            "crawl_delay_sec", F.lit(default_delay_sec).cast("bigint")
        )

    hkey = F.conv(F.substring(F.md5(F.col("host")), 1, 15), 16, 10).cast("long")
    return out.select(
        "url",
        "host",
        F.pmod(hkey, F.lit(n_workers)).cast("bigint").alias("worker"),
        "fetch_seq",
        (F.col("fetch_seq") * F.col("crawl_delay_sec")).cast("bigint").alias(
            "fetch_at_sec"
        ),
    )
