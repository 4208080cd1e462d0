"""Domain blocklist filtering: drop pages whose host falls under any
blocked domain suffix.

The UT1/"adult-domains"-style gate every crawl corpus applies before
training (reference scope: parser-shacl has no crawl surface — this
generalizes alongside ``robots.py``/``frontier.py``). Semantics match
registrable-domain blocklists: a page is blocked iff ANY dot-suffix of
its host (``a.b.example.org`` → ``a.b.example.org``, ``b.example.org``,
``example.org``, ``org``) appears in the blocklist — so one entry blocks
every subdomain under it, and exact-host entries work unchanged.

Plan shape (scale notes):

- Suffix expansion is a codegen ``transform`` over ``sequence`` — at most
  ``max_labels`` (8) array elements per page, no Python.
- Matching is an ``explode`` + **broadcast** LEFT SEMI equi-join against
  the blocklist (blocklists are MB-scale metadata: always the broadcast
  side), so the hit detection itself is map-only — no shuffle.
- The join-back attaching the per-page ``blocked`` flag is keyed on
  ``url``; the hits side carries only blocked urls (usually a small
  fraction), so AQE converts it to a broadcast join in the common case.
  When a corpus is mostly-blocked, compose with ``keep_blocked=False``
  (the default) and consume the anti-join output directly instead of
  materializing flags for rows about to be dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .urlops import host_col


def host_suffixes_col(host, max_labels: int = 8):
    """Array of dot-suffixes of a hostname, longest first, capped at
    ``max_labels`` (suffix count == label count; the cap bounds the explode
    factor against pathological 100-label hosts)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda i: F.concat_ws(".", F.slice(parts, i, n)),
    )


def blocklist_filter(
    pages: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    keep_blocked: bool = False,
    max_labels: int = 8,
) -> DataFrame:
    """Filter ``pages`` against a blocklist of domain suffixes.

    ``keep_blocked=False`` (default): return only unblocked pages
    (left-anti — the production shape). ``keep_blocked=True``: return all
    pages with a ``blocked`` bool column (the audit shape)."""
    hits = (
        pages.select(F.col(url_col).alias("__url"))
        .withColumn(
            "__suf",
            F.explode(
                host_suffixes_col(host_col(F.col("__url")), max_labels=max_labels)
            ),
        )
        .join(
            F.broadcast(blocked_domains.select(F.col(domain_col).alias("__suf"))),
            "__suf",
            "left_semi",
        )
        .select("__url")
        .distinct()
    )
    if keep_blocked:
        return pages.join(
            hits.withColumn("__b", F.lit(True)),
            pages[url_col] == hits["__url"],
            "left",
        ).select(
            *[pages[c] for c in pages.columns],
            F.coalesce(F.col("__b"), F.lit(False)).alias("blocked"),
        )
    return pages.join(hits, pages[url_col] == hits["__url"], "left_anti")
