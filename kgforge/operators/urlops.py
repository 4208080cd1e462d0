"""URL operators for crawl hygiene: canonicalization + host extraction.

A crawl sees the same page under many spellings — case-varied scheme and
host, explicit default ports, fragments, tracking parameters, permuted
query strings. Canonicalizing BEFORE url-keyed dedup/joins collapses
those spellings so downstream exact dedup and per-host grouping key on
one form. (The reference parses one file at a time and has no URL layer;
this is corpus infrastructure the north rule's crawl-scale input needs.)

All pure built-in column expressions — WholeStageCodegen end-to-end, no
Python in the hot path, usable inside join keys and groupBys. Semantics
follow RFC 3986 §6 normalization where it is safe losslessly:

- scheme and host lowercased (path/query case is significant — kept);
- default port stripped when it matches the scheme (http:80, https:443);
- fragment dropped (never sent to the server);
- tracking query parameters dropped (default: the utm_* family, gclid,
  fbclid) and the remainder SORTED, '?' dropped when nothing is left.

Out of scope deliberately: percent-encoding case folding and dot-segment
removal (rare in crawl URLs, and wrong to apply blindly to opaque
paths); IDN/punycode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# scheme :// authority  path  ?query  #fragment(dropped)
_URL_RE = r"^([^:/?#]+)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

DEFAULT_TRACKING_PREFIXES = ("utm_", "gclid", "fbclid")


def host_col(url_col):
    """Lowercased hostname without port ('' when the URL has no authority
    form). The per-host partitioning / politeness / stats key."""
    url_col = F.col(url_col) if isinstance(url_col, str) else url_col
    auth = F.lower(F.regexp_extract(url_col, _URL_RE, 2))
    return F.regexp_replace(auth, r":\d+$", "")


def canonical_url_col(url_col, tracking_prefixes=DEFAULT_TRACKING_PREFIXES):
    """Canonical form of an absolute http(s)-style URL (see module doc).
    Inputs not matching scheme://authority... are passed through unchanged
    (opaque ids stay stable keys rather than becoming empty strings)."""
    url_col = F.col(url_col) if isinstance(url_col, str) else url_col
    no_frag = F.regexp_replace(url_col, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(no_frag, _URL_RE, 2))
    path = F.regexp_extract(no_frag, _URL_RE, 3)
    query = F.regexp_extract(no_frag, _URL_RE, 4)

    auth = F.when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).otherwise(auth)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~_any_prefix(p, tracking_prefixes),
    )
    q_norm = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q_norm == "", F.lit("")).otherwise(F.concat(F.lit("?"), q_norm)),
    )
    return F.when(scheme == "", url_col).otherwise(rebuilt)


def _any_prefix(p, prefixes):
    cond = F.lit(False)
    for pre in prefixes:
        cond = cond | p.startswith(pre)
    return cond


def url_templates(urls: DataFrame, url_col: str = "dst_url") -> DataFrame:
    """URL pattern mining: collapse every digit run in host+path to '{n}'
    and aggregate per template — (template, n, n_hosts, sample_url). The
    crawl-ops lens on a link corpus: one template row per *page family*
    (/art/{n}, /dir{n}/sec/{n}, ...) instead of millions of URLs, which is
    how crawler traps (calendar pages, session-id paths) and
    over-represented URL families get spotted and capped before fetch.

    Scale shape: pure codegen regexp work (scheme strip, query/fragment
    strip, digit collapse) fused into the scan, then ONE
    map-side-combinable agg keyed on the template — output is
    template-cardinality-sized. sample_url = min(url), a combinable agg,
    never a window.
    """
    base = F.regexp_replace(F.col(url_col), r"^[a-z]+://", "")
    base = F.regexp_replace(base, r"[?#].*$", "")
    tmpl = F.regexp_replace(base, r"[0-9]+", "{n}")
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/?#]+)", 1)
    return (
        urls.select(
            tmpl.alias("template"), host.alias("host"), F.col(url_col).alias("u")
        )
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("host").cast("bigint").alias("n_hosts"),
            F.min("u").alias("sample_url"),
        )
    )
