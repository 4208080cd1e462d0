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


def resolve_chains(
    mapping: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve redirect / rel=canonical chains to their terminal target
    by pointer jumping: page A declares canonical B, B declares C — the
    crawl consolidation step needs A -> C directly (plus the hop count
    for loop/age diagnostics). Returns (src, final, n_hops, resolved):
    resolved=false with NULL final/n_hops for sources whose chain never
    terminates within ``max_hops`` (a canonical loop, or a chain longer
    than the cap — both are crawl-quality findings, not data).

    Multiple declared targets per source collapse to min(dst) first
    (deterministic functional graph). Pointer jumping doubles the reach
    per round — log2(max_hops) self-joins, not max_hops — with eager
    localCheckpoint lineage cuts; each round's join is keyed on the
    current pointer, and the relation never exceeds the input mapping's
    size (one row per source, always).
    """
    import math

    f = (
        mapping.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .groupBy("u")
        .agg(F.min("v").alias("v"))
        .localCheckpoint(eager=True)
    )
    cur = f.select("u", "v", F.lit(1).cast("bigint").alias("h"))
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        nxt = (
            cur.alias("x")
            .join(
                cur.select(
                    F.col("u").alias("_ju"),
                    F.col("v").alias("_jv"),
                    F.col("h").alias("_jh"),
                ),
                F.col("x.v") == F.col("_ju"),
                "left",
            )
            .select(
                F.col("x.u").alias("u"),
                F.coalesce("_jv", F.col("x.v")).alias("v"),
                (F.col("x.h") + F.coalesce("_jh", F.lit(0))).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        cur = nxt
    # terminal = the final pointer has no outgoing edge AND the chain fit
    # inside the cap; everything else is a loop / over-long chain
    dom = f.select(F.col("u").alias("_d"))
    return (
        cur.join(dom, cur["v"] == dom["_d"], "left")
        .select(
            F.col("u").alias("src"),
            F.when(
                F.col("_d").isNull() & (F.col("h") <= max_hops), F.col("v")
            ).alias("final"),
            F.when(
                F.col("_d").isNull() & (F.col("h") <= max_hops), F.col("h")
            ).alias("n_hops"),
            (F.col("_d").isNull() & (F.col("h") <= max_hops)).alias("resolved"),
        )
    )
