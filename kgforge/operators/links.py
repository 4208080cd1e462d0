"""Hyperlink extraction + resolution: the crawl's web-graph construction.

A KG built from Common-Crawl-style pages needs the LINK graph as much as
the entity graph — outlinks drive crawl frontier ranking, host-level
authority (PageRank over hosts), and spam/hub detection. (The reference
parses one file at a time and has no link layer; this is corpus
infrastructure the north rule's crawl-scale input needs, same rationale
as `urlops.py`.)

Everything is pure built-in column expressions — WholeStageCodegen
end-to-end, no Python in the hot path:

- href harvesting: one ``regexp_extract_all`` over the decoded html
  (per-row, no shuffle; fan-out bounded by links-per-page);
- reference resolution per RFC 3986 §5 (the subset crawl hrefs use):
  absolute URLs pass through, ``//host/..`` takes the base scheme,
  ``/path`` takes the base authority, relative paths merge with the
  base directory; ``mailto:``/``javascript:``/``tel:``/``data:`` and
  fragment-only hrefs are dropped;
- dot-segment removal (§5.2.4) as a BOUNDED regexp fixpoint — 8 passes
  collapse ``..`` nesting up to depth 8, far beyond crawl-real paths;
  leading above-root ``../`` clamps to ``/`` (browser behavior);
- canonicalization reuses `urlops.canonical_url_col` so the dst key
  collapses case/port/tracking-param/query-order spellings exactly like
  every other url-keyed stage.

Scale: extraction and resolution are map-only. `host_edges` is a single
(src_host, dst_host) groupBy — hash-partial-aggregated map-side, so hot
destination hosts (the web's power-law: everyone links to a few giants)
combine before the shuffle instead of hammering one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .urlops import canonical_url_col, host_col

# href attribute inside an <a> tag, attribute order free, either quote
_HREF_RE = r"""(?i)<a\b[^>]*?\bhref\s*=\s*["']([^"']+)["']"""

# scheme-qualified absolute reference (RFC 3986 scheme = ALPHA *(alnum+-.))
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"

_SKIP_SCHEMES = ("mailto:", "javascript:", "tel:", "data:")

_DOT_SEGMENT_PASSES = 8


def _remove_dot_segments(path):
    """RFC 3986 §5.2.4 on an already-rooted path, as a bounded regexp
    fixpoint: each pass deletes one layer of ``/./`` and ``/seg/../``
    nesting; 8 passes handle ≥8-deep ``..`` chains (crawl paths are
    nowhere near). Above-root ``..`` clamps to the root like browsers."""
    p = path
    for _ in range(_DOT_SEGMENT_PASSES):
        p = F.regexp_replace(p, r"/\./", "/")
        # a segment that is not '..' followed by '/../' collapses away
        p = F.regexp_replace(p, r"/(?!\.\./)[^/]+/\.\./", "/")
    p = F.regexp_replace(p, r"/\.$", "/")
    p = F.regexp_replace(p, r"^(/\.\.)+(/|$)", "/")
    return p


def resolve_href_col(href_col, base_url_col):
    """Absolute URL for one href against its page URL (RFC 3986 §5 merge),
    NULL for non-navigational hrefs (fragment-only, mailto:/javascript:/
    tel:/data:). Pure column expression."""
    href = F.trim(href_col if not isinstance(href_col, str) else F.col(href_col))
    base = base_url_col if not isinstance(base_url_col, str) else F.col(base_url_col)
    scheme = F.lower(F.regexp_extract(base, r"^([^:/?#]+)://", 1))
    authority = F.regexp_extract(base, r"^[^:/?#]+://([^/?#]*)", 1)
    base_path = F.regexp_extract(base, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    base_dir = F.when(
        base_path == "", F.lit("/")
    ).otherwise(F.regexp_replace(base_path, r"[^/]*$", ""))

    no_frag = F.regexp_replace(href, r"#.*$", "")
    skip = (no_frag == "") | F.lit(False)
    for s in _SKIP_SCHEMES:
        skip = skip | F.lower(no_frag).startswith(s)

    rel_path = _remove_dot_segments(F.concat(base_dir, no_frag))
    resolved = (
        F.when(no_frag.rlike(_ABS_RE), no_frag)
        .when(no_frag.startswith("//"), F.concat(scheme, F.lit(":"), no_frag))
        .when(
            no_frag.startswith("/"),
            F.concat(scheme, F.lit("://"), authority, _remove_dot_segments(no_frag)),
        )
        .otherwise(F.concat(scheme, F.lit("://"), authority, rel_path))
    )
    return F.when(skip, F.lit(None).cast("string")).otherwise(resolved)


def extract_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(src_url, href, dst_url, src_host, dst_host) — one row per
    navigational <a href> on each page, dst canonicalized. Pages without
    links contribute no rows (explode, not explode_outer: the link table
    is an edge list, absence IS the information)."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    out = (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(F.regexp_extract_all(html_str, F.lit(_HREF_RE), 1)).alias("href"),
        )
        .withColumn("dst_url", canonical_url_col(resolve_href_col(F.col("href"), F.col("src_url"))))
        .filter(F.col("dst_url").isNotNull())
    )
    return out.select(
        "src_url",
        "href",
        "dst_url",
        host_col("src_url").alias("src_host"),
        host_col("dst_url").alias("dst_host"),
    )


# full <a ...>TEXT</a> element: group 1 = href value, group 2 = inner html
_ANCHOR_RE = (
    r"""(?is)<a\b[^>]*?\bhref\s*=\s*["']([^"']+)["'][^>]*>(.*?)</a>"""
)


def extract_anchors(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(src_url, href, anchor, dst_url, dst_host) — one row per
    navigational ``<a href>…</a>`` with its VISIBLE anchor text (inner
    tags stripped, whitespace collapsed, trimmed; may be '' for image
    links). Anchor text is the web's free human labeling of the target —
    the classic entity-linking / page-description signal (anchor-text
    indexing, Brin & Page 1998 §2.2).

    Same harvest/resolve machinery as `extract_links`; the (href, text)
    pairs come from TWO ``regexp_extract_all`` calls over the same
    pattern (group 1 / group 2) zipped positionally — both run in the
    same codegen stage over one decode, so the page html is scanned
    twice at worst, never shuffled. Map-only; explode fan-out bounded by
    anchors-per-page."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html_str, F.lit(_ANCHOR_RE), 1).alias("href"),
        F.regexp_extract_all(html_str, F.lit(_ANCHOR_RE), 2).alias("raw"),
    )
    out = (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(pairs).alias("a"),
        )
        .select(
            "src_url",
            F.col("a.href").alias("href"),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("a.raw"), r"<[^>]*>", " "),
                    r"\s+",
                    " ",
                )
            ).alias("anchor"),
        )
        .withColumn(
            "dst_url",
            canonical_url_col(resolve_href_col(F.col("href"), F.col("src_url"))),
        )
        .filter(F.col("dst_url").isNotNull())
    )
    return out.select(
        "src_url", "href", "anchor", "dst_url", host_col("dst_url").alias("dst_host")
    )


def anchor_texts(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_count: int = 1,
) -> DataFrame:
    """Aggregated anchor-text table: (dst_url, anchor, n_links,
    n_src_hosts) — how the web describes each target URL, with the
    off-host evidence count that anchor-text ranking weighs (many
    distinct source hosts ≫ many links from one host).

    One groupBy, map-side partial-aggregated; hot targets (the power-law
    giants every page links to) combine before the single Exchange.
    Empty anchors (image/icon links) are dropped — they carry no text
    evidence."""
    anchors = extract_anchors(pages, html_col=html_col, url_col=url_col).filter(
        F.col("anchor") != ""
    )
    agg = (
        anchors.withColumn("src_host", host_col("src_url"))
        .groupBy("dst_url", "anchor")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src_host").alias("n_src_hosts"),
        )
    )
    return agg.filter(F.col("n_links") >= min_count)


def host_edges(links: DataFrame, drop_self: bool = False) -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links). One partial-
    aggregated groupBy; hot dst hosts combine map-side before the shuffle."""
    edges = links.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )
    if drop_self:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return edges


def mirror_hosts(
    edges: DataFrame,
    threshold: float = 0.5,
    df_cap: int | None = None,
    src: str = "src_host",
    dst: str = "dst_host",
) -> DataFrame:
    """Mirror / duplicate-site detection: host pairs whose OUTLINK TARGET
    SETS overlap with Jaccard >= threshold — the structural twin of text
    near-dup (a mirrored site links to the same places even when its HTML
    differs in boilerplate). Returns (host_a, host_b, n_common, jaccard),
    host_a < host_b, exact Jaccard over distinct target sets.

    Scale shape: one distinct, one posting-list self-join keyed on the
    TARGET (the same inverted-index shape as the n-gram Jaccard join), one
    pair agg, then the size join. The hazard is a ubiquitous target (the
    analytics host every site links to) whose posting list pairs
    quadratically; ``df_cap`` drops targets linked from more than df_cap
    hosts BEFORE set sizes are computed, so the result stays exact over
    the capped universe — ubiquitous targets carry no mirror signal, same
    argument as the stopword cap in lexical dedup. All codegen; the pair
    agg combines map-side.
    """
    # persisted: sets is both sides of the posting-list self-join AND the
    # size aggregate — the cut keeps the upstream link harvest single-pass
    sets = edges.select(F.col(src).alias("h"), F.col(dst).alias("t")).distinct().persist()
    if df_cap is not None:
        keep = (
            sets.groupBy("t")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= df_cap)
            .select("t")
        )
        sets = sets.join(keep, "t").select("h", "t")
    sizes = sets.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sets.alias("x")
        .join(sets.alias("y"), "t")
        .filter(F.col("x.h") < F.col("y.h"))
        .groupBy(F.col("x.h").alias("host_a"), F.col("y.h").alias("host_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        inter.join(sizes.select(F.col("h").alias("host_a"), F.col("n").alias("_na")), "host_a")
        .join(sizes.select(F.col("h").alias("host_b"), F.col("n").alias("_nb")), "host_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("n_common")).cast("double"),
                6,
            ),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold).select(
        "host_a", "host_b", "n_common", "jaccard"
    )


# <link rel="canonical" href="..."> in either attribute order
_CANON_REL_FIRST = (
    r"""(?is)<link\b[^>]*?\brel\s*=\s*["']canonical["'][^>]*?\bhref\s*=\s*["']([^"']+)["']"""
)
_CANON_HREF_FIRST = (
    r"""(?is)<link\b[^>]*?\bhref\s*=\s*["']([^"']+)["'][^>]*?\brel\s*=\s*["']canonical["']"""
)


def extract_canonical(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, canonical_url, is_self): the page's own ``<link
    rel="canonical">`` declaration — the web's explicit duplicate-cluster
    hint (Google's canonicalization signal; the cheap pre-filter that
    collapses parameter/mirror variants BEFORE content dedup ever runs).
    Pages without a declaration contribute no rows. The href resolves
    against the page URL and runs through the same canonical_url_col
    machinery as links, so canonical targets join directly against
    harvested link/sitemap URLs. Both attribute orders are matched
    (rel-then-href and href-then-rel); first declaration wins. Pure
    codegen, map-only."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    href = F.coalesce(
        F.nullif(F.regexp_extract(html_str, _CANON_REL_FIRST, 1), F.lit("")),
        F.nullif(F.regexp_extract(html_str, _CANON_HREF_FIRST, 1), F.lit("")),
    )
    out = (
        pages.select(F.col(url_col).alias("url"), href.alias("_href"))
        .filter(F.col("_href").isNotNull())
        .select(
            "url",
            canonical_url_col(
                resolve_href_col(F.col("_href"), F.col("url"))
            ).alias("canonical_url"),
        )
        .filter(F.col("canonical_url").isNotNull())
    )
    return out.withColumn(
        "is_self", F.col("canonical_url") == canonical_url_col(F.col("url"))
    )


def anchor_priors(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_links: int = 1,
) -> DataFrame:
    """Commonness prior P(target | anchor surface) from the crawl's own
    anchor statistics — the wikification prior (Mihalcea & Csomai 2007;
    Milne & Witten 2008): when entity linking sees the surface "jaguar",
    the distribution of link targets the web attached to that exact
    anchor text is the strongest context-free disambiguation signal.
    Returns (anchor, dst_url, n_links, prior) with prior = this target's
    share of the anchor's total links.

    Exactness: n_links and the per-anchor total are exact bigints, so
    the share is one IEEE division — bit-identical across engines,
    rounded to 6 for presentation.

    Scale shape: rides :func:`anchor_texts`'s map-side-combined
    (dst_url, anchor) aggregation, then ONE anchor-keyed combinable
    total + one anchor-keyed join — the prior table is
    (surface, target)-sized, exactly what a linking stage broadcasts or
    bucket-joins against its mention candidates.
    """
    # the aggregated table is read twice (totals + join); checkpoint so
    # the anchor-extraction scan underneath runs once
    agg = anchor_texts(
        pages, html_col=html_col, url_col=url_col, min_count=1
    ).select("anchor", "dst_url", "n_links").localCheckpoint(eager=True)
    # totals over ALL of the anchor's links, BEFORE the presentation
    # filter — shares always sum to 1 per anchor
    tot = agg.groupBy("anchor").agg(F.sum("n_links").alias("_tot"))
    return (
        agg.join(tot, "anchor")
        .select(
            "anchor",
            "dst_url",
            F.col("n_links").cast("bigint").alias("n_links"),
            F.round(
                F.col("n_links").cast("double") / F.col("_tot").cast("double"),
                6,
            ).alias("prior"),
        )
        .filter(F.col("n_links") >= min_links)
    )
