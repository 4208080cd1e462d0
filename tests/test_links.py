"""Link extraction + RFC 3986 resolution hand cases (operators/links.py)."""

from pyspark.sql import functions as F

from kgforge.operators.links import extract_links, host_edges, resolve_href_col


def _page(url, html):
    return (url, html.encode("utf-8"))


def _links(spark, rows):
    df = spark.createDataFrame(rows, "url string, html binary")
    return extract_links(df)


def test_extracts_and_resolves_all_forms(spark):
    html = (
        "<html><body>"
        "<a href='https://other.example.com/a?utm_source=t&b=2&a=1'>abs</a>"
        '<a class="x" href="/root/idx">rooted</a>'
        "<a href='//cdn.example.net/lib.js'>proto-rel</a>"
        "<a href='sub/page.html'>relative</a>"
        "<a href='../up/x'>dotdot</a>"
        "<a href='#top'>frag</a>"
        "<a href='mailto:x@example.com'>mail</a>"
        "<a href='javascript:void(0)'>js</a>"
        "</body></html>"
    )
    out = _links(spark, [_page("https://ex1.example.org/dir/sub2/page5", html)])
    got = {r.dst_url for r in out.collect()}
    assert got == {
        # canonicalized: utm dropped, query sorted
        "https://other.example.com/a?a=1&b=2",
        "https://ex1.example.org/root/idx",
        "https://cdn.example.net/lib.js",
        "https://ex1.example.org/dir/sub2/sub/page.html",
        "https://ex1.example.org/dir/up/x",
    }
    hosts = {(r.src_host, r.dst_host) for r in out.collect()}
    assert ("ex1.example.org", "cdn.example.net") in hosts


def test_dot_segments_and_above_root_clamp(spark):
    df = spark.createDataFrame(
        [
            ("https://h.org/a/b/c/d", "../../x"),
            ("https://h.org/a/b/c/d", "./y"),
            ("https://h.org/a", "../../../z"),  # above root -> clamp
            ("https://h.org/a/b/", "e/../f"),
        ],
        "url string, href string",
    )
    out = df.select(resolve_href_col(F.col("href"), F.col("url")).alias("r")).collect()
    assert [r.r for r in out] == [
        "https://h.org/a/x",
        "https://h.org/a/b/c/y",
        "https://h.org/z",
        "https://h.org/a/b/f",
    ]


def test_no_links_page_contributes_no_rows(spark):
    out = _links(spark, [_page("https://h.org/p", "<html><body>plain</body></html>")])
    assert out.count() == 0


def test_host_edges_counts_and_self_drop(spark):
    html = (
        "<a href='/one'>1</a><a href='/two'>2</a>"
        "<a href='https://ext.example.net/x'>3</a>"
    )
    links = _links(spark, [_page("https://h.org/p", html)])
    edges = {(r.src_host, r.dst_host): r.n_links for r in host_edges(links).collect()}
    assert edges == {("h.org", "h.org"): 2, ("h.org", "ext.example.net"): 1}
    noself = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_edges(links, drop_self=True).collect()
    }
    assert noself == {("h.org", "ext.example.net"): 1}


def test_base_without_path(spark):
    df = spark.createDataFrame([("https://h.org", "rel/p")], "url string, href string")
    out = df.select(resolve_href_col(F.col("href"), F.col("url")).alias("r")).collect()
    assert out[0].r == "https://h.org/rel/p"
