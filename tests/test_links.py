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


def test_extract_anchors_text_and_nesting(spark):
    html = (
        "<html><body>"
        "<a href='/a'>Plain text</a>"
        "<a href='/b'><b>bold</b> and <i>italic</i></a>"
        "<a href='/c'>  spaced\n  out  </a>"
        "<a href='/d'><img src='x.png'/></a>"  # image link -> anchor ''
        "<a href='#frag'>skipme</a>"
        "</body></html>"
    )
    from kgforge.operators.links import extract_anchors

    df = spark.createDataFrame(
        [("https://h.org/dir/page", html.encode("utf-8"))], "url string, html binary"
    )
    got = {(r.dst_url, r.anchor) for r in extract_anchors(df).collect()}
    assert got == {
        ("https://h.org/a", "Plain text"),
        ("https://h.org/b", "bold and italic"),
        ("https://h.org/c", "spaced out"),
        ("https://h.org/d", ""),
    }


def test_anchor_texts_aggregates_and_counts_hosts(spark):
    from kgforge.operators.links import anchor_texts

    mk = lambda u, h: (u, h.encode("utf-8"))
    rows = [
        mk("https://s1.org/p1", "<a href='https://t.org/x'>Target X</a>"),
        mk("https://s1.org/p2", "<a href='https://t.org/x'>Target X</a>"),
        mk("https://s2.org/p1", "<a href='https://t.org/x'>Target X</a>"),
        mk("https://s2.org/p2", "<a href='https://t.org/x'>other name</a>"),
        mk("https://s2.org/p3", "<a href='https://t.org/y'><img src='i'/></a>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {
        (r.dst_url, r.anchor): (r.n_links, r.n_src_hosts)
        for r in anchor_texts(df).collect()
    }
    # empty-anchor image link dropped entirely
    assert got == {
        ("https://t.org/x", "Target X"): (3, 2),
        ("https://t.org/x", "other name"): (1, 1),
    }
