"""Crawl-frontier construction (operators/frontier.py): anti-join on
canonical form + host-indegree ranking, hand case."""

from kgforge.operators.frontier import crawl_frontier
from kgforge.operators.links import extract_links


def test_frontier_drops_crawled_and_ranks_by_host_indegree(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://a.org/p1",
                b"<a href='https://hub.org/x'>h</a><a href='https://a.org/p2'>n</a>",
            ),
            (
                "https://b.org/p1",
                b"<a href='https://hub.org/x'>h</a><a href='https://hub.org/x'>h2</a>",
            ),
            ("https://a.org/p2", b"<a href='/p3'>r</a>"),
        ],
        "url string, html binary",
    )
    links = extract_links(pages)
    got = {
        r.dst_url: (r.n_links, r.n_src_hosts)
        for r in crawl_frontier(links, pages.select("url")).collect()
    }
    # a.org/p2 is crawled -> dropped; hub.org/x linked 3x from 2 hosts
    assert got == {"https://hub.org/x": (3, 2), "https://a.org/p3": (1, 1)}


def test_frontier_crawled_matching_is_canonical(spark):
    pages = spark.createDataFrame(
        [("https://a.org/p1", b"<a href='https://B.org/q?utm_source=z'>x</a>")],
        "url string, html binary",
    )
    # crawled list spells the same target differently; canonical forms match
    crawled = spark.createDataFrame(
        [("HTTPS://b.org:443/q#frag",)], "url string"
    )
    links = extract_links(pages)
    assert crawl_frontier(links, crawled).count() == 0
