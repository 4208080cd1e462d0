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


def test_politeness_schedule_dense_seq_and_sticky_worker(spark):
    from kgforge.operators.frontier import politeness_schedule

    rows = [(f"https://h{i%3}.org/p/{i}", f"h{i%3}.org") for i in range(30)]
    f = spark.createDataFrame(rows, "dst_url string, dst_host string")
    out = politeness_schedule(f, n_workers=8).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        # dense 0..n-1 sequence per host
        assert sorted(x["fetch_seq"] for x in rs) == list(range(len(rs)))
        # a host never splits across workers
        assert len({x["worker"] for x in rs}) == 1
        # default delay 1: fetch_at == seq
        assert all(x["fetch_at_sec"] == x["fetch_seq"] for x in rs)


def test_politeness_schedule_bucket_granularity_invariance(spark):
    """The two-phase rank must not depend on the bucket split."""
    from kgforge.operators.frontier import politeness_schedule

    rows = [(f"https://h.org/p/{i}", "h.org") for i in range(200)]
    f = spark.createDataFrame(rows, "dst_url string, dst_host string")
    a = {(r["url"], r["fetch_seq"])
         for r in politeness_schedule(f, bucket_bits=1).collect()}
    b = {(r["url"], r["fetch_seq"])
         for r in politeness_schedule(f, bucket_bits=12).collect()}
    assert a == b


def test_politeness_schedule_delays_join_and_default(spark):
    from kgforge.operators.frontier import politeness_schedule

    f = spark.createDataFrame(
        [("https://a.org/1", "a.org"), ("https://a.org/2", "a.org"),
         ("https://b.org/1", "b.org")],
        "dst_url string, dst_host string",
    )
    delays = spark.createDataFrame([("a.org", 10)], "host string, crawl_delay_sec bigint")
    out = {(r["host"], r["fetch_seq"]): r["fetch_at_sec"]
           for r in politeness_schedule(f, delays, default_delay_sec=2).collect()}
    assert out[("a.org", 0)] == 0 and out[("a.org", 1)] == 10
    assert out[("b.org", 0)] == 0  # seq 0 * default 2
