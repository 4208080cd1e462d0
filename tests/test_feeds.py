"""RSS/Atom feed ingestion (operators/feeds.py)."""


def _feeds(spark, xml: bytes, url: str = "https://h.org/feed.xml"):
    return spark.createDataFrame([(url, bytearray(xml))], "url string, xml binary")


def test_parse_feeds_rss_fields_and_canonicalization(spark):
    from kgforge.operators.feeds import parse_feeds

    xml = (b"<rss><channel><item><title>A &amp; B</title>"
           b"<link>HTTPS://H.ORG:443/p/1?utm_source=x&amp;b=2</link>"
           b"<pubDate>Tue, 19 Aug 2026 10:30:00 +0000</pubDate>"
           b"<guid>g1</guid></item></channel></rss>")
    r = parse_feeds(_feeds(spark, xml)).collect()[0]
    assert r["kind"] == "item" and r["host"] == "h.org"
    assert r["link"] == "https://h.org/p/1?b=2"  # canonical: case, port, utm
    assert r["title"] == "A & B" and r["guid"] == "g1"
    assert r["published_ts"].hour == 10 and r["published_ts"].minute == 30


def test_parse_feeds_atom_href_and_iso_ts(spark):
    from kgforge.operators.feeds import parse_feeds

    xml = (b"<feed><entry><title>T</title><link href='/e/9'/>"
           b"<published>2026-08-19T10:00:00Z</published><id>tag:9</id></entry></feed>")
    r = parse_feeds(_feeds(spark, xml)).collect()[0]
    assert r["kind"] == "entry" and r["link"] == "https://h.org/e/9"
    assert r["guid"] == "tag:9" and r["published_ts"] is not None


def test_parse_feeds_garbage_date_and_missing_link(spark):
    from kgforge.operators.feeds import parse_feeds

    xml = (b"<rss><channel>"
           b"<item><title>ok</title><link>/a</link><pubDate>not a date</pubDate></item>"
           b"<item><title>no link: dropped</title></item>"
           b"</channel></rss>")
    rows = parse_feeds(_feeds(spark, xml)).collect()
    assert len(rows) == 1
    assert rows[0]["published_ts"] is None and rows[0]["link"].endswith("/a")
