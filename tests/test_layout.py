"""Layout fingerprinting (operators/layout.py)."""


def test_layout_clusters_template_invariance(spark):
    from kgforge.operators.layout import layout_clusters

    rows = [
        # same template, different content/attrs -> same fingerprint
        ("https://a.org/1", b"<html><body CLASS='x'><p id='1'>alpha</p></body></html>"),
        ("https://b.org/2", b"<html><body><p>completely different text</p></body></html>"),
        # different skeleton -> different fingerprint
        ("https://a.org/3", b"<html><body><div><p>x</p></div></body></html>"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows], "url string, html binary"
    )
    out = layout_clusters(df).collect()
    assert len(out) == 2
    big = max(out, key=lambda r: r["n_pages"])
    assert big["n_pages"] == 2 and big["n_hosts"] == 2
    assert big["sample_url"] == "https://a.org/1"


def test_layout_fingerprint_ignores_case_and_close_tags(spark):
    from pyspark.sql import functions as F

    from kgforge.operators.layout import layout_fingerprint_col

    df = spark.createDataFrame(
        [("<HTML><Body><P>x</P></Body></HTML>",), ("<html><body><p>y",)],
        "h string",
    )
    fps = [r["fp"] for r in df.select(
        layout_fingerprint_col(F.col("h")).alias("fp")).collect()]
    assert fps[0] == fps[1]  # case and closing tags don't matter
