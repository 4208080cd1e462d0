"""Cross-micro-batch stateful near-dup edge stream (applyInPandasWithState)
must reproduce batch ``dedup_pages(mode='near')``: connected components over
the accumulated streamed edge log keep exactly the batch survivors.

Micro-batches are split by page-id PARITY so every planted duplicate pair
(mirror i%23 and near-dup i%29 both pair i with i-1) straddles two batches —
the statefulness is what the equivalence exercises, not in-batch blocking.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kgforge.fixtures import pages_pdf
from kgforge.pipeline.run import dedup_pages
from kgforge.streaming.stateful import streaming_neardup_edges


def _union_find_kept(urls, edges):
    """Pure-python oracle for the downstream CC step: keep the (string-)min
    url of each component, everything unpaired survives."""
    parent = {u: u for u in urls}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for u in urls:
        comp.setdefault(find(u), []).append(u)
    return {min(members) for members in comp.values()}


def test_streaming_neardup_edges_match_batch_dedup(spark, tmp_path):
    n = 60
    pages = pages_pdf(range(n))
    landing = str(tmp_path / "landing_neardup")
    os.makedirs(landing, exist_ok=True)
    evens = pages[pages["url"].str.extract(r"/page/(\d+)$")[0].astype(int) % 2 == 0]
    odds = pages[pages["url"].str.extract(r"/page/(\d+)$")[0].astype(int) % 2 == 1]
    spark.createDataFrame(evens).coalesce(1).write.parquet(landing + "/f1")
    spark.createDataFrame(odds).coalesce(1).write.parquet(landing + "/f2")

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/f*")
    )
    out = streaming_neardup_edges(stream, threshold=0.9)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_edges")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT DISTINCT a, b FROM neardup_edges").collect()
    edges = {(r["a"], r["b"]) for r in rows}
    assert edges, "planted mirrors/near-dups must produce edges"
    # every planted pair straddles the parity split: each edge endpoint set
    # must contain at least one even and one odd page id -> the match was
    # found against STATE from an earlier micro-batch, not in-batch
    def pid(u):
        return int(u.rsplit("/", 1)[1])

    cross = [e for e in edges if pid(e[0]) % 2 != pid(e[1]) % 2]
    assert cross, "no cross-batch edge: state did nothing"

    batch_df = spark.createDataFrame(pages)
    want = {r["url"] for r in dedup_pages(batch_df, mode="near").select("url").collect()}
    got = _union_find_kept(list(pages["url"]), edges)
    assert got == want


def test_streaming_neardup_bucket_freeze_bounds_state(spark, tmp_path):
    """max_bucket freezes a hot bucket: identical texts all land in the same
    buckets, so member count sticks at the cap and pair fan-out is bounded
    by cap^2/2 instead of n^2/2."""
    import pandas as pd

    n = 12
    cap = 4
    docs = pd.DataFrame(
        {
            "url": [f"u{i:02d}" for i in range(n)],
            "text": ["the same boilerplate page text repeated everywhere"] * n,
        }
    )
    landing = str(tmp_path / "landing_hot")
    os.makedirs(landing, exist_ok=True)
    spark.createDataFrame(docs).coalesce(1).write.parquet(landing + "/f1")
    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/f*")
    )
    out = streaming_neardup_edges(stream, threshold=0.9, max_bucket=cap)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_hot")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pairs = {
        (r["a"], r["b"])
        for r in spark.sql("SELECT DISTINCT a, b FROM neardup_hot").collect()
    }
    # only the cap's first members (id-sorted) pair; frozen members never do
    want = {
        (f"u{i:02d}", f"u{j:02d}") for i in range(cap) for j in range(i + 1, cap)
    }
    assert pairs == want
