"""WARC source: writer/parser roundtrip, malformed-record resilience, and
pipeline-schema integration with the byte-identical text invariant."""

from __future__ import annotations

import datetime as dt

import pytest

from kgforge.fixtures import build_page
from kgforge.sources.warc import build_warc, pages_from_warc, parse_warc_bytes


def _fixture_records(n=6):
    recs = []
    for i in range(n):
        url, ts, html, _text, _lang = build_page(i)
        recs.append({"url": url, "ts": ts, "html": html, "status": 200})
    return recs


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_byte_identical(compress):
    recs = _fixture_records()
    rows = parse_warc_bytes(build_warc(recs, compress=compress))
    assert len(rows) == len(recs)
    for r, src in zip(rows, recs):
        assert r["status"] == "ok" and r["record_type"] == "response"
        assert r["url"] == src["url"]
        assert r["warc_ts"] == src["ts"]
        assert r["http_status"] == 200
        assert r["html"] == src["html"]  # byte-identical capture


def test_malformed_member_degrades_to_error_row_and_resyncs():
    recs = _fixture_records(4)
    good = build_warc(recs[:2], compress=True)
    # a truncated THIRD record (cut mid-body) followed by a clean fourth
    bad_raw = build_warc([recs[2]], compress=False)[:-40]
    import gzip

    blob = good + gzip.compress(bad_raw, mtime=0) + build_warc([recs[3]], compress=True)
    rows = parse_warc_bytes(blob)
    ok = [r for r in rows if r["status"] == "ok"]
    err = [r for r in rows if r["status"] == "error"]
    assert [r["url"] for r in ok] == [r["url"] for r in (recs[:2] + recs[3:])]
    assert len(err) == 1 and "truncated" in err[0]["error"]


def test_corrupt_final_gzip_member_keeps_earlier_records():
    recs = _fixture_records(3)
    tail = bytearray(build_warc(recs[2:]))
    mid = len(tail) // 2
    tail[mid : mid + 8] = b"\x00" * 8  # corrupt the DEFLATE stream
    rows = parse_warc_bytes(build_warc(recs[:2]) + bytes(tail))
    ok = [r for r in rows if r["status"] == "ok"]
    err = [r for r in rows if r["status"] == "error"]
    assert [r["url"] for r in ok] == [r["url"] for r in recs[:2]]
    assert len(err) == 1 and (
        "gzip" in err[0]["error"].lower() or "truncated" in err[0]["error"]
    )


def test_non_warc_blob_is_one_error_row():
    rows = parse_warc_bytes(b"PK\x03\x04 definitely not a warc")
    assert len(rows) == 1 and rows[0]["status"] == "error"


def test_pages_from_warc_matches_fixture_pages(spark):
    """End-to-end: WARC blob -> pages rows identical (url, ts, html, text)
    to the fixture generator's — the byte-identical extracted-text
    invariant holds through the archive roundtrip."""
    recs = _fixture_records(8)
    blob = build_warc(recs)
    blobs = spark.createDataFrame([(blob,)], "content binary")
    got = {
        r["url"]: r
        for r in pages_from_warc(blobs).collect()
    }
    assert len(got) == 8
    for i in range(8):
        url, ts, html, text, _lang = build_page(i)
        r = got[url]
        assert bytes(r["html"]) == html
        assert r["text"] == text
        assert r["warc_ts"] == ts.replace(tzinfo=None)  # session TZ is UTC


def test_non_response_records_filtered(spark):
    import gzip

    meta = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    blob = gzip.compress(meta, mtime=0) + build_warc(_fixture_records(2))
    blobs = spark.createDataFrame([(blob,)], "content binary")
    assert pages_from_warc(blobs).count() == 2
    from kgforge.sources.warc import warc_records

    types = sorted(
        r["record_type"] for r in warc_records(blobs).select("record_type").collect()
    )
    assert types == ["response", "response", "warcinfo"]


def test_q_warc_ingest_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as e

    sdf = e.queries()["q_warc_ingest"](spark, "/root/testdata/sf0.001").toPandas()
    odf = duckdb.connect().execute(e.oracle_sql()["q_warc_ingest"]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns) and len(sdf) == len(odf) == 200
    s = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    o = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert (s.values == o.values).all()


def test_warc_pages_feed_the_parser(spark):
    """The ingested pages drive parse_combined exactly like fixture pages."""
    from kgforge.operators.parse import parse_combined

    recs = _fixture_records(6)
    blobs = spark.createDataFrame([(build_warc(recs),)], "content binary")
    pages = pages_from_warc(blobs)
    parsed = parse_combined(pages)
    assert parsed.filter("subject is not null").count() > 0
    # every input url produced rows and none errored
    assert parsed.filter("status = 'error'").count() == 0
