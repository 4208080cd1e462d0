"""WARC (ISO 28500 / Common Crawl) source: archive blobs -> page rows.

The north-star corpus is "an Iceberg table of Common-Crawl-style web
pages"; crawls DELIVER that content as WARC files — millions of records
of `WARC/1.0` header blocks + captured HTTP responses, usually with each
record an independent gzip member so the archive is splittable by
member. This source turns a DataFrame of WARC file blobs into the
pipeline's page rows (url, warc_ts, html, text, lang) entirely inside
``mapInPandas``:

- zero shuffle — one input blob expands to its records within the task;
- per-record error columns (status/error), never a dead job: a truncated
  or malformed record yields an error row and parsing continues at the
  next gzip member / record boundary (same posture as operators/parse.py
  S4: reference dies on bad input, a 10^12-doc crawl must not);
- stdlib-only: zlib handles the multi-member gzip stream.

At 100 TB the blobs come from a binary-file scan (e.g.
``spark.read.format("binaryFile")`` over the crawl bucket, or an Iceberg
binary column); one WARC file ≈ 1 GB gzipped is one task — set
maxPartitionBytes accordingly. Everything downstream (parse, shapes,
mentions) is unchanged: this is strictly an ingestion adapter.

Parser scope: WARC/1.0 and 1.1 response records with
``Content-Type: application/http``; request/metadata/warcinfo records
are surfaced with their type so callers can filter. The writer
(``build_warc``) exists for fixtures and tests — deterministic output,
one gzip member per record like Common Crawl.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_PAGE_SCHEMA = (
    "url string, warc_ts timestamp, record_type string, http_status int, "
    "html binary, status string, error string"
)

_CRLF = b"\r\n"


# --------------------------------------------------------------- writer


def build_warc(records: list[dict], compress: bool = True) -> bytes:
    """records: [{url, ts (aware datetime), html (bytes), status (int)}] ->
    WARC bytes, one response record per entry, each its own gzip member
    when ``compress`` (the Common Crawl layout — members are the split
    points)."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        http = (
            b"HTTP/1.1 %d OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
            b"Content-Length: %d\r\n\r\n" % (r.get("status", 200), len(r["html"]))
        ) + r["html"]
        ts = r["ts"].astimezone(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        header = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: " + r["url"].encode("utf-8") + _CRLF
            + b"WARC-Date: " + ts.encode("ascii") + _CRLF
            + b"WARC-Record-ID: <urn:uuid:%08d>\r\n" % i
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: %d\r\n" % len(http)
            + _CRLF
        )
        record = header + http + _CRLF + _CRLF
        out.write(gzip.compress(record, mtime=0) if compress else record)
    return out.getvalue()


# --------------------------------------------------------------- parser


def _split_members(data: bytes) -> Iterator[bytes]:
    """Yield decompressed gzip members (or the raw bytes if not gzip)."""
    if not data[:2] == b"\x1f\x8b":
        yield data
        return
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        yield d.decompress(rest)
        rest = d.unused_data
    # trailing non-gzip garbage is ignored (truncated tail member raises
    # zlib.error inside decompress -> caller turns it into an error row)


def _parse_record(chunk: bytes, offset: int) -> tuple[dict | None, int]:
    """Parse ONE WARC record starting at ``offset``; returns (row | None,
    next_offset). None row means clean end-of-input."""
    # skip inter-record blank lines
    while chunk[offset : offset + 2] == _CRLF:
        offset += 2
    if offset >= len(chunk):
        return None, offset
    head_end = chunk.find(_CRLF + _CRLF, offset)
    if head_end < 0:
        raise ValueError("truncated WARC header block")
    head = chunk[offset:head_end].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    if not lines[0].startswith("WARC/"):
        raise ValueError(f"not a WARC record at offset {offset}: {lines[0][:40]!r}")
    fields = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        fields[k.strip().lower()] = v.strip()
    length = int(fields.get("content-length", "-1"))
    if length < 0:
        raise ValueError("missing Content-Length")
    body_start = head_end + 4
    body = chunk[body_start : body_start + length]
    if len(body) < length:
        raise ValueError("truncated WARC body")
    rtype = fields.get("warc-type", "")
    url = fields.get("warc-target-uri")
    ts = None
    if "warc-date" in fields:
        # WARC 1.1 permits fractional seconds; fromisoformat takes both
        ts = _dt.datetime.fromisoformat(fields["warc-date"].replace("Z", "+00:00"))
    http_status, html = None, None
    if rtype == "response" and body[:5] == b"HTTP/":
        hdr_end = body.find(_CRLF + _CRLF)
        if hdr_end < 0:
            raise ValueError("truncated HTTP headers")
        status_line = body[: body.find(_CRLF)].decode("ascii", errors="replace")
        parts = status_line.split(" ")
        http_status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
        html = body[hdr_end + 4 :]
    return (
        {
            "url": url,
            "warc_ts": ts,
            "record_type": rtype,
            "http_status": http_status,
            "html": html,
            "status": "ok",
            "error": None,
        },
        body_start + length,
    )


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All records of one WARC file (gzip multi-member or plain), malformed
    records downgraded to error rows instead of exceptions."""
    rows: list[dict] = []
    members = _split_members(data)
    while True:
        # per-member error isolation: a truncated FINAL gzip member must
        # not discard the records already decoded from earlier members
        try:
            chunk = next(members)
        except StopIteration:
            break
        except zlib.error as exc:
            rows.append(_err_row(f"gzip: {exc}"))
            break
        offset = 0
        while offset < len(chunk):
            try:
                row, offset = _parse_record(chunk, offset)
            except (ValueError, OverflowError) as exc:
                rows.append(_err_row(str(exc)))
                break  # resync at the next gzip member
            if row is None:
                break
            rows.append(row)
    return rows


def _err_row(msg: str) -> dict:
    return {
        "url": None,
        "warc_ts": None,
        "record_type": None,
        "http_status": None,
        "html": None,
        "status": "error",
        "error": msg[:500],
    }


# ---------------------------------------------------------- Spark layer


def warc_records(blobs: DataFrame, blob_col: str = "content") -> DataFrame:
    """DataFrame with a WARC-file binary column -> one row per WARC record
    (WARC_PAGE_SCHEMA). Arrow-batched; no shuffle."""

    def fn(batches):
        for pdf in batches:
            out = []
            for data in pdf[blob_col]:
                out.extend(parse_warc_bytes(bytes(data)))
            yield pd.DataFrame(
                out,
                columns=[
                    "url",
                    "warc_ts",
                    "record_type",
                    "http_status",
                    "html",
                    "status",
                    "error",
                ],
            )

    return blobs.mapInPandas(fn, schema=WARC_PAGE_SCHEMA)


def pages_from_warc(blobs: DataFrame, blob_col: str = "content") -> DataFrame:
    """WARC blobs -> the pipeline's page schema (url, warc_ts, html, text,
    lang): successful 2xx response records only, visible text extracted
    with the same ``html.extract_text`` the fixtures use (byte-identical
    text invariant carries through — tested). lang is left '' for the
    pipeline's language-ID operator to fill downstream."""
    from pyspark.sql import functions as F

    from ..html import extract_text

    recs = warc_records(blobs, blob_col).filter(
        (F.col("status") == "ok")
        & (F.col("record_type") == "response")
        & (F.col("http_status") >= 200)
        & (F.col("http_status") < 300)
    )

    def add_text(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = [extract_text(bytes(h)) for h in pdf["html"]]
            pdf["lang"] = ""
            yield pdf[["url", "warc_ts", "html", "text", "lang"]]

    return recs.mapInPandas(
        add_text,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
