"""WARC source: read Common-Crawl-style WARC files into the pages table.

WARC is the crawl-native input (ISO 28500): a concatenation of records,
each ``WARC/1.x`` header block + ``Content-Length`` payload; ``response``
records carry an HTTP response whose body is the page HTML.

Distribution shape: Spark's ``binaryFile`` source gives one row per
file, and the record parser runs in ``mapInPandas`` — so the unit of
parallelism is the FILE. That matches how Common Crawl is laid out
(~1 GB ``.warc.gz`` segments, tens of thousands per crawl): at 100 TB
the file count is the task count, and a listing-directory glob fans the
read across the cluster. A WARC file is not internally splittable
without an index (gzip members would have to be re-scanned), so one
adversarially huge file bounds a single task — keep segments ~1 GB, as
Common Crawl does. ``.warc.gz`` uses per-record gzip members; Python's
``gzip.decompress`` handles multi-member streams, so the same path
reads both plain and gzipped files (magic-byte sniff).

Everything here is stdlib byte parsing — no WARC library ships in this
container, and none is needed for the record framing.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from readability_ex_spark.sources.pages import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def warc_record_bytes(url: str, date: str, html: bytes) -> bytes:
    """One WARC response record (test/synthesis helper — the framing the
    reader parses): WARC headers + an HTTP/1.1 200 response carrying
    ``html``."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + f"Content-Length: {len(html)}\r\n\r\n".encode()
        + html
    )
    headers = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(http)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
    ).encode()
    return headers + b"\r\n" + http + _CRLF2


def iter_warc_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per record. Content-Length framing; tolerant of
    leading garbage between records (resyncs on the next 'WARC/')."""
    pos = 0
    n = len(buf)
    while pos < n:
        start = buf.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = buf.find(_CRLF2, start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in buf[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + len(_CRLF2)
            continue
        body_start = hdr_end + len(_CRLF2)
        yield headers, buf[body_start : body_start + length]
        pos = body_start + length


def http_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload (after the header block); a
    payload with no header block is returned as-is (warc-like files in
    the wild sometimes store the bare resource)."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(_CRLF2)
        if sep >= 0:
            return payload[sep + len(_CRLF2) :]
    return payload


def _parse_warc_date(s: str | None):
    if not s:
        return None
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            # WARC-Date is UTC; the session timezone is pinned to UTC,
            # so emit a naive UTC datetime (Arrow-friendly)
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def warc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binaryFile rows -> pages rows. Response
    records only; malformed records are skipped (a crawl segment must
    never kill the job)."""
    for pdf in batches:
        out = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
        for content in pdf["content"]:
            buf = bytes(content)
            if buf[:2] == b"\x1f\x8b":  # gzip (multi-member per record)
                try:
                    buf = gzip.decompress(buf)
                except OSError:
                    continue
            for headers, payload in iter_warc_records(buf):
                if headers.get("warc-type") != "response":
                    continue
                url = headers.get("warc-target-uri")
                if not url:
                    continue
                out["url"].append(url)
                out["warc_ts"].append(_parse_warc_date(headers.get("warc-date")))
                out["html"].append(http_body(payload))
                out["text"].append(None)
                out["lang"].append(None)
        yield pd.DataFrame(out)


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` (plain or .gz) -> the pages table
    schema, ready for ``run_extraction``."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(warc_batches, PAGES_SCHEMA)
