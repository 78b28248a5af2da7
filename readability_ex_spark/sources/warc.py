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
from pyspark.sql import types as T

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


# -- WET output (Common Crawl "conversion" records) -------------------------
# The ecosystem symmetry: raw crawl WARC comes IN through the reader
# above; extracted text goes OUT as WET — one `conversion` record per
# document, per-record gzip members per the CC convention (the reader's
# gzip.decompress already consumes multi-member streams, so WET output
# round-trips through the same parser).

WET_EPOCH_DATE = "1970-01-01T00:00:00Z"  # deterministic default


def _warc_safe_uri(url: str) -> str:
    """Percent-encode a target URI down to printable ASCII: non-ASCII
    bytes (UTF-8 percent-escaped), CR/LF, and spaces would either raise
    in the header encode or corrupt WARC record framing.  Existing
    percent-escapes survive (``%`` is in the safe set), so an
    already-clean URL is unchanged."""
    from urllib.parse import quote

    return quote(url, safe="!#$%&'()*+,-./:;=?@[]_~|")


def _warc_record_id(url: str, date: str) -> str:
    """Deterministic ``urn:uuid`` per (url, date) — the WARC spec
    mandates a WARC-Record-ID per record; deriving it from the record
    identity keeps reruns byte-identical."""
    import hashlib
    import uuid

    digest = hashlib.md5(f"{url}\n{date}".encode("utf-8")).hexdigest()
    return f"<urn:uuid:{uuid.UUID(digest)}>"


def wet_record_bytes(url: str, date: str, text: bytes) -> bytes:
    """One WET conversion record (WARC/1.0 framing).  The header block
    is pure ASCII (URI percent-encoded via ``_warc_safe_uri``) and
    carries the spec-mandated deterministic WARC-Record-ID."""
    safe_url = _warc_safe_uri(url)
    return (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: {_warc_record_id(safe_url, date)}\r\n"
        f"WARC-Target-URI: {safe_url}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(text)}\r\n\r\n"
    ).encode("ascii") + text + b"\r\n\r\n"


def write_wet(
    extracted: DataFrame,
    path: str,
    *,
    date: str = WET_EPOCH_DATE,
    url_col: str = "url",
    text_col: str = "text",
) -> None:
    """Write (url, text) rows as ``part-*.warc.wet.gz`` files, one file
    per partition — the CC segment layout the reader side consumes
    (file = unit of parallelism). Each record is its own gzip member.

    Executors write through the mounted filesystem (local disk here; an
    object-store fuse mount or NFS at scale — the same contract as any
    task-local file sink). ``date`` is an explicit parameter so reruns
    are byte-deterministic; pass the crawl's logical date.
    """
    import os
    import uuid

    os.makedirs(path, exist_ok=True)

    def _write(rows) -> None:
        out_file = os.path.join(
            path, f"part-{uuid.uuid4().hex}.warc.wet.gz"
        )
        buf: list[bytes] = []
        for row in rows:
            text = row[text_col]
            if text is None:
                continue
            buf.append(
                gzip.compress(
                    wet_record_bytes(
                        row[url_col], date, text.encode("utf-8")
                    )
                )
            )
        if buf:
            with open(out_file, "wb") as f:
                f.write(b"".join(buf))

    extracted.select(url_col, text_col).foreachPartition(_write)


WET_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _wet_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("url", "warc_ts", "text")}
        for content in pdf["content"]:
            buf = bytes(content)
            if buf[:2] == b"\x1f\x8b":
                try:
                    buf = gzip.decompress(buf)
                except OSError:
                    continue
            for headers, payload in iter_warc_records(buf):
                if headers.get("warc-type") != "conversion":
                    continue
                url = headers.get("warc-target-uri")
                if not url:
                    continue
                out["url"].append(url)
                out["warc_ts"].append(
                    _parse_warc_date(headers.get("warc-date"))
                )
                out["text"].append(payload.decode("utf-8", "replace"))
        yield pd.DataFrame(out)


def read_wet_docs(spark: SparkSession, path: str) -> DataFrame:
    """WET files under ``path`` -> (url, warc_ts, text) — the read-back
    path for corpora shipped in the CC interchange format."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(_wet_batches, WET_SCHEMA)
