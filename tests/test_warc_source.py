"""WARC source: record framing, gzip members, HTTP body extraction,
end-to-end extraction over a synthesized WARC segment."""

from __future__ import annotations

import gzip

import pyspark.sql.functions as F

from readability_ex_spark.sources.warc import (
    http_body,
    iter_warc_records,
    read_warc_pages,
    warc_record_bytes,
)


def _segment(pages: list[tuple[str, str, bytes]]) -> bytes:
    return b"".join(warc_record_bytes(u, d, h) for u, d, h in pages)


_HTML = (
    b"<html><body><article><p>real article body, with commas, and "
    b"enough text to matter for extraction purposes.</p></article>"
    b"<footer>foot</footer></body></html>"
)


def test_record_framing_and_http_body():
    seg = _segment(
        [
            ("http://w.test/a", "2024-06-01T10:00:00Z", _HTML),
            ("http://w.test/b", "2024-06-01T11:30:05Z", b"<p>b</p>"),
        ]
    )
    recs = list(iter_warc_records(seg))
    assert len(recs) == 2
    h0, p0 = recs[0]
    assert h0["warc-type"] == "response"
    assert h0["warc-target-uri"] == "http://w.test/a"
    assert http_body(p0) == _HTML
    # payload containing binary/CRLF content must not confuse framing
    tricky = b"<p>\r\n\r\nWARC/1.0 fake inside body</p>"
    seg2 = _segment([("http://w.test/c", "2024-06-01T00:00:00Z", tricky)])
    (hc, pc), = list(iter_warc_records(seg2))
    assert http_body(pc) == tricky


def test_read_warc_pages_plain_and_gzip(spark, tmp_path):
    pages = [
        ("http://w.test/a", "2024-06-01T10:00:00Z", _HTML),
        ("http://w.test/b", "2024-06-01T11:30:05Z", _HTML),
    ]
    seg = _segment(pages)
    d = tmp_path / "warc"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(seg)
    # per-record gzip members, Common-Crawl style
    (d / "seg-1.warc.gz").write_bytes(
        b"".join(gzip.compress(warc_record_bytes(*p)) for p in
                 [("http://w.test/c", "2024-06-01T12:00:00Z", _HTML)])
    )
    df = read_warc_pages(spark, str(d))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {"http://w.test/a", "http://w.test/b", "http://w.test/c"}
    assert bytes(rows["http://w.test/a"].html) == _HTML
    assert rows["http://w.test/b"].warc_ts.hour == 11

    # the pages table feeds extraction directly
    from readability_ex_spark.pipeline import run_extraction

    ext = run_extraction(df, n_partitions=2)
    assert ext.filter(F.col("status") == "ok").count() == 3
    txt = ext.filter(F.col("url") == "http://w.test/a").head().text
    assert "real article body" in txt


def test_run_job_warc_input(spark, tmp_path):
    """run_job.py --table-format warc: raw crawl segments in, parquet
    extraction table out."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    d = tmp_path / "warc_in"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(
        _segment(
            [
                ("http://w.test/a", "2024-06-01T10:00:00Z", _HTML),
                ("http://w.test/b", "2024-06-01T11:30:05Z", _HTML),
            ]
        )
    )
    proc = subprocess.run(
        [
            sys.executable, str(repo / "scripts" / "run_job.py"),
            "--input", str(d),
            "--output", str(tmp_path / "out"),
            "--table-format", "warc",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(repo),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 2
    assert out.filter("status = 'ok'").count() == 2


# -- WET round-trip ---------------------------------------------------------

def test_wet_write_read_roundtrip(spark, tmp_path):
    """Extraction output -> WET files -> read back: url+text identical."""
    from readability_ex_spark.sources.warc import read_wet_docs, write_wet

    docs = spark.createDataFrame(
        [
            ("http://a.test/1", "first extracted article text"),
            ("http://a.test/2", "second text with unicode: éü—"),
            ("http://a.test/3", None),  # failed extraction: skipped
        ],
        "url string, text string",
    ).repartition(2)
    out = tmp_path / "wet"
    write_wet(docs, str(out), date="2026-01-02T03:04:05Z")

    files = list(out.glob("part-*.warc.wet.gz"))
    assert files, "no WET part files written"

    back = read_wet_docs(spark, str(out))
    rows = {r.url: r for r in back.collect()}
    assert set(rows) == {"http://a.test/1", "http://a.test/2"}
    assert rows["http://a.test/1"].text == "first extracted article text"
    assert rows["http://a.test/2"].text == "second text with unicode: éü—"
    assert str(rows["http://a.test/1"].warc_ts) == "2026-01-02 03:04:05"


def test_wet_record_headers_are_safe_and_identified():
    """Non-latin-1 / CR-LF urls must not raise or corrupt framing, and
    every record carries a deterministic spec-mandated WARC-Record-ID."""
    from readability_ex_spark.sources.warc import (
        iter_warc_records,
        wet_record_bytes,
    )

    url = "http://ex.test/путь/ファイル?q=a b\r\nWARC-Type: sneaky"
    rec = wet_record_bytes(url, "2026-01-02T03:04:05Z", b"body text")
    # header block is pure ASCII and still frames exactly one record
    ((headers, payload),) = list(iter_warc_records(rec))
    assert payload == b"body text"
    assert headers["warc-type"] == "conversion"
    # CR/LF percent-encoded: the injected header never materializes
    assert "sneaky" not in headers.get("warc-type", "")
    assert "%0D%0A" in headers["warc-target-uri"]
    assert "%D0%BF" in headers["warc-target-uri"]  # UTF-8 'п' escaped
    # record id: present, urn:uuid, deterministic, distinct per url
    rid = headers["warc-record-id"]
    assert rid.startswith("<urn:uuid:") and rid.endswith(">")
    rec2 = wet_record_bytes(url, "2026-01-02T03:04:05Z", b"body text")
    assert rec2 == rec
    ((h3, _),) = list(
        iter_warc_records(
            wet_record_bytes("http://ex.test/other", "2026-01-02T03:04:05Z", b"x")
        )
    )
    assert h3["warc-record-id"] != rid
    # an already-clean url is byte-unchanged (no double-encoding)
    clean = "http://ex.test/a%20b?x=1&y=%2F"
    ((h4, _),) = list(
        iter_warc_records(wet_record_bytes(clean, "2026-01-02T03:04:05Z", b"x"))
    )
    assert h4["warc-target-uri"] == clean


def test_wet_records_are_per_member_gzip(spark, tmp_path):
    """Each record is its own gzip member (the CC convention the reader's
    multi-member decompress consumes)."""
    import gzip as _gz

    from readability_ex_spark.sources.warc import write_wet

    docs = spark.createDataFrame(
        [(f"http://m.test/{i}", f"text {i}") for i in range(5)],
        "url string, text string",
    ).coalesce(1)
    out = tmp_path / "wet2"
    write_wet(docs, str(out))
    (f,) = list(out.glob("part-*.warc.wet.gz"))
    raw = f.read_bytes()
    # multi-member: more than one gzip magic in the file
    assert raw.count(b"\x1f\x8b\x08") == 5
    assert _gz.decompress(raw).count(b"WARC-Type: conversion") == 5
