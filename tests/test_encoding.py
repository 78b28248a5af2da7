from __future__ import annotations

from readability_ex_spark.kernel.encoding import decode_html, sniff_encoding


def test_bom_utf8():
    payload = b"\xef\xbb\xbf<html><p>caf\xc3\xa9</p></html>"
    assert sniff_encoding(payload) == "utf-8"
    assert "café" in decode_html(payload)


def test_meta_charset_windows_1252():
    payload = (
        b'<html><head><meta charset="iso-8859-1"></head>'
        b"<body>caf\xe9</body></html>"
    )
    assert sniff_encoding(payload) == "windows-1252"
    assert "café" in decode_html(payload)


def test_http_equiv_content_type():
    payload = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=gb2312">'
        b"\xd6\xd0\xce\xc4"
    )
    assert sniff_encoding(payload) == "gb18030"
    assert "中文" in decode_html(payload)


def test_bogus_charset_falls_back():
    payload = b'<meta charset="no-such-enc"><p>ok caf\xe9</p>'
    out = decode_html(payload)
    assert "ok caf" in out  # decoded via fallback, never raises


def test_utf16_le_bom():
    payload = "﻿<p>hello</p>".encode("utf-16-le")
    assert "hello" in decode_html(b"\xff\xfe" + payload[2:])


def test_invalid_utf8_never_raises():
    assert decode_html(b"\xff\xfe\xfd garbage <p>x</p>") != ""
