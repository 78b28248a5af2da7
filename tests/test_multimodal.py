"""Multimodal plumbing: schema, batching, real header decode (PNG IHDR,
JPEG SOF, GIF LSD, WebP), and error paths."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F

from readability_ex_spark.operators.multimodal import (
    decode_image_header,
    media_dedup,
    media_metadata,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _webp_lossless(w: int, h: int) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)
    body = b"VP8L" + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def test_decode_image_header_known_dims():
    assert decode_image_header(_png(640, 480)) == (640, 480)
    assert decode_image_header(_gif(320, 200)) == (320, 200)
    assert decode_image_header(_jpeg(1024, 768)) == (1024, 768)
    assert decode_image_header(_webp_lossless(33, 17)) == (33, 17)


def test_decode_image_header_errors():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image_header(b"not an image")
    with pytest.raises(ValueError):
        decode_image_header(b"\x89PNG\r\n\x1a\n trunc")
    with pytest.raises(ValueError):
        decode_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00")  # no SOF


def test_media_metadata_plumbing(spark):
    rows = [
        ("m1", _png(640, 480)),
        ("m2", _jpeg(100, 50)),
        ("m3", _png(640, 480)),  # duplicate of m1
        ("m4", None),
        ("m5", b"not an image"),
        ("m6", b"\x89PNG\r\n\x1a\n trunc"),  # corrupt known format
        ("m7", _gif(12, 34)),
    ]
    media = spark.createDataFrame(rows, schema="media_id string, payload binary")
    meta = media_metadata(media).cache()
    out = {r.media_id: r for r in meta.collect()}
    assert out["m1"].format == "png" and out["m1"].status == "ok"
    assert (out["m1"].width, out["m1"].height) == (640, 480)
    assert out["m2"].format == "jpeg" and (out["m2"].width, out["m2"].height) == (100, 50)
    assert out["m4"].status == "error" and out["m4"].n_bytes is None
    assert out["m5"].format is None and out["m5"].status == "unsupported"
    assert out["m6"].format == "png" and out["m6"].status == "error"
    assert (out["m7"].width, out["m7"].height) == (12, 34)
    assert out["m1"].content_hash == out["m3"].content_hash

    dd = media_dedup(meta)
    dup = dd.filter(F.col("n_copies") > 1).collect()
    assert len(dup) == 1 and dup[0].canonical_id == "m1"
