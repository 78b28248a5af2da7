"""Multimodal plumbing: schema, batching, error paths (decode stubbed —
see operators/multimodal.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from readability_ex_spark.operators.multimodal import media_dedup, media_metadata


def test_media_metadata_plumbing(spark):
    rows = [
        ("m1", b"\x89PNG\r\n" + b"x" * 64),
        ("m2", b"\xff\xd8\xff\xe0" + b"y" * 32),
        ("m3", b"\x89PNG\r\n" + b"x" * 64),  # duplicate of m1
        ("m4", None),
        ("m5", b"not an image"),
    ]
    media = spark.createDataFrame(rows, schema="media_id string, payload binary")
    meta = media_metadata(media).cache()
    out = {r.media_id: r for r in meta.collect()}
    assert out["m1"].format == "png" and out["m1"].status == "ok"
    assert out["m2"].format == "jpeg"
    assert out["m4"].status == "error"
    assert out["m5"].format is None and out["m5"].status == "ok"
    assert out["m1"].content_hash == out["m3"].content_hash
    assert (out["m1"].width, out["m1"].height) == (out["m3"].width, out["m3"].height)

    dd = media_dedup(meta)
    dup = dd.filter(F.col("n_copies") > 1).collect()
    assert len(dup) == 1 and dup[0].canonical_id == "m1"
