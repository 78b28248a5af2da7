"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in the pages-style tables as ``binary`` columns
with typed metadata structs. The Spark-side plumbing — schema, Arrow
batching, partitioning, UDF signatures — is real and tested, and image
dimensions come from real stdlib header parsing
(``decode_image_header``: PNG IHDR, JPEG SOFn, GIF logical screen
descriptor, WebP VP8/VP8L/VP8X). Full pixel decode / resize /
frame-sampling still needs PIL/libvips/ffmpeg, which are not in this
container — those stay behind the same (bytes -> ...) batch contract.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

_FORMAT_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "webp",
}


def _sniff_format(payload: bytes) -> str | None:
    for magic, fmt in _FORMAT_MAGIC.items():
        if payload.startswith(magic):
            return fmt
    return None


# JPEG start-of-frame markers carrying dimensions (C4/C8/CC are
# huffman/arithmetic tables, not frames)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xD8)}  # TEM, RSTn: no length field


def _png_dims(b: bytes) -> tuple[int, int]:
    if len(b) < 24 or b[12:16] != b"IHDR":
        raise ValueError("truncated PNG")
    return int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")


def _gif_dims(b: bytes) -> tuple[int, int]:
    if len(b) < 10:
        raise ValueError("truncated GIF")
    return int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little")


def _jpeg_dims(b: bytes) -> tuple[int, int]:
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in _JPEG_STANDALONE:
            pos += 2
            continue
        if marker in _JPEG_SOF:
            if pos + 9 > len(b):
                raise ValueError("truncated JPEG SOF")
            h = int.from_bytes(b[pos + 5 : pos + 7], "big")
            w = int.from_bytes(b[pos + 7 : pos + 9], "big")
            return w, h
        seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
        if seg_len < 2:
            raise ValueError("bad JPEG segment length")
        pos += 2 + seg_len
    raise ValueError("no JPEG SOF marker found")


def _webp_dims(b: bytes) -> tuple[int, int]:
    if len(b) < 16 or b[8:12] != b"WEBP":
        raise ValueError("truncated WebP")
    chunk = b[12:16]
    if chunk == b"VP8 ":  # lossy: dims after the 0x9D012A sync code
        if len(b) < 30 or b[23:26] != b"\x9d\x01\x2a":
            raise ValueError("truncated VP8 / bad sync code")
        w = int.from_bytes(b[26:28], "little") & 0x3FFF
        h = int.from_bytes(b[28:30], "little") & 0x3FFF
        return w, h
    if chunk == b"VP8L":  # lossless: 14-bit fields packed after 0x2F
        if len(b) < 25 or b[20] != 0x2F:
            raise ValueError("truncated VP8L / bad signature")
        bits = int.from_bytes(b[21:25], "little")
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if chunk == b"VP8X":  # extended: 24-bit canvas size minus one
        if len(b) < 30:
            raise ValueError("truncated VP8X")
        w = int.from_bytes(b[24:27], "little") + 1
        h = int.from_bytes(b[27:30], "little") + 1
        return w, h
    raise ValueError(f"unknown WebP chunk {chunk!r}")


_DIM_PARSERS = {
    "png": _png_dims,
    "gif": _gif_dims,
    "jpeg": _jpeg_dims,
    "webp": _webp_dims,
}


def decode_image_header(payload: bytes) -> tuple[int, int]:
    """(width, height) from the container header — pure stdlib byte
    parsing, no codec libraries. Raises NotImplementedError for formats
    we don't sniff (the pipeline maps that to status='unsupported') and
    ValueError for truncated/corrupt payloads (status='error')."""
    fmt = _sniff_format(payload)
    if fmt is None:
        raise NotImplementedError("unknown image format")
    return _DIM_PARSERS[fmt](payload)


def extract_media_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_id, payload) -> typed metadata rows.
    Decode failures surface as status='error' rows, never exceptions."""
    for pdf in batches:
        out = {k: [] for k in (
            "media_id", "n_bytes", "content_hash", "width", "height",
            "format", "status",
        )}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            out["media_id"].append(mid)
            if payload is None:
                out["n_bytes"].append(None)
                out["content_hash"].append(None)
                out["width"].append(None)
                out["height"].append(None)
                out["format"].append(None)
                out["status"].append("error")
                continue
            payload = bytes(payload)
            out["n_bytes"].append(len(payload))
            out["content_hash"].append(hashlib.md5(payload).hexdigest())
            fmt = _sniff_format(payload)
            out["format"].append(fmt)
            try:
                w, h = decode_image_header(payload)
                out["width"].append(w)
                out["height"].append(h)
                out["status"].append("ok")
            except NotImplementedError:
                out["width"].append(None)
                out["height"].append(None)
                out["status"].append("unsupported")
            except Exception:  # truncated/corrupt payload
                out["width"].append(None)
                out["height"].append(None)
                out["status"].append("error")
        yield pd.DataFrame(out)


def media_metadata(media: DataFrame) -> DataFrame:
    """Distributed media metadata extraction over (media_id, payload).

    Repartitions by media_id hash before the UDF (payloads are large;
    even spread matters more than locality) and returns the typed
    metadata table — the join key back to the source is media_id.
    """
    df = media.select("media_id", "payload").repartition(F.col("media_id"))
    return df.mapInPandas(extract_media_meta, MEDIA_META_SCHEMA)


def media_dedup(meta: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (same shape as text exact-dedup:
    one hash shuffle with map-side combine)."""
    return (
        meta.filter(F.col("content_hash").isNotNull())
        .groupBy("content_hash")
        .agg(
            F.min("media_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
            F.first("format").alias("format"),
        )
    )
