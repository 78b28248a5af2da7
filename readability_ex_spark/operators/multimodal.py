"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in the pages-style tables as ``binary`` columns
with typed metadata structs. The Spark-side plumbing — schema, Arrow
batching, partitioning, UDF signatures — is real and tested; the actual
codec work is stubbed behind ``_decode_image_stub`` because the
image/audio libraries are not in this container (swap the stub for
PIL/libvips/ffmpeg calls in production; the batch shape stays the same).
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


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic fake dimensions derived from the content hash.

    Production: replace with a real decoder (PIL.Image.open etc.). The
    signature (bytes -> (width, height)) and the NotImplementedError
    contract for unsupported formats are what the pipeline depends on.
    """
    digest = hashlib.md5(payload).digest()
    return (
        int.from_bytes(digest[:2], "big") % 3840 + 1,
        int.from_bytes(digest[2:4], "big") % 2160 + 1,
    )


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
                w, h = _decode_image_stub(payload)
                out["width"].append(w)
                out["height"].append(h)
                out["status"].append("ok")
            except NotImplementedError:
                out["width"].append(None)
                out["height"].append(None)
                out["status"].append("unsupported")
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
