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
import re
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

def sniff_media(payload: bytes) -> tuple[str, str] | None:
    """(kind, format) from magic bytes — image/audio/video containers.

    RIFF is a shared container: bytes 8..12 disambiguate WebP images,
    WAV audio, and AVI video."""
    if payload.startswith(b"\x89PNG"):
        return ("image", "png")
    if payload.startswith(b"\xff\xd8\xff"):
        return ("image", "jpeg")
    if payload.startswith(b"GIF8"):
        return ("image", "gif")
    if payload.startswith(b"RIFF"):
        sub = payload[8:12]
        if sub == b"WEBP":
            return ("image", "webp")
        if sub == b"WAVE":
            return ("audio", "wav")
        if sub == b"AVI ":
            return ("video", "avi")
        return None
    if payload.startswith(b"ID3") or payload[:2] in (
        b"\xff\xfb", b"\xff\xf3", b"\xff\xf2"
    ):
        return ("audio", "mp3")
    if payload.startswith(b"OggS"):
        return ("audio", "ogg")
    if payload[4:8] == b"ftyp":
        return ("video", "mp4")
    if payload.startswith(b"\x1a\x45\xdf\xa3"):
        return ("video", "webm")
    if payload.startswith(b"%PDF-"):
        return ("document", "pdf")
    return None


def _sniff_format(payload: bytes) -> str | None:
    """Image-format sniff (the contract of decode_image_header)."""
    km = sniff_media(payload)
    return km[1] if km is not None and km[0] == "image" else None


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
    The partition count is explicit (the run_extraction rule): the
    decode stage is CPU-bound, and AQE's advisory-size coalescing would
    serialize a byte-small batch onto one core.
    """
    n = media.sparkSession.sparkContext.defaultParallelism * 2
    df = media.select("media_id", "payload").repartition(
        n, F.col("media_id")
    )
    return df.mapInPandas(extract_media_meta, MEDIA_META_SCHEMA)


def decode_wav_header(b: bytes) -> tuple[int, int, float]:
    """(sample_rate, channels, duration_ms) from RIFF/WAVE chunks —
    pure stdlib byte parsing, like the image headers."""
    if len(b) < 12 or b[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos = 12
    rate = channels = bits = None
    data_size = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = pos + 8
        if cid == b"fmt " and body + 16 <= len(b):
            channels = int.from_bytes(b[body + 2 : body + 4], "little")
            rate = int.from_bytes(b[body + 4 : body + 8], "little")
            bits = int.from_bytes(b[body + 14 : body + 16], "little")
        elif cid == b"data":
            data_size = size
        pos = body + size + (size & 1)  # chunks are word-aligned
    if not rate or not channels or not bits or data_size is None:
        raise ValueError("truncated WAVE header")
    n_samples = data_size // (channels * max(bits // 8, 1))
    return rate, channels, n_samples / rate * 1000.0


def decode_mp4_duration(b: bytes) -> float:
    """duration_ms from the ISO-BMFF moov/mvhd box (v0 and v1)."""

    def boxes(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            typ = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize (boxes > 4 GB, e.g. mdat)
                if pos + 16 > end:
                    return
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                body = pos + 16
                if size < 16:
                    return
            elif size == 0:  # box extends to end of file
                size = end - pos
            elif size < 8:
                return
            yield typ, body, min(pos + size, end)
            pos += size

    for typ, body, end in boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, b2, _e2 in boxes(b, body, end):
            if t2 != b"mvhd":
                continue
            version = b[b2]
            if version == 1:
                scale = int.from_bytes(b[b2 + 20 : b2 + 24], "big")
                dur = int.from_bytes(b[b2 + 24 : b2 + 32], "big")
            else:
                scale = int.from_bytes(b[b2 + 12 : b2 + 16], "big")
                dur = int.from_bytes(b[b2 + 16 : b2 + 20], "big")
            if not scale:
                raise ValueError("mvhd timescale is zero")
            return dur / scale * 1000.0
    raise ValueError("no moov/mvhd box found")


_RE_PDF_PAGE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_RE_PDF_PAGES = re.compile(rb"/Type\s*/Pages")
_RE_PDF_COUNT = re.compile(rb"/Count\s+(\d+)")


def parse_pdf_meta(b: bytes) -> tuple[str, int]:
    """(version, n_pages) from raw PDF bytes — stdlib byte parsing like
    the image/audio headers (north rule names PDF/layout parse; text
    extraction is ``extract_pdf_text`` below; layout analysis and
    non-Flate codec filters stay behind the documented stub contract
    like pixel decode).

    Page count: the number of uncompressed ``/Type /Page`` objects;
    PDFs that pack page objects into compressed object streams
    (1.5+ xref streams) expose no plain page objects, so fall back to
    the largest ``/Count N`` found NEAR a ``/Type /Pages`` marker (the
    page-tree root's count is the page total and dominates subtree
    counts; an unscoped max would pick up outline/bookmark ``/Count``
    entries, which can exceed the page count)."""
    if not b.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    eol = b.find(b"\n", 0, 16)
    version = b[5 : eol if eol > 0 else 13].strip(b"\r ").decode(
        "ascii", "replace"
    )
    n_pages = len(_RE_PDF_PAGE.findall(b))
    if n_pages == 0:
        counts = []
        for m in _RE_PDF_PAGES.finditer(b):
            window = b[max(0, m.start() - 300) : m.start() + 300]
            counts += [int(c) for c in _RE_PDF_COUNT.findall(window)]
        n_pages = max(counts) if counts else 0
    return version, n_pages


# --- PDF text extraction (stdlib: zlib FlateDecode + BT/ET text ops) ------

_RE_PDF_OBJ = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_RE_PDF_STREAM = re.compile(rb"stream(\r\n|\n|\r)")
_RE_PDF_CONTENTS = re.compile(
    rb"/Contents\s*(?:\[([^\]]*)\]|(\d+)\s+\d+\s+R)", re.S
)
_RE_PDF_REF = re.compile(rb"(\d+)\s+\d+\s+R")
# a TJ kerning gap at least this wide (negative thousandths of em) is
# rendered as visible space — the pdftotext convention
_PDF_TJ_SPACE_GAP = -180.0
_PDF_ESCAPES = {
    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f",
    0x28: b"(", 0x29: b")", 0x5C: b"\\",
}


def _pdf_objects(b: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """obj number -> (dictionary bytes, raw stream bytes or None).

    Linear scan for ``N G obj`` markers; a stream body is delimited by
    the FOLLOWING ``endstream`` (not ``endobj``, which can occur inside
    compressed bytes). Good for the simple-PDF common case; objects
    packed inside 1.5+ compressed object streams are not walked (their
    text stays behind the stub contract, like parse_pdf_meta's page
    fallback)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _RE_PDF_OBJ.finditer(b):
        num = int(m.group(1))
        start = m.end()
        eo = b.find(b"endobj", start)
        sm = _RE_PDF_STREAM.search(b, start)
        if sm is not None and (eo < 0 or sm.start() < eo):
            head = b[start : sm.start()]
            es = b.find(b"endstream", sm.end())
            data = b[sm.end() : es if es >= 0 else len(b)]
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith((b"\n", b"\r")):
                data = data[:-1]
            objs[num] = (head, data)
        else:
            objs[num] = (b[start : eo if eo >= 0 else len(b)], None)
    return objs


def _pdf_decode_stream(head: bytes, data: bytes) -> bytes:
    """Apply the stream's /Filter: none or FlateDecode (zlib — stdlib).
    Anything else (DCT, LZW, ASCII85, crypt) raises NotImplementedError —
    the honest codec-unavailable contract."""
    if b"/Filter" not in head:
        return data
    if b"/FlateDecode" not in head and not re.search(rb"/Fl\b", head):
        raise NotImplementedError("unsupported PDF stream filter")
    import zlib

    return zlib.decompress(data)


def _pdf_literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal at data[i] == '(' (nesting, escapes,
    octal, line continuations — PDF 32000-1 §7.3.4.2). Returns (bytes,
    index past the closing paren)."""
    depth, i = 1, i + 1
    buf = bytearray()
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _PDF_ESCAPES:
                buf += _PDF_ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                j = i
                while j < n and j < i + 3 and 0x30 <= data[j] <= 0x37:
                    j += 1
                buf.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0D, 0x0A):  # escaped EOL = continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                buf.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            buf.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                buf.append(c)
            i += 1
        else:
            buf.append(c)
            i += 1
    return bytes(buf), i


def _pdf_hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``<...>`` hex string at data[i] == '<'. Odd digit counts
    pad with 0 (spec)."""
    end = data.find(b">", i + 1)
    if end < 0:
        end = len(data)
    hx = re.sub(rb"\s+", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        raw = b""
    return raw, end + 1


def _pdf_bytes_to_text(raw: bytes) -> str:
    """String bytes -> text: UTF-16BE when BOM'd, else Latin-1 (the
    byte-transparent superset of PDFDocEncoding's printable range).
    CID/composite-font bytes come out as mojibake — the documented
    simple-PDF limit (a ToUnicode CMap walk is the stub's territory)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


def _pdf_content_text(data: bytes) -> str:
    """Extract show-text operators from one decoded content stream:
    ``Tj``, ``TJ`` (with kerning-gap spaces), ``'``/``\"``; line breaks
    from ``T*``/``Td``/``TD`` (nonzero ty) and ``Tm``. Tokens outside
    BT..ET are positioning/drawing and are skipped."""
    out: list[str] = []
    operands: list = []  # parsed strings/numbers since the last operator
    in_text = False
    in_array = False
    arr_parts: list[str] = []
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # ( literal string
            raw, i = _pdf_literal_string(data, i)
            s = _pdf_bytes_to_text(raw)
            if in_array:
                arr_parts.append(s)
            else:
                operands.append(s)
        elif c == 0x3C:  # < hex string or << dict
            if data[i : i + 2] == b"<<":
                j = data.find(b">>", i + 2)
                i = n if j < 0 else j + 2
            else:
                raw, i = _pdf_hex_string(data, i)
                s = _pdf_bytes_to_text(raw)
                if in_array:
                    arr_parts.append(s)
                else:
                    operands.append(s)
        elif c == 0x5B:  # [ array (TJ operand)
            in_array, arr_parts = True, []
            i += 1
        elif c == 0x5D:  # ]
            in_array = False
            operands.append(arr_parts)
            i += 1
        elif c == 0x2F:  # /Name
            m = re.match(rb"/[^\s()<>\[\]{}/%]*", data[i:])
            operands.append(None)
            i += m.end()
        else:
            m = re.match(rb"[^\s()<>\[\]{}/%]+", data[i:])
            if m is None:
                i += 1
                continue
            tok = m.group()
            i += m.end()
            try:
                num = float(tok)
            except ValueError:
                num = None
            if num is not None:
                if in_array:
                    # kerning gap wide enough to read as a space
                    if num <= _PDF_TJ_SPACE_GAP:
                        arr_parts.append(" ")
                else:
                    operands.append(num)
                continue
            # an operator
            if tok == b"BT":
                in_text = True
            elif tok == b"ET":
                in_text = False
                if out and not out[-1].endswith("\n"):
                    out.append("\n")
            elif in_text:
                if tok == b"Tj" and operands and isinstance(operands[-1], str):
                    out.append(operands[-1])
                elif tok == b"TJ" and operands and isinstance(operands[-1], list):
                    out.append("".join(operands[-1]))
                elif tok in (b"'", b'"') and operands and isinstance(
                    operands[-1], str
                ):
                    out.append("\n")
                    out.append(operands[-1])
                elif tok == b"T*":
                    out.append("\n")
                elif tok in (b"Td", b"TD"):
                    if (
                        len(operands) >= 2
                        and isinstance(operands[-1], (int, float))
                        and operands[-1] != 0
                    ):
                        out.append("\n")
                elif tok == b"Tm":
                    out.append("\n")
            operands = []
    text = "".join(out)
    return re.sub(r"\n{3,}", "\n\n", text).strip("\n")


def extract_pdf_text(b: bytes) -> str:
    """Full-document text from raw PDF bytes — stdlib only (zlib
    FlateDecode + content-stream BT/ET text operators).

    Page order: ``/Type /Page`` objects in document order, each page's
    ``/Contents`` refs resolved through the object map (single ref or
    array), pages joined with form-feeds. Falls back to scanning every
    decoded stream containing a BT marker when no page objects resolve
    (e.g. 1.5+ compressed-xref layouts, whose page DICTS are packed but
    whose content streams usually are not).

    Raises ValueError for non-PDF payloads. Streams with non-Flate
    filters raise NotImplementedError inside and are SKIPPED here
    (their text is unreachable without codec libraries — the same
    honest-stub contract as ``decode_frames``)."""
    if not b.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    objs = _pdf_objects(b)

    def decoded(num: int) -> bytes | None:
        entry = objs.get(num)
        if entry is None or entry[1] is None:
            return None
        try:
            return _pdf_decode_stream(entry[0], entry[1])
        except NotImplementedError:
            return None
        except Exception:  # corrupt deflate data
            return None

    page_texts: list[str] = []
    for num, (head, stream) in objs.items():
        if stream is not None or not _RE_PDF_PAGE.search(head):
            continue
        refs: list[int] = []
        for am, sm in _RE_PDF_CONTENTS.findall(head):
            if sm:
                refs.append(int(sm))
            else:
                refs += [int(r) for r in _RE_PDF_REF.findall(am)]
        parts = [t for t in (decoded(r) for r in refs) if t]
        if parts:
            page_texts.append(_pdf_content_text(b"\n".join(parts)))
    if not page_texts:  # no resolvable page objects: scan all streams
        for num in sorted(objs):
            data = decoded(num)
            if data and b"BT" in data:
                t = _pdf_content_text(data)
                if t:
                    page_texts.append(t)
    return "\f".join(page_texts)


MEDIA_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("n_pages", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

_PROFILE_COLS = [f.name for f in MEDIA_PROFILE_SCHEMA.fields]


def profile_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: typed per-kind metadata from container
    headers — image dims, WAV sample rate/channels/duration, MP4
    duration. All stdlib byte parsing; decode failures are status rows."""
    for pdf in batches:
        out = {k: [] for k in _PROFILE_COLS}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            row = dict.fromkeys(_PROFILE_COLS)
            row["media_id"] = mid
            if payload is None:
                row["status"] = "error"
            else:
                payload = bytes(payload)
                row["n_bytes"] = len(payload)
                row["content_hash"] = hashlib.md5(payload).hexdigest()
                km = sniff_media(payload)
                if km is None:
                    row["status"] = "unsupported"
                else:
                    row["kind"], row["format"] = km
                    try:
                        if row["kind"] == "image":
                            row["width"], row["height"] = decode_image_header(
                                payload
                            )
                        elif row["format"] == "wav":
                            (
                                row["sample_rate"],
                                row["channels"],
                                row["duration_ms"],
                            ) = decode_wav_header(payload)
                        elif row["format"] == "mp4":
                            row["duration_ms"] = decode_mp4_duration(payload)
                        elif row["format"] == "pdf":
                            _v, row["n_pages"] = parse_pdf_meta(payload)
                            # content-stream text (FlateDecode/plain);
                            # exotic-filter pages come back empty -> NULL
                            row["text"] = extract_pdf_text(payload) or None
                        # mp3/ogg/webm/avi: kind+format sniff only (frame
                        # headers need a codec library)
                        row["status"] = "ok"
                    except Exception:  # truncated/corrupt payload
                        row["status"] = "error"
            for k, v in row.items():
                out[k].append(v)
        yield pd.DataFrame(out)


def media_profile(media: DataFrame) -> DataFrame:
    """Distributed multimodal profiling over (media_id, payload) —
    same layout strategy (and explicit partition count) as
    media_metadata."""
    n = media.sparkSession.sparkContext.defaultParallelism * 2
    df = media.select("media_id", "payload").repartition(
        n, F.col("media_id")
    )
    return df.mapInPandas(profile_media_batches, MEDIA_PROFILE_SCHEMA)


def frame_sample_plan(profile: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform frame-sample timestamps for video rows: frame i of n is
    at duration * (i + 0.5)/n. Pure JVM explode — the PLAN is data, the
    decode is a separate (stubbed) stage. Videos without a known
    duration are skipped (no timestamp to seek to)."""
    vids = profile.filter(
        (F.col("kind") == "video") & F.col("duration_ms").isNotNull()
    )
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_no"),
        "duration_ms",
    ).select(
        "media_id",
        "frame_no",
        F.round(
            F.col("duration_ms") * (F.col("frame_no") + 0.5) / n_frames, 3
        ).alias("ts_ms"),
    )


def decode_frames(plan_with_payload: DataFrame) -> DataFrame:
    """Frame decode stage — STUB: the container has no video codecs
    (cv2/ffmpeg), so every row comes back frame_bytes=NULL with
    status='decoder_unavailable'. The Spark-side contract (schema,
    Arrow batching, (media_id, frame_no, ts_ms, payload) input shape)
    is real; swap _decode_one for a cv2.VideoCapture seek+grab in
    production."""
    schema = (
        "media_id string, frame_no int, ts_ms double, "
        "frame_bytes binary, status string"
    )

    def _decode_one(payload: bytes, ts_ms: float):
        try:
            import cv2  # noqa: F401 — not present in this container
        except ImportError:
            raise NotImplementedError("no video codec library available")
        raise NotImplementedError("unreachable in this container")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames, statuses = [], []
            for payload, ts in zip(pdf["payload"], pdf["ts_ms"]):
                try:
                    frames.append(_decode_one(bytes(payload), float(ts)))
                    statuses.append("ok")
                except NotImplementedError:
                    frames.append(None)
                    statuses.append("decoder_unavailable")
                except Exception:  # noqa: BLE001
                    frames.append(None)
                    statuses.append("error")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_no": pdf["frame_no"],
                    "ts_ms": pdf["ts_ms"],
                    "frame_bytes": frames,
                    "status": statuses,
                }
            )

    return plan_with_payload.select(
        "media_id", "frame_no", "ts_ms", "payload"
    ).mapInPandas(batches, schema)


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


def q_multimodal_dedup(spark, sf_dir: str) -> DataFrame:
    """``media_dedup`` in the checked contract: content-hash dedup of
    opaque binary payloads (documents' text bytes standing in for the
    media column — the hash/groupBy plumbing is identical for real
    image/audio payloads)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    meta = docs.select(
        F.col("doc_id").alias("media_id"),
        F.md5(F.col("text").cast("binary")).alias("content_hash"),
        F.lit("fake").alias("format"),
    )
    return media_dedup(meta).orderBy("content_hash")
