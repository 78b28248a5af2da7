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


def _wav(rate=44100, channels=2, bits=16, n_samples=44100) -> bytes:
    fmt = (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    )
    data_size = n_samples * channels * bits // 8
    data = b"data" + struct.pack("<I", data_size) + b"\x00" * min(data_size, 64)
    body = b"WAVE" + fmt + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mp4(duration_ms=12000, timescale=1000) -> bytes:
    mvhd_body = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def test_sniff_media_riff_disambiguation():
    from readability_ex_spark.operators.multimodal import sniff_media

    assert sniff_media(_wav()) == ("audio", "wav")
    assert sniff_media(_webp_lossless(3, 3)) == ("image", "webp")
    assert sniff_media(b"RIFF\x00\x00\x00\x00AVI LIST") == ("video", "avi")
    assert sniff_media(_mp4()) == ("video", "mp4")
    assert sniff_media(b"ID3\x04rest") == ("audio", "mp3")
    assert sniff_media(b"OggS junk") == ("audio", "ogg")
    assert sniff_media(b"\x1a\x45\xdf\xa3 ebml") == ("video", "webm")
    assert sniff_media(b"plain text") is None


def test_wav_and_mp4_header_decode():
    from readability_ex_spark.operators.multimodal import (
        decode_mp4_duration,
        decode_wav_header,
    )

    rate, ch, dur = decode_wav_header(_wav(rate=22050, channels=1,
                                           n_samples=22050))
    assert (rate, ch) == (22050, 1) and abs(dur - 1000.0) < 1e-6
    assert abs(decode_mp4_duration(_mp4(duration_ms=12000)) - 12000.0) < 1e-6

    import pytest

    with pytest.raises(ValueError):
        decode_wav_header(b"RIFF\x04\x00\x00\x00WAVE")


def test_media_profile_and_frame_sampling(spark):
    import pyspark.sql.functions as F

    from readability_ex_spark.operators.multimodal import (
        decode_frames,
        frame_sample_plan,
        media_profile,
    )

    media = spark.createDataFrame(
        [
            ("img", _png(640, 480)),
            ("aud", _wav(rate=8000, channels=1, n_samples=16000)),
            ("vid", _mp4(duration_ms=10000)),
            ("bad", b"???"),
        ],
        "media_id string, payload binary",
    )
    prof = media_profile(media).cache()
    rows = {r.media_id: r for r in prof.collect()}
    assert rows["img"].kind == "image" and rows["img"].width == 640
    assert rows["aud"].kind == "audio" and rows["aud"].sample_rate == 8000
    assert abs(rows["aud"].duration_ms - 2000.0) < 1e-6
    assert rows["vid"].kind == "video" and abs(rows["vid"].duration_ms - 10000) < 1e-6
    assert rows["bad"].status == "unsupported"

    plan = frame_sample_plan(prof, n_frames=4).orderBy("frame_no")
    ts = [r.ts_ms for r in plan.collect()]
    assert ts == [1250.0, 3750.0, 6250.0, 8750.0]  # uniform mid-bins

    decoded = decode_frames(plan.join(media, "media_id")).collect()
    assert len(decoded) == 4
    assert all(
        r.status == "decoder_unavailable" and r.frame_bytes is None
        for r in decoded
    )


def test_mp4_largesize_and_eof_boxes():
    from readability_ex_spark.operators.multimodal import decode_mp4_duration

    # >4GB-style mdat encoded with size=1 + 64-bit largesize BEFORE moov
    mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16)
    base = _mp4(duration_ms=7000)
    ftyp, moov = base[:16], base[16:]
    assert abs(decode_mp4_duration(ftyp + mdat + moov) - 7000.0) < 1e-6
    # trailing size=0 box (extends to EOF) before moov is skipped over
    free = struct.pack(">I", 12) + b"free" + b"\x00" * 4
    assert abs(decode_mp4_duration(ftyp + free + moov) - 7000.0) < 1e-6


def _pdf(n_pages: int, version: str = "1.4") -> bytes:
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    pages = "".join(
        f"{3 + i} 0 obj << /Type /Page /Parent 2 0 R >> endobj\n"
        for i in range(n_pages)
    )
    return (
        f"%PDF-{version}\n"
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        f"2 0 obj << /Type /Pages /Kids [{kids}] /Count {n_pages} >> endobj\n"
        f"{pages}"
        "trailer << /Root 1 0 R >>\n%%EOF"
    ).encode("latin-1")


def test_parse_pdf_meta():
    from readability_ex_spark.operators.multimodal import (
        parse_pdf_meta,
        sniff_media,
    )

    assert sniff_media(_pdf(2)) == ("document", "pdf")
    assert parse_pdf_meta(_pdf(2)) == ("1.4", 2)
    assert parse_pdf_meta(_pdf(5, version="1.7")) == ("1.7", 5)
    # compressed-object-stream PDFs expose no plain /Type /Page objects:
    # the page-tree /Count fallback answers (root count dominates), and
    # outline/bookmark /Count entries (no /Type /Pages nearby) are
    # ignored even when larger
    packed = (
        b"%PDF-1.6\n2 0 obj << /Type /Pages /Count 7 >> endobj\n"
        + b"x" * 400
        + b"\n8 0 obj << /Type /Outlines /Count 50 >> endobj\n"
        b"9 0 obj << /Count 3 >> endobj\n%%EOF"
    )
    assert parse_pdf_meta(packed) == ("1.6", 7)
    import pytest

    with pytest.raises(ValueError):
        parse_pdf_meta(b"GIF89a whatever")


def test_media_profile_pdf(spark):
    from readability_ex_spark.operators.multimodal import media_profile

    media = spark.createDataFrame(
        [("doc", bytearray(_pdf(3)))], "media_id string, payload binary"
    )
    row = media_profile(media).head()
    assert row.kind == "document" and row.format == "pdf"
    assert row.n_pages == 3 and row.status == "ok"


def _text_pdf(pages: list[bytes], compress: bool = False) -> bytes:
    """Minimal but structurally-honest PDF: catalog -> page tree ->
    per-page /Contents streams (optionally FlateDecoded)."""
    import zlib

    n = len(pages)
    objs = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    objs.append(
        f"2 0 obj << /Type /Pages /Count {n} /Kids [{kids}] >> endobj".encode()
    )
    for i, content in enumerate(pages):
        page_num, cont_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"{page_num} 0 obj << /Type /Page /Parent 2 0 R "
            f"/Contents {cont_num} 0 R >> endobj".encode()
        )
        data = zlib.compress(content) if compress else content
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            f"{cont_num} 0 obj << ".encode() + filt
            + f"/Length {len(data)} >> stream\n".encode()
            + data
            + b"\nendstream endobj"
        )
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\n%%EOF"


def test_pdf_text_plain_and_compressed():
    from readability_ex_spark.operators.multimodal import extract_pdf_text

    content = b"BT /F1 12 Tf 72 700 Td (Hello World) Tj ET"
    for compress in (False, True):
        pdf = _text_pdf([content], compress=compress)
        assert extract_pdf_text(pdf) == "Hello World"


def test_pdf_text_operators():
    from readability_ex_spark.operators.multimodal import extract_pdf_text

    content = (
        b"BT (Line one) Tj T* (Line two) Tj 0 -14 Td (Line three) Tj "
        b"(continued) ' ET\n"
        # drawing ops outside BT/ET must not leak strings
        b"(not text) 1 0 0 1 50 50 cm\n"
        b"BT [(Kerned) -50 (Pair)] TJ ET\n"
        b"BT [(Wide) -500 (gap)] TJ ET"
    )
    out = extract_pdf_text(_text_pdf([content]))
    assert "Line one\nLine two\nLine three\ncontinued" in out
    assert "KernedPair" in out      # small kern: no space
    assert "Wide gap" in out        # wide kern: space
    assert "not text" not in out


def test_pdf_text_escapes_and_hex():
    from readability_ex_spark.operators.multimodal import extract_pdf_text

    content = (
        rb"BT (paren \( pair \) back\\slash octal \101) Tj "
        b"<48656C6C6F> Tj "
        b"<FEFF00480069> Tj ET"  # UTF-16BE "Hi"
    )
    out = extract_pdf_text(_text_pdf([content]))
    assert r"paren ( pair ) back\slash octal A" in out
    assert "Hello" in out and "Hi" in out


def test_pdf_text_multipage_and_decoys():
    import zlib

    from readability_ex_spark.operators.multimodal import extract_pdf_text

    p1 = b"BT (Page one text) Tj ET"
    p2 = b"BT (Page two text) Tj ET"
    pdf = _text_pdf([p1, p2], compress=True)
    # decoy: a non-content stream whose bytes contain 'endobj' + BT noise
    decoy = zlib.compress(b"endobj 99 0 obj BT (should not appear) Tj ET")
    pdf = pdf.replace(
        b"%%EOF",
        b"90 0 obj << /Filter /FlateDecode /Subtype /XML /Length "
        + str(len(decoy)).encode()
        + b" >> stream\n" + decoy + b"\nendstream endobj\n%%EOF",
    )
    out = extract_pdf_text(pdf)
    assert out == "Page one text\fPage two text"


def test_pdf_text_unsupported_filter_and_fallback():
    from readability_ex_spark.operators.multimodal import (
        _pdf_decode_stream,
        extract_pdf_text,
    )
    import pytest

    with pytest.raises(NotImplementedError):
        _pdf_decode_stream(b"<< /Filter /DCTDecode >>", b"\xff\xd8")
    with pytest.raises(ValueError):
        extract_pdf_text(b"GIF89a not a pdf")
    # no /Type /Page objects: fall back to scanning raw streams with BT
    pdf = (
        b"%PDF-1.5\n7 0 obj << /Length 30 >> stream\n"
        b"BT (orphan stream text) Tj ET\nendstream endobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "orphan stream text"


def test_media_profile_pdf_text(spark):
    from readability_ex_spark.operators.multimodal import media_profile

    pdf = _text_pdf([b"BT (From the profile) Tj ET"], compress=True)
    media = spark.createDataFrame(
        [("doc", bytearray(pdf))], "media_id string, payload binary"
    )
    row = media_profile(media).head()
    assert row.format == "pdf" and row.status == "ok"
    assert row.n_pages == 1
    assert row.text == "From the profile"
