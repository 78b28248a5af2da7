"""Charset sniffing for raw crawl bytes (WHATWG-flavored, stdlib-only).

Order: BOM -> <meta charset> / http-equiv within the first 4 KB ->
UTF-8 -> windows-1252 fallback (never fails; 1252 decodes any byte
sequence, matching browsers' legacy default for the web).
"""

from __future__ import annotations

import codecs
import re

_RE_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I
)

_BOMS = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

# label normalization for the common aliases seen in crawls
_ALIASES = {
    "iso-8859-1": "windows-1252",  # WHATWG maps latin-1 labels to 1252
    "latin-1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "gb2312": "gb18030",
    "gbk": "gb18030",
}


def sniff_encoding(payload: bytes) -> str:
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            return enc
    m = _RE_META_CHARSET.search(payload[:4096])
    if m:
        label = m.group(1).decode("ascii", "ignore").lower()
        label = _ALIASES.get(label, label)
        try:
            codecs.lookup(label)
            return label
        except LookupError:
            pass
    return "utf-8"


def decode_html(payload: bytes) -> str:
    """Best-effort decode that never raises."""
    enc = sniff_encoding(payload)
    if enc.startswith("utf-16"):
        payload = payload[2:] if payload[:2] in (
            codecs.BOM_UTF16_LE, codecs.BOM_UTF16_BE
        ) else payload
    elif payload.startswith(codecs.BOM_UTF8):
        payload = payload[len(codecs.BOM_UTF8):]
    try:
        return payload.decode(enc)
    except (UnicodeDecodeError, LookupError):
        pass
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("windows-1252", errors="replace")
