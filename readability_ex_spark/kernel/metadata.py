"""Metadata extraction: JSON-LD + meta tags (reference: metadata.ex)."""

from __future__ import annotations

import json
import re
from urllib.parse import urlsplit

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.constants import RE_NONWORD
from readability_ex_spark.kernel.dom import Element

JSONLD_TYPES = frozenset(
    [
        "Article", "AdvertiserContentArticle", "NewsArticle",
        "AnalysisNewsArticle", "AskPublicNewsArticle", "BackgroundNewsArticle",
        "OpinionNewsArticle", "ReportageNewsArticle", "ReviewNewsArticle",
        "Report", "SatiricalArticle", "ScholarlyArticle",
        "MedicalScholarlyArticle", "SocialMediaPosting", "BlogPosting",
        "LiveBlogPosting", "DiscussionForumPosting", "TechArticle",
        "APIReference",
    ]
)

# metadata.ex:28-29
_PROPERTY_PATTERN = re.compile(
    r"\s*(article|dc|dcterm|og|twitter)\s*:\s*"
    r"(author|creator|description|published_time|title|site_name)\s*",
    re.I | re.A,
)
_NAME_PATTERN = re.compile(
    r"^\s*(?:(dc|dcterm|og|twitter|parsely|weibo:(article|webpage))"
    r"\s*[-\.:]\s*)?(author|creator|pub-date|description|title|site_name)\s*$",
    re.I | re.A,
)

_RE_JSONLD_SCRIPT = re.compile(
    r"<script[^>]*type=[\"']application/ld\+json[\"'][^>]*>(.*?)</script>",
    re.I | re.S,
)
_RE_SCHEMA_ORG = re.compile(r"^https?://schema\.org/?$", re.I)
_RE_NAMED_ENT = re.compile(r"&(?:quot|amp|apos|lt|gt);")
_RE_NUM_ENT = re.compile(r"&#(?:x([0-9a-f]+)|([0-9]+));", re.I)
_NAMED_ENT_MAP = {
    "&quot;": '"', "&amp;": "&", "&apos;": "'", "&lt;": "<", "&gt;": ">",
}
RE_WS_ASCII = re.compile(r"\s+", re.A)


def extract(doc: list, raw_html: str) -> dict:
    """metadata.ex:31-74. ``doc`` is the pre-cleaned tree; JSON-LD reads
    the raw pre-parse HTML string (metadata.ex:157-161)."""
    from readability_ex_spark.kernel import title as title_mod

    article_title = title_mod.get_article_title(doc, {"title": ""})
    jsonld = _get_jsonld(raw_html, article_title)
    values = _get_meta_values(doc)

    meta = {
        "title": _first(
            jsonld.get("title"),
            values.get("dc:title"),
            values.get("dcterm:title"),
            values.get("og:title"),
            values.get("weibo:article:title"),
            values.get("weibo:webpage:title"),
            values.get("title"),
            values.get("twitter:title"),
            values.get("parsely-title"),
            article_title,
        ),
        "excerpt": _first(
            jsonld.get("excerpt"),
            values.get("dc:description"),
            values.get("dcterm:description"),
            values.get("og:description"),
            values.get("weibo:article:description"),
            values.get("weibo:webpage:description"),
            values.get("description"),
            values.get("twitter:description"),
        ),
        "byline": _first(
            jsonld.get("byline"),
            values.get("dc:creator"),
            values.get("dcterm:creator"),
            values.get("author"),
            values.get("parsely-author"),
            _article_author(values.get("article:author")),
        ),
        "site_name": _first(jsonld.get("site_name"), values.get("og:site_name")),
        "lang": _html_attr(doc, "lang"),
        "published_time": _first(
            jsonld.get("published_time"),
            values.get("article:published_time"),
            values.get("parsely-pub-date"),
        ),
        "dir": _html_attr(doc, "dir"),
    }
    for k in ("title", "excerpt", "byline", "site_name", "published_time"):
        meta[k] = unescape_html_entities(meta[k])
    return meta


def get_direction(top_id, state) -> str | None:
    """Walk ancestors from top candidate for a non-empty dir attr
    (metadata.ex:76-94)."""
    cur = top_id
    while cur is not None:
        n = state.get(cur)
        if n is None:
            return None
        if n.dir:
            return n.dir
        cur = n.parent_id
    return None


def _first(*vals):
    for v in vals:
        if v is not None:
            return v
    return None


def _get_meta_values(doc: list) -> dict:
    values: dict[str, str] = {}
    for meta in dom.find(doc, "meta"):
        content = meta.attr("content") if meta.has_attr("content") else None
        if content is None or content == "":
            continue
        content = _blank_to_none(content.strip())
        if content is None:
            continue
        prop = meta.attr("property") if meta.has_attr("property") else None
        name = meta.attr("name") if meta.has_attr("name") else None
        matched = _property_match(prop)
        if matched is not None:
            values[matched] = content
        elif name is not None and _NAME_PATTERN.match(name):
            values[_normalize_meta_name(name)] = content
    return values


def _property_match(prop: str | None) -> str | None:
    if prop is None:
        return None
    m = _PROPERTY_PATTERN.search(prop)
    if m is None:
        return None
    return RE_WS_ASCII.sub("", m.group(0).lower())


def _normalize_meta_name(name: str) -> str:
    return RE_WS_ASCII.sub("", name.lower()).replace(".", ":")


def _get_jsonld(raw_html: str, article_title: str) -> dict:
    for m in _RE_JSONLD_SCRIPT.finditer(raw_html):
        decoded = _decode_jsonld(m.group(1), article_title)
        if decoded is not None:
            return decoded
    return {}


def _decode_jsonld(body: str, article_title: str) -> dict | None:
    body = body.strip()
    body = body.replace("<![CDATA[", "").replace("]]>", "").strip()
    try:
        data = json.loads(body)
    except Exception:
        return None
    return _normalize_jsonld(data, article_title)


def _normalize_jsonld(data, article_title: str) -> dict | None:
    if isinstance(data, list):
        data = next((x for x in data if _jsonld_article_type(x)), None)
        if data is None:
            return None
    if not isinstance(data, dict):
        return None
    # @context is required on the object itself before any @graph descent
    # (Readability.js semantics; the reference's @graph-first clause at
    # metadata.ex:202-204 would reject common {@context, @graph} payloads)
    if not _schema_org_context(data.get("@context")):
        return None
    node = data
    if not data.get("@type"):
        node = next(
            (x for x in data.get("@graph", []) if _jsonld_article_type(x)), None
        )
    if node is None or not _jsonld_article_type(node):
        return None
    return {
        "title": _jsonld_title(node.get("name"), node.get("headline"), article_title),
        "byline": _extract_author(node.get("author")),
        "published_time": _blank_to_none(node.get("datePublished")),
        "excerpt": _blank_to_none(node.get("description")),
        "site_name": _publisher_name(node.get("publisher")),
    }


def _extract_author(author):
    """Readability.js accepts only {name: str} or a list of them — a bare
    string author is ignored (tumblr-style JSON-LD '"author": "blogname"'
    must NOT become the byline)."""
    if isinstance(author, dict):
        name = author.get("name")
        return _blank_to_none(name) if isinstance(name, str) else None
    if isinstance(author, list):
        parts = [
            a["name"].strip()
            for a in author
            if isinstance(a, dict) and isinstance(a.get("name"), str)
            and a["name"].strip() != ""
        ]
        return _blank_to_none(", ".join(parts)) if parts else None
    return None


def _jsonld_article_type(node) -> bool:
    if isinstance(node, dict):
        return _jsonld_article_type(node.get("@type"))
    if isinstance(node, str):
        return node in JSONLD_TYPES
    if isinstance(node, list):
        return any(_jsonld_article_type(t) for t in node)
    return False


def _schema_org_context(context) -> bool:
    if isinstance(context, str):
        return bool(_RE_SCHEMA_ORG.match(context))
    if isinstance(context, dict):
        vocab = context.get("@vocab")
        return _schema_org_context(vocab) if vocab is not None else False
    return False


def _publisher_name(publisher):
    if isinstance(publisher, dict):
        return _blank_to_none(publisher.get("name"))
    return None


def _jsonld_title(name, headline, article_title):
    name = _blank_to_none(name) if isinstance(name, str) else None
    headline = _blank_to_none(headline) if isinstance(headline, str) else None
    if name is not None and headline is not None and name != headline:
        name_matches = text_similarity(name, article_title) > 0.75
        headline_matches = text_similarity(headline, article_title) > 0.75
        if headline_matches and not name_matches:
            return headline
        return name
    if name is not None:
        return name
    if headline is not None:
        return headline
    return None


def text_similarity(text_a: str, text_b: str) -> float:
    tokens_a = _tokenize(text_a)
    tokens_b = _tokenize(text_b)
    if not tokens_a or not tokens_b:
        return 0.0
    set_a = set(tokens_a)
    uniq_b = [t for t in tokens_b if t not in set_a]
    distance_b = len(" ".join(uniq_b)) / max(1, len(" ".join(tokens_b)))
    return 1.0 - distance_b


def _tokenize(text) -> list[str]:
    return [t for t in RE_NONWORD.split(str(text).lower()) if t != ""]


def unescape_html_entities(text: str | None) -> str | None:
    """Named quot/amp/apos/lt/gt + numeric entities; invalid -> U+FFFD
    (metadata.ex:326-375)."""
    if text is None or text == "":
        return text

    text = _RE_NAMED_ENT.sub(lambda m: _NAMED_ENT_MAP[m.group(0)], text)

    def num_repl(m):
        hex_part, dec_part = m.group(1), m.group(2)
        s, base = (hex_part, 16) if hex_part is not None else (dec_part, 10)
        try:
            num = int(s, base)
        except ValueError:
            return m.group(0)
        if num == 0 or num > 0x10FFFF or (0xD800 <= num <= 0xDFFF):
            return "�"
        return chr(num)

    return _RE_NUM_ENT.sub(num_repl, text)


def _blank_to_none(s):
    if s is None or not isinstance(s, str):
        return None
    s = s.strip()
    return s if s != "" else None


def _article_author(author):
    if author is None or not isinstance(author, str):
        return None
    author = author.strip()
    if _is_url(author):
        return None
    return _blank_to_none(author)


def _is_url(value: str) -> bool:
    """metadata.ex:398-406: a value with a scheme is a URL — except
    http(s) without a host."""
    try:
        parts = urlsplit(value)
    except ValueError:
        return False
    if parts.scheme == "":
        return False
    if parts.scheme in ("http", "https") and not parts.netloc:
        return False
    return True


def _html_attr(doc: list, attr: str) -> str | None:
    """First html element that *has* the attr (Floki.attribute semantics,
    metadata.ex:408-413)."""
    for el in dom.find(doc, "html"):
        if el.has_attr(attr):
            return _blank_to_none(el.attr(attr))
    return None
