"""Regexes, tag sets, and flags of the extraction algorithm.

Mirrors /root/reference/lib/readability_ex/constants.ex (the reference's
pinned variant of Mozilla Readability's REGEXPS).
"""

from __future__ import annotations

import re

# Flags (constants.ex:4-22)
FLAG_STRIP_UNLIKELYS = 0x1
FLAG_WEIGHT_CLASSES = 0x2
FLAG_CLEAN_CONDITIONALLY = 0x4
FLAG_ALL = FLAG_STRIP_UNLIKELYS | FLAG_WEIGHT_CLASSES | FLAG_CLEAN_CONDITIONALLY
FLAG_NO_STRIP_UNLIKELYS = FLAG_WEIGHT_CLASSES | FLAG_CLEAN_CONDITIONALLY
FLAG_NO_WEIGHT_CLASSES = FLAG_STRIP_UNLIKELYS | FLAG_CLEAN_CONDITIONALLY
FLAG_NO_CLEAN_CONDITIONALLY = FLAG_STRIP_UNLIKELYS | FLAG_WEIGHT_CLASSES

# Multi-pass order: Readability.js removes flags CUMULATIVELY
# (00_original_code.js _removeFlag chain: ALL -> weight+clean -> clean
# -> none). The reference instead tries four independent configs
# (readability_ex.ex:35-40) — the goldens encode the cumulative order.
FLAG_PASSES = [
    FLAG_ALL,
    FLAG_WEIGHT_CLASSES | FLAG_CLEAN_CONDITIONALLY,
    FLAG_CLEAN_CONDITIONALLY,
    0,
]


def has_flag(flags: int, f: int) -> bool:
    return (flags & f) > 0


# Tag sets (constants.ex:27-31)
CANDIDATE_TAGS = frozenset(["section", "h2", "h3", "h4", "h5", "h6", "p", "td", "pre"])
STRUCTURAL_TAGS = frozenset(["div", "section", "article", "main"])
HEADER_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

# ARIA roles dropped early (constants.ex:34-44)
UNLIKELY_ROLES = frozenset(
    ["menu", "menubar", "complementary", "navigation", "alert", "alertdialog", "dialog"]
)

# Class/id weighting regexes (constants.ex:47-58)
RE_POSITIVE = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post|text|blog|story",
    re.I,
)
RE_NEGATIVE = re.compile(
    r"-ad-|hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|footer|gdpr"
    r"|masthead|media|meta|outbrain|promo|related|scroll|share|shoutbox|sidebar"
    r"|skyscraper|sponsor|shopping|tags|widget",
    re.I,
)
RE_UNLIKELY = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|disqus|extra"
    r"|footer|gdpr|header|legends|menu|related|remark|replies|rss|shoutbox|sidebar"
    r"|skyscraper|social|sponsor|supplemental|ad-break|agegate|pagination|pager|popup"
    r"|yom-remote",
    re.I,
)
RE_OK_MAYBE = re.compile(r"and|article|body|column|content|main|mathjax|shadow", re.I)
RE_BYLINE = re.compile(r"byline|author|dateline|writtenby|p-author", re.I)

# Comma variants (constants.ex:62-65): , U+060C U+FE50 U+FE10 U+FE11
# U+2E01 U+2E34 U+2E32 U+FF0C
RE_COMMAS = re.compile(
    "[,،﹐︐︑⸁⸴⸲，]"
)

DEFAULT_CHAR_THRESHOLD = 500

# Ad / loading word blocks (constants.ex:69-73)
RE_AD_WORDS = re.compile(
    r"^(ad(vertising|vertisement)?|pub(licité)?|werb(ung)?|广告"
    r"|Реклама|Anuncio)$",
    re.I | re.U,
)
RE_LOADING_WORDS = re.compile(
    r"^((loading|正在加载|Загрузка"
    r"|chargement|cargando)(…|\.\.\.)?)$",
    re.I | re.U,
)

# NB: Elixir PCRE without (*UCP) keeps \b/\s/\W ASCII-only even with /u;
# Python's default is Unicode-aware, so translated patterns use re.ASCII.
RE_SHARE_ELEMENTS = re.compile(r"(\b|_)(share|sharedaddy)(\b|_)", re.I | re.A)

RE_NEXT_LINK = re.compile(r"(next|weiter|continue|>([^\|]|$)|»([^\|]|$))", re.I)
RE_PREV_LINK = re.compile(r"(prev|earl|old|new|<|«)", re.I)

# Allowed video embed hosts (constants.ex:80-82)
RE_ALLOWED_VIDEO = re.compile(
    r"//(www\.)?((dailymotion|youtube|youtube-nocookie|player\.vimeo|v\.qq|bilibili"
    r"|live\.bilibili)\.com|(archive|upload\.wikimedia)\.org|player\.twitch\.tv)",
    re.I,
)

# Lazy-image source attributes (constants.ex:84-101)
LAZY_SRC_ATTRS = [
    "data-src",
    "data-srcset",
    "data-original",
    "data-orig-src",
    "data-lazy-src",
    "data-lazy-srcset",
    "data-actualsrc",
    "data-hires",
    "data-url",
    "data-img-url",
    "data-image",
    "data-placeholder",
    "data-fullsrc",
    "data-full-src",
]

RE_URLISH_IMAGE = re.compile(r"\.(png|jpe?g|webp|gif|avif)(\?|#|$)", re.I)

# Tag score bases (sieve.ex:645-668)
TAG_SCORE_BASE = {
    "div": 5,
    "pre": 3,
    "td": 3,
    "blockquote": 3,
    "address": -3,
    "ol": -3,
    "ul": -3,
    "dl": -3,
    "dd": -3,
    "dt": -3,
    "li": -3,
    "form": -3,
    "h1": -5,
    "h2": -5,
    "h3": -5,
    "h4": -5,
    "h5": -5,
    "h6": -5,
    "th": -5,
}

# Phrasing content elements (cleaner.ex:6-46), lowercase
PHRASING_ELEMS = frozenset(
    [
        "abbr", "audio", "b", "bdo", "br", "button", "cite", "code", "data",
        "datalist", "dfn", "em", "embed", "i", "img", "input", "kbd", "label",
        "mark", "math", "meter", "noscript", "object", "output", "progress",
        "q", "ruby", "samp", "script", "select", "small", "span", "strong",
        "sub", "sup", "textarea", "time", "var", "wbr",
    ]
)

# Block-level tags (cleaner.ex:505-540)
BLOCK_TAGS = frozenset(
    [
        "address", "article", "aside", "blockquote", "canvas", "details",
        "div", "dl", "fieldset", "figcaption", "figure", "footer", "form",
        "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "main",
        "menu", "meta", "nav", "ol", "p", "pre", "section", "table", "ul",
    ]
)

# Presentational attributes dropped by clean_styles (cleaner.ex:1883-1898)
PRESENTATIONAL_ATTRS = frozenset(
    [
        "align", "background", "bgcolor", "border", "cellpadding",
        "cellspacing", "frame", "hspace", "rules", "style", "valign", "vspace",
    ]
)

# Word-ish tokenizer used by text similarity (sieve.ex:153-157): Elixir
# ~r/\W+/u is ASCII \W (PCRE /u does not imply UCP).
RE_NONWORD = re.compile(r"\W+", re.A)
RE_WHITESPACE = re.compile(r"\s+", re.A)
