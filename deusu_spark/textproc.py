"""Text normalization + tokenization (reference parity layer).

Pure-Python/regex functions mirroring the reference's parser so that the
index side and the query side fold text identically — the reference keeps
these twinned by hand (ParserClass.pas:436-528 vs searchservernew.dpr:
1790-1817); we keep them twinned by sharing this module.

The heavy path (per-document tokenization during the index build) is invoked
from Arrow-batched pandas UDFs in build.py — never from row-at-a-time Python
UDFs.
"""

from __future__ import annotations

import re

from .constants import (
    FLAG_IN_DESCRIPTION,
    FLAG_IN_TITLE,
    FLAG_IN_URL,
    GERMAN_WORDS,
    MAX_TERMS_PER_DOC,
    MAX_TOKEN_LEN,
    is_fill_word,
)

# HTML entity subset handled by the reference parser
# (ParserClass.pas:458-510): &auml; &ouml; &uuml; &Auml; &Ouml; &Uuml;
# &szlig; &amp; &nbsp;  (&reg;/&copy; map to symbols the tokenizer drops).
_ENTITIES = {
    "&auml;": "ae",
    "&ouml;": "oe",
    "&uuml;": "ue",
    "&Auml;": "ae",
    "&Ouml;": "oe",
    "&Uuml;": "ue",
    "&szlig;": "ss",
    "&amp;": "&",
    "&nbsp;": " ",
    "&reg;": " ",
    "&copy;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))

# Umlaut transliteration — ParserClass.pas:444-456,520-528 (index side) and
# searchservernew.dpr:1796-1817 (query side): UTF-8 C3-xx umlauts fold to
# two-letter ASCII. We operate on decoded Python strings, so the mapping is
# by codepoint.
_UMLAUTS = str.maketrans(
    {
        "ä": "ae",  # ä
        "ö": "oe",  # ö
        "ü": "ue",  # ü
        "Ä": "ae",  # Ä (lowercased later anyway)
        "Ö": "oe",
        "Ü": "ue",
        "ß": "ss",  # ß
    }
)


def fold(s: str) -> str:
    """Lowercase + entity decode + umlaut transliteration.

    Must be applied identically on the index side and the query side
    (SURVEY §2.2 P2). Lowercasing happens first, exactly like the query
    server (searchservernew.dpr:1793 AnsiLowerCase before the fold loop).
    """
    s = s.lower()
    if "&" in s:
        s = _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    return s.translate(_UMLAUTS)


# Body tokenizer — ParserClass.pas:1173-1204: token starts with [a-z0-9],
# continues with [a-z0-9_-], max 255 chars (overlong tails are consumed and
# dropped, which for a regex equals "truncate to 255").
_BODY_TOKEN_RE = re.compile(r"[a-z0-9][a-z0-9_\-]*")

# Title tokenizer — ParserClass.pas:1136-1149: runs of [a-z_-] only (digits
# split title tokens), applied to the first 255 chars of the title.
_TITLE_TOKEN_RE = re.compile(r"[a-z_\-]+")


def body_tokens(folded: str) -> list[str]:
    """Tokens of already-folded body text (ParserClass.pas:1173-1204)."""
    return [t[:MAX_TOKEN_LEN] for t in _BODY_TOKEN_RE.findall(folded)]


def title_tokens(folded_title: str) -> list[str]:
    """Tokens of an already-folded title (ParserClass.pas:1136-1149)."""
    return [t[:MAX_TOKEN_LEN] for t in _TITLE_TOKEN_RE.findall(folded_title[:255].strip())]


def doc_terms(text: str, title: str, extra: str = "") -> tuple[list[str], int, bool]:
    """Distinct indexable terms of one document, in first-encounter order.

    Mirrors the parser's liWords accumulation (ParserClass.pas:168-172 sorted
    dupIgnore list + AddToWordList:710-714 stopword gate + cMaxKeywords cap):
    title tokens first (ParserClass.pas:1136-1149), then body tokens
    (:1173-1204), then description tokens (:1206-1239). For transcripts the
    mapping is title := role, body := text, extra := tool (SURVEY §7.4).

    Returns (terms, body_token_count, is_german). body_token_count is the
    document length used by the textbook-BM25 mode (the reference computes
    WordCount but discards it for scoring, SURVEY §2.6). is_german is the
    any-token German test (ParserClass.pas:1199-1200 + Words.pas:92-155).
    """
    ftext = fold(text)
    btoks = body_tokens(ftext)
    seen: dict[str, None] = {}
    for t in title_tokens(fold(title)):
        if not is_fill_word(t):
            seen.setdefault(t, None)
    is_german = False
    for t in btoks:
        if not is_german and t in GERMAN_WORDS:
            is_german = True
        if not is_fill_word(t):
            seen.setdefault(t, None)
    if extra:
        for t in body_tokens(fold(extra)):
            if not is_fill_word(t):
                seen.setdefault(t, None)
    terms = list(seen)[:MAX_TERMS_PER_DOC]
    return terms, len(btoks), is_german


def posting_flags(term: str, url_l: str, title_l: str, desc_l: str) -> int:
    """Location flags per (term, doc) — ImportData.dpr:316-320.

    Substring containment (Pascal Pos()) against the *lowercased* url, title
    and description — NOT a token match.
    """
    f = 0
    if term in url_l:
        f |= FLAG_IN_URL
    if term in title_l:
        f |= FLAG_IN_TITLE
    if term in desc_l:
        f |= FLAG_IN_DESCRIPTION
    return f


def filter_byte(url: str, is_german: bool) -> int:
    """The per-doc filter.dat byte — GenDb.dpr:381-402."""
    b = 0
    slash = url.find("/") + 1  # 1-based like Pascal Pos(); 0 = not found
    if slash == len(url) and slash > 0:
        b |= 128
    if url.lower().startswith("www.") and slash > 1 and url[slash - 2] != ".":
        b |= 64
    if is_german:
        b |= 32
    u = url[4:] if url.lower().startswith("www.") else url
    b |= min(max(len(u) - 1, 0), 31)
    return b


def domain_data_byte(url: str) -> int:
    """The rank2.dat byte — GenDb.dpr:111-156 (CalcDomainData).

    Input is the URL with any leading 'www.' already stripped
    (GenDb.dpr:376-378). (path_elements << 4) | host_elements, capped 15.
    """
    path_elements = url.count("/") + 1
    if url.endswith("/"):
        path_elements -= 1
    host = url.split("/", 1)[0]
    host_elements = host.count(".") + 1
    return (min(path_elements, 15) << 4) | min(host_elements, 15)
