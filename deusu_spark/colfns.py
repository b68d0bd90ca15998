"""Shared JVM column-expression helpers (the "no Python in the hot path"
building blocks). Each has a pure-Python parity twin in textproc.py /
sources.py pinned by tests; these are the versions the hot paths use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Python str.strip() whitespace (ASCII \s plus the unicode spaces Python
# treats as whitespace) — Spark trim() only strips ' ', so strip via regexp.
WS_CLASS = (
    "[\\s\\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f"
    "\\u3000\\x1c-\\x1f]"
)


def strip_col(c):
    """Column twin of Python str.strip()."""
    return F.regexp_replace(c, f"^{WS_CLASS}+|{WS_CLASS}+$", "")


def fold_col(c):
    """JVM twin of textproc.fold(): lowercase, entity decode, umlauts.

    Sequential replaces equal the oracle's single-pass regex because no
    entity is a prefix of another and no replacement text contains '&'
    except &amp;'s, which therefore runs last."""
    from .textproc import _ENTITIES

    c = F.lower(c)
    folded = c
    for k, v in _ENTITIES.items():
        if k == "&amp;" or k != k.lower():
            continue  # uppercase entity names cannot survive lower()
        folded = F.replace(folded, F.lit(k), F.lit(v))
    folded = F.replace(folded, F.lit("&amp;"), F.lit("&"))
    c = F.when(c.contains("&"), folded).otherwise(c)
    for k, v in (("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss")):
        c = F.replace(c, F.lit(k), F.lit(v))
    return c


def not_fill(t):
    """Column twin of `not constants.is_fill_word(t)` (Words.pas:25-89)."""
    from .constants import MIN_TOKEN_LEN, STOPWORDS

    return (F.length(t) >= MIN_TOKEN_LEN) & ~t.isin(sorted(STOPWORDS))
