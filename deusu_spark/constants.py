"""Shared constants of the DeuSu-on-Spark engine.

Everything here is derived from the reference implementation (read-only at
/root/reference) and re-stated as data so that the Spark engine, the pure
Python oracle and the tests all agree on one single source of truth.

Reference citations use ``file:line`` of /root/reference/src.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Stopwords ("fill words") — Words.pas:25-89 (IsFillWord), verbatim list.
# Applied identically at index time (ParserClass.pas:710-714 AddToWordList)
# and at query time (searchservernew.dpr:1448-1458 RefineSearch).
# ---------------------------------------------------------------------------
STOPWORDS = frozenset(
    """
    and auf an als auch am alle aus
    bitte bei bis
    du der die das den dem de diese dr durch des
    er es ein eine eines einer einen
    fuer
    he
    ich ihr it im ist in
    mit
    not nicht nach nbsp
    oder or
    sie she sind sich
    the to
    und ueber uns
    von
    wir we werden
    you
    zu zur zum
    """.split()
)

# Words.pas:25-33: words of length < 2 are always fill words.
MIN_TOKEN_LEN = 2


def is_fill_word(s: str) -> bool:
    """Words.pas:25-89 — True for stopwords and any token shorter than 2."""
    return len(s) < MIN_TOKEN_LEN or s in STOPWORDS


# ---------------------------------------------------------------------------
# German detection word list — Words.pas:92-155 (IsGerman). A document is
# German as soon as any single token matches (ParserClass.pas:1199-1200).
# ---------------------------------------------------------------------------
GERMAN_WORDS = frozenset(
    """
    auf auch
    bitte beim bzw
    dessen dass durch diese dieser dokumente damit daran darauf denen denn
    diesem deutschen
    eine einer eines einen einem erhalten
    haben heute
    ist ihre ihren ihnen
    koennen kann
    mehr
    nicht nur noch nachrichten nach
    oder offizielle
    sich sind sowie
    ueber unter uns und unsere
    wir wie wird weitere wenn weiter wurde
    zu zur zum zurueck
    """.split()
)

# ---------------------------------------------------------------------------
# Posting flag bits — DbTypes.pas:119-127 (THit) + ImportData.dpr:316-320.
# flags bit0 = keyword is a substring of lower(description)
# flags bit1 = keyword is a substring of lower(title)
# flags bit2 = keyword is a substring of lower(url)
# ---------------------------------------------------------------------------
FLAG_IN_DESCRIPTION = 1
FLAG_IN_TITLE = 2
FLAG_IN_URL = 4

# ---------------------------------------------------------------------------
# filter.dat byte — GenDb.dpr:381-402.
# bit7 = URL is a domain root (first '/' is the last char)
# bit6 = URL starts with 'www.' and char before the first '/' is not '.'
# bit5 = page is German
# bits0-4 = min(max(len(url_without_www) - 1, 0), 31)
# ---------------------------------------------------------------------------
FILTER_DOMAIN_ROOT = 128
FILTER_WWW_PREFIX = 64
FILTER_GERMAN = 32
FILTER_URLLEN_MASK = 31

# rank2 byte — GenDb.dpr:111-156 (CalcDomainData):
# (path_elements << 4) | host_elements, both capped at 15; host_elements is
# the only part used at query time: (rank2 & 15) + 1, searchservernew.dpr:888.

# ---------------------------------------------------------------------------
# Index geometry
# ---------------------------------------------------------------------------
# Term partition count: *always* 64 — GenDb.dpr:349 ("crc32(kw) and 63"),
# GenDb.dpr:1018-1020.
N_TERM_BUCKETS = 64

# Max distinct terms indexed per document — DbTypes.pas:67 (cMaxKeywords).
MAX_TERMS_PER_DOC = 10_000

# Max shortstring token length — ParserClass.pas:1190-1195.
MAX_TOKEN_LEN = 255

# Fancy-hits ("top postings") static-pruning policy — GenDb.dpr:1053,1063:
# terms with df > 100_000 get an accelerator list restricted to documents
# with 0 < domain_rank < 200_000. Configurable so small test corpora can
# exercise the two-pass path.
FANCY_DF_THRESHOLD = 100_000
FANCY_RANK_LO = 0  # exclusive
FANCY_RANK_HI = 200_000  # exclusive

# Build-stats report (info.txt) — GenDb.dpr:658-659,692-693: terms with
# df >= 100_000 are listed, plus UniqueWords / WordOccurences totals.
INFO_DF_THRESHOLD = 100_000
# driver-safety cap on the listed terms (the reference has no cap; at
# 10^12 docs the >=100k-df vocabulary could be huge)
INFO_TERM_LIST_CAP = 10_000

# Query-side limits — searchservernew.dpr:47 (cMaxKeywords=10),
# :1328 (top-1000), :1820-1821 (startwith 1..991, showcount 10..1000).
MAX_QUERY_KEYWORDS = 10
MAX_RESULTS = 1000
SCORE_CLAMP = 65535

# Default ranking weights — searchservernew.dpr:1771-1787. b1..b6 are
# multiplied by 256; b7 is raw.
DEFAULT_WEIGHTS = {
    "b1": 8 * 256,
    "b2": 2 * 256,
    "b3": 2 * 256,
    "b4": 1 * 256,
    "b5": 1 * 256,
    "b6": 1 * 256,
    "b7": 1,
}

# Language preference — hardcoded at searchservernew.dpr:1822-1823.
PREFER_DE = True
PREFER_EN = False

# Domain-rank factor — searchservernew.dpr:894.
RANK_FACTOR = 0.000000027
# RankData of -1 means "unranked": rank+1 == 0 is remapped to 1000001
# (searchservernew.dpr:886,891).
UNRANKED_RANK_VALUE = 1000001

# Language bonus — searchservernew.dpr:882-883.
LANG_BONUS = 10

# Backlink value curve — searchservernew.dpr:182-197 (InitBackLinkValueArray):
# value(0) = 1.0, value(i) = 2500 * ln(i) / ln(max_backlinks).
BACKLINK_SCALE = 2500.0

# Posting segment size (postings per binary blob row). The reference streams
# postings in chunks of 32768 (cMaxTempPages, searchservernew.dpr:48); we make
# the chunk a durable unit so that hot terms parallelize across tasks and no
# single parquet cell grows unboundedly at 10^12-turn scale.
SEGMENT_SIZE = 32768
