"""Pure-Python oracle: a line-by-line port of the reference's index build and
query engine (single-process, dict-based). This is the golden standard the
Spark engine must be rank-identical to — scores are uint16-quantized in the
reference (searchservernew.dpr:898-899), so equality is exact, no tolerance.

Ported from /root/reference/src:
  - query normalization:       searchservernew.dpr:1790-1817, 251-284
  - refine (and/not, stop):    searchservernew.dpr:1409-1460
  - optimize (df reorder):     searchservernew.dpr:988-1053, 520-644
  - execution + scoring:       searchservernew.dpr:742-980, 1110-1117
  - host queries:              searchservernew.dpr:298-445
  - two-pass fancy fallback:   searchservernew.dpr:1836-1855, GenDb.dpr:975-1109
  - backlink value curve:      searchservernew.dpr:182-207
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from .. import synth, textproc
from ..constants import (
    DEFAULT_WEIGHTS,
    FANCY_DF_THRESHOLD,
    FANCY_RANK_HI,
    FANCY_RANK_LO,
    LANG_BONUS,
    MAX_QUERY_KEYWORDS,
    MAX_RESULTS,
    PREFER_DE,
    PREFER_EN,
    RANK_FACTOR,
    SCORE_CLAMP,
    UNRANKED_RANK_VALUE,
    is_fill_word,
)


def _round(x: float) -> int:
    """FreePascal Round() = round-half-to-even (banker's rounding), which is
    exactly Python 3's round() on floats."""
    return round(x)


@dataclass
class OracleIndex:
    """In-memory inverted index over a transcripts DataFrame."""

    n_docs: int = 0
    doc_len: list[int] = field(default_factory=list)  # body token count
    # term -> list[(doc_id, flags)] in ascending doc_id order
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    # term -> fancy (pre-filtered) postings, only for df > fancy_threshold
    fancy: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    # per-doc sidecars, indexed by doc_id (reference: searchservernew.dpr:1541-1628)
    filter_data: list[int] = field(default_factory=list)
    rank_data: list[int] = field(default_factory=list)
    host_elements: list[int] = field(default_factory=list)
    backlinks: list[int] = field(default_factory=list)
    # host -> list[doc_id] (hosts.idx, GenDb.dpr:717-906)
    host_postings: dict[str, list[int]] = field(default_factory=dict)
    bl_value: list[float] = field(default_factory=list)
    doc_keys: list[tuple[str, int]] = field(default_factory=list)
    # logical deletions (tombstones): masked at postings access, while
    # df()/doc_len/avgdl stay as built — survivors keep exact pre-deletion
    # scores, matching both engines' decode-time masking contract
    deleted: set[int] = field(default_factory=set)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))


def build_index(
    transcripts: pd.DataFrame, fancy_threshold: int = FANCY_DF_THRESHOLD
) -> OracleIndex:
    """Build the oracle index: stable (conv_id, turn_idx) order, dense doc_id
    (GenDb.dpr:256,426), per-doc sidecars, per-term postings with location
    flags, fancy lists."""
    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    idx = OracleIndex(n_docs=len(df))

    max_bl = 0
    for doc_id, row in enumerate(df.itertuples(index=False)):
        url = synth.doc_url(row.conv_id, int(row.turn_idx))
        title = row.role
        desc = row.text[:255].strip()
        terms, dl, is_german = textproc.doc_terms(row.text, title, row.tool)
        idx.doc_len.append(dl)

        url_l, title_l, desc_l = url.lower(), title.lower(), desc.lower()
        for t in terms:
            flags = textproc.posting_flags(t, url_l, title_l, desc_l)
            idx.postings.setdefault(t, []).append((doc_id, flags))

        host = row.conv_id
        idx.host_postings.setdefault(host, []).append(doc_id)
        idx.filter_data.append(textproc.filter_byte(url, is_german))
        rank2 = textproc.domain_data_byte(url)
        idx.host_elements.append((rank2 & 15) + 1)
        idx.rank_data.append(synth.doc_domain_rank(host))
        bl = synth.doc_backlinks(url)
        idx.backlinks.append(bl)
        max_bl = max(max_bl, bl)
        idx.doc_keys.append((row.conv_id, int(row.turn_idx)))

    # InitBackLinkValueArray — searchservernew.dpr:182-197
    ln_mbl = math.log(max_bl) if max_bl > 0 else 0.0
    idx.bl_value = [
        1.0 if i == 0 else (2500.0 * math.log(i) / ln_mbl if ln_mbl > 0 else 0.0)
        for i in range(max_bl + 1)
    ]

    # fancy lists — GenDb.dpr:1053-1071: df > threshold, keep docs with
    # 0 < domain_rank < 200000
    for t, plist in idx.postings.items():
        if len(plist) > fancy_threshold:
            idx.fancy[t] = [
                (d, f)
                for (d, f) in plist
                if FANCY_RANK_LO < idx.rank_data[d] < FANCY_RANK_HI
            ]
    return idx


# ---------------------------------------------------------------------------
# Query compilation
# ---------------------------------------------------------------------------

_KILL_CHARS = set('"/&*,+')  # searchservernew.dpr:256-258


def extract_keywords(query: str) -> list[str]:
    """searchservernew.dpr:1790-1817 (fold) + 251-284 (ExtractKeywords)."""
    q = textproc.fold(query)
    q = "".join(" " if c in _KILL_CHARS else c for c in q)
    return q.split()[:MAX_QUERY_KEYWORDS]


def refine_search(keywords: list[str]) -> list[str]:
    """searchservernew.dpr:1409-1460 — infix and/und → '+', not/nicht → '-',
    then stopword removal (on the raw keyword *including* any prefix, exactly
    like the reference)."""
    kws = list(keywords)
    i = 0
    while i < len(kws) - 1:
        if kws[i] in ("und", "and"):
            s = kws[i + 1].lstrip()
            if s[:1] in "+-":
                s = s[1:]
            kws[i + 1] = "+" + s
            del kws[i]
        elif kws[i] in ("nicht", "not"):
            s = kws[i + 1]
            if s[:1] in "+-":
                s = s[1:]
            kws[i + 1] = "-" + s
            del kws[i]
        else:
            i += 1
    return [k for k in kws if not is_fill_word(k)]


@dataclass
class QueryTerm:
    raw: str  # keyword incl. any +/- prefix, as stored in KeyWords[]
    key: str  # prefix-stripped keyword (may carry host:/inurl:/intitle:)
    action: str  # 'SET' | 'AND' | 'NOT'
    df: int = 0


def _strip_prefix(kw: str) -> tuple[str, str]:
    if kw.startswith("+"):
        return kw[1:], "AND"
    if kw.startswith("-"):
        return kw[1:], "NOT"
    return kw, "AND"


def _host_key(key: str) -> str | None:
    """Host-query detection — searchservernew.dpr:696-736,541-565."""
    kl = key.lower()
    if kl.startswith(("host:", "site:")):
        return key[5:]
    if kl.startswith("www."):
        return key
    if kl.endswith(".de") or kl.endswith(".com"):
        return "www." + key
    return None


def optimize_query(idx: OracleIndex, keywords: list[str]) -> list[QueryTerm]:
    """searchservernew.dpr:988-1053 (OptimizeQuery): assign actions, look up
    df, auto host-rewrite of unknown www*/*com/*de terms
    (:631-643), then bubble sort ANDs-before-NOTs and ANDs ascending df."""
    terms: list[QueryTerm] = []
    for kw in keywords:
        key, action = _strip_prefix(kw)
        df = 0
        if _host_key(key) is None and not key.lower().startswith(("inurl:", "intitle:")):
            if ":" not in key:
                df = idx.df(key)
                if df == 0:
                    # auto host-rewrite — searchservernew.dpr:631-643
                    k = key
                    rewritten = False
                    if k.lower()[:3] == "www":
                        k = k[:3] + "." + k[3:]
                        rewritten = True
                    if k.lower()[-3:] == "com":
                        k = k[:-3] + "." + k[-3:]
                        rewritten = True
                    if k.lower()[-2:] == "de":
                        k = k[:-2] + "." + k[-2:]
                        rewritten = True
                    if rewritten:
                        # the rewrite replaces KeyWords[i] losing the prefix
                        kw = "host:" + k
                        key = "host:" + k
            else:
                df = 0  # 'inurl:x' etc. probe the literal key → not found
        terms.append(QueryTerm(raw=kw, key=key, action=action, df=df))

    # re-derive action from the (possibly rewritten) raw keyword, mirroring
    # FindKeys re-parsing KeyWords[i] — searchservernew.dpr:1121-1134
    for t in terms:
        key, action = _strip_prefix(t.raw)
        t.key, t.action = key, action

    changed = True
    while changed:
        changed = False
        for i in range(len(terms) - 1):
            a, b = terms[i], terms[i + 1]
            if a.action != "AND" and b.action == "AND":
                terms[i], terms[i + 1] = b, a
                changed = True
            elif a.action == "AND" and b.action == "AND" and b.df < a.df:
                terms[i], terms[i + 1] = b, a
                changed = True
    return terms


# ---------------------------------------------------------------------------
# Execution + scoring
# ---------------------------------------------------------------------------


def idf(n_docs: int, df: int) -> float:
    """BM25-style IDF — searchservernew.dpr:1110-1117 (note the plus in the
    numerator, log base 10, and the +11 floor)."""
    return math.log10(11.0 + (n_docs + df + 0.5) / (df + 0.5))


def _score_posting(
    idx: OracleIndex,
    doc: int,
    flags: int,
    term_idf: float,
    w: dict[str, int],
    include_backlink: bool,
) -> int:
    """Generic-path per-posting score — searchservernew.dpr:874-899. The fast
    AND path (:445-508) is identical except the backlink add is commented out
    (:491) — expressed here via include_backlink."""
    fd = idx.filter_data[doc]
    v = w["b1"]
    if flags & 1:
        v += w["b2"]
    if flags & 2:
        v += w["b3"]
    if flags & 4:
        v += w["b4"]
    if fd & 128:
        v += w["b5"]
    if fd & 64:
        v += w["b6"]
    if PREFER_DE and (fd & 32):
        v += LANG_BONUS
    if PREFER_EN and not (fd & 32):
        v += LANG_BONUS
    v += (31 - (fd & 31)) * w["b7"]

    rank_v = idx.rank_data[doc] + 1
    if rank_v == 0:
        rank_v = UNRANKED_RANK_VALUE
    if include_backlink:
        v += _round(idx.bl_value[idx.backlinks[doc]])
    v = _round((1.0 - rank_v * RANK_FACTOR) * v / idx.host_elements[doc] * term_idf)
    return min(v, SCORE_CLAMP)


def search(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    weights: dict[str, int] | None = None,
) -> list[tuple[int, int]]:
    """Full two-pass query — searchservernew.dpr:1836-1855. Returns the
    top-k [(doc_id, score)] ordered by (score desc, doc_id asc)."""
    w = dict(DEFAULT_WEIGHTS)
    if weights:
        w.update(weights)
    keywords = refine_search(extract_keywords(query))
    if not keywords:
        return []
    terms = optimize_query(idx, keywords)

    result = _run_pass(idx, terms, w, use_fancy=True)
    if len(result) < MAX_RESULTS:
        result = _run_pass(idx, terms, w, use_fancy=False)

    ordered = sorted(result.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[:k]


def _run_pass(
    idx: OracleIndex,
    terms: list[QueryTerm],
    w: dict[str, int],
    use_fancy: bool,
) -> dict[int, int]:
    """One FindKeys pass — searchservernew.dpr:1106-1148. Sequential term
    processing with acSet/acAnd/acNot; candidates dict plays the bitfield +
    Values arrays."""
    cand: dict[int, int] = {}
    for i, t in enumerate(terms):
        # FindKeys: first term is always acSet, even a '-' one
        # (searchservernew.dpr:1138-1146)
        action = "SET" if i == 0 else t.action
        term_idf = idf(idx.n_docs, t.df)

        host = _host_key(t.key)
        if host is not None:
            cand = _process_host(idx, cand, host, action, w)
        else:
            key = t.key
            kl = key.lower()
            url_only = title_only = False
            if kl.startswith("inurl:"):
                url_only, key = True, key[6:]
            elif kl.startswith("intitle:"):
                title_only, key = True, key[8:]

            plist = idx.postings.get(key, [])
            if use_fancy and key in idx.fancy:
                plist = idx.fancy[key]
            if idx.deleted:
                plist = [(d, f) for d, f in plist if d not in idx.deleted]

            # backlink-add asymmetry — searchservernew.dpr:491 vs :893
            include_bl = action == "SET" or (action == "AND" and (url_only or title_only))

            if action == "SET":
                new: dict[int, int] = {}
                for doc, flags in plist:
                    if url_only and not (flags & 4):
                        continue
                    if title_only and not (flags & 2):
                        continue
                    new[doc] = _score_posting(idx, doc, flags, term_idf, w, include_bl)
                cand = new
            elif action == "AND":
                matched: dict[int, int] = {}
                for doc, flags in plist:
                    if url_only and not (flags & 4):
                        continue
                    if title_only and not (flags & 2):
                        continue
                    if doc in cand:
                        matched[doc] = min(
                            cand[doc]
                            + _score_posting(idx, doc, flags, term_idf, w, include_bl),
                            SCORE_CLAMP,
                        )
                cand = matched
            else:  # NOT
                for doc, flags in plist:
                    if url_only and not (flags & 4):
                        continue
                    if title_only and not (flags & 2):
                        continue
                    cand.pop(doc, None)
        if action == "AND" and not cand:
            return {}  # EarlyAbort — searchservernew.dpr:949-959
    return cand


def search_bm25(
    idx: OracleIndex, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75
) -> list[tuple[int, float]]:
    """Textbook BM25 (binary TF) oracle — the engine's mode='bm25' twin.
    Same boolean semantics as search(); single full-postings pass; host terms
    filter but contribute 0."""
    keywords = refine_search(extract_keywords(query))
    if not keywords:
        return []
    terms = optimize_query(idx, keywords)
    avgdl = sum(idx.doc_len) / max(len(idx.doc_len), 1)
    cand: dict[int, float] = {}
    for i, t in enumerate(terms):
        action = "SET" if i == 0 else t.action
        host = _host_key(t.key)
        if host is not None:
            docs = set(idx.host_postings.get(host, [])) - idx.deleted
            if action == "SET":
                cand = {d: 0.0 for d in sorted(docs)}
            elif action == "AND":
                cand = {d: v for d, v in cand.items() if d in docs}
            else:
                cand = {d: v for d, v in cand.items() if d not in docs}
            continue
        key = t.key
        kl = key.lower()
        url_only = title_only = False
        if kl.startswith("inurl:"):
            url_only, key = True, key[6:]
        elif kl.startswith("intitle:"):
            title_only, key = True, key[8:]
        plist = [
            (d, f)
            for d, f in idx.postings.get(key, [])
            if (not url_only or f & 4)
            and (not title_only or f & 2)
            and d not in idx.deleted
        ]
        df = t.df
        idf = math.log(1.0 + (idx.n_docs - df + 0.5) / (df + 0.5))

        def w(d: int) -> float:
            return idf * (k1 + 1.0) / (
                1.0 + k1 * (1 - b + b * idx.doc_len[d] / avgdl)
            )

        if action == "SET":
            cand = {d: w(d) for d, _ in plist}
        elif action == "AND":
            cand = {d: cand[d] + w(d) for d, _ in plist if d in cand}
        else:
            for d, _ in plist:
                cand.pop(d, None)
    ordered = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, round(s, 6)) for d, s in ordered[:k]]


def _process_host(
    idx: OracleIndex,
    cand: dict[int, int],
    host: str,
    action: str,
    w: dict[str, int],
) -> dict[int, int]:
    """FindThisHost — searchservernew.dpr:298-445. Host scoring is
    b1 + url-length bonus (+ backlink value on acSet only), min-clamped to 1;
    no IDF / rank / host-elements."""
    docs = idx.host_postings.get(host, [])
    if idx.deleted:
        docs = [d for d in docs if d not in idx.deleted]
    if action == "SET":
        new: dict[int, int] = {}
        for doc in docs:
            fd = idx.filter_data[doc]
            v = w["b1"] + (31 - (fd & 31)) * w["b7"]
            v += _round(idx.bl_value[idx.backlinks[doc]])
            v = max(1, min(v, SCORE_CLAMP))
            new[doc] = v
        return new
    if action == "AND":
        matched: dict[int, int] = {}
        for doc in docs:
            if doc in cand:
                fd = idx.filter_data[doc]
                v = w["b1"] + (31 - (fd & 31)) * w["b7"]
                v = max(1, min(v, SCORE_CLAMP))
                matched[doc] = min(cand[doc] + v, SCORE_CLAMP)
        return matched
    for doc in docs:  # NOT
        cand.pop(doc, None)
    return cand


def with_deletions(idx: OracleIndex, doc_ids) -> OracleIndex:
    """A view of ``idx`` with the given doc_ids logically deleted — the
    oracle twin of incremental.delete_conversations + decode-time masking.
    Shares all built structures; only the tombstone set differs, so corpus
    statistics (df, idf, doc_len) intentionally stay as built."""
    import dataclasses

    return dataclasses.replace(idx, deleted=set(idx.deleted) | set(doc_ids))
