"""Proximity-RANKED retrieval (round-5: the natural next query feature on
the positions sidecar, per the round-4 verdict): AND results re-ranked by
base score + PROXIMITY_SCALE // (minimal_window_span − n_terms + 1).

Pinned the same way NEAR was: a brute-force window sweep over the raw
text is the oracle for the minimal span, the expected ranking is
recomputed independently from search() scores + that oracle, and all
three engine tiers (distributed SearchEngine, serving LocalSearcher,
ShardedSearcher coordinator) must agree exactly.
"""

from itertools import product

import numpy as np
import pandas as pd
import pytest

from deusu_spark import positions as posmod
from deusu_spark.build import build_index
from deusu_spark.positions import (
    PROXIMITY_SCALE,
    min_cover_window,
    proximity_boost,
)
from deusu_spark.query import SearchEngine
from deusu_spark.query_local import LocalSearcher, ShardedSearcher
from deusu_spark.textproc import body_tokens, fold
from tests.test_positions import TEXTS

# extra docs engineered so equal-base-score docs differ ONLY in proximity
PROX_TEXTS = TEXTS + [
    "zebra yak together here now",             # 10: adjacent pair
    "zebra one two three four five six yak",   # 11: span 8
    "zebra gap yak",                           # 12: span 3
]


def _brute_span(text: str, uniq: list[str]) -> int | None:
    toks = body_tokens(fold(text))
    lists = []
    for t in uniq:
        p = [i for i, tok in enumerate(toks) if tok == t]
        if not p:
            return None
        lists.append(p)
    return min(max(c) - min(c) + 1 for c in product(*lists))


def _expected(eng, doc_text, query: str, k: int):
    terms = [t for _, t in posmod.phrase_pattern(query)]
    uniq = list(dict.fromkeys(terms))
    base = eng.search(" ".join(terms), k=10_000)
    rows = []
    for d, s in base:
        span = _brute_span(doc_text[d], uniq)
        rows.append((int(s) + proximity_boost(span, len(uniq)), d))
    rows.sort(key=lambda x: (-x[0], x[1]))
    return [(d, s) for s, d in rows[:k]]


@pytest.fixture(scope="module")
def prox_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prox_idx"))
    pdf = pd.DataFrame(
        [(f"conv{i:04d}", 0, "user", t, "") for i, t in enumerate(PROX_TEXTS)],
        columns=["conv_id", "turn_idx", "role", "text", "tool"],
    )
    build_index(
        spark, spark.createDataFrame(pdf), d,
        fancy_threshold=10**9, seg_size=3, positions=True,
    )
    eng = SearchEngine(spark, d)
    url_to_text = {f"conv{i:04d}/0": t for i, t in enumerate(PROX_TEXTS)}
    doc_text = {
        r["doc_id"]: url_to_text[r["url"]]
        for r in eng.docmeta.select("doc_id", "url").collect()
    }
    return d, eng, doc_text


QUERIES = [
    "zebra yak",
    "quick fox",
    "brown fox",
    "linux kernel",
    "fox dog",
    "quick brown fox",
    "alphaonly zebra",   # no co-occurring doc
]


def test_proximity_matches_brute_force_oracle(spark, prox_index):
    root, eng, doc_text = prox_index
    ls = LocalSearcher(root)
    for q in QUERIES:
        want = _expected(eng, doc_text, q, k=50)
        assert eng.search_proximity(q, k=50) == want, ("dist", q)
        assert ls.search_proximity(q, k=50) == want, ("serve", q)


def test_proximity_reorders_ties(spark, prox_index):
    """Docs 10/11/12 share the zebra+yak AND score shape; proximity must
    order adjacent < small gap < large gap (boost strictly decreasing in
    span) where base scores tie."""
    root, eng, doc_text = prox_index
    rows = eng.search_proximity("zebra yak", k=10)
    spans = {
        d: _brute_span(doc_text[d], ["zebra", "yak"]) for d, _ in rows
    }
    # every returned doc co-occurs; ordering respects boosted score
    boosted = [s for _, s in rows]
    assert boosted == sorted(boosted, reverse=True)
    # the adjacent doc (span 2) carries the max pair boost over the others
    by_span = sorted(rows, key=lambda r: spans[r[0]])
    assert spans[by_span[0][0]] == 2
    base = dict(eng.search("zebra yak", k=100))
    for d, s in rows:
        assert s == base[d] + PROXIMITY_SCALE // (spans[d] - 1), d


def test_proximity_sharded_identity(spark, prox_index):
    root, _, _ = prox_index
    ls = LocalSearcher(root)
    for n in (2, 3):
        sh = ShardedSearcher(root, n_shards=n)
        for q in QUERIES + ["fox", ""]:
            assert sh.search_proximity(q, k=50) == ls.search_proximity(
                q, k=50
            ), (n, q)
            assert sh.search_proximity(q, k=3) == ls.search_proximity(
                q, k=3
            ), (n, q)


def test_proximity_edge_cases(spark, prox_index):
    root, eng, doc_text = prox_index
    ls = LocalSearcher(root)
    # empty / stopword-only
    assert eng.search_proximity("", k=10) == []
    assert eng.search_proximity("the and it", k=10) == []
    # single term: every body match gets the full SCALE boost uniformly —
    # ranking equals search() with scores shifted by SCALE
    got = eng.search_proximity("fox", k=50)
    want = _expected(eng, doc_text, "fox", k=50)
    assert got == want
    assert ls.search_proximity("fox", k=50) == want


def test_min_cover_window_unit():
    mw = min_cover_window
    assert mw([np.array([0]), np.array([1])]) == 2
    assert mw([np.array([0, 10]), np.array([12]), np.array([11])]) == 3
    assert mw([np.array([5])]) == 1
    assert mw([np.array([0]), np.array([], dtype=np.int64)]) is None
    assert mw([]) is None
    assert mw([np.array([1, 4, 9]), np.array([3, 20])]) == 2
    # boost formula sanity: adjacency of k terms → full scale
    assert proximity_boost(2, 2) == PROXIMITY_SCALE
    assert proximity_boost(3, 2) == PROXIMITY_SCALE // 2
    assert proximity_boost(None, 2) == 0
