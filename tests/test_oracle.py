"""Oracle sanity: deterministic corpus, sane retrieval behavior, invariants
from FIXTURES.md §Invariants."""

import pandas as pd
import pytest

from deusu_spark import synth
from deusu_spark.oracle import oracle


@pytest.fixture(scope="module")
def corpus():
    return synth.gen_transcripts(200)  # 'tiny' — ~2000 turns


@pytest.fixture(scope="module")
def idx(corpus):
    # low fancy threshold so the two-pass path is exercised at tiny scale
    return oracle.build_index(corpus, fancy_threshold=300)


def test_corpus_deterministic(corpus):
    again = synth.gen_transcripts(200)
    pd.testing.assert_frame_equal(corpus, again)


def test_postings_ascending_and_df_invariant(idx):
    total = 0
    for t, plist in idx.postings.items():
        docs = [d for d, _ in plist]
        assert docs == sorted(set(docs)), t  # strictly ascending, binary TF
        total += len(plist)
    assert total == sum(len(p) for p in idx.postings.values())


def test_single_hot_term(idx):
    res = oracle.search(idx, "linux", k=10)
    assert len(res) == 10
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s <= 65535 for s in scores)


def test_and_is_subset(idx):
    both = {d for d, _ in oracle.search(idx, "linux ubuntu", k=1000)}
    linux = {d for d, _ in oracle.search(idx, "linux", k=100000)}
    assert both <= linux


def test_infix_and_equivalent(idx):
    assert oracle.search(idx, "linux and ubuntu", k=50) == oracle.search(
        idx, "linux ubuntu", k=50
    )


def test_not_excludes(idx):
    minus = {d for d, _ in oracle.search(idx, "linux -google", k=100000)}
    google = {d for d, _ in oracle.search(idx, "google", k=100000)}
    assert not (minus & google)


def test_german_not_rewrite(idx):
    assert oracle.search(idx, "linux nicht google", k=50) == oracle.search(
        idx, "linux -google", k=50
    )


def test_stopword_stripping(idx):
    assert oracle.search(idx, "der linux die", k=50) == oracle.search(
        idx, "linux", k=50
    )


def test_intitle_filter(idx):
    res = oracle.search(idx, "intitle:assistant linux", k=100000)
    docs = {d for d, _ in res}
    assistant_docs = {d for d, _ in idx.postings.get("assistant", [])}
    assert docs and docs <= assistant_docs


def test_host_query(idx):
    res = oracle.search(idx, "host:conv00000017", k=1000)
    docs = {d for d, _ in res}
    assert docs == set(idx.host_postings["conv00000017"])


def test_keyword_cap_10(idx):
    q = " ".join(f"w{i:04d}" for i in range(1, 15))
    kws = oracle.extract_keywords(q)
    assert len(kws) == 10


def test_umlaut_query_folding(idx):
    assert oracle.extract_keywords("über straße") == ["ueber", "strasse"]
    # 'ueber' is a stopword → removed in refine
    assert oracle.refine_search(["ueber", "strasse"]) == ["strasse"]


def test_fancy_pass_exists(idx):
    assert idx.fancy, "tiny corpus must have at least one fancy term"
    # fancy docs all have 0 < rank < 200000
    for t, plist in idx.fancy.items():
        for d, _ in plist:
            assert 0 < idx.rank_data[d] < 200000
