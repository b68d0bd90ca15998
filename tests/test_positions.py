"""Positions sidecar: build + positions-driven phrase verification.

The correctness pin the round-4 verdict asked for: phrase results from
the positions path must be RANK-IDENTICAL to the text-verify path (AND
retrieval filtered by a pure-python adjacency check over the original
text with the parity-tested fold/tokenizer) on a constructed corpus and
on the shared tiny synth corpus.
"""

import numpy as np
import pandas as pd
import pytest

from deusu_spark import positions as posmod
from deusu_spark.build import build_index, current_index_dir
from deusu_spark.query import SearchEngine
from deusu_spark.textproc import body_tokens, fold


def _text_verify(phrase: str, rows_by_doc: dict[int, str]) -> set[int]:
    """The text-rescan oracle: raw-token-offset adjacency over the folded
    body token stream (fill words keep offsets, cannot be pattern terms)."""
    pattern = posmod.phrase_pattern(phrase)
    out = set()
    for doc, text in rows_by_doc.items():
        toks = body_tokens(fold(text))
        idx = {}
        for i, t in enumerate(toks):
            idx.setdefault(t, []).append(i)
        starts = None
        okdoc = True
        for off, term in pattern:
            p = np.asarray(idx.get(term, []), dtype=np.int64)
            if len(p) == 0:
                okdoc = False
                break
            s = p - off
            starts = s if starts is None else np.intersect1d(starts, s)
            if len(starts) == 0:
                okdoc = False
                break
        if okdoc and starts is not None and len(starts):
            out.add(doc)
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog",          # 0
    "quick brown dog sleeps while the brown fox watches",   # 1
    "brown quick fox is not a quick brown fox at all",      # 2
    "a fox that is quick and brown but never adjacent",     # 3
    "linux the kernel boots while linux kernel panics",     # 4
    "kernel linux is reversed here",                        # 5
    "M&uuml;nchen ist sch&ouml;n heute",                    # 6 (entities)
    "muenchen ist gross",                                   # 7
    "linux kernel only adjacent here",                      # 8
    "here linux the kernel stops again",                    # 9 (gap of 1)
]


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pos_idx"))
    pdf = pd.DataFrame(
        [
            (f"conv{i:04d}", 0, "user", t, "")
            for i, t in enumerate(TEXTS)
        ],
        columns=["conv_id", "turn_idx", "role", "text", "tool"],
    )
    sdf = spark.createDataFrame(pdf)
    build_index(
        spark, sdf, d,
        fancy_threshold=10**9, seg_size=4, positions=True,
    )
    eng = SearchEngine(spark, d)
    # engine doc_id -> original text, via docmeta url = conv_id/turn_idx
    url_to_text = {f"conv{i:04d}/0": t for i, t in enumerate(TEXTS)}
    doc_text = {
        r["doc_id"]: url_to_text[r["url"]]
        for r in eng.docmeta.select("doc_id", "url").collect()
    }
    return eng, doc_text


PHRASES = [
    "quick brown fox",
    "brown fox",
    "quick brown",
    "linux the kernel",   # stopword keeps its offset: only doc 4 matches
    "linux kernel",
    "kernel linux",
    "M&uuml;nchen ist",   # entity + umlaut folding on the query side
    "lazy dog",
    "fox jumps over the lazy dog",
    "no such phrase here at all zz",
]


def test_phrase_matches_text_verify_oracle(spark, pos_index):
    eng, doc_text = pos_index
    for phrase in PHRASES:
        got = eng.search_phrase(phrase, k=50)
        want_docs = _text_verify(phrase, doc_text)
        assert {d for d, _ in got} == want_docs, phrase
        # scores are the plain AND scores for the same terms
        pattern = posmod.phrase_pattern(phrase)
        if pattern and want_docs:
            and_rows = dict(
                eng.search(" ".join(t for _, t in pattern), k=100)
            )
            for d, s in got:
                assert and_rows[d] == s, (phrase, d)


def test_phrase_stopword_offsets(spark, pos_index):
    """'linux the kernel' != 'linux kernel': the stopword consumes a
    token slot, so adjacency differs."""
    eng, doc_text = pos_index
    with_stop = {d for d, _ in eng.search_phrase("linux the kernel", k=50)}
    without = {d for d, _ in eng.search_phrase("linux kernel", k=50)}
    assert with_stop != without
    assert with_stop == _text_verify("linux the kernel", doc_text)
    assert without == _text_verify("linux kernel", doc_text)


def test_phrase_order_sensitive(spark, pos_index):
    eng, doc_text = pos_index
    fwd = {d for d, _ in eng.search_phrase("linux kernel", k=50)}
    rev = {d for d, _ in eng.search_phrase("kernel linux", k=50)}
    assert fwd == _text_verify("linux kernel", doc_text)
    assert rev == _text_verify("kernel linux", doc_text)
    assert fwd.isdisjoint(rev) or fwd != rev


def test_phrase_single_term_equals_search(spark, pos_index):
    eng, _ = pos_index
    assert eng.search_phrase("fox", k=10) == eng.search("fox", k=10)


def test_phrase_empty_and_stopword_only(spark, pos_index):
    eng, _ = pos_index
    assert eng.search_phrase("", k=10) == []
    assert eng.search_phrase("the and it", k=10) == []


def test_phrase_on_tiny_synth_corpus(spark, tiny_corpus, tiny_index_dir):
    """Sidecar retrofitted onto the existing published tiny index (its
    own build step), phrase results vs the text-verify oracle over the
    synth transcripts."""
    vdir = current_index_dir(tiny_index_dir)
    if not posmod.has_positions(vdir):
        posmod.build_positions(
            spark, spark.createDataFrame(tiny_corpus), tiny_index_dir,
            seg_size=64,
        )
    eng = SearchEngine(spark, tiny_index_dir)
    url_to_text = {
        f"{r.conv_id}/{r.turn_idx}": r.text
        for r in tiny_corpus.itertuples()
    }
    doc_text = {
        r["doc_id"]: url_to_text[r["url"]]
        for r in eng.docmeta.select("doc_id", "url").collect()
    }
    # phrases harvested from the corpus itself: adjacent token pairs
    some = list(doc_text.items())[:5]
    phrases = []
    for _, text in some:
        toks = body_tokens(fold(text))
        if len(toks) >= 2:
            phrases.append(" ".join(toks[1:3]))
    phrases += ["linux google", "w0001 w0002"]
    for phrase in phrases:
        pattern = posmod.phrase_pattern(phrase)
        if len(pattern) < 2:
            continue
        # k larger than the corpus so EVERY match must surface
        got = {d for d, _ in eng.search_phrase(phrase, k=10_000)}
        want = _text_verify(phrase, doc_text)
        assert got == want, phrase


def test_positions_segment_ranges_disjoint(spark, pos_index):
    """Per term, segment [first_doc, last_doc] ranges never overlap —
    the invariant contiguous doc-range salting guarantees."""
    eng, _ = pos_index
    import os

    segs = spark.read.parquet(
        os.path.join(eng.vdir, "positions")
    ).select("term", "first_doc", "last_doc").collect()
    by_term = {}
    for r in segs:
        by_term.setdefault(r["term"], []).append(
            (r["first_doc"], r["last_doc"])
        )
    for t, ranges in by_term.items():
        ranges.sort()
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 < l2, (t, ranges)


def test_phrase_serving_matches_distributed(spark, pos_index):
    """LocalSearcher.search_phrase is rank-identical to the distributed
    SearchEngine.search_phrase on every probe phrase."""
    import os

    from deusu_spark.query_local import LocalSearcher

    eng, _ = pos_index
    ls = LocalSearcher(os.path.dirname(eng.vdir))
    for phrase in PHRASES + ["", "the and it", "fox"]:
        a = eng.search_phrase(phrase, k=50)
        b = ls.search_phrase(phrase, k=50)
        assert list(a) == list(b), phrase


def _text_near_verify(
    phrase: str, window: int, rows_by_doc: dict[int, str]
) -> set[int]:
    """Oracle: unordered within-window co-occurrence over the folded body
    token stream — brute force over all position combinations."""
    from itertools import product

    terms = [t for _, t in posmod.phrase_pattern(phrase)]
    uniq = list(dict.fromkeys(terms))
    out = set()
    for doc, text in rows_by_doc.items():
        toks = body_tokens(fold(text))
        pls = []
        for t in uniq:
            p = [i for i, tok in enumerate(toks) if tok == t]
            if not p:
                pls = None
                break
            pls.append(p)
        if pls is None:
            continue
        for combo in product(*pls):
            if max(combo) - min(combo) < window:
                out.add(doc)
                break
    return out


def test_near_matches_brute_force_oracle(spark, pos_index):
    eng, doc_text = pos_index
    import os

    from deusu_spark.query_local import LocalSearcher

    ls = LocalSearcher(os.path.dirname(eng.vdir))
    cases = [
        ("quick fox", 3),      # within 3 tokens, any order
        ("quick fox", 2),
        ("fox dog", 5),
        ("fox dog", 50),
        ("kernel linux", 2),   # unordered: reversed adjacency matches
        ("linux kernel", 3),
        ("muenchen gross", 4),
        ("nosuch fox", 5),
    ]
    for phrase, w in cases:
        want = _text_near_verify(phrase, w, doc_text)
        got_d = {d for d, _ in eng.search_near(phrase, k=50, window=w)}
        got_s = {d for d, _ in ls.search_near(phrase, k=50, window=w)}
        assert got_d == want, (phrase, w, "distributed")
        assert got_s == want, (phrase, w, "serving")


def test_near_unordered_vs_phrase_ordered(spark, pos_index):
    """NEAR/2 of 'kernel linux' matches BOTH orders; the phrase matches
    only the literal order."""
    eng, doc_text = pos_index
    near = {d for d, _ in eng.search_near("kernel linux", k=50, window=2)}
    fwd = {d for d, _ in eng.search_phrase("linux kernel", k=50)}
    rev = {d for d, _ in eng.search_phrase("kernel linux", k=50)}
    assert near == fwd | rev
    assert near == _text_near_verify("kernel linux", 2, doc_text)


def test_near_window_match_unit():
    """The shared sweep: minimal-window semantics on hand cases."""
    nm = posmod.near_window_match
    assert nm([np.array([0]), np.array([1])], 2)
    assert not nm([np.array([0]), np.array([2])], 2)
    assert nm([np.array([0, 10]), np.array([12]), np.array([11])], 3)
    assert not nm([np.array([0, 10]), np.array([14]), np.array([11])], 3)
    assert not nm([np.array([0]), np.array([], dtype=np.int64)], 99)
    assert nm([np.array([5])], 1)
    assert not nm([], 5)
