"""Decoded-term cache accounting: LRU retention + hit/miss/eviction
counters (regression for the 10M-doc unsharded warm-stream inversion —
FIFO evicted hot terms in insertion order, so a warm stream of
hot+tail two-term queries re-decoded the hot term every query)."""

import numpy as np

from deusu_spark.query_local import LocalSearcher


def _elems(ls):
    return sum(len(d) for d, _ in ls._term_cache.values())


def test_hit_miss_accounting(tiny_index_dir):
    ls = LocalSearcher(tiny_index_dir)
    ls.search("linux", k=5)
    misses0 = ls.term_cache_misses
    assert misses0 >= 1 and ls.term_cache_hits == 0
    # new query string, same term population → decoded-term hits, no
    # result-cache interference (different query → different Q14 slot key)
    ls.search("linux -google", k=5)
    assert ls.term_cache_hits >= 1
    # element accounting matches the cache contents exactly
    assert ls._term_cache_elems == _elems(ls)


def test_lru_keeps_hot_term_under_pressure(tiny_index_dir):
    ls = LocalSearcher(tiny_index_dir)
    hot_docs, _ = ls._term_postings("linux", False, ls.term_df("linux"))
    assert len(hot_docs) > 0
    # shrink the budget so the hot term + a couple of tail terms overflow
    ls.term_cache_max_elems = max(len(hot_docs) + 20, 40)
    tail = [t for t in ("w0042", "w0100", "w0005", "w0007", "w0011")]
    ls.search("linux", k=5)
    assert ("linux", "full") in ls._term_cache
    ev0 = ls.term_cache_evictions
    for i, t in enumerate(tail):
        # hot term re-probed between tail insertions — LRU must keep it
        ls.search(f"linux {t}", k=5)
        assert ("linux", "full") in ls._term_cache, (i, t)
    assert ls.term_cache_evictions > ev0  # pressure was real
    assert ls._term_cache_elems == _elems(ls)
    assert ls._term_cache_elems <= ls.term_cache_max_elems
    # and the hot entry still serves identical postings
    again, _ = ls._term_postings("linux", False, ls.term_df("linux"))
    assert np.array_equal(hot_docs, again)
