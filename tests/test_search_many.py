"""Batch query API: search_many must be rank-identical per query to
search() (which is itself pinned to the pure-Python oracle), while paying
one metadata job + at most two union plans for the whole batch.

This is the offline-throughput path (Missing #2 in the round-2 review):
a training-data pipeline issuing millions of retrieval queries cannot pay
2-3 Spark jobs per query."""

import pytest

from tests.test_rank_identity import QUERIES


def test_search_many_rank_identity_k10(engine, oracle_index):
    from deusu_spark.oracle import oracle

    batch = engine.search_many(QUERIES, k=10)
    assert len(batch) == len(QUERIES)
    for q, rows in zip(QUERIES, batch):
        assert rows == oracle.search(oracle_index, q, k=10), f"query={q!r}"


def test_search_many_matches_search_k1000(engine):
    qs = ["linux", "linux ubuntu", "linux -google", "w0042"]
    batch = engine.search_many(qs, k=1000)
    for q, rows in zip(qs, batch):
        assert rows == engine.search(q, k=1000), f"query={q!r}"


def test_search_many_bm25(engine, oracle_index):
    from deusu_spark.oracle import oracle

    qs = ["linux", "linux ubuntu", "w0042", "host:conv00000017"]
    batch = engine.search_many(qs, k=10, mode="bm25")
    for q, rows in zip(qs, batch):
        expected = oracle.search_bm25(oracle_index, q, k=10)
        assert [d for d, _ in rows] == [d for d, _ in expected], q
        for (_, sa), (_, se) in zip(rows, expected):
            assert abs(sa - se) < 1e-5, q


def test_search_many_custom_weights(engine):
    qs = ["linux", "linux ubuntu"]
    w = {"b1": 10, "b7": 3}
    batch = engine.search_many(qs, k=10, weights=w)
    for q, rows in zip(qs, batch):
        assert rows == engine.search(q, k=10, weights=w), f"query={q!r}"


def test_search_many_empty_and_duplicates(engine):
    qs = ["", "nosuchterm12345", "linux", "linux"]
    batch = engine.search_many(qs, k=5)
    assert batch[0] == []
    assert batch[1] == []
    assert batch[2] == batch[3] == engine.search("linux", k=5)


def test_serving_search_many_rank_identity(tiny_index_dir, oracle_index):
    """LocalSearcher.search_many: batch == per-query == oracle, and the
    decoded-term cache actually amortizes (terms shared across the batch
    live in the cache; a repeat batch is served from the Q14 result
    cache without further postings reads)."""
    from deusu_spark.oracle import oracle
    from deusu_spark.query_local import LocalSearcher

    ls = LocalSearcher(tiny_index_dir)
    batch = ls.search_many(QUERIES, k=10)
    assert len(batch) == len(QUERIES)
    for q, rows in zip(QUERIES, batch):
        assert rows == oracle.search(oracle_index, q, k=10), f"query={q!r}"
    # shared terms across the batch were decoded once and retained
    assert len(ls._term_cache) > 0
    assert ls._term_cache_elems <= ls.term_cache_max_elems
    misses_after_first = ls.cache_misses
    assert ls.search_many(QUERIES, k=10) == batch
    assert ls.cache_misses == misses_after_first  # all Q14 hits


def test_serving_search_many_sharded(tiny_index_dir):
    from deusu_spark.query_local import LocalSearcher, ShardedSearcher

    ls = LocalSearcher(tiny_index_dir)
    sh = ShardedSearcher(tiny_index_dir, n_shards=3)
    qs = ["linux", "linux ubuntu", "linux -google", "w0042", "google java"]
    assert sh.search_many(qs, k=10) == [ls.search(q, k=10) for q in qs]


def test_serving_term_cache_eviction(tiny_index_dir):
    """A tiny element budget must evict FIFO and never exceed the bound,
    with results unchanged."""
    from deusu_spark.query_local import LocalSearcher

    ls = LocalSearcher(tiny_index_dir)
    ref = LocalSearcher(tiny_index_dir)
    ls.term_cache_max_elems = 64
    for q in QUERIES:
        assert ls.search(q, k=10) == ref.search(q, k=10), q
        assert ls._term_cache_elems <= 64


def test_search_many_one_metadata_job_when_warm(engine):
    """After compile-warming, a batch must run NO further metadata jobs:
    the per-term metadata cache is shared across the batch."""
    qs = ["linux ubuntu", "linux -google", "w0042"]
    engine.search_many(qs, k=10)  # warm the term-metadata cache
    before = dict(engine._term_meta)
    engine.search_many(qs, k=10)
    # cache unchanged (no eviction/refetch) — same object contents
    assert set(engine._term_meta) == set(before)
