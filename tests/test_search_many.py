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


def test_search_many_one_metadata_job_when_warm(engine):
    """After compile-warming, a batch must run NO further metadata jobs:
    the per-term metadata cache is shared across the batch."""
    qs = ["linux ubuntu", "linux -google", "w0042"]
    engine.search_many(qs, k=10)  # warm the term-metadata cache
    before = dict(engine._term_meta)
    engine.search_many(qs, k=10)
    # cache unchanged (no eviction/refetch) — same object contents
    assert set(engine._term_meta) == set(before)
