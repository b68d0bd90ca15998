"""Logical deletions (takedowns): delete_conversations publishes a
tombstoned index version; both engines must mask deleted docs everywhere
while surviving docs keep their exact pre-deletion scores (stats stay as
built until the next full rebuild — the reference's GenDb-rebuild model).

Contract pinned here:
  - deleted docs never appear in any result, on any engine, any mode
  - results == pre-deletion results with deleted docs filtered out (the
    tiny corpus has < 1000 results per query, so every engine runs the
    full pass both before and after — the filtered-prefix property is
    exact, and the pre-deletion side is itself oracle-pinned)
  - distributed == serving == sharded on the tombstoned index
  - deletions accumulate, survive incremental appends, and are atomic
    (CURRENT pointer swap; the old version is untouched)
"""

import json
import os
import shutil
import tempfile

import pytest

from tests.test_rank_identity import QUERIES


@pytest.fixture(scope="module")
def del_env(spark, tiny_index_dir, oracle_index):
    """A private copy of the tiny index (hard links via copytree would
    mutate shared state; the tombstone publish writes a NEW version dir, so
    a plain copy isolates this module) with two conversations deleted."""
    from deusu_spark.incremental import delete_conversations
    from deusu_spark.query_local import LocalSearcher

    root = tempfile.mkdtemp(prefix="deusu_del_")
    dst = os.path.join(root, "idx")
    shutil.copytree(tiny_index_dir, dst)

    before = LocalSearcher(dst)
    pre = {q: before.search(q, k=1000) for q in QUERIES}
    # delete the conversations of the top-2 'linux' docs (guaranteed to
    # change visible results) — host == conversation id
    top = before.fetch_results(pre["linux"][:2])
    convs = sorted({r.host for r in top})
    m = delete_conversations(spark, dst, convs)
    assert m["n_tombstones"] > 0

    from deusu_spark.build import current_index_dir, load_tombstones

    tomb = set(load_tombstones(current_index_dir(dst)).tolist())
    # pin the version this first deletion published: later tests mutate the
    # index further (second takedown + append), and published versions are
    # immutable — tests asserting the FIRST-deletion state read v1 explicitly
    # so they hold under any test ordering
    v1 = m["version"]
    yield dst, pre, convs, tomb, v1
    shutil.rmtree(root, ignore_errors=True)


def test_deleted_docs_absent_and_prefix_property(del_env):
    from deusu_spark.query_local import LocalSearcher

    dst, pre, _convs, tomb, v1 = del_env
    ls = LocalSearcher(dst, version=v1)
    for q in QUERIES:
        rows = ls.search(q, k=1000)
        assert not ({d for d, _ in rows} & tomb), q
        expect = [(d, s) for d, s in pre[q] if d not in tomb]
        if len(pre[q]) < 1000:
            # complete pre-deletion list -> exact filtered equality
            assert rows == expect[:1000], q
        else:
            # pre list was truncated at 1000: survivors keep their exact
            # scores and order as a PREFIX; docs formerly ranked past 1000
            # may slide in after them (score <= the old cut, doc_id
            # tie-order preserved)
            assert rows[: len(expect)] == expect, q


def test_engines_identical_on_tombstoned_index(spark, del_env):
    from deusu_spark.query import SearchEngine
    from deusu_spark.query_local import LocalSearcher, ShardedSearcher

    dst, _pre, _convs, tomb, _v1 = del_env
    ls = LocalSearcher(dst)
    sh = ShardedSearcher(dst, n_shards=2)
    eng = SearchEngine(spark, dst)
    for q in QUERIES:
        want = ls.search(q, k=10)
        assert eng.search(q, k=10) == want, q
        assert sh.search(q, k=10) == want, q
    # batch APIs too
    assert eng.search_many(QUERIES[:6], k=10) == [
        ls.search(q, k=10) for q in QUERIES[:6]
    ]


def test_bm25_masked(spark, del_env):
    from deusu_spark.query import SearchEngine
    from deusu_spark.query_local import LocalSearcher

    dst, pre, _convs, tomb, _v1 = del_env
    ls = LocalSearcher(dst)
    eng = SearchEngine(spark, dst)
    for q in ["linux", "linux ubuntu", "w0042"]:
        rows = ls.search(q, k=10, mode="bm25")
        assert not ({d for d, _ in rows} & tomb), q
        got = eng.search(q, k=10, mode="bm25")
        assert [d for d, _ in got] == [d for d, _ in rows], q


def test_host_query_masked(del_env):
    from deusu_spark.query_local import LocalSearcher

    dst, _pre, convs, tomb, _v1 = del_env
    ls = LocalSearcher(dst)
    for conv in convs:
        assert ls.search(f"host:{conv}", k=1000) == [], conv


def test_deletions_accumulate_and_survive_append(spark, del_env):
    from deusu_spark import synth
    from deusu_spark.build import current_index_dir, load_tombstones
    from deusu_spark.incremental import delete_conversations, incremental_update
    from deusu_spark.query_local import LocalSearcher

    dst, _pre, _convs, tomb, _v1 = del_env
    # a second takedown accumulates on top of the first
    more = LocalSearcher(dst).fetch_results(
        LocalSearcher(dst).search("google", k=1)
    )
    delete_conversations(spark, dst, [more[0].host])
    t2 = set(load_tombstones(current_index_dir(dst)).tolist())
    assert tomb < t2

    # append new conversations (ids sort after the existing 200):
    # tombstones carry forward
    full = synth.gen_transcripts(206)
    convs = sorted(full["conv_id"].unique())
    delta = full[full["conv_id"].isin(convs[200:])].reset_index(drop=True)
    incremental_update(spark, dst, spark.createDataFrame(delta))
    t3 = set(load_tombstones(current_index_dir(dst)).tolist())
    assert t3 == t2
    ls = LocalSearcher(dst)
    for q in ["linux", "google", "linux -google"]:
        assert not ({d for d, _ in ls.search(q, k=1000)} & t3), q


def test_published_tombstone_version_is_never_reused(spark, del_env):
    """Regression: _pending_version must treat a tombstone-published version
    as published. It used to see only a "tombstone" lineage step, decide the
    dir was an unpublished leftover once a newer version took CURRENT, and
    reuse it for the next append — physically clobbering a pinned snapshot
    (its lexicon was overwritten in place and _delta scratch appeared
    inside it). Runs after the accumulate test mutated the index twice."""
    from deusu_spark.build import _pending_version, list_index_versions

    dst, _pre, _convs, _tomb, v1 = del_env
    pending = _pending_version(dst)
    assert pending not in list_index_versions(dst)
    # the tombstoned version dir stayed physically intact
    assert not os.path.isdir(os.path.join(dst, v1, "_delta"))
    assert os.path.isdir(os.path.join(dst, v1, "lexicon"))


def test_oracle_triple_identity_on_deletions(oracle_index, del_env):
    """The pure-Python oracle with the same tombstone set must match the
    serving engine EXACTLY on the tombstoned index — the full rank-identity
    contract extends to deletions (df/idf stay stale on all three engines,
    survivors keep exact scores, pass decisions agree on masked counts)."""
    from deusu_spark.oracle import oracle
    from deusu_spark.query_local import LocalSearcher

    dst, _pre, _convs, tomb, v1 = del_env
    oidx = oracle.with_deletions(oracle_index, tomb)
    ls = LocalSearcher(dst, version=v1)
    for q in QUERIES:
        assert ls.search(q, k=10) == oracle.search(oidx, q, k=10), q
    for q in ["linux", "linux ubuntu", "w0042"]:
        got = ls.search(q, k=10, mode="bm25")
        want = oracle.search_bm25(oidx, q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q


def test_snapshot_pinning_reproduces_pre_deletion(spark, del_env):
    """Published versions are immutable: pinning the pre-deletion version
    must reproduce its exact results on both engines, regardless of the
    takedowns and appends the later tests published on top."""
    from deusu_spark.build import list_index_versions
    from deusu_spark.query import SearchEngine
    from deusu_spark.query_local import LocalSearcher

    dst, pre, _convs, _tomb, _v1 = del_env
    v0 = list_index_versions(dst)[0]
    ls = LocalSearcher(dst, version=v0)
    eng = SearchEngine(spark, dst, version=v0)
    for q in ["linux", "linux ubuntu", "linux -google", "w0042"]:
        assert ls.search(q, k=1000) == pre[q], q
        assert eng.search(q, k=10) == pre[q][:10], q


def test_delete_is_atomic_version_swap(del_env):
    dst, _pre, _convs, _tomb, _v1 = del_env
    with open(os.path.join(dst, "CURRENT")) as f:
        cur = f.read().strip()
    versions = sorted(v for v in os.listdir(dst) if v.startswith("v_"))
    assert cur in versions and len(versions) >= 2
    # the pre-deletion version is untouched (no tombstones dir inside it)
    assert not os.path.isdir(os.path.join(dst, versions[0], "tombstones"))
    meta = json.load(open(os.path.join(dst, cur, "meta.json")))
    assert meta["n_tombstones"] > 0
