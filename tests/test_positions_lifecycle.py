"""Positions-sidecar lifecycle across index maintenance ops (round-5):

- _POSMETA.json stamps n_docs; has_positions() treats a mismatched stamp
  as ABSENT — a sidecar carried into a version it wasn't built for can
  never silently drop matching docs (the round-4 advisor's staleness
  hazard), phrase/NEAR raise instead.
- incremental_update EXTENDS the sidecar with delta-only segments:
  appended docs are phrase/NEAR-retrievable, old answers unchanged,
  per-term segment doc ranges stay globally disjoint.
- delete_conversations links the sidecar (still valid: candidates are
  tombstone-masked upstream, n_docs unchanged).
- compact_index re-segments the fragmented sidecar (decode→re-encode, no
  re-tokenization): answers identical, fragmentation reduced.
- ShardedSearcher answers phrase/NEAR rank-identically to LocalSearcher
  (CLAUDE.md contract: both serving tiers move together).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from deusu_spark import positions as posmod
from deusu_spark.build import build_index, current_index_dir
from deusu_spark.incremental import (
    compact_index,
    delete_conversations,
    incremental_update,
)
from deusu_spark.query import SearchEngine
from deusu_spark.query_local import LocalSearcher, ShardedSearcher
from tests.test_positions import _text_near_verify, _text_verify

BASE = [
    ("conv0000", "alpha beta gamma delta"),
    ("conv0001", "beta alpha gamma"),
    ("conv0002", "alpha beta omega"),
    ("conv0003", "epsilon zeta eta"),
    ("conv0004", "linux kernel boots fast"),
    ("conv0005", "kernel linux reversed"),
]
DELTA = [
    ("conv1000", "alpha beta newdoc"),
    ("conv1001", "omega sigma tau"),
    ("conv1002", "sigma alpha tau far away"),
]
PHRASES = ["alpha beta", "sigma tau", "linux kernel", "beta gamma"]
NEARS = [("sigma tau", 3), ("sigma tau", 2), ("alpha gamma", 3)]


def _df(spark, rows):
    pdf = pd.DataFrame(
        [(c, 0, "user", t, "") for c, t in rows],
        columns=["conv_id", "turn_idx", "role", "text", "tool"],
    )
    return spark.createDataFrame(pdf)


def _doc_text(spark, root, rows):
    url_to_text = {f"{c}/0": t for c, t in rows}
    eng = SearchEngine(spark, root)
    return eng, {
        r["doc_id"]: url_to_text[r["url"]]
        for r in eng.docmeta.select("doc_id", "url").collect()
    }


def _assert_disjoint(spark, vdir):
    segs = spark.read.parquet(os.path.join(vdir, "positions")).select(
        "term", "first_doc", "last_doc"
    ).collect()
    by_term = {}
    for r in segs:
        by_term.setdefault(r["term"], []).append(
            (r["first_doc"], r["last_doc"])
        )
    for t, ranges in by_term.items():
        ranges.sort()
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 < l2, (t, ranges)


def _check_all(spark, root, rows, dead_texts=frozenset()):
    eng, doc_text = _doc_text(spark, root, rows)
    doc_text = {
        d: t for d, t in doc_text.items() if t not in dead_texts
    }
    ls = LocalSearcher(root)
    for phrase in PHRASES:
        want = _text_verify(phrase, doc_text)
        assert {d for d, _ in eng.search_phrase(phrase, k=100)} == want, phrase
        assert {d for d, _ in ls.search_phrase(phrase, k=100)} == want, phrase
    for phrase, w in NEARS:
        want = _text_near_verify(phrase, w, doc_text)
        got_d = {d for d, _ in eng.search_near(phrase, k=100, window=w)}
        got_s = {d for d, _ in ls.search_near(phrase, k=100, window=w)}
        assert got_d == want, (phrase, w)
        assert got_s == want, (phrase, w)
    return eng, ls, doc_text


@pytest.fixture(scope="module")
def lifecycle_root(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pos_lifecycle"))
    build_index(
        spark, _df(spark, BASE), d,
        fancy_threshold=10**9, seg_size=2, positions=True,
    )
    return d


def test_posmeta_stamped(spark, lifecycle_root):
    vdir = current_index_dir(lifecycle_root)
    with open(os.path.join(vdir, "positions", "_POSMETA.json")) as f:
        pm = json.load(f)
    assert pm["n_docs"] == len(BASE)
    assert pm["version"] == os.path.basename(vdir)
    assert posmod.has_positions(vdir)


def test_stale_sidecar_reads_absent(spark, lifecycle_root, tmp_path):
    """A sidecar whose n_docs stamp mismatches meta.json is ABSENT (the
    engines raise) — never silently wrong."""
    vdir = current_index_dir(lifecycle_root)
    fake = tmp_path / "fake_v"
    fake.mkdir()
    meta = json.load(open(os.path.join(vdir, "meta.json")))
    meta["n_docs"] += 7  # as if docs were appended without extending
    json.dump(meta, open(fake / "meta.json", "w"))
    os.makedirs(fake / "positions", exist_ok=True)
    pm = json.load(open(os.path.join(vdir, "positions", "_POSMETA.json")))
    json.dump(pm, open(fake / "positions" / "_POSMETA.json", "w"))
    assert not posmod.has_positions(str(fake))
    # unstamped legacy sidecar: also absent
    json.dump(
        {"seg_size": 2},
        open(fake / "positions" / "_POSMETA.json", "w"),
    )
    assert not posmod.has_positions(str(fake))


def test_incremental_append_extends_positions(spark, lifecycle_root):
    before_eng, _, _ = _check_all(spark, lifecycle_root, BASE)
    before = {p: before_eng.search_phrase(p, k=100) for p in PHRASES}

    incremental_update(spark, lifecycle_root, _df(spark, DELTA))
    vdir = current_index_dir(lifecycle_root)
    assert posmod.has_positions(vdir)
    with open(os.path.join(vdir, "positions", "_POSMETA.json")) as f:
        assert json.load(f)["n_docs"] == len(BASE) + len(DELTA)
    _assert_disjoint(spark, vdir)

    eng, ls, doc_text = _check_all(spark, lifecycle_root, BASE + DELTA)
    # the appended-only phrase is found (the silent-drop hazard)
    got = {d for d, _ in eng.search_phrase("sigma tau", k=100)}
    assert got == _text_verify("sigma tau", doc_text) and got
    # old docs' phrase hits survive the append
    for p in PHRASES:
        old_docs = {d for d, _ in before[p]}
        new_docs = {d for d, _ in eng.search_phrase(p, k=100)}
        assert old_docs <= new_docs, p


def test_deletion_keeps_positions(spark, lifecycle_root):
    delete_conversations(spark, lifecycle_root, ["conv0002"])
    vdir = current_index_dir(lifecycle_root)
    assert posmod.has_positions(vdir)
    eng, doc_text = _doc_text(spark, lifecycle_root, BASE + DELTA)
    deleted = {
        d for d, txt in doc_text.items()
        if txt == "alpha beta omega"
    }
    got = {d for d, _ in eng.search_phrase("alpha beta", k=100)}
    live_text = {d: t for d, t in doc_text.items() if d not in deleted}
    assert got == _text_verify("alpha beta", live_text)
    assert got.isdisjoint(deleted)


def test_compaction_resegments_positions(spark, lifecycle_root):
    vdir_before = current_index_dir(lifecycle_root)
    segs_before = spark.read.parquet(
        os.path.join(vdir_before, "positions")
    ).count()
    dead = frozenset({"alpha beta omega"})  # conv0002 tombstoned above
    eng_b, ls_b, _ = _check_all(
        spark, lifecycle_root, BASE + DELTA, dead_texts=dead
    )
    before = {p: eng_b.search_phrase(p, k=100) for p in PHRASES}

    metrics = compact_index(spark, lifecycle_root)
    vdir = current_index_dir(lifecycle_root)
    assert posmod.has_positions(vdir)
    assert metrics["positions_segments"] is not None
    _assert_disjoint(spark, vdir)
    # append fragmented 'alpha'/'beta' into per-delta runs; re-encode at
    # seg_size merges them
    assert metrics["positions_segments"] <= segs_before

    eng, ls, _ = _check_all(
        spark, lifecycle_root, BASE + DELTA, dead_texts=dead
    )
    for p in PHRASES:
        assert eng.search_phrase(p, k=100) == before[p], p
        assert ls.search_phrase(p, k=100) == before[p], p


def test_sharded_phrase_near_identity(spark, lifecycle_root):
    """ShardedSearcher(2,3) phrase/NEAR == LocalSearcher on the same
    (post-lifecycle) index, incl. paging past the first fetch."""
    ls = LocalSearcher(lifecycle_root)
    for n in (2, 3):
        sh = ShardedSearcher(lifecycle_root, n_shards=n)
        for phrase in PHRASES + ["alpha", ""]:
            assert sh.search_phrase(phrase, k=100) == ls.search_phrase(
                phrase, k=100
            ), (n, phrase)
            assert sh.search_phrase(phrase, k=2) == ls.search_phrase(
                phrase, k=2
            ), (n, phrase)
        for phrase, w in NEARS + [("alpha", 2)]:
            assert sh.search_near(
                phrase, k=100, window=w
            ) == ls.search_near(phrase, k=100, window=w), (n, phrase, w)
