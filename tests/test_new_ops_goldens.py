"""Oracle-independent goldens/invariants for the round-3 relational ops.

The driver gate compares Spark vs DuckDB, but several of these ops run the
SAME algorithm in both engines (phrase counting, pagerank rounding), so a
shared-algorithm bug would pass the oracle. These tests pin literal
hand-computed expectations and conservation laws instead.
"""

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def phrase_dir(spark):
    """A documents table with hand-countable occurrences of PHRASE
    ('the table'), including the ADJACENT-occurrence case the doubled-space
    trick exists for."""
    rows = [
        # two adjacent occurrences sharing a boundary space in the
        # space-joined token stream — plain non-overlapping replace()
        # on the undoubled string would count 1
        (0, "the table the table"),
        (1, "a the table b"),               # one occurrence mid-text
        (2, "the chair"),                    # no occurrence
        (3, "THE,table;the--TABLE the table"),  # normalization: 3 occurrences
        (4, ""),                             # empty text
        (5, "table the"),                    # reversed, no occurrence
    ]
    d = tempfile.mkdtemp(prefix="phrase_golden_")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_phrase_match_literal_counts(spark, phrase_dir):
    got = {
        r["doc_id"]: r["n_hits"]
        for r in pipelines.q_phrase_match(spark, phrase_dir).collect()
    }
    # docs 2, 4, 5 must be absent (zero hits are filtered out)
    assert got == {0: 2, 1: 1, 3: 3}


def test_pagerank_conserves_mass(spark):
    """Σ rank == 1 at every fixpoint of a dangling-free graph: the
    bidirectional edge construction guarantees every node has outdegree,
    so damped mass redistribution must conserve the total (within the
    9-decimal per-round rounding: ≤ n_nodes × 5e-10)."""
    df = pipelines.q_pagerank(spark, SF_DIR)
    rows = df.collect()
    total = sum(r["pr"] for r in rows)
    n = len(rows)
    assert n > 0
    assert abs(total - 1.0) < max(1e-6, n * 5e-7)  # pr rounded to 6 decimals
    assert all(r["pr"] > 0 for r in rows)


def test_gapfill_grid_complete_and_counts_conserved(spark):
    """Densified output must contain EVERY (type, hour) cell of the span
    exactly once, and the zero-filled counts must still sum to the raw
    event count (gap-fill adds cells, never events)."""
    out = pipelines.q_events_gapfill(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = ev.count()
    types = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
    hours = {r["hour"] for r in out}
    # complete rectangle: |rows| == |types| × |hours|, no duplicates
    assert len(out) == len(types) * len(hours)
    assert len({(r["event_type"], r["hour"]) for r in out}) == len(out)
    # conservation: zero-filled cells add no events
    assert sum(r["cnt"] for r in out) == n_events
    # the span is contiguous hourly
    hs = sorted(hours)
    assert all((b - a).total_seconds() == 3600 for a, b in zip(hs, hs[1:]))


def test_set_ops_containment(spark):
    """(view ∩ purchase) − error must be contained in the view user-days,
    contained in the purchase user-days, and disjoint from the error
    user-days — the definition, checked against raw event scans."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    def days(t):
        return {
            (r["user_id"], r["day"])
            for r in ev.where(F.col("event_type") == t)
            .select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
            .collect()
        }

    got = {
        (r["user_id"], r["day"])
        for r in pipelines.q_set_ops_users(spark, SF_DIR).collect()
    }
    assert got  # non-trivial by construction of the synthetic events
    assert got == (days("view") & days("purchase")) - days("error")


def test_tfidf_pairs_bounded_and_symmetric_free(spark):
    """Cosines lie in (0, 1 + ε]; each unordered pair appears exactly once
    (doc_a < doc_b); every reported doc exists under the id bound."""
    rows = pipelines.q_tfidf_cosine_pairs(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"] < pipelines.TFIDF_MAX_DOC
        # rounding at two stages can push an exact-duplicate pair a hair
        # over 1.0 — bound with the rounding epsilon, not exactly 1
        assert pipelines.TFIDF_COS_MIN <= r["cosine"] <= 1.0 + 1e-3
        key = (r["doc_a"], r["doc_b"])
        assert key not in seen
        seen.add(key)


def test_kth_smallest_matches_full_sort(spark, monkeypatch):
    """_kth_smallest vs np.sort on an adversarial distribution — 60% mass
    on ONE duplicated value (exercises the all-equal short-circuit), heavy
    skew, negatives and huge outliers — with the collect limit and bucket
    count shrunk to force several narrowing passes."""
    import numpy as np

    monkeypatch.setattr(pipelines, "QUANT_BISECT_LIMIT", 64)
    monkeypatch.setattr(pipelines, "QUANT_BISECT_BUCKETS", 8)
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            np.full(3000, 42.5),
            rng.lognormal(0, 3, 1500),
            -rng.lognormal(0, 2, 400),
            np.array([1e12, -1e12, 0.0]),
            rng.normal(42.5, 1e-9, 97),  # near-duplicate cloud
        ]
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    s = np.sort(vals)
    n = len(vals)
    ks = [1, 2, n // 4, n // 2, n // 2 + 1, (3 * n) // 4, n - 1, n]
    got = pipelines._kth_smallest(df, "x", ks)
    for k in ks:
        assert got[k] == s[k - 1], (k, got[k], s[k - 1])


def test_knn_join_against_local_brute_force(spark):
    """knn_join vs a driver-side numpy brute force with identical rounding
    and tie-break rules — independent of the DuckDB oracle's SQL path."""
    import numpy as np

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    qmask = ids % pipelines.KNN_QUERY_MOD == 0
    sims = np.round(m[~qmask] @ m[qmask].T, 4)
    rids = ids[~qmask]
    expect = {}
    for j, qid in enumerate(ids[qmask]):
        best = min(zip(-sims[:, j], rids))
        expect[int(qid)] = (int(best[1]), float(-best[0]))
    got = {
        r["qid"]: (r["rid"], r["cos_sim"])
        for r in pipelines.q_knn_join(spark, SF_DIR).collect()
    }
    assert got == expect
