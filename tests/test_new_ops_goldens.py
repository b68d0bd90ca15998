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


# --------------------------------------------------------------------------
# round-3 late-session ops: independent references and conservation laws
# --------------------------------------------------------------------------


def _tmp_table(name, df):
    d = tempfile.mkdtemp(prefix=f"{name}_golden_")
    df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def test_dtw_against_local_reference(spark):
    """q_dtw_distance vs a plain-Python DTW over the same dense daily
    series — an implementation-independent check of the nested-fold DP
    (the DuckDB oracle replays a similar fold, so a shared recurrence
    bug would pass the oracle)."""
    import numpy as np

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = ev["ts"].dt.normalize()
    grid = pd.date_range(ev["day"].min(), ev["day"].max(), freq="D")

    def series(et):
        c = ev[ev.event_type == et].groupby("day").size()
        return c.reindex(grid, fill_value=0).to_numpy(dtype=float)

    a, b = series(pipelines.DTW_A), series(pipelines.DTW_B)
    big = 1e18
    prev = np.concatenate(([0.0], np.full(len(b), big)))
    for ai in a:
        cur = [big]
        for j, bj in enumerate(b):
            cur.append(abs(ai - bj) + min(prev[j], prev[j + 1], cur[-1]))
        prev = np.array(cur)
    row = pipelines.q_dtw_distance(spark, SF_DIR).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["dtw"] == prev[-1]


def test_ffd_against_local_reference(spark):
    """q_ffd_bin_packing vs a plain-Python first-fit-decreasing over the
    same item list, plus the conservation law Σ loads == Σ sizes."""
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    sizes = (
        o.groupby(o.o_orderkey % pipelines.FFD_FILES)
        .size()
        .reset_index(name="sz")
        .rename(columns={"o_orderkey": "fid"})
    )
    items = sizes.sort_values(["sz", "fid"], ascending=[False, True])[
        "sz"
    ].tolist()
    total = sum(items)
    cap = -(-total // pipelines.FFD_TARGET_BINS)
    bins = []
    for s in items:
        for i, l in enumerate(bins):
            if l + s <= cap:
                bins[i] += s
                break
        else:
            bins.append(s)
    got = [
        r["load"]
        for r in pipelines.q_ffd_bin_packing(spark, SF_DIR)
        .orderBy("bin")
        .collect()
    ]
    assert got == bins
    assert sum(got) == total
    assert all(l <= cap for l in got)


def test_consistent_hash_minimal_movement(spark):
    """The consistent-hashing CONTRACT: when a node is added, keys only
    move TO the new node — no old node ever gains a key — and the key
    population is conserved."""
    rows = pipelines.q_consistent_hash_rebalance(spark, SF_DIR).collect()
    new_node = pipelines.CH_NODES_AFTER - 1
    assert sum(r["n_before"] for r in rows) == sum(
        r["n_after"] for r in rows
    )
    for r in rows:
        if r["node"] == new_node:
            assert r["n_before"] == 0 and r["n_gained"] == r["n_after"] > 0
        else:
            assert r["n_gained"] == 0


def test_nb_classifier_separable_corpus(spark):
    """On a trivially separable corpus (each class has a disjoint
    vocabulary), naive Bayes must classify every test doc correctly."""
    rows = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        tok = "xx" if lang == "aa" else "yy"
        rows.append((i, f"{tok} {tok} common filler", lang))
    d = _tmp_table(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
    )
    out = pipelines.q_nb_classifier(spark, d).collect()
    assert len(out) == 8  # doc_id % 5 == 0
    assert all(r["pred"] == r["actual"] for r in out)


def test_lift_gains_conservation(spark):
    """Decile table conservation: users and positives each sum to their
    totals, cumulative gain ends at exactly 1, and the user-weighted
    mean lift is 1 (lift is base-rate-normalized by construction)."""
    rows = pipelines.q_lift_gains(spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.user_id.nunique()
    n_pos = ev[ev.event_type == "purchase"].user_id.nunique()
    assert sum(r["n_users"] for r in rows) == n_users
    assert sum(r["n_pos"] for r in rows) == n_pos
    assert rows[-1]["cum_gain"] == 1.0
    wmean = sum(r["lift"] * r["n_users"] for r in rows) / n_users
    assert abs(wmean - 1.0) < 1e-4


def test_kcore_converged_degrees(spark):
    """At sf0.001 the K-core peel converges inside the fixed rounds, so
    every survivor's within-core degree must be >= K (the defining
    k-core property)."""
    rows = pipelines.q_kcore(spark, SF_DIR).collect()
    assert rows, "core unexpectedly empty"
    assert all(r["core_deg"] >= pipelines.KCORE_K for r in rows)


def test_markov_attribution_laws(spark):
    """Removal monotonicity (removing a channel can only lose conversion
    mass) and share normalization."""
    rows = pipelines.q_markov_attribution(spark, SF_DIR).collect()
    assert len(rows) == len(pipelines.MK_CHANNELS)
    for r in rows:
        assert 0.0 <= r["p_conv_removed"] <= r["p_conv"] <= 1.0
        assert r["removal_effect"] >= 0.0
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-5


def test_holt_winters_periodic_fixpoint(spark):
    """On an exactly periodic series (integer counts repeating with the
    seasonal period), Holt-Winters must learn zero trend and forecast
    the next season exactly (the recursion's fixpoint)."""
    m = pipelines.HW_PERIOD
    pattern = [(h % 4) + 1 for h in range(m)]  # 1..4 cycling, period 24
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for hour in range(m * 6):
        for _ in range(pattern[hour % m]):
            rows.append(
                (
                    eid,
                    base + pd.Timedelta(hours=hour, minutes=30),
                    eid % 7,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = _tmp_table("events", df)
    out = pipelines.q_holt_winters(spark, d).collect()[0]
    assert out["n_hours"] == m * 6
    assert abs(out["trend"]) < 1e-9
    # next hour's true value is pattern[0] (series length is a multiple of m)
    assert abs(out["forecast_h1"] - pattern[0]) < 1e-6
