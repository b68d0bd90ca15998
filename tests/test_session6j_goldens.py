"""Oracle-independent goldens/invariants for the session-6 batch P/Q
operators (newsvendor_quantile … srm_check)."""

import os
import tempfile

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6j_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def _docs(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    return df


def test_newsvendor_interpolated_fractile(spark):
    """Daily demand exactly 1..10: the 0.9 fractile interpolates to 9.1
    and exactly one day in ten exceeds it."""
    rows = []
    eid = 0
    for day in range(10):
        for _ in range(day + 1):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 3,
                         "purchase", 1.0, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_newsvendor_quantile(spark, d).collect()[0]
    assert out["n_days"] == 10
    assert out["mean_demand"] == 5.5
    assert out["critical_ratio"] == 0.9
    assert out["q_star"] == 9.1
    assert out["frac_short_days"] == 0.1


def test_lin_ccc_identical_counters(spark):
    """Pure-alphanumeric words make the whitespace and BPE counts
    identical per doc → CCC = Pearson = C_b = 1."""
    d = _tmp_dir(
        documents=_docs(
            [
                (0, "aa bb", "en", "A"),
                (1, "aa bb cc", "en", "A"),
                (2, "aa bb cc dd", "en", "A"),
                (3, "aa", "en", "A"),
            ]
        )
    )
    out = pipelines.q_lin_ccc(spark, d).collect()[0]
    assert out["ccc"] == 1.0
    assert out["pearson_r"] == 1.0
    assert out["bias_correction_cb"] == 1.0


def test_youden_boundary_rows(spark):
    """At threshold 0 the classifier accepts everything → TPR = FPR = 1,
    J = 0; the flagged best threshold must attain the best J."""
    rows = {r["bin"]: r for r in
            pipelines.q_youden_threshold(spark, SF_DIR).collect()}
    lo = min(rows)
    assert rows[lo]["tpr"] == 1.0 and rows[lo]["fpr"] == 1.0
    best_j = rows[lo]["best_j"]
    assert all(r["youden_j"] <= best_j + 1e-9 for r in rows.values())
    attained = [r for r in rows.values()
                if abs(r["youden_j"] - best_j) < 1e-9]
    assert min(r["threshold"] for r in attained) == rows[lo][
        "best_threshold"
    ]


def test_cronbach_perfectly_correlated_items(spark):
    """Every user has the SAME count on both items → the items are
    perfectly consistent → α = 1 exactly."""
    rows = []
    eid = 0
    for user, c in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        for etype in ("click", "view"):
            for _ in range(c):
                rows.append((eid, BASE + pd.Timedelta(minutes=eid), user,
                             etype, 1.0, "{}"))
                eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_cronbach_alpha(spark, d).collect()[0]
    assert out["k_items"] == 2 and out["n_users"] == 4
    assert out["alpha"] == 1.0


def test_gini_perfect_split(spark):
    """Source determines the language exactly: child impurity 0, the
    decrease equals the full root impurity 2·½·½ = 0.5."""
    d = _tmp_dir(
        documents=_docs(
            [(i, "w x", "en" if i < 4 else "de",
              "A" if i < 4 else "B") for i in range(8)]
        )
    )
    out = pipelines.q_gini_split(spark, d).collect()[0]
    assert out["gini_root"] == 0.5
    assert out["gini_weighted"] == 0.0
    assert out["gini_decrease"] == 0.5


def test_srm_balanced_and_broken(spark):
    """A perfect 50/50 split passes (χ² = 0); a 90/10 split of 100 users
    fails decisively (χ² = 64 > 3.84)."""
    rows = [(i, BASE + pd.Timedelta(minutes=i), i, "view", 1.0, "{}")
            for i in range(100)]
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_srm_check(spark, d).collect()[0]
    assert out["chi2"] == 0.0 and out["srm_flag"] == 0

    rows = []
    for i in range(90):
        rows.append((i, BASE + pd.Timedelta(minutes=i), 2 * i, "view",
                     1.0, "{}"))  # even users → arm 0
    for i in range(10):
        rows.append((1000 + i, BASE + pd.Timedelta(minutes=i),
                     2 * i + 1, "view", 1.0, "{}"))
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_srm_check(spark, d).collect()[0]
    assert out["n_a"] == 90 and out["n_b"] == 10
    assert out["chi2"] == 64.0 and out["srm_flag"] == 1


def test_batch_pq_ops_stay_jvm_side(spark):
    for q in (
        pipelines.q_newsvendor_quantile,
        pipelines.q_lin_ccc,
        pipelines.q_youden_threshold,
        pipelines.q_cronbach_alpha,
        pipelines.q_gini_split,
        pipelines.q_srm_check,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
