"""Oracle-independent goldens/invariants for the session-6 batch K
operators (paired_ttest … deming_regression)."""

import os
import tempfile

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6e_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def test_paired_ttest_hand_computed(spark):
    """Two users with post−pre differences exactly {1, 3}:
    d̄ = 2, s_d = √2, t = 2/(√2/√2) = 2."""
    rows = []
    eid = 0
    # window spans seconds 0..1000 → cut at 500
    for user, pre_v, post_v in [(1, 10.0, 11.0), (2, 10.0, 13.0)]:
        for sec, v in [(0, pre_v), (10, pre_v), (990, post_v),
                       (1000, post_v)]:
            rows.append((eid, BASE + pd.Timedelta(seconds=sec), user,
                         "view", v, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_paired_ttest(spark, d).collect()[0]
    assert out["n_pairs"] == 2 and out["df"] == 1
    assert out["mean_diff"] == 2.0
    assert abs(out["t_stat"] - 2.0) < 1e-6


def test_mcnemar_constructed_discordance(spark):
    """One pre-only converter (b), one post-only (c), one concordant,
    one never: χ²_corrected = (|1−1|−1)²/2 = 0.5."""
    rows = []
    eid = 0

    def add(user, sec, etype):
        nonlocal eid
        rows.append((eid, BASE + pd.Timedelta(seconds=sec), user, etype,
                     1.0, "{}"))
        eid += 1

    # pin the window to [0, 1000] with neutral views for every user/half
    for user in (1, 2, 3, 4):
        add(user, 0, "view")
        add(user, 1000, "view")
    for s in (10, 20, 30):
        add(1, s, "purchase")        # user 1: b (pre-only)
    for s in (910, 920, 930):
        add(2, s, "purchase")        # user 2: c (post-only)
    for s in (10, 20, 30, 910, 920, 930):
        add(3, s, "purchase")        # user 3: concordant converter
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_mcnemar_test(spark, d).collect()[0]
    assert out["n_paired"] == 4
    assert out["b"] == 1 and out["c"] == 1
    assert out["chi2_corrected"] == 0.5


def test_bland_altman_constant_offset(spark):
    """Docs where the BPE count exceeds the whitespace count by exactly
    2 everywhere: bias = 2, sd = 0, limits collapse onto the bias, and
    nothing lies outside them."""
    docs = pd.DataFrame(
        [(i, "a.b c", "en", "A") for i in range(6)],
        columns=["doc_id", "text", "lang", "source"],
    )
    docs["n_chars"] = docs["text"].str.len()
    d = _tmp_dir(documents=docs)
    out = pipelines.q_bland_altman(spark, d).collect()[0]
    # ws = {"a.b", "c"} = 2; bpe = {a, ., b, c} = 4 → diff = 2
    assert out["n"] == 6
    assert out["bias"] == 2.0 and out["sd_diff"] == 0.0
    assert out["loa_low"] == 2.0 and out["loa_high"] == 2.0
    assert out["frac_outside"] == 0.0


def test_deming_satisfies_its_quadratic(spark):
    """The Deming slope must be the positive root of
    sxy·m² + (sxx−syy)·m − sxy = 0; recover the moments from the
    emitted OLS slope and correlation and check the residual, plus the
    attenuation ordering |deming| ≥ |ols| for positively-correlated
    counters."""
    out = pipelines.q_deming_regression(spark, SF_DIR).collect()[0]
    m = out["slope_deming"]
    ols = out["slope_ols"]  # sxy/sxx
    r = out["corr"]         # sxy/sqrt(sxx*syy)
    assert r > 0 and ols > 0
    # syy/sxx = (ols/r)^2; divide the quadratic by sxx:
    # ols·m² + (1 − (ols/r)²)·m − ols ≈ 0
    resid = ols * m * m + (1.0 - (ols / r) ** 2) * m - ols
    assert abs(resid) < 1e-3
    assert m >= ols - 1e-9


def test_batch_k_ops_stay_jvm_side(spark):
    for q in (
        pipelines.q_paired_ttest,
        pipelines.q_mcnemar_test,
        pipelines.q_bland_altman,
        pipelines.q_deming_regression,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
