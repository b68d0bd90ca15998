"""Oracle-independent goldens/invariants for the session-6 batch L
operators (pacf_daily … spectral_peaks)."""

import math
import os
import tempfile

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6f_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def test_pacf_lag1_equals_acf(spark):
    """φ₁₁ = r₁ by construction of the Durbin-Levinson recursion, and
    every partial correlation is a correlation (|pacf| bounded)."""
    rows = {r["lag"]: r for r in
            pipelines.q_pacf_daily(spark, SF_DIR).collect()}
    assert set(rows) == set(range(1, pipelines.PACF_K + 1))
    assert rows[1]["pacf"] == rows[1]["acf"]
    for r in rows.values():
        assert abs(r["pacf"]) <= 1.0 + 1e-9


def test_runs_alternating_series(spark):
    """Perfectly alternating above/below days: every day starts a new
    run → R = n, and z matches the closed form."""
    rows = []
    eid = 0
    for day in range(20):
        for _ in range(5 if day % 2 == 0 else 1):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 3,
                         "view", 1.0, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_runs_test(spark, d).collect()[0]
    n, n1, n2, r = 20, 10, 10, 20
    assert (out["n_days"], out["n_above"], out["n_below"],
            out["n_runs"]) == (n, n1, n2, r)
    e = 1.0 + 2.0 * n1 * n2 / n
    v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    assert abs(out["z"] - round((r - e) / math.sqrt(v), 6)) < 1e-6
    assert out["expected_runs"] == e


def test_newey_west_self_consistent(spark):
    """The emitted correction must equal se_nw/se_iid, and both SEs are
    positive on real data."""
    out = pipelines.q_newey_west_se(spark, SF_DIR).collect()[0]
    assert out["se_iid"] > 0 and out["se_nw"] > 0
    assert abs(out["correction"] - out["se_nw"] / out["se_iid"]) < 1e-4


def test_spectral_square_wave_peaks_at_24(spark):
    """A period-24 square wave (12 busy hours, 12 quiet) concentrates
    its power at the 24 h fundamental — even harmonics vanish, so 12
    and 6 stay near zero and 24 must be the flagged peak."""
    rows = []
    eid = 0
    for day in range(10):
        for hour in range(24):
            for _ in range(5 if hour < 12 else 1):
                rows.append(
                    (eid, BASE + pd.Timedelta(days=day, hours=hour),
                     eid % 3, "view", 1.0, "{}")
                )
                eid += 1
    d = _tmp_dir(events=_events(rows))
    out = {r["period"]: r for r in
           pipelines.q_spectral_peaks(spark, d).collect()}
    assert out[24]["is_peak"] == 1
    assert out[24]["share"] > 0.9
    for p in (6, 12):
        assert out[p]["is_peak"] == 0


def test_batch_l_ops_stay_jvm_side(spark):
    for q in (
        pipelines.q_runs_test,
        pipelines.q_newey_west_se,
        pipelines.q_spectral_peaks,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
