"""Oracle-independent goldens/invariants for the session-6 batch N
operators (rmst … spc_imr_chart)."""

import math
import os
import tempfile

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6h_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def test_rmst_no_events_equals_horizon(spark):
    """No purchases at all → S(t) = 1 on the whole window → RMST equals
    the horizon exactly."""
    rows = [
        (i, BASE + pd.Timedelta(days=i % 5), i % 4, "view", 1.0, "{}")
        for i in range(40)
    ]
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_rmst(spark, d).collect()[0]
    assert out["horizon_days"] == pipelines.KM_HORIZON_DAYS
    assert out["rmst"] == float(pipelines.KM_HORIZON_DAYS)
    assert out["rmst_frac"] == 1.0


def test_cochran_armitage_perfect_trend(spark):
    """High-value iff band ≥ 2, equal band sizes: z matches the closed
    form recomputed from the emitted per-band table."""
    cust_rows = []
    order_rows = []
    key = 0
    for band in range(4):
        for i in range(5):
            cid = band * 10 + i + 1
            cust_rows.append(
                (cid, f"c{cid}", 0, band * pipelines.CA_BAND + 100.0,
                 "SEG")
            )
            spend = 9.0e6 if band >= 2 else 1000.0
            order_rows.append(
                (key, cid, "O", spend, BASE.date(), "1-URGENT")
            )
            key += 1
    cust = pd.DataFrame(
        cust_rows,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    )
    orders = pd.DataFrame(
        order_rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    d = _tmp_dir(orders=orders, customer=cust)
    rows = pipelines.q_cochran_armitage(spark, d).collect()
    rates = {r["band"]: r["rate"] for r in rows}
    assert rates == {0: 0.0, 1: 0.0, 2: 1.0, 3: 1.0}
    n = {r["band"]: r["n"] for r in rows}
    r_ = {r["band"]: r["n_high_value"] for r in rows}
    nn = sum(n.values())
    pbar = sum(r_.values()) / nn
    swr = sum(b * r_[b] for b in n)
    swn = sum(b * n[b] for b in n)
    sw2n = sum(b * b * n[b] for b in n)
    z = (swr - pbar * swn) / math.sqrt(
        pbar * (1 - pbar) * (sw2n - swn * swn / nn)
    )
    assert abs(rows[0]["z_trend"] - round(z, 6)) < 1e-6
    assert rows[0]["z_trend"] > 3.0


def test_odds_ratio_perfect_association(spark):
    """Treated all heavy purchasers, controls none: with the Haldane
    correction OR = (5.5·5.5)/(0.5·0.5) = 121 and risk difference 1."""
    rows = []
    eid = 0
    m = pipelines.OR_MIN_PURCH
    for user in range(1, 11):  # odd users treated
        n_purch = m + 1 if user % 2 == 1 else 0
        rows.append((eid, BASE, user, "view", 1.0, "{}"))
        eid += 1
        for k in range(n_purch):
            rows.append(
                (eid, BASE + pd.Timedelta(minutes=k), user, "purchase",
                 1.0, "{}")
            )
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_odds_ratio_2x2(spark, d).collect()[0]
    assert (out["a"], out["b"], out["c"], out["d"]) == (5, 0, 0, 5)
    assert out["odds_ratio"] == 121.0
    assert out["risk_difference"] == 1.0
    assert out["or_ci_low"] < 121.0 < out["or_ci_high"]


def test_spc_flat_process_in_control(spark):
    """A perfectly flat daily count: zero moving range, limits collapse
    onto the center, nothing flags out of control."""
    rows = []
    eid = 0
    for day in range(15):
        for _ in range(4):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 3,
                         "view", 1.0, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_spc_imr_chart(spark, d).collect()[0]
    assert out["n_days"] == 15
    assert out["xbar"] == 4.0 and out["mrbar"] == 0.0
    assert out["ucl_x"] == 4.0 and out["lcl_x"] == 4.0
    assert out["n_ooc_x"] == 0 and out["n_ooc_mr"] == 0


def test_batch_n_ops_stay_jvm_side(spark):
    for q in (
        pipelines.q_rmst,
        pipelines.q_cochran_armitage,
        pipelines.q_odds_ratio_2x2,
        pipelines.q_spc_imr_chart,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
