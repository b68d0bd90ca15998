"""Oracle-independent goldens/invariants for the session-6 batch J
operators (ipw_ate … ipf_raking)."""

import os
import tempfile
from collections import defaultdict

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6d_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def test_ipw_null_effect_matches_stratified(spark):
    """Outcome depends only on the stratum → IPW ATE is exactly 0, and
    both arm means equal the propensity-weighted stratum mix."""
    rows = []
    eid = 0
    for user in [1, 2, 3, 4]:
        for etype, v in [("click", 1.5), ("view", 4.0)]:
            for _ in range(2):
                rows.append(
                    (eid, BASE + pd.Timedelta(minutes=eid), user, etype,
                     v, "{}")
                )
                eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_ipw_ate(spark, d).collect()[0]
    assert out["ate_ipw"] == 0.0
    assert out["mu_treated"] == out["mu_control"]


def test_jackknife_exact_ratio_has_zero_se(spark):
    """purchases = 2 × clicks every single day: every leave-one-out
    replicate equals the full ratio → SE = 0, bias = 0."""
    rows = []
    eid = 0
    for day in range(12):
        c = 3 + day % 4
        for _ in range(c):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 3,
                         "click", 1.0, "{}"))
            eid += 1
        for _ in range(2 * c):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 3,
                         "purchase", 1.0, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_jackknife_ratio(spark, d).collect()[0]
    assert out["ratio"] == 2.0
    assert out["jk_se"] == 0.0
    assert out["jk_bias"] == 0.0


def test_kish_equal_weights_full_efficiency(spark):
    """Equal weights are worth their full count: n_eff = n,
    efficiency = design effect = 1."""
    rows = [
        (i, BASE + pd.Timedelta(minutes=i), i % 4, "view", 5.0, "{}")
        for i in range(30)
    ]
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_kish_neff(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_eff"] == float(r["n"])
    assert r["efficiency"] == 1.0 and r["design_effect"] == 1.0


def test_ipf_uniform_table_is_fixpoint(spark):
    """A table whose margins already equal the uniform targets is an IPF
    fixpoint: every weight stays 1 and the margin error is 0."""
    cust = pd.DataFrame(
        [(1, "a", 0, 0.0, "SEGA"), (2, "b", 0, 0.0, "SEGB")],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    )
    orders = pd.DataFrame(
        [
            (k, 1 + k % 2, "O", 100.0, BASE.date(),
             "1-URGENT" if (k // 2) % 2 == 0 else "2-HIGH")
            for k in range(40)
        ],
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    d = _tmp_dir(orders=orders, customer=cust)
    rows = pipelines.q_ipf_raking(spark, d).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["w"] == 1.0 and r["raked"] == float(r["cnt"])
        assert r["max_row_err"] == 0.0


def test_ipf_column_margins_exact_after_final_step(spark):
    """The last IPF half-step scales columns, so every column of the
    raked table must hit its target N/n_p exactly (up to row
    rounding)."""
    rows = pipelines.q_ipf_raking(spark, SF_DIR).collect()
    by_p = defaultdict(float)
    total = 0.0
    for r in rows:
        by_p[r["p"]] += r["raked"]
        total += r["raked"]
    target = total / len(by_p)
    for p, s in by_p.items():
        assert abs(s - target) < 1e-2, (p, s, target)


def test_batch_j_ops_stay_jvm_side(spark):
    for q in (
        pipelines.q_ipw_ate,
        pipelines.q_jackknife_ratio,
        pipelines.q_kish_neff,
        pipelines.q_ipf_raking,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
