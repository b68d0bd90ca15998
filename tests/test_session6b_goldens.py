"""Oracle-independent goldens/invariants for the late session-6 operators
(eb_shrinkage … err_eval) — constructed fixtures with hand-computed
expectations plus the conservation laws the formulas must obey."""

import math
import os
import tempfile

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6b_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def _orders(rows):
    return pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )


def _customers(rows):
    return pd.DataFrame(
        rows,
        columns=[
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        ],
    )


def test_eb_shrinkage_contracts_toward_prior(spark):
    """Every shrunk rate must sit between the raw rate and the prior
    mean, strictly closer to the prior than the raw rate was."""
    rows = pipelines.q_eb_shrinkage(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        pm = r["prior_alpha"] / (r["prior_alpha"] + r["prior_beta"])
        assert abs(r["shrunk_rate"] - pm) <= abs(r["raw_rate"] - pm) + 1e-6
        lo, hi = sorted([r["raw_rate"], pm])
        assert lo - 1e-6 <= r["shrunk_rate"] <= hi + 1e-6


def test_gumbel_degenerate_constant_maxima(spark):
    """Identical daily profiles → the block maxima are constant → σ = 0,
    β = 0, and every location/return-level equals the common maximum."""
    rows = []
    eid = 0
    for day in range(10):
        for hour in (3, 9):  # peak hour 9 with 4 events, hour 3 with 1
            for _ in range(4 if hour == 9 else 1):
                rows.append(
                    (eid, BASE + pd.Timedelta(days=day, hours=hour),
                     eid % 5, "view", 1.0, "{}")
                )
                eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_gumbel_maxima(spark, d).collect()[0]
    assert out["n_blocks"] == 10
    assert out["mean_max"] == 4.0
    assert out["sd_max"] == 0.0
    assert out["beta_scale"] == 0.0
    assert out["mu_loc"] == 4.0
    assert out[f"ret_{pipelines.GUMBEL_RET_T}d"] == 4.0


def test_qte_null_effect(spark):
    """Both arms see the identical value multiset → every decile QTE is
    exactly 0."""
    rows = []
    eid = 0
    for user in (1, 2):  # one odd (treated), one even (control)
        for v in range(1, 41):
            rows.append(
                (eid, BASE + pd.Timedelta(minutes=eid), user, "view",
                 float(v), "{}")
            )
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_quantile_treatment_effects(spark, d).collect()
    assert len(out) == 9
    for r in out:
        assert r["qte"] == 0.0 and r["q_control"] == r["q_treated"]


def test_pettitt_constructed_changepoint(spark):
    """10 days at value 1 then 10 days at value 5: ranks are two tied
    blocks (avg 5.5 / 15.5), so U peaks at the boundary with
    K = |2·55 − 10·21| = 100 and the changepoint is day 10."""
    rows = []
    for day in range(20):
        v = 1.0 if day < 10 else 5.0
        rows.append((day, BASE + pd.Timedelta(days=day), day % 3, "view",
                     v, "{}"))
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_pettitt_test(spark, d).collect()[0]
    assert out["n_days"] == 20
    assert out["k_stat"] == 100.0
    assert out["cp_day"] == (BASE + pd.Timedelta(days=9)).date()
    expect_p = round(2.0 * math.exp(-6.0 * 100.0**2 / (20**3 + 20**2)), 6)
    assert abs(out["p_approx"] - expect_p) < 1e-6


def test_t_closeness_single_class_is_global(spark):
    """One equivalence class holding the whole corpus → its sensitive
    distribution IS the global one → TVD = 0, t-close everywhere."""
    cust = _customers(
        [(i, f"c{i}", 7, 500.0, "SEG") for i in range(1, 5)]
    )
    orders = _orders(
        [
            (k, 1 + k % 4, "O", 100.0, BASE.date(),
             ["1-URGENT", "2-HIGH", "3-MEDIUM"][k % 3])
            for k in range(30)
        ]
    )
    d = _tmp_dir(orders=orders, customer=cust)
    rows = pipelines.q_t_closeness(spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["tvd"] == 0.0 and rows[0]["t_close"] == 1


def test_entropy_rate_deterministic_chain(spark):
    """Users that strictly alternate click → view → click → … have a
    deterministic transition matrix: every conditional entropy and the
    rate are exactly 0."""
    rows = []
    eid = 0
    for user in range(4):
        for step in range(10):
            rows.append(
                (eid, BASE + pd.Timedelta(minutes=step, seconds=user),
                 user, "click" if step % 2 == 0 else "view", 1.0, "{}")
            )
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_entropy_rate(spark, d).collect()
    assert {r["s"] for r in out} == {"click", "view"}
    for r in out:
        assert r["h_state"] == 0.0 and r["h_rate"] == 0.0


def test_rich_club_complete_graph(spark):
    """Five parts always ordered together form a complete graph of
    degree 4: φ(k) = 1 for k < 4 and is NULL above the max degree."""
    rows = []
    for order in range(3):  # 3 orders → every pair co-occurs 3 ≥ minw
        for part in range(5):
            rows.append((order, part))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    for col in ["l_quantity", "l_extendedprice", "l_discount"]:
        li[col] = 1.0
    li["l_returnflag"] = "N"
    d = _tmp_dir(lineitem=li)
    out = {r["k"]: r for r in pipelines.q_rich_club(spark, d).collect()}
    assert out[2]["n_nodes"] == 5 and out[2]["n_edges"] == 20
    assert out[2]["phi"] == 1.0
    assert out[4]["n_nodes"] == 0 and out[4]["phi"] is None


def test_conformal_noiseless_model_covers_fully(spark):
    """Daily counts exactly linear in the day index → all residuals are
    0 → the conformal radius is 0 and held-out coverage is 1."""
    rows = []
    eid = 0
    for day in range(20):
        for _ in range(5 + 2 * day):  # y = 5 + 2x, exact line
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 3,
                         "view", 1.0, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_conformal_interval(spark, d).collect()[0]
    assert out["n_calib"] == 10 and out["n_test"] == 10
    assert out["q_radius"] == 0.0
    assert out["coverage"] == 1.0


def test_fwl_recovers_structural_slope(spark):
    """clicks = x + e, purchases = x + 3e (e = alternating ±1): the raw
    slope is confounded by the shared trend x, but partialling x out
    leaves purchases_resid = 3·clicks_resid exactly — β = 3, partial
    correlation 1."""
    rows = []
    eid = 0
    for day in range(20):
        x = 10 + day
        e = 1 if day % 2 == 0 else -1
        for _ in range(x + e):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 3,
                         "click", 1.0, "{}"))
            eid += 1
        for _ in range(x + 3 * e):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 3,
                         "purchase", 1.0, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_fwl_partial_regression(spark, d).collect()[0]
    assert abs(out["beta_controlled"] - 3.0) < 1e-6
    assert abs(out["corr_partial"] - 1.0) < 1e-6
    assert abs(out["beta_naive"] - 3.0) > 0.3  # visibly confounded


def test_croston_periodic_demand_fixpoint(spark):
    """Demand of size 2 exactly every 4th day: the EWMAs sit at their
    fixpoint (z = 2, p = 4) so the forecast rate is exactly 0.5."""
    rows = []
    eid = 0
    for day in range(24):
        rows.append((eid, BASE + pd.Timedelta(days=day, hours=1), 1,
                     "view", 1.0, "{}"))
        eid += 1
        if day % 4 == 3:
            for _ in range(2):
                rows.append(
                    (eid, BASE + pd.Timedelta(days=day, hours=2),
                     pipelines.CROSTON_USER_MOD, "error", 1.0, "{}")
                )
                eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_croston_forecast(spark, d).collect()[0]
    assert out["n_days"] == 24 and out["n_demand_days"] == 6
    assert out["smoothed_size"] == 2.0
    assert out["smoothed_interval"] == 4.0
    assert out["forecast_rate"] == 0.5


def test_stl_anomalies_flat_series_silent(spark):
    """A perfectly periodic hourly rate decomposes with zero residual →
    MAD = 0 and no anomalies."""
    rows = []
    eid = 0
    for day in range(6):
        for hour in range(24):
            for _ in range(3):
                rows.append(
                    (eid, BASE + pd.Timedelta(days=day, hours=hour),
                     eid % 3, "view", 1.0, "{}")
                )
                eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_stl_anomalies(spark, d).collect()
    assert len(out) == 1
    assert out[0]["n_anomalies"] == 0
    assert out[0]["mad"] == 0.0 and out[0]["max_abs_resid"] == 0.0


def test_err_hand_computed_cascade(spark):
    """Three docs: rel-2 ranked first, rel-1 second, one irrelevant:
    ERR = 3/4 + (1/2)·(1/4)·(1/4) = 0.78125 exactly."""
    docs = pd.DataFrame(
        [
            (0, "spark join", "en", "A"),
            (1, "spark", "en", "A"),
            (2, "nothing here", "en", "A"),
        ],
        columns=["doc_id", "text", "lang", "source"],
    )
    docs["n_chars"] = docs["text"].str.len()
    d = _tmp_dir(documents=docs)
    out = pipelines.q_err_eval(spark, d).collect()[0]
    assert out["n_rel_in_k"] == 2
    assert out["err"] == 0.78125


def test_late_session6_ops_stay_jvm_side(spark):
    """The late session-6 operators are pure column expressions end to
    end — no Python evaluator in any plan."""
    for q in (
        pipelines.q_eb_shrinkage,
        pipelines.q_gumbel_maxima,
        pipelines.q_quantile_treatment_effects,
        pipelines.q_pettitt_test,
        pipelines.q_t_closeness,
        pipelines.q_entropy_rate,
        pipelines.q_rich_club,
        pipelines.q_conformal_interval,
        pipelines.q_fwl_partial_regression,
        pipelines.q_croston_forecast,
        pipelines.q_stl_anomalies,
        pipelines.q_err_eval,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
