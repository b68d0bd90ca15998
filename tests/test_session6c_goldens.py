"""Oracle-independent goldens/invariants for the final session-6 batches
(newman_modularity … burstiness_index)."""

import os
import tempfile

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6c_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def _lineitem(pairs):
    li = pd.DataFrame(pairs, columns=["l_orderkey", "l_partkey"])
    for col in ["l_quantity", "l_extendedprice", "l_discount"]:
        li[col] = 1.0
    li["l_returnflag"] = "N"
    return li


def test_modularity_two_cliques(spark):
    """Two disjoint triangles: LPA resolves each clique to its minimum
    label, and Q = 2·(3/6 − (6/12)²) = 0.5 exactly."""
    pairs = []
    for order, parts in enumerate([(0, 1), (1, 2), (0, 2),
                                   (3, 4), (4, 5), (3, 5)]):
        for p in parts:
            pairs.append((order, p))
    d = _tmp_dir(lineitem=_lineitem(pairs))
    rows = pipelines.q_newman_modularity(spark, d).collect()
    assert len(rows) == 2
    assert all(r["size"] == 3 and r["e_in"] == 3 and r["d_c"] == 6
               for r in rows)
    assert all(r["q_modularity"] == 0.5 for r in rows)


def test_hodges_lehmann_symmetric(spark):
    """A symmetric daily-value distribution: the Walsh-average median
    equals the plain median equals the center."""
    rows = []
    vals = [8.0, 9.0, 10.0, 11.0, 12.0] * 3
    for day, v in enumerate(vals):
        rows.append((day, BASE + pd.Timedelta(days=day), day % 3, "view",
                     v, "{}"))
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_hodges_lehmann(spark, d).collect()[0]
    assert out["n_days"] == 15
    assert out["n_pairs"] == 15 * 16 // 2
    assert out["plain_median"] == 10.0
    assert out["hl_estimate"] == 10.0


def test_nb_dispersion_two_point_golden(spark):
    """3 users × 6 days, each active on 1/3 of days with 3 events:
    m = 1, E[x²] = 3, v = 2 → dispersion 2, r = 1, p = 0.5,
    NB zero fraction 0.5 vs observed 2/3."""
    rows = []
    eid = 0
    for user in range(3):
        for day in range(6):
            if day % 3 == user % 3:
                for _ in range(3):
                    rows.append((eid, BASE + pd.Timedelta(days=day), user,
                                 "view", 1.0, "{}"))
                    eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_nb_dispersion_fit(spark, d).collect()[0]
    assert out["n_users"] == 3 and out["n_days"] == 6
    assert out["mean_per_cell"] == 1.0
    assert out["var_per_cell"] == 2.0
    assert out["dispersion"] == 2.0
    assert out["nb_r"] == 1.0 and out["nb_p"] == 0.5
    assert out["nb_zero_frac"] == 0.5
    assert out["obs_zero_frac"] == round(2.0 / 3.0, 6)


def test_power_analysis_self_consistent(spark):
    """n_per_arm and days_required must be the closed-form recomputation
    from the emitted mean/var/dau columns."""
    import math

    out = pipelines.q_power_analysis(spark, SF_DIR).collect()[0]
    zz = (pipelines.PWR_Z_ALPHA + pipelines.PWR_Z_BETA) ** 2
    delta = out["mean_value"] * pipelines.PWR_MDE_FRAC
    n = math.ceil(2.0 * out["var_value"] * zz / (delta * delta))
    # emitted values use unrounded moments; allow one unit of slack
    assert abs(out["n_per_arm"] - n) <= 1
    assert out["days_required"] >= 1
    assert abs(out["mde"] - round(delta, 6)) < 1e-4


def test_clustering_coefficient_clique(spark):
    """K5 (five parts always co-ordered): every wedge closes →
    transitivity = 1 and every local coefficient is 1."""
    pairs = [(0, p) for p in range(5)]
    d = _tmp_dir(lineitem=_lineitem(pairs))
    out = pipelines.q_clustering_coefficient(spark, d).collect()[0]
    assert out["n_nodes"] == 5
    assert out["n_edges"] == 10
    assert out["n_triangles"] == 10
    assert out["transitivity"] == 1.0
    assert out["avg_local_cc"] == 1.0


def test_cramers_v_perfect_association(spark):
    """Segment determines priority exactly → V = 1."""
    cust = pd.DataFrame(
        [(1, "a", 0, 0.0, "SEGA"), (2, "b", 0, 0.0, "SEGB")],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    )
    orders = pd.DataFrame(
        [
            (k, 1 + k % 2, "O", 100.0, BASE.date(),
             "1-URGENT" if k % 2 == 1 else "2-HIGH")
            for k in range(40)
        ],
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    d = _tmp_dir(orders=orders, customer=cust)
    out = pipelines.q_cramers_v(spark, d).collect()[0]
    assert out["n_rows"] == 2 and out["n_cols"] == 2
    assert out["cramers_v"] == 1.0


def test_ece_bounded_by_mce(spark):
    """ECE is a weighted mean of the per-bin gaps, MCE their max:
    0 ≤ ECE ≤ MCE ≤ 1 always."""
    out = pipelines.q_ece_calibration(spark, SF_DIR).collect()[0]
    assert 0.0 <= out["ece"] <= out["mce"] <= 1.0
    assert out["n_bins"] >= 1


def test_taylor_law_synchronized_bursts(spark):
    """Each user fires all its events on a single day: v = a²(D−1)/D²
    and m = a/D put every user exactly on the slope-2 log-log line."""
    rows = []
    eid = 0
    for user, a in enumerate([2, 4, 8, 16]):
        for _ in range(a):
            rows.append((eid, BASE + pd.Timedelta(days=user), user,
                         "view", 1.0, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_taylor_law(spark, d).collect()[0]
    assert out["n_users"] == 4
    assert abs(out["taylor_b"] - 2.0) < 1e-6
    assert abs(out["r2"] - 1.0) < 1e-6


def test_burstiness_metronomic_users(spark):
    """Perfectly regular interarrivals → σ = 0 → B = −1 for every user:
    one 'regular' band holding everyone, mean B = −1."""
    rows = []
    eid = 0
    for user in range(3):
        for step in range(10):
            rows.append(
                (eid, BASE + pd.Timedelta(hours=step * (user + 1)), user,
                 "view", 1.0, "{}")
            )
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_burstiness_index(spark, d).collect()
    assert len(out) == 1
    assert out[0]["band"] == "regular"
    assert out[0]["n"] == 3 and out[0]["n_users"] == 3
    assert out[0]["mean_b"] == -1.0


def test_final_session6_ops_stay_jvm_side(spark):
    for q in (
        pipelines.q_newman_modularity,
        pipelines.q_hodges_lehmann,
        pipelines.q_nb_dispersion_fit,
        pipelines.q_power_analysis,
        pipelines.q_clustering_coefficient,
        pipelines.q_cramers_v,
        pipelines.q_ece_calibration,
        pipelines.q_taylor_law,
        pipelines.q_burstiness_index,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
