"""Oracle-independent goldens/invariants for the session-6 batch M
operators (map_eval … hhi_concentration)."""

import os
import tempfile

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6g_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def test_map_perfect_ranking(spark):
    """Both relevant docs ranked first: AP = 1 and R-precision = 1; the
    list is shorter than 10 so P@10 is undefined (NULL) by design."""
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
    out = pipelines.q_map_eval(spark, d).collect()[0]
    assert out["n_rel_total"] == 2
    assert out["average_precision"] == 1.0
    assert out["r_precision"] == 1.0
    assert out["p_at_10"] is None


def test_markov_eval_deterministic_chain(spark):
    """Users strictly alternate click → view in BOTH halves: the trained
    argmax predictor is exact on the held-out half while the majority
    baseline cannot exceed the class share."""
    rows = []
    eid = 0
    for user in range(4):
        for step in range(20):
            rows.append(
                (eid, BASE + pd.Timedelta(hours=step, seconds=user), user,
                 "click" if step % 2 == 0 else "view", 1.0, "{}")
            )
            eid += 1
    d = _tmp_dir(events=_events_df(rows))
    out = pipelines.q_markov_next_event_eval(spark, d).collect()[0]
    assert out["n_test"] > 0
    assert out["acc_markov"] == 1.0
    assert out["lift"] > 1.5


def _events_df(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def test_price_elasticity_exact_power_law(spark):
    """qty = 1024·price⁻² exactly across four parts → elasticity −2 with
    a perfect log-log fit."""
    rows = []
    for key, p in enumerate([1.0, 2.0, 4.0, 8.0]):
        q = 1024.0 / (p * p)
        rows.append((key, key, q, p * q, 0.0, "N"))
    li = pd.DataFrame(
        rows,
        columns=["l_orderkey", "l_partkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_returnflag"],
    )
    d = _tmp_dir(lineitem=li)
    out = pipelines.q_price_elasticity(spark, d).collect()[0]
    assert out["n_parts"] == 4
    assert abs(out["elasticity"] - (-2.0)) < 1e-6
    assert abs(out["r2"] - 1.0) < 1e-6


def test_hhi_equal_and_monopoly(spark):
    """Four equal customers → HHI = 1/4, effective n = 4; a one-customer
    nation → HHI = 1."""
    cust = pd.DataFrame(
        [(i, f"c{i}", 0 if i <= 4 else 1, 0.0, "SEG")
         for i in range(1, 6)],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    )
    orders = pd.DataFrame(
        [(k, 1 + k % 4, "O", 100.0, BASE.date(), "1-URGENT")
         for k in range(40)]
        + [(100, 5, "O", 777.0, BASE.date(), "1-URGENT")],
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    d = _tmp_dir(orders=orders, customer=cust)
    out = {r["nationkey"]: r for r in
           pipelines.q_hhi_concentration(spark, d).collect()}
    assert out[0]["hhi"] == 0.25 and out[0]["effective_n"] == 4.0
    assert out[1]["hhi"] == 1.0 and out[1]["n_customers"] == 1


def test_batch_m_ops_stay_jvm_side(spark):
    for q in (
        pipelines.q_map_eval,
        pipelines.q_markov_next_event_eval,
        pipelines.q_price_elasticity,
        pipelines.q_hhi_concentration,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
