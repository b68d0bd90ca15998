"""Oracle-independent goldens/invariants for the session-6 batch O
operators (price_index … seasonal_strength)."""

import os
import tempfile

import pandas as pd

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = pd.Timestamp("2024-03-01")


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6i_golden_")
    for name, df in tables.items():
        if "ts" in df.columns:
            # Spark cannot read TIMESTAMP(NANOS) parquet (see CLAUDE.md)
            df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(rows):
    return pd.DataFrame(rows, columns=EVENT_COLS)


def test_price_index_uniform_doubling(spark):
    """Every matched part doubles in price at unchanged quantities:
    Laspeyres = Paasche = Fisher = 2 exactly."""
    orders = pd.DataFrame(
        [
            (1, 1, "O", 100.0, pd.Timestamp("1995-06-01").date(),
             "1-URGENT"),
            (2, 1, "O", 100.0, pd.Timestamp("1999-06-01").date(),
             "1-URGENT"),
        ],
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    li_rows = []
    for part, price, qty in [(1, 10.0, 3.0), (2, 20.0, 5.0),
                             (3, 7.0, 2.0)]:
        li_rows.append((1, part, qty, price * qty, 0.0, "N"))
        li_rows.append((2, part, qty, 2.0 * price * qty, 0.0, "N"))
    li = pd.DataFrame(
        li_rows,
        columns=["l_orderkey", "l_partkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_returnflag"],
    )
    d = _tmp_dir(orders=orders, lineitem=li)
    out = pipelines.q_price_index(spark, d).collect()[0]
    assert out["n_parts_matched"] == 3
    assert out["laspeyres"] == 2.0
    assert out["paasche"] == 2.0
    assert out["fisher"] == 2.0


def test_profile_similarity_identical_and_disjoint(spark):
    """Types with identical hourly profiles have cosine 1; types active
    in disjoint hours have cosine 0."""
    rows = []
    eid = 0
    for day in range(3):
        for hour in (2, 14):
            for etype in ("click", "view"):  # identical profiles
                rows.append(
                    (eid, BASE + pd.Timedelta(days=day, hours=hour),
                     eid % 3, etype, 1.0, "{}")
                )
                eid += 1
        rows.append(  # 'error' only in a disjoint hour
            (eid, BASE + pd.Timedelta(days=day, hours=20), eid % 3,
             "error", 1.0, "{}")
        )
        eid += 1
    d = _tmp_dir(events=_events(rows))
    out = {(r["type_a"], r["type_b"]): r["cosine"] for r in
           pipelines.q_profile_similarity(spark, d).collect()}
    assert out[("click", "view")] == 1.0
    assert out[("click", "error")] == 0.0
    assert out[("error", "view")] == 0.0


def test_adjusted_residuals_independent_table(spark):
    """A perfectly balanced 2×2 (independent margins): every observed
    count equals its expectation → all adjusted residuals 0, nothing
    significant."""
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
    for r in pipelines.q_adjusted_residuals(spark, d).collect():
        assert r["adj_resid"] == 0.0 and r["significant"] == 0
        assert r["o"] == 10 and r["expected"] == 10.0


def test_seasonal_strength_square_wave(spark):
    """A strong 24 h square wave with no drift: seasonal strength near
    1, trend strength far below it."""
    rows = []
    eid = 0
    for day in range(6):
        for hour in range(24):
            for _ in range(5 if hour < 12 else 1):
                rows.append(
                    (eid, BASE + pd.Timedelta(days=day, hours=hour),
                     eid % 3, "view", 1.0, "{}")
                )
                eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_seasonal_strength(spark, d).collect()
    assert len(out) == 1
    assert out[0]["seasonal_strength"] > 0.8
    # cnt − seasonal is exactly constant here → Var(T+R) = 0 → the
    # trend strength is degenerate by construction and must be NULL
    assert out[0]["trend_strength"] is None


def test_batch_o_ops_stay_jvm_side(spark):
    for q in (
        pipelines.q_price_index,
        pipelines.q_profile_similarity,
        pipelines.q_adjusted_residuals,
        pipelines.q_seasonal_strength,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
