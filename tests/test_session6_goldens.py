"""Oracle-independent goldens/invariants for the session-6 operators
(kruskal_wallis … bayesian_ab).

The driver gate proves Spark == DuckDB, but both engines run the SAME
formula, so a shared-algorithm bug would pass it. These tests pin
hand-computed expectations on constructed fixtures and conservation laws
the formulas must obey.
"""

import math
import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F  # noqa: F401 (plan gate below)

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _tmp_dir(**tables):
    d = tempfile.mkdtemp(prefix="s6_golden_")
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


def _docs(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    return df


BASE = pd.Timestamp("2024-03-01")


# ---------------------------------------------------------------- kruskal


def test_kruskal_rank_sum_conservation(spark):
    """Average ranks must partition the total rank sum: Σ n·mean_rank ==
    N(N+1)/2 exactly, and the tie correction can only grow H."""
    rows = pipelines.q_kruskal_wallis(spark, SF_DIR).collect()
    n_tot = sum(r["n"] for r in rows)
    rank_sum = sum(r["n"] * r["mean_rank"] for r in rows)
    assert abs(rank_sum - n_tot * (n_tot + 1) / 2.0) < n_tot * 1e-5
    assert rows[0]["h_adj"] >= rows[0]["h_val"] - 1e-9


# ---------------------------------------------------------- wasserstein


def test_wasserstein_two_point_golden(spark):
    """Two segments at bin 0 / bin 1 with equal mass: each segment's CDF
    differs from the pooled CDF by 0.5 on exactly one bin → W1 = 2500."""
    cust = _customers(
        [
            (1, "a", 0, 0.0, "SEGA"),
            (2, "b", 0, 0.0, "SEGA"),
            (3, "c", 0, 0.0, "SEGB"),
            (4, "d", 0, 0.0, "SEGB"),
        ]
    )
    orders = _orders(
        [
            (i, c, "O", p, BASE.date(), "1-URGENT")
            for i, (c, p) in enumerate(
                [(1, 2500.0), (2, 2500.0), (1, 2500.0), (2, 2500.0),
                 (3, 7500.0), (4, 7500.0), (3, 7500.0), (4, 7500.0)]
            )
        ]
    )
    d = _tmp_dir(orders=orders, customer=cust)
    got = {
        r["seg"]: r["w1"]
        for r in pipelines.q_wasserstein_drift(spark, d).collect()
    }
    assert got == {"SEGA": 2500.0, "SEGB": 2500.0}


def test_wasserstein_gap_weighted_golden(spark):
    """Empty-bin runs must count once per MISSING bin, not once per
    occupied bin: SEGA all at bin 0, SEGB all at bin 10, pooled = half
    each.  The CDF difference of 0.5 persists across the 10-bin gap, so
    the true W1 is 0.5 · 10 · 5000 = 25000 per segment (moving half the
    mass 10 bins).  The pre-fix observed-bins-only formula gave 2500."""
    cust = _customers(
        [
            (1, "a", 0, 0.0, "SEGA"),
            (2, "b", 0, 0.0, "SEGA"),
            (3, "c", 0, 0.0, "SEGB"),
            (4, "d", 0, 0.0, "SEGB"),
        ]
    )
    orders = _orders(
        [
            (i, c, "O", p, BASE.date(), "1-URGENT")
            for i, (c, p) in enumerate(
                [(1, 2500.0), (2, 2500.0), (1, 2500.0), (2, 2500.0),
                 (3, 52500.0), (4, 52500.0), (3, 52500.0), (4, 52500.0)]
            )
        ]
    )
    d = _tmp_dir(orders=orders, customer=cust)
    got = {
        r["seg"]: r["w1"]
        for r in pipelines.q_wasserstein_drift(spark, d).collect()
    }
    assert got == {"SEGA": 25000.0, "SEGB": 25000.0}


# --------------------------------------------------------------- did/ate


def test_diff_in_diff_constructed_effect(spark):
    """Treated arm gains exactly +1 post; control is flat → DiD = 1 with
    zero within-cell variance → SE = 0."""
    rows = []
    eid = 0
    for user, pre_v, post_v in [(1, 1.0, 2.0), (2, 1.0, 1.0)]:
        for sec, v in [(0, pre_v), (10, pre_v), (990, post_v), (1000, post_v)]:
            rows.append(
                (eid, BASE + pd.Timedelta(seconds=sec), user, "view", v, "{}")
            )
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_diff_in_diff(spark, d).collect()[0]
    assert out["did"] == 1.0
    assert out["se"] == 0.0
    assert out["n_total"] == 8


def test_stratified_ate_null_effect(spark):
    """Outcome depends only on the stratum, never on the arm → every
    per-stratum diff and the pooled ATE are exactly 0."""
    rows = []
    eid = 0
    for user in [1, 2, 3, 4]:  # two odd (treated), two even
        for etype, v in [("click", 1.5), ("view", 4.0)]:
            for k in range(2):
                rows.append(
                    (
                        eid,
                        BASE + pd.Timedelta(minutes=eid),
                        user,
                        etype,
                        v,
                        "{}",
                    )
                )
                eid += 1
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_stratified_ate(spark, d).collect()
    assert {r["stratum"] for r in out} == {"click", "view"}
    for r in out:
        assert r["diff"] == 0.0 and r["ate"] == 0.0


# -------------------------------------------------------------------- js


def test_js_divergence_identical_sources(spark):
    """Two sources with identical unigram distributions → P == Q for
    every observed token and full q-coverage → JSD exactly 0."""
    d = _tmp_dir(
        documents=_docs(
            [
                (0, "x y z", "en", "A"),
                (1, "x y", "en", "A"),
                (2, "x y z", "en", "B"),
                (3, "x y", "en", "B"),
            ]
        )
    )
    for r in pipelines.q_js_divergence(spark, d).collect():
        assert r["jsd"] == 0.0


# ---------------------------------------------------------------- levene


def test_levene_equal_spread_golden(spark):
    """Two groups with identical |x − median| patterns → the absolute
    deviations have equal group means → F = 0 exactly."""
    cust = _customers(
        [
            (1, "a", 0, 0.0, "SEGA"),
            (2, "b", 0, 0.0, "SEGB"),
        ]
    )
    orders = _orders(
        [
            (i, c, "O", p, BASE.date(), "1-URGENT")
            for i, (c, p) in enumerate(
                [(1, 0.0), (1, 10.0), (1, 20.0), (1, 30.0),
                 (2, 100.0), (2, 110.0), (2, 120.0), (2, 130.0)]
            )
        ]
    )
    d = _tmp_dir(orders=orders, customer=cust)
    rows = pipelines.q_levene_test(spark, d).collect()
    assert all(r["f_bf"] == 0.0 for r in rows)
    assert rows[0]["df1"] == 1 and rows[0]["df2"] == 6
    assert {r["median"] for r in rows} == {15.0, 115.0}


# ---------------------------------------------------------------- hill


def test_hill_recovers_pareto_tail_index(spark):
    """Exact Pareto(α=2) quantile grid: x_i = 100·(n/i)^(1/2) → the Hill
    estimator over the top-k must recover α ≈ 2 (within the known
    harmonic-sum bias at k=200)."""
    n = 1000
    orders = _orders(
        [
            (i, 1, "O", 100.0 * math.sqrt(n / i), BASE.date(), "1-URGENT")
            for i in range(1, n + 1)
        ]
    )
    d = _tmp_dir(orders=orders)
    out = pipelines.q_hill_tail_index(spark, d).collect()[0]
    assert out["k"] == pipelines.HILL_K
    assert abs(out["alpha_hat"] - 2.0) < 0.1


# ------------------------------------------------------------ chatterjee


def test_chatterjee_perfect_dependence(spark):
    """purchases == clicks, strictly increasing by day: the tie-free ξ of
    a perfect monotone map is exactly 1 − 3/(n+1), both directions."""
    rows = []
    eid = 0
    n_days = 12
    for day in range(1, n_days + 1):
        for etype in ("click", "purchase"):
            for _ in range(day):
                rows.append(
                    (
                        eid,
                        BASE + pd.Timedelta(days=day, minutes=eid % 60),
                        eid % 5,
                        etype,
                        1.0,
                        "{}",
                    )
                )
                eid += 1
    d = _tmp_dir(events=_events(rows))
    expect = round(1.0 - 3.0 / (n_days + 1), 6)
    out = pipelines.q_chatterjee_xi(spark, d).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_days"] == n_days
        assert abs(r["xi"] - expect) < 1e-6


# ------------------------------------------------------------------- ccf


def test_ccf_detects_known_lag(spark):
    """purchases(d) = clicks(d−2): the cross-correlation must peak at
    lag +2 with ccf == 1 (identical overlapping series)."""
    pattern = [3, 1, 4, 1, 5, 2, 6, 3, 7, 2, 8, 1, 9, 4, 2, 5, 3, 6, 1, 7]
    rows = []
    eid = 0
    for day, clicks in enumerate(pattern):
        for _ in range(clicks):
            rows.append(
                (eid, BASE + pd.Timedelta(days=day), eid % 5, "click", 1.0,
                 "{}")
            )
            eid += 1
        n_pur = pattern[day - 2] if day >= 2 else 1
        for _ in range(n_pur):
            rows.append(
                (eid, BASE + pd.Timedelta(days=day), eid % 5, "purchase",
                 1.0, "{}")
            )
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = {r["lag"]: r["ccf"] for r in
           pipelines.q_ccf_leadlag(spark, d).collect()}
    # overlap region of lag 2 excludes the two padded purchase days
    assert out[2] is not None and abs(out[2] - 1.0) < 1e-9
    assert all(v is None or v <= out[2] for v in out.values())


# -------------------------------------------------------------- isotonic


def test_isotonic_monotone_and_mass_preserving(spark):
    """The PAV fit must be nondecreasing in the score bin and preserve
    the weighted mean of the observed rates (projection property)."""
    rows = pipelines.q_isotonic_calibration(spark, SF_DIR).collect()
    iso = [r["iso_p"] for r in rows]
    assert iso == sorted(iso)
    tot_iso = sum(r["n"] * r["iso_p"] for r in rows)
    tot_obs = sum(r["n"] * r["obs_rate"] for r in rows)
    assert abs(tot_iso - tot_obs) < 1e-2


# ---------------------------------------------------------- diagnostics


def test_regression_hat_trace(spark):
    """The leverages of a p=2 OLS fit must sum to p (trace of the hat
    matrix) and Cook's distances are nonnegative."""
    rows = pipelines.q_regression_diagnostics(spark, SF_DIR).collect()
    assert abs(sum(r["leverage"] for r in rows) - 2.0) < 1e-4
    assert all(r["cooks_d"] >= 0 for r in rows)


# ------------------------------------------------------------ page-hinkley


def test_page_hinkley_flat_series_never_alarms(spark):
    """A constant daily mean drifts by exactly −δ per step: the cumsum is
    its own running minimum, so PH = 0 and no alarm, every day."""
    rows = [
        (day, BASE + pd.Timedelta(days=day), day % 3, "view", 3.0, "{}")
        for day in range(20)
    ]
    d = _tmp_dir(events=_events(rows))
    for r in pipelines.q_page_hinkley(spark, d).collect():
        assert r["ph"] == 0.0 and r["alarm"] == 0


# ---------------------------------------------------------------- flesch


def test_flesch_hand_counted_golden(spark):
    """Hand-counted words/sentences/vowel-groups on two tiny docs,
    including the zero-sentence and zero-vowel clamps."""
    d = _tmp_dir(
        documents=_docs(
            [
                (0, "the cat sat. the dog ran.", "en", "A"),
                (1, "zzz", "en", "A"),
            ]
        )
    )
    out = pipelines.q_flesch_readability(spark, d).collect()[0]
    # doc0: w=6 s=2 y=6 → 206.835 − 1.015·3 − 84.6·1 = 119.19
    # doc1: w=1 s=max(0,1)=1 y=max(0,1)=1 → 206.835 − 1.015 − 84.6 = 121.22
    assert out["n_docs"] == 2
    assert out["avg_words"] == 3.5
    assert out["avg_sentences"] == 1.5
    assert out["avg_syll_per_word"] == 1.0
    assert abs(out["avg_fre"] - (119.19 + 121.22) / 2.0) < 1e-6
    assert out["frac_hard"] == 0.0


# --------------------------------------------------------------- burrows


def test_burrows_identical_sources_zero_delta(spark):
    """Sources A and B share the exact token distribution, C differs:
    Delta(A,B) = 0 < Delta(A,C), and the pair grid is complete."""
    base = "alpha beta beta gamma delta delta delta"
    other = "zeta zeta eta theta theta iota kappa"
    d = _tmp_dir(
        documents=_docs(
            [
                (0, base, "en", "A"),
                (1, base, "en", "B"),
                (2, other, "en", "C"),
            ]
        )
    )
    rows = {
        (r["src_a"], r["src_b"]): r["delta"]
        for r in pipelines.q_burrows_delta(spark, d).collect()
    }
    assert set(rows) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert rows[("A", "B")] == 0.0
    assert rows[("A", "C")] > 0.0
    assert rows[("A", "C")] == rows[("B", "C")]


# ------------------------------------------------------------------- rbo


def test_rbo_identical_rankings(spark):
    """Customer i places i orders of a fixed price → the spend and
    frequency rankings coincide, so truncated RBO = 1 − p^k exactly."""
    rows = []
    key = 0
    for cust in range(1, 61):
        for _ in range(cust):
            rows.append((key, cust, "O", 100.0, BASE.date(), "1-URGENT"))
            key += 1
    d = _tmp_dir(orders=_orders(rows))
    out = pipelines.q_rbo_rankings(spark, d).collect()[0]
    assert out["n_common"] == pipelines.RBO_K
    assert out["overlap_at_k"] == 1.0
    expect = round(1.0 - pipelines.RBO_P ** pipelines.RBO_K, 6)
    assert abs(out["rbo"] - expect) < 1e-6


# ---------------------------------------------------------------- em gmm


def test_em_gmm_recovers_separated_clusters(spark):
    """Two tight, well-separated log-price clusters (ln x ≈ 2 and ≈ 6,
    equal mass): EM from the moment init must land on them."""
    rows = []
    for i in range(300):
        rows.append((i, 1, "O", math.exp(2.0 + 0.1 * (-1) ** i),
                     BASE.date(), "1-URGENT"))
    for i in range(300):
        rows.append((300 + i, 1, "O", math.exp(6.0 + 0.1 * (-1) ** i),
                     BASE.date(), "1-URGENT"))
    d = _tmp_dir(orders=_orders(rows))
    out = sorted(
        pipelines.q_em_gmm(spark, d).collect(), key=lambda r: r["mu"]
    )
    assert abs(out[0]["mu"] - 2.0) < 0.05
    assert abs(out[1]["mu"] - 6.0) < 0.05
    for r in out:
        assert abs(r["weight"] - 0.5) < 0.02
        assert abs(r["sigma"] - 0.1) < 0.05


# --------------------------------------------------------------- granger


def test_granger_constructed_causality(spark):
    """purchases(d) ≈ clicks(d−1) (+ small parity noise): the
    click→purchase F must dwarf the reverse direction."""
    pattern = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4,
               6, 2, 6, 4, 3, 3, 8, 3, 2, 7]
    rows = []
    eid = 0
    for day, clicks in enumerate(pattern):
        for _ in range(clicks):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 5,
                         "click", 1.0, "{}"))
            eid += 1
        n_pur = (pattern[day - 1] if day >= 1 else 1) + day % 2
        for _ in range(n_pur):
            rows.append((eid, BASE + pd.Timedelta(days=day), eid % 5,
                         "purchase", 1.0, "{}"))
            eid += 1
    d = _tmp_dir(events=_events(rows))
    out = {r["direction"]: r["f_stat"] for r in
           pipelines.q_granger_causality(spark, d).collect()}
    assert out["click_to_purchase"] > 10.0
    assert out["click_to_purchase"] > out["purchase_to_click"]


# --------------------------------------------------------------- weibull


def test_weibull_exponential_gaps_give_shape_one(spark):
    """Interarrivals laid out on the exact exponential quantile grid
    (scale 10⁴ s, so integer-second truncation is negligible): the
    log-moment fit must recover k ≈ 1 and λ ≈ 10⁴."""
    n = 200
    gaps = [round(-math.log(1.0 - (i - 0.5) / n) * 10000.0) for i in
            range(1, n + 1)]
    # deterministic interleave so time order ≠ sorted order
    order = gaps[::2] + gaps[1::2]
    rows, t = [], 0
    rows.append((0, BASE, 7, "view", 1.0, "{}"))
    for i, g in enumerate(order, start=1):
        t += g
        rows.append((i, BASE + pd.Timedelta(seconds=t), 7, "view", 1.0,
                     "{}"))
    d = _tmp_dir(events=_events(rows))
    out = pipelines.q_weibull_fit(spark, d).collect()[0]
    assert out["n"] == n
    assert abs(out["k_shape"] - 1.0) < 0.12
    assert abs(out["lambda_scale"] - 10000.0) / 10000.0 < 0.15


# ------------------------------------------------------------- bayes a/b


def test_bayesian_ab_posterior_moments(spark):
    """Posterior moments must equal the closed-form Beta(1+k, 1+n−k)
    values recomputed from the emitted (n, k), and z must be the emitted
    diff ratio."""
    rows = pipelines.q_bayesian_ab(spark, SF_DIR).collect()
    assert len(rows) == 2
    for r in rows:
        a, b = r["k"] + 1.0, r["n"] - r["k"] + 1.0
        assert abs(r["post_mean"] - a / (a + b)) < 1e-6
        var = a * b / ((a + b) ** 2 * (a + b + 1.0))
        assert abs(r["post_sd"] - math.sqrt(var)) < 1e-6
    assert abs(rows[0]["z"] - rows[0]["diff_mean"] /
               rows[0]["diff_sd"]) < 1e-5


# ------------------------------------------------------------- plan gate


def test_session6_ops_stay_jvm_side(spark):
    """Every session-6 operator is pure column expressions end to end —
    no Python evaluator may appear in any plan."""
    for q in (
        pipelines.q_kruskal_wallis,
        pipelines.q_wasserstein_drift,
        pipelines.q_diff_in_diff,
        pipelines.q_js_divergence,
        pipelines.q_levene_test,
        pipelines.q_hill_tail_index,
        pipelines.q_chatterjee_xi,
        pipelines.q_ccf_leadlag,
        pipelines.q_isotonic_calibration,
        pipelines.q_stratified_ate,
        pipelines.q_regression_diagnostics,
        pipelines.q_page_hinkley,
        pipelines.q_flesch_readability,
        pipelines.q_burrows_delta,
        pipelines.q_rbo_rankings,
        pipelines.q_hurst_exponent,
        pipelines.q_em_gmm,
        pipelines.q_granger_causality,
        pipelines.q_weibull_fit,
        pipelines.q_bayesian_ab,
    ):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan, q
