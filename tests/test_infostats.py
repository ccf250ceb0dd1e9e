"""Known-answer fixture tests for the information-statistics helpers
(``operators/infostats.py``) behind the round-5 fifth-batch queries:
Gini at its analytic extremes, mutual information at independence and
perfect dependence, integer-domain leading-digit extraction, and
autocorrelation of an alternating series.  These pin the math the
sf-parity gate then re-certifies end-to-end.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.infostats import (
    autocorr_by_group,
    gini_by_group,
    kaplan_meier,
    leading_digit,
    mutual_info_by_x,
    woe_iv,
)


# -------------------------------------------------------------------- gini


def test_gini_equal_distribution_is_zero(spark):
    rows = [("g", i, 10.0) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "grp string, uid int, x double")
    out = gini_by_group(df, "grp", "x", "uid").collect()[0]
    assert out["n_units"] == 5
    assert out["total"] == pytest.approx(50.0)
    assert out["gini"] == pytest.approx(0.0, abs=1e-12)


def test_gini_total_concentration_is_n_minus_1_over_n(spark):
    # one unit holds the entire mass: G = (n-1)/n exactly
    rows = [("g", 1, 0.0), ("g", 2, 0.0), ("g", 3, 0.0), ("g", 4, 100.0)]
    df = spark.createDataFrame(rows, "grp string, uid int, x double")
    out = gini_by_group(df, "grp", "x", "uid").collect()[0]
    assert out["gini"] == pytest.approx(0.75, abs=1e-12)


def test_gini_zero_mass_group_is_null_and_ties_are_order_invariant(spark):
    rows = [("z", 1, 0.0), ("z", 2, 0.0)] + [
        ("t", i, v) for i, v in [(9, 5.0), (3, 5.0), (7, 10.0)]
    ]
    df = spark.createDataFrame(rows, "grp string, uid int, x double")
    got = {r["grp"]: r for r in gini_by_group(df, "grp", "x", "uid").collect()}
    assert got["z"]["gini"] is None
    # ties (5.0, 5.0): rank sum over the tied block is invariant, so
    # G = 2*(1*5+2*5+3*10)/(3*20) - 4/3 = 45/30 - 4/3
    assert got["t"]["gini"] == pytest.approx(45.0 / 30.0 - 4.0 / 3.0)


# -------------------------------------------------- mutual information


def test_mutual_info_independent_is_zero(spark):
    # uniform independent joint: every (x, y) cell equally likely
    rows = [(x, y) for x in "ab" for y in (0, 1) for _ in range(10)]
    df = spark.createDataFrame(rows, "x string, y int")
    for r in mutual_info_by_x(df, "x", "y").collect():
        assert r["n_events"] == 20
        assert r["mi_contrib"] == pytest.approx(0.0, abs=1e-12)


def test_mutual_info_perfect_dependence_sums_to_ln_k(spark):
    # y determined by x, k=4 uniform classes: I(X;Y) = ln(4)
    rows = [(f"c{i}", i) for i in range(4) for _ in range(5)]
    df = spark.createDataFrame(rows, "x string, y int")
    out = mutual_info_by_x(df, "x", "y").collect()
    total = sum(r["mi_contrib"] for r in out)
    assert total == pytest.approx(math.log(4.0), abs=1e-12)
    for r in out:  # each class contributes (1/4) ln 4
        assert r["mi_contrib"] == pytest.approx(math.log(4.0) / 4, abs=1e-12)


# ------------------------------------------------------- leading digit


def test_leading_digit_integer_domain(spark):
    vals = [123.45, 0.07, 9000.0, 1.0, 55555.55, 999.99]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r["d"]
        for r in df.select(leading_digit(F.col("v")).alias("d")).collect()
    ]
    assert got == [1, 7, 9, 1, 5, 9]


# ------------------------------------------------------- autocorrelation


def test_autocorr_alternating_series_is_minus_one(spark):
    rows = [("g", i, float(1 if i % 2 else 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = autocorr_by_group(df, "grp", "t", "v", [1]).collect()[0]
    assert out["n_points"] == 10
    assert out["ac_lag1"] == pytest.approx(-1.0, abs=1e-12)


def test_autocorr_constant_series_is_null_and_lag7_periodicity(spark):
    const = [("c", i, 5.0) for i in range(10)]
    # period-7 series: lag-7 pairs are identical -> ac_lag7 = 1
    periodic = [("p", i, float((i % 7) + 1)) for i in range(21)]
    df = spark.createDataFrame(
        const + periodic, "grp string, t int, v double"
    )
    got = {
        r["grp"]: r
        for r in autocorr_by_group(df, "grp", "t", "v", [1, 7]).collect()
    }
    assert got["c"]["ac_lag1"] is None  # zero variance
    assert got["p"]["ac_lag7"] == pytest.approx(1.0, abs=1e-12)


# ----------------------------------------------------- Kaplan-Meier


def test_kaplan_meier_textbook_curve(spark):
    # subjects: t=1 event, t=2 censored, t=3 event, t=4 censored
    rows = [("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 4, 0)]
    df = spark.createDataFrame(rows, "grp string, t int, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "grp", "t", "ev").collect()}
    assert [got[t]["n_risk"] for t in (1, 2, 3, 4)] == [4, 3, 2, 1]
    assert got[1]["survival"] == pytest.approx(0.75)
    assert got[2]["survival"] == pytest.approx(0.75)  # censor: flat
    assert got[3]["survival"] == pytest.approx(0.375)  # 3/4 * 1/2
    assert got[4]["survival"] == pytest.approx(0.375)


def test_kaplan_meier_whole_risk_set_dies_pins_zero(spark):
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 2, 1), ("g", 2, 1)]
    df = spark.createDataFrame(rows, "grp string, t int, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "grp", "t", "ev").collect()}
    assert got[1]["survival"] == pytest.approx(0.75)
    assert got[2]["survival"] == 0.0  # exactly 0, not exp(ln(0))


# ------------------------------------------------------------- WoE/IV


def test_woe_known_answer_and_single_class_null(spark):
    # A: 5 bad / 5 good; B: 0 bad / 10 good -> B has no log-odds
    rows = [("A", True)] * 5 + [("A", False)] * 5 + [("B", False)] * 10
    df = spark.createDataFrame(rows, "cat string, bad boolean")
    got = {r["cat"]: r for r in woe_iv(df, "cat", F.col("bad")).collect()}
    assert got["B"]["woe"] is None and got["B"]["iv_contrib"] is None
    # A: bad_share = 5/5 = 1, good_share = 5/15 -> woe = ln(3)
    assert got["A"]["bad_share"] == pytest.approx(1.0)
    assert got["A"]["good_share"] == pytest.approx(1.0 / 3.0)
    assert got["A"]["woe"] == pytest.approx(math.log(3.0), abs=1e-12)
    assert got["A"]["iv_contrib"] == pytest.approx(
        (1.0 - 1.0 / 3.0) * math.log(3.0), abs=1e-12
    )
