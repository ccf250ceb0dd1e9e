"""Expectation suite (operators/constraints.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.constraints import (
    expectation_report,
    referential_report,
    violations_sample,
)


def _df(spark):
    rows = [
        (1, 10.0, "A"),
        (2, -5.0, "A"),      # range violation
        (3, None, "B"),      # NULL value -> range rule NULL -> violation
        (3, 20.0, None),     # dup id + null flag
    ]
    return spark.createDataFrame(rows, "id INT, x DOUBLE, flag STRING")


def test_report_counts_and_null_semantics(spark):
    out = {
        r.rule: r
        for r in expectation_report(
            _df(spark),
            rules={
                "x_positive": F.col("x") > 0,
                "flag_not_null": F.col("flag").isNotNull(),
            },
            unique_keys={"unique_id": ["id"]},
        ).collect()
    }
    assert out["x_positive"].violations == 2          # -5 and NULL both violate
    assert out["flag_not_null"].violations == 1
    assert out["unique_id"].violations == 1           # one duplicate beyond first
    assert all(r.checked == 4 for r in out.values())
    assert not out["x_positive"].passed
    rules_sorted = [r for r in out]
    assert rules_sorted == sorted(rules_sorted)


def test_all_pass_on_clean_table(spark):
    df = spark.range(5).select("id", (F.col("id") + 1.0).alias("x"))
    out = expectation_report(
        df, rules={"x_positive": F.col("x") > 0}, unique_keys={"uid": ["id"]}
    ).collect()
    assert all(r.passed and r.violations == 0 for r in out)


def test_single_scan_plan(spark):
    # the whole suite (3 predicate rules) compiles to ONE aggregate over
    # ONE scan of the input
    df = _df(spark)
    rep = expectation_report(
        df,
        rules={
            "a": F.col("x") > 0,
            "b": F.col("flag").isNotNull(),
            "c": F.col("id") < 100,
        },
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1


def test_duplicate_rule_name_rejected(spark):
    with pytest.raises(ValueError):
        expectation_report(
            _df(spark), rules={"r": F.col("x") > 0}, unique_keys={"r": ["id"]}
        )


def test_violations_sample_tags_and_caps(spark):
    df = spark.range(100).select("id", (F.col("id") - 50.0).alias("x"))
    out = violations_sample(
        df, {"x_positive": F.col("x") > 0}, per_rule=3, order_by=["id"]
    ).collect()
    assert len(out) == 3
    assert all(r.rule == "x_positive" and r.x <= 0 for r in out)
    assert [r.id for r in out] == [0, 1, 2]  # deterministic under order_by


def test_referential_report_counts_orphans_and_nulls(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 10)], "id INT, fk INT"
    )
    dim = spark.createDataFrame([(10,), (20,)], "dk INT")
    r = referential_report(fact, dim, "fk", "dk", "fk_resolves").first()
    assert r.rule == "fk_resolves"
    assert r.violations == 2  # orphan 99 + NULL key
    assert r.checked == 4 and not r.passed


def test_sql_unsafe_rule_name_rejected(spark):
    """Rule names are interpolated into stack(...) SQL; anything beyond
    identifier characters must raise a clear ValueError up front, not a
    parse error (or expr splice) at run time."""
    df = spark.createDataFrame([(1,)], "x INT")
    for bad in ("has space", "quote'name", "tick`name", "dash-name", "1leading"):
        with pytest.raises(ValueError, match="rule names must match"):
            expectation_report(df, {bad: F.col("x").isNotNull()})
    with pytest.raises(ValueError, match="rule names must match"):
        expectation_report(
            df, {"ok_rule": F.col("x").isNotNull()}, unique_keys={"bad key": ["x"]}
        )
