"""Per-group closed-form OLS trend (operators/trend.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.trend import (
    group_ols_trend,
    ols_forecast,
)


def _fit(spark, rows):
    df = spark.createDataFrame([Row(g=g, x=x, y=y) for g, x, y in rows])
    out = group_ols_trend(df, ["g"], "x", "y")
    return {r["g"]: r.asDict() for r in out.collect()}


class TestGroupOlsTrend:
    def test_matches_numpy_polyfit(self, spark):
        rng = np.random.default_rng(11)
        rows = []
        truth = {}
        for g in ("a", "b", "c"):
            x = np.arange(20, dtype=float)
            y = rng.standard_normal() * x + rng.standard_normal() * 5 \
                + rng.standard_normal(20) * 0.3
            slope, icpt = np.polyfit(x, y, 1)
            truth[g] = (slope, icpt, np.corrcoef(x, y)[0, 1] ** 2)
            rows += [(g, float(xi), float(yi)) for xi, yi in zip(x, y)]
        got = _fit(spark, rows)
        for g, (slope, icpt, r2) in truth.items():
            assert got[g]["slope"] == pytest.approx(slope, rel=1e-9)
            assert got[g]["intercept"] == pytest.approx(icpt, rel=1e-9)
            assert got[g]["r2"] == pytest.approx(r2, rel=1e-9)
            assert got[g]["n_obs"] == 20
            assert got[g]["x_max"] == 19.0

    def test_degenerate_groups_yield_nulls_not_errors(self, spark):
        got = _fit(
            spark,
            [
                ("single", 1.0, 5.0),          # one point: no line
                ("zerovar", 2.0, 1.0),         # x constant: vertical
                ("zerovar", 2.0, 3.0),
                ("flat", 0.0, 7.0),            # y constant: slope 0,
                ("flat", 1.0, 7.0),            # r2 undefined (0/0)
                ("flat", 2.0, 7.0),
            ],
        )
        assert got["single"]["slope"] is None
        assert got["single"]["intercept"] is None
        assert got["zerovar"]["slope"] is None
        assert got["flat"]["slope"] == pytest.approx(0.0, abs=1e-12)
        assert got["flat"]["intercept"] == pytest.approx(7.0)
        assert got["flat"]["r2"] is None

    def test_null_pairs_excluded_pairwise(self, spark):
        df = spark.createDataFrame(
            [
                Row(g="a", x=0.0, y=0.0),
                Row(g="a", x=1.0, y=2.0),
                Row(g="a", x=None, y=9.0),
                Row(g="a", x=9.0, y=None),
            ]
        )
        out = group_ols_trend(df, ["g"], "x", "y").collect()[0]
        assert out["n_obs"] == 2
        assert out["x_max"] == 1.0  # null-pair rows excluded from x_max too
        assert out["slope"] == pytest.approx(2.0)

    def test_forecast_is_line_extrapolation(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", x=float(i), y=3.0 * i + 1.0) for i in range(5)]
        )
        fit = group_ols_trend(df, ["g"], "x", "y")
        got = fit.select(
            ols_forecast(F.col("slope"), F.col("intercept"),
                         F.col("x_max") + 7).alias("f")
        ).collect()[0]["f"]
        assert got == pytest.approx(3.0 * 11 + 1.0)

    def test_single_pass_plan_no_sort_no_window(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", x=float(i), y=float(i)) for i in range(10)]
        )
        plan = group_ols_trend(df, ["g"], "x", "y")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Window" not in plan and "Sort" not in plan
        assert plan.count("Exchange") == 1  # the one group-key shuffle
