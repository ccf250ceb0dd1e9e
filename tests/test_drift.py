"""Exact two-sample KS drift statistic (operators/drift.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.drift import ks_by_group


def _brute_ks(group_vals, all_vals) -> float:
    """Reference: sup over a dense grid of pooled points of
    |F_grp - F_glob| — evaluates BOTH the step values and left limits by
    probing every pooled point exactly and just below it."""
    g = np.sort(np.asarray(group_vals, dtype=float))
    a = np.sort(np.asarray(all_vals, dtype=float))
    points = np.unique(np.concatenate([g, a]))
    best = 0.0
    for x in points:
        for le in (True, False):
            fg = (g <= x).mean() if le else (g < x).mean()
            fa = (a <= x).mean() if le else (a < x).mean()
            best = max(best, abs(fg - fa))
    return best


def test_single_group_is_zero(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 2, 3, 5, 8]], "g STRING, v DOUBLE"
    )
    rows = ks_by_group(df, "v", "g").collect()
    assert len(rows) == 1
    assert rows[0]["ks_stat"] == pytest.approx(0.0)
    assert rows[0]["n_group"] == 6


def test_matches_brute_force_on_random_groups(spark):
    rng = np.random.default_rng(7)
    data = []
    for gi, (mu, n) in enumerate([(0.0, 80), (0.5, 50), (2.0, 30)]):
        for v in rng.normal(mu, 1.0, n):
            data.append((f"g{gi}", float(round(v, 3))))
    df = spark.createDataFrame(data, "g STRING, v DOUBLE")
    got = {r["g"]: r["ks_stat"] for r in ks_by_group(df, "v", "g").collect()}
    all_vals = [v for _, v in data]
    for gi in range(3):
        grp = [v for g, v in data if g == f"g{gi}"]
        assert got[f"g{gi}"] == pytest.approx(_brute_ks(grp, all_vals), abs=1e-9)


def test_ties_and_duplicates_handled(spark):
    # heavy ties: the <= / < rank split must count multiplicities
    data = [("a", 1.0)] * 10 + [("a", 2.0)] * 5 + [("b", 2.0)] * 15
    df = spark.createDataFrame(data, "g STRING, v DOUBLE")
    got = {r["g"]: r["ks_stat"] for r in ks_by_group(df, "v", "g").collect()}
    all_vals = [v for _, v in data]
    for g in ("a", "b"):
        grp = [v for gg, v in data if gg == g]
        assert got[g] == pytest.approx(_brute_ks(grp, all_vals), abs=1e-9)


def test_constant_values_degenerate_span(spark):
    # span == 0 (every value identical): all mass in bin 0, D == 0
    df = spark.createDataFrame(
        [("a", 3.0)] * 4 + [("b", 3.0)] * 6, "g STRING, v DOUBLE"
    )
    for r in ks_by_group(df, "v", "g").collect():
        assert r["ks_stat"] == pytest.approx(0.0)


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0), ("b", None)],
        "g STRING, v DOUBLE",
    )
    rows = {r["g"]: r for r in ks_by_group(df, "v", "g").collect()}
    assert rows["a"]["n_group"] == 1 and rows["b"]["n_group"] == 1
    # two disjoint singletons vs pooled {1,2}: D = 1/2 for each
    assert rows["a"]["ks_stat"] == pytest.approx(0.5)
    assert rows["b"]["ks_stat"] == pytest.approx(0.5)


def test_no_single_partition_data_window(spark):
    """The scale contract: no window over data rows without a partition
    key — global-ordered windows may only run on the tiny bucket-totals
    tables (their plans sit under an aggregation to <= n_bins rows)."""
    df = spark.createDataFrame(
        [("a", float(i % 17)) for i in range(100)], "g STRING, v DOUBLE"
    )
    plan = ks_by_group(df, "v", "g")._jdf.queryExecution().optimizedPlan().toString()
    # every Window over the raw values is partitioned by bin (or g, bin)
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "bin" not in spec:
            # the totals-table prefix windows order by bin without
            # partitioning — they must mention bin in the ORDER clause
            raise AssertionError(f"window without bin key: {spec}")
