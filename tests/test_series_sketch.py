"""Hand-built-fixture tests for the series/sketch batch (seasonal
decomposition, HLL audience overlap)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts_s string, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, d, rows):
    df = spark.createDataFrame(rows, EVENTS_SCHEMA).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"),
        "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))


def test_seasonal_decomposition_recovers_planted_components(spark):
    """y = 100 + 10 on Sundays, over 21 consecutive days: the centered
    MA trend is flat at 100 + 10/7 (every 7-day window holds exactly
    one Sunday), the Sunday seasonal effect is ~+10 * 6/7, the others
    ~-10/7, and every residual is ~0 with no anomalies."""
    rows = []
    for i in range(21):
        day = i + 1  # 2024-01-01 is a Monday; Sundays are the 7,14,21
        v = 100.0 + (10.0 if day % 7 == 0 else 0.0)
        rows.append((i, f"2024-01-{day:02d} 12:00:00", 1, "view", v, None))
    d = tempfile.mkdtemp()
    _write_events(spark, d, rows)
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {str(r["d"]): r for r in
           QUERIES["events_seasonal_decomposition"](spark, d).collect()}
    assert len(out) == 21
    defined = [r for r in out.values() if r["trend"] is not None]
    assert len(defined) == 15  # 21 days minus 3 edge days each side
    assert out["2024-01-01"]["trend"] is None  # edge day, no full window
    mid = out["2024-01-10"]
    assert abs(mid["trend"] - (100 + 10 / 7)) < 1e-3
    sunday = out["2024-01-14"]
    assert abs(sunday["seasonal"] - 10 * 6 / 7) < 1e-3
    assert abs(mid["seasonal"] - (-10 / 7)) < 1e-3
    for r in defined:
        assert abs(r["residual"]) < 1e-3
        # residuals are exactly 0 -> MAD 0 -> z and the flag are
        # guarded NULL rather than a divide-by-zero
        assert r["resid_z"] is None and r["is_anomaly"] is None


def test_audience_overlap_exact_sets_and_bounds(spark):
    """Type A active on user-days {u1d1, u1d2, u2d1}, type B on
    {u1d1, u3d1}: union 4, intersection 1; at these tiny cardinalities
    HLL is exact, so both contract booleans hold."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "A", 1.0, None),
        (2, "2024-01-01 11:00:00", 1, "A", 1.0, None),  # same user-day
        (3, "2024-01-02 10:00:00", 1, "A", 1.0, None),
        (4, "2024-01-01 10:00:00", 2, "A", 1.0, None),
        (5, "2024-01-01 10:00:00", 1, "B", 1.0, None),
        (6, "2024-01-01 10:00:00", 3, "B", 1.0, None),
    ]
    d = tempfile.mkdtemp()
    _write_events(spark, d, rows)
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["events_audience_overlap_hll"](spark, d).collect()
    assert (row["type_a"], row["type_b"]) == ("A", "B")
    assert (row["exact_a"], row["exact_b"]) == (3, 2)
    assert row["exact_union"] == 4
    assert row["exact_intersection"] == 1
    assert row["union_within_bound"] and row["intersection_within_bound"]


def test_seasonal_decomposition_sorts_only_collapsed_frame(spark):
    """Invariant pinned by the round-5 review: the unpartitioned
    ``Window.orderBy("d")`` is safe ONLY because it runs on the
    calendar-collapsed daily frame.  Guard the shape: every global Sort
    in the physical plan must sit above the date aggregation (its
    subtree contains the to_date groupBy), never above the raw events
    scan directly — so a refactor that moves the window below the
    collapse fails here before it ships a 100-TB single-partition sort.
    """
    from bigdata_covid19_real_time_spark.plans import QUERIES

    df = QUERIES["events_seasonal_decomposition"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # walk the plan text: each Sort line must have an aggregate deeper
    # in its own subtree (textually below it at greater indent depth)
    lines = plan.splitlines()
    sort_idxs = [i for i, ln in enumerate(lines) if " Sort " in ln or ln.lstrip("+-: *(0123456789)").startswith("Sort ")]
    agg_idxs = [i for i, ln in enumerate(lines) if "HashAggregate" in ln]
    assert agg_idxs, plan
    for si in sort_idxs:
        assert any(ai > si for ai in agg_idxs), plan
