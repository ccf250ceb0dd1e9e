"""Hand-built-fixture tests for the product-metrics batch (entropy
rate, power analysis, session bounce)."""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.product_metrics import (
    POWER_TARGET_LIFT,
    Z_ALPHA,
    Z_BETA,
)


def _events(spark, d, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"),
        "user_id", "event_type", "value",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))


def test_entropy_rate_deterministic_vs_uniform(spark):
    """User 1 alternates a->b->a->b (deterministic: row entropy 0);
    user 2 emits c then a/b equally (from c: entropy ln 2)."""
    rows = []
    for i in range(6):  # a b a b a b -> transitions a->b, b->a only
        rows.append((i, f"2024-01-01 10:{i:02d}:00", 1,
                     "a" if i % 2 == 0 else "b", 1.0))
    # user 2: c a c b c a c b -> c->a (x2), c->b (x2), a->c, b->c...
    seq2 = ["c", "a", "c", "b", "c", "a", "c", "b"]
    for i, t in enumerate(seq2):
        rows.append((100 + i, f"2024-01-01 11:{i:02d}:00", 2, t, 1.0))
    d = tempfile.mkdtemp()
    _events(spark, d, rows)
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {r["event_type"]: r for r in
           QUERIES["events_entropy_rate"](spark, d).collect()}
    # a's transitions: user1 a->b x3, user2 a->c x2
    # so a -> {b: 3, c: 2}: entropy = -(0.6 ln 0.6 + 0.4 ln 0.4)
    exp_a = -(0.6 * math.log(0.6) + 0.4 * math.log(0.4))
    assert got["a"]["row_entropy"] == round(exp_a + 1e-9, 6)
    # c -> a twice, c -> b twice: exactly ln 2
    assert got["c"]["row_entropy"] == round(math.log(2) + 1e-9, 6)
    # pi sums to 1 across states
    assert abs(sum(r["pi"] for r in got.values()) - 1.0) < 1e-5


def test_power_analysis_closed_form(spark):
    """Values 4,6 repeated 50x for one type: mean 5, var ~1.0101;
    the mde and required-n columns match the textbook formulas."""
    rows = [(i, "2024-01-01 10:00:00", i, "buy", 4.0 if i % 2 == 0 else 6.0)
            for i in range(100)]
    d = tempfile.mkdtemp()
    _events(spark, d, rows)
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["events_power_analysis"](spark, d).collect()
    n, mean = 100, 5.0
    var = 100.0 / 99.0  # sum sq dev = 100 * 1
    zsum = Z_ALPHA + Z_BETA
    assert row["mean_value"] == 5.0
    exp_mde = round(100.0 * zsum * math.sqrt(2 * var / n) / mean + 1e-9, 4)
    assert row["mde_pct"] == exp_mde
    exp_n = math.ceil(round(2 * var * zsum ** 2
                            / (POWER_TARGET_LIFT * mean) ** 2 + 1e-9, 4))
    assert row["n_per_arm_5pct"] == exp_n


def test_session_bounce_splits_on_gap_and_attributes_entry(spark):
    """User 1: two events 10 min apart (one session, depth 2, entry
    'view'); then a 40-min gap then one lone event (bounce, entry
    'buy').  Bounce rate for 'buy' entry = 1.0, for 'view' = 0.0."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (2, "2024-01-01 10:10:00", 1, "click", 1.0),
        (3, "2024-01-01 10:50:00", 1, "buy", 1.0),
    ]
    d = tempfile.mkdtemp()
    _events(spark, d, rows)
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {r["entry_type"]: r for r in
           QUERIES["events_session_bounce"](spark, d).collect()}
    assert got["view"]["n_sessions"] == 1
    assert got["view"]["bounce_rate"] == 0.0
    assert got["view"]["avg_depth"] == 2.0
    assert got["view"]["avg_duration_sec"] == 600.0
    assert got["buy"]["bounce_rate"] == 1.0
    assert got["buy"]["avg_duration_sec"] == 0.0
