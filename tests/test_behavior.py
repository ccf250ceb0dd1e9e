"""Hand-built-fixture tests for the behavioral feature batch (RFM,
time-decay value, interval backlog, YoY growth, hourly profile)."""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.behavior import (
    DECAY_HALF_LIFE_DAYS,
)


def _write(spark, d, name, rows, schema, post=None):
    df = spark.createDataFrame(rows, schema)
    if post is not None:
        df = post(df)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


def test_rfm_known_quartiles(spark):
    """8 customers, single orders, distinct spends 100..800 and order
    dates 1..8 days before ref: monetary quartiles are exactly 2
    customers each (ceil(4*cum/8)), recency likewise; every customer
    has freq=1 so f_bucket=4 for all (ties share the top bucket)."""
    rows = []
    for i in range(8):
        rows.append(
            (i, 100 + i, f"2024-01-{i + 1:02d}", 100.0 * (i + 1))
        )
    d = tempfile.mkdtemp()
    _write(
        spark, d, "orders", rows,
        "o_orderkey long, o_custkey long, date_s string, o_totalprice double",
        post=lambda df: df.select(
            "o_orderkey", "o_custkey",
            F.to_date("date_s").alias("o_orderdate"), "o_totalprice",
        ),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = QUERIES["customer_rfm_segments"](spark, d).collect()
    assert sum(r["n_customers"] for r in got) == 8
    assert all(r["f_bucket"] == 4 for r in got)  # all-tied freq
    # spend and recency rise together, so the grid is the 4 diagonal
    # cells of 2 customers each; the top quartile (spends 700+800,
    # most recent) lands in (r=1, m=4)
    got_map = {(r["r_bucket"], r["m_bucket"]): r for r in got}
    assert set(got_map) == {(4, 1), (3, 2), (2, 3), (1, 4)}
    assert got_map[(1, 4)]["avg_monetary"] == 750.0


def test_recency_weighted_value_half_life(spark):
    """One event at the ref date (weight 1) and one exactly one
    half-life earlier (weight 0.5): decayed 10 + 5 = 15."""
    hl = int(DECAY_HALF_LIFE_DAYS)
    rows = [
        (1, 7, "2024-03-15 12:00:00", "click", 10.0),
        (2, 7, "2024-03-01 08:00:00", "click", 10.0),  # 14 days earlier
    ]
    assert hl == 14
    d = tempfile.mkdtemp()
    _write(
        spark, d, "events", rows,
        "event_id long, user_id long, ts_s string, event_type string,"
        " value double",
        post=lambda df: df.select(
            "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"),
            "event_type", "value",
        ).withColumn("props", F.lit("{}")),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = QUERIES["user_recency_weighted_value"](spark, d).collect()
    assert len(got) == 1
    assert got[0]["n"] == 2
    assert abs(got[0]["decayed_value"] - 15.0) < 1e-6


def test_backlog_event_ification(spark):
    """Two orders: Jan->Feb and Jan->Jan. January: 2 started, 1 closed,
    backlog 1; February: 0 started, 1 closed, backlog 0."""
    orders = [
        (1, "2024-01-05"),
        (2, "2024-01-20"),
    ]
    li = [
        (1, "2024-02-10"),  # order 1 ships in Feb
        (1, "2024-01-25"),
        (2, "2024-01-30"),  # order 2 fully ships in Jan
    ]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "orders", orders,
        "o_orderkey long, date_s string",
        post=lambda df: df.select(
            "o_orderkey", F.to_date("date_s").alias("o_orderdate")
        ),
    )
    _write(
        spark, d, "lineitem", li,
        "l_orderkey long, date_s string",
        post=lambda df: df.select(
            "l_orderkey", F.to_date("date_s").alias("l_shipdate")
        ),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {
        str(r["month"]): (r["n_started"], r["n_closed"], r["backlog_eom"])
        for r in QUERIES["orders_open_backlog"](spark, d).collect()
    }
    assert got == {
        "2024-01-01": (2, 1, 1),
        "2024-02-01": (0, 1, 0),
    }


def test_yoy_growth_known(spark):
    """One nation, revenue 100 then 150: growth NULL then 0.5."""
    orders = [
        (1, 10, "2023-06-01", 100.0),
        (2, 10, "2024-06-01", 150.0),
    ]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "orders", orders,
        "o_orderkey long, o_custkey long, date_s string, o_totalprice double",
        post=lambda df: df.select(
            "o_orderkey", "o_custkey",
            F.to_date("date_s").alias("o_orderdate"), "o_totalprice",
        ),
    )
    _write(spark, d, "customer", [(10, 3)], "c_custkey long, c_nationkey long")
    _write(spark, d, "nation", [(3, "FRANCE")], "n_nationkey long, n_name string")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = sorted(
        QUERIES["nation_revenue_yoy"](spark, d).collect(),
        key=lambda r: r["yr"],
    )
    assert [(r["yr"], r["revenue"], r["yoy_growth"]) for r in got] == [
        (2023, 100.0, None),
        (2024, 150.0, 0.5),
    ]


def test_hourly_profile_peak_and_tiebreak(spark):
    """Hours 3 and 9 both have 2 events (tie -> earliest wins), hour 15
    has 1: peak_hour 3, share 2/5, 3 active hours."""
    rows, eid = [], 0
    for hr, n in ((3, 2), (9, 2), (15, 1)):
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, f"2024-05-01 {hr:02d}:30:00", "click", 1.0))
    d = tempfile.mkdtemp()
    _write(
        spark, d, "events", rows,
        "event_id long, user_id long, ts_s string, event_type string,"
        " value double",
        post=lambda df: df.select(
            "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"),
            "event_type", "value",
        ).withColumn("props", F.lit("{}")),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = QUERIES["events_hourly_profile"](spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["peak_hour"], r["n_active_hours"]) == (3, 3)
    assert abs(r["peak_share"] - 0.4) < 1e-9
