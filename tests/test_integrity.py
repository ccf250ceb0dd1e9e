"""Hand-built-fixture tests for the governance/engagement batch
(RI audit, DAU/WAU/MAU stickiness, repeat intervals)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def _write(spark, d, name, rows, schema, post=None):
    df = spark.createDataFrame(rows, schema)
    if post is not None:
        df = post(df)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


def _star(spark, d, lineitem_rows):
    _write(spark, d, "lineitem", lineitem_rows,
           "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
           "l_quantity double, l_extendedprice double, l_discount double, "
           "l_tax double, l_returnflag string, l_linestatus string, ship_s string",
           post=lambda df: df.select(
               "*", F.to_timestamp("ship_s").alias("l_shipdate")).drop("ship_s"))
    _write(spark, d, "orders", [(1, 1, "O", 10.0, "2024-01-01", "1-URGENT")],
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, date_s string, o_orderpriority string",
           post=lambda df: df.select(
               "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               F.to_timestamp("date_s").alias("o_orderdate"), "o_orderpriority"))
    _write(spark, d, "part", [(1, "p", "B", "t", 1, 1.0)],
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    _write(spark, d, "supplier", [(1, "s", 1, 0.0)],
           "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    _write(spark, d, "customer", [(1, "c", 1, 0.0, "SEG")],
           "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
           "c_mktsegment string")
    _write(spark, d, "nation", [(1, "n", 1)],
           "n_nationkey int, n_name string, n_regionkey int")
    _write(spark, d, "region", [(1, "r")], "r_regionkey int, r_name string")


def test_ri_audit_counts_dangling_and_null_keys(spark):
    """Three lineitem rows: one valid, one pointing at a missing
    order (dangling), one with a NULL order key.  The lineitem->orders
    edge reports 1 dangling / 1 null / orphan rate 0.5; every
    dimension edge is clean."""
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01"),
        (999, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01"),
        (None, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01"),
    ]
    d = tempfile.mkdtemp()
    _star(spark, d, li)
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {r["fk_edge"]: r for r in
           QUERIES["star_schema_integrity"](spark, d).collect()}
    e = got["lineitem->orders"]
    assert (e["n_rows"], e["n_null_keys"], e["n_dangling"]) == (3, 1, 1)
    assert e["orphan_rate"] == 0.5
    for edge in ["lineitem->part", "lineitem->supplier",
                 "orders->customer", "customer->nation", "nation->region"]:
        assert got[edge]["n_dangling"] == 0


def test_stickiness_windows_truncate_and_ratio(spark):
    """u1 active day 1 only, u2 active day 10 only: on day 10 DAU=1,
    WAU=1 (u1's 7-day support ended day 7), MAU=2, stickiness 0.5."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (2, "2024-01-10 10:00:00", 2, "view", 1.0),
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "events", rows,
           "event_id long, ts_s string, user_id long, event_type string, value double",
           post=lambda df: df.select(
               "event_id", F.to_timestamp("ts_s").alias("ts"),
               "user_id", "event_type", "value"))
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {r["day"].isoformat(): r for r in
           QUERIES["events_wau_mau_stickiness"](spark, d).collect()}
    # only days with DAU rows appear (dau is the spine)
    assert set(got) == {"2024-01-01", "2024-01-10"}
    r10 = got["2024-01-10"]
    assert (r10["dau"], r10["wau"], r10["mau"]) == (1, 1, 2)
    assert r10["stickiness"] == 0.5
    r1 = got["2024-01-01"]
    assert (r1["dau"], r1["wau"], r1["mau"]) == (1, 1, 1)


def test_repeat_intervals_gap_percentiles(spark):
    """One customer ordering on days 1, 11, 31: gaps 10 and 20 ->
    mean 15, p50 15, p90 19 (linear interpolation)."""
    orders = [(i, 1, "O", 10.0, ds, "1-URGENT") for i, ds in
              [(1, "2024-01-01"), (2, "2024-01-11"), (3, "2024-01-31")]]
    d = tempfile.mkdtemp()
    _write(spark, d, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, date_s string, o_orderpriority string",
           post=lambda df: df.select(
               "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               F.to_timestamp("date_s").alias("o_orderdate"), "o_orderpriority"))
    _write(spark, d, "customer", [(1, "c", 1, 0.0, "AUTO")],
           "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
           "c_mktsegment string")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["orders_repeat_intervals"](spark, d).collect()
    assert row["n_gaps"] == 2
    assert row["mean_gap_days"] == 15.0
    assert row["p50_gap_days"] == 15.0
    assert row["p90_gap_days"] == 19.0
