"""Hand-built-fixture tests for the mining batch (Theil-Sen trend,
item-CF similarity)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def _write(spark, d, name, rows, schema, post=None):
    df = spark.createDataFrame(rows, schema)
    if post is not None:
        df = post(df)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


def test_theilsen_ignores_single_outlier(spark):
    """Daily totals 10, 20, 30, 40, 1000 (one wild day): OLS would be
    dragged far above 10/day; the Theil-Sen median slope stays 10
    (median of pairwise slopes) and the intercept stays 0."""
    rows = []
    vals = [10.0, 20.0, 30.0, 40.0, 1000.0]
    for i, v in enumerate(vals):
        rows.append((i, f"2024-01-{i + 1:02d} 10:00:00", 1, "view", v))
    d = tempfile.mkdtemp()
    _write(spark, d, "events", rows,
           "event_id long, ts_s string, user_id long, event_type string, value double",
           post=lambda df: df.select(
               "event_id", F.to_timestamp("ts_s").alias("ts"),
               "user_id", "event_type", "value"))
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["events_theilsen_trend"](spark, d).collect()
    assert row["n_days"] == 5 and row["n_pairs"] == 10
    assert row["theilsen_slope"] == 10.0   # median of the 10 pairwise slopes
    # residuals y - 10x = [10, 10, 10, 10, 960] -> median 10
    assert row["intercept"] == 10.0


def test_item_cf_cosine_identical_and_disjoint_profiles(spark):
    """Brands A and B bought in identical quantities by the same 5
    customers -> cosine 1.0; brand C shares no customers with A -> no
    (A, C) pair survives the common-customer floor."""
    li, orders = [], []
    for cust in range(5):
        okey = 100 + cust
        orders.append((okey, cust, "O", 10.0, "2024-01-01", "1-URGENT"))
        li.append((okey, 1, 1, 1, 2.0 + cust, 1.0, 0.0, 0.0, "N", "O", "2024-01-01"))
        li.append((okey, 2, 1, 2, 2.0 + cust, 1.0, 0.0, 0.0, "N", "O", "2024-01-01"))
    for cust in range(10, 16):  # brand C only, disjoint customers
        okey = 200 + cust
        orders.append((okey, cust, "O", 10.0, "2024-01-01", "1-URGENT"))
        li.append((okey, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01"))
    part = [(1, "p1", "BRAND#A", "t", 1, 1.0),
            (2, "p2", "BRAND#B", "t", 1, 1.0),
            (3, "p3", "BRAND#C", "t", 1, 1.0)]
    d = tempfile.mkdtemp()
    _write(spark, d, "lineitem", li,
           "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
           "l_quantity double, l_extendedprice double, l_discount double, "
           "l_tax double, l_returnflag string, l_linestatus string, ship_s string",
           post=lambda df: df.select(
               "*", F.to_timestamp("ship_s").alias("l_shipdate")).drop("ship_s"))
    _write(spark, d, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, date_s string, o_orderpriority string",
           post=lambda df: df.select(
               "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               F.to_timestamp("date_s").alias("o_orderdate"), "o_orderpriority"))
    _write(spark, d, "part", part,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {(r["brand_a"], r["brand_b"]): r for r in
           QUERIES["brand_item_cf_similarity"](spark, d).collect()}
    assert set(got) == {("BRAND#A", "BRAND#B")}
    r = got[("BRAND#A", "BRAND#B")]
    assert r["n_common"] == 5
    assert r["cosine"] == 1.0
