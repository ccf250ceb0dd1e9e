"""Hand-built-fixture tests for the growth batch (ordered funnel,
growth accounting, price elasticity)."""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F


def _write(spark, d, name, rows, schema, post=None):
    df = spark.createDataFrame(rows, schema)
    if post is not None:
        df = post(df)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


EVENTS_SCHEMA = (
    "event_id long, ts_s string, user_id long, event_type string, "
    "value double, props string"
)


def _ev(df):
    return df.select(
        "event_id", F.to_timestamp("ts_s").alias("ts"),
        "user_id", "event_type", "value", "props")


def test_funnel_requires_order_and_timeout(spark):
    """User 1 completes the full ordered funnel inside the timeouts.
    User 2 purchased BEFORE viewing (order violation).  User 3 viewed
    25 h after signup (timeout).  Only user 1 reaches step 3."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "signup", 1.0, None),
        (2, "2024-01-01 01:00:00", 1, "view", 1.0, None),
        (3, "2024-01-01 02:00:00", 1, "purchase", 1.0, None),
        (4, "2024-01-01 00:00:00", 2, "signup", 1.0, None),
        (5, "2024-01-01 02:00:00", 2, "purchase", 1.0, None),
        (6, "2024-01-01 03:00:00", 2, "view", 1.0, None),
        (7, "2024-01-01 00:00:00", 3, "signup", 1.0, None),
        (8, "2024-01-02 01:00:00", 3, "view", 1.0, None),  # 25 h later
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "events", rows, EVENTS_SCHEMA, post=_ev)
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {r["step"]: r for r in
           QUERIES["events_funnel_conversion"](spark, d).collect()}
    assert out[1]["n_users"] == 3
    assert out[2]["n_users"] == 2          # users 1 and 2 view in time
    assert out[3]["n_users"] == 1          # only user 1, ordered
    assert out[2]["step_conversion"] == round(2 / 3, 6) + 0.0
    assert out[3]["step_conversion"] == 0.5
    assert out[3]["overall_conversion"] == round(1 / 3, 6) + 0.0


ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate_s string, o_orderpriority string"
)


def test_growth_accounting_ledger(spark):
    """Customer 1 active Jan+Feb (retained), skips Mar, returns Apr
    (resurrected).  Customer 2 active Feb only.  The monthly ledger
    books each transition once."""
    rows = [
        (1, 1, "O", 1.0, "2024-01-10 00:00:00", "1-URGENT"),
        (2, 1, "O", 1.0, "2024-02-05 00:00:00", "1-URGENT"),
        (3, 1, "O", 1.0, "2024-04-07 00:00:00", "1-URGENT"),
        (4, 2, "O", 1.0, "2024-02-20 00:00:00", "1-URGENT"),
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "orders", rows, ORDERS_SCHEMA,
           post=lambda df: df.withColumn(
               "o_orderdate", F.to_timestamp("o_orderdate_s")
           ).drop("o_orderdate_s"))
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {str(r["month"]): r for r in
           QUERIES["customer_growth_accounting"](spark, d).collect()}
    jan, feb, apr = out["2024-01-01"], out["2024-02-01"], out["2024-04-01"]
    assert (jan["n_active"], jan["n_new"], jan["n_retained"]) == (1, 1, 0)
    assert (feb["n_active"], feb["n_new"], feb["n_retained"]) == (2, 1, 1)
    # cust 1 skips March -> counted as churning after Feb; cust 2 also
    assert feb["n_churning_after"] == 2
    assert (apr["n_resurrected"], apr["n_new"]) == (1, 0)
    assert "2024-03-01" not in out


def test_price_elasticity_exact_powerlaw(spark):
    """Quantities generated exactly as q = 100 * price^(-2): the
    log-log OLS slope recovers -2 with R^2 = 1.  A one-point brand
    yields NULL elasticity."""
    li, part = [], [(1, "p1", "BRAND#E", "t", 1, 1.0),
                    (2, "p2", "BRAND#S", "t", 1, 1.0)]
    k = 0
    for price in [2.0, 4.0, 8.0, 16.0]:
        q = 100.0 * price ** -2
        # l_extendedprice = unit price * quantity
        li.append((k := k + 1, 1, 1, 1, q, price * q, 0.0, 0.0,
                   "N", "O", "1995-01-01"))
    li.append((k := k + 1, 2, 1, 1, 3.0, 9.0, 0.0, 0.0, "N", "O",
               "1995-01-01"))
    d = tempfile.mkdtemp()
    _write(spark, d, "lineitem", li,
           "l_orderkey long, l_partkey long, l_suppkey long, "
           "l_linenumber int, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double, l_returnflag string, "
           "l_linestatus string, l_shipdate_s string",
           post=lambda df: df.withColumn(
               "l_shipdate", F.to_timestamp("l_shipdate_s")
           ).drop("l_shipdate_s"))
    _write(spark, d, "part", part,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {r["brand"]: r for r in
           QUERIES["brand_price_elasticity"](spark, d).collect()}
    assert math.isclose(out["BRAND#E"]["elasticity"], -2.0, abs_tol=1e-6)
    assert math.isclose(out["BRAND#E"]["r2"], 1.0, abs_tol=1e-6)
    assert out["BRAND#S"]["elasticity"] is None
    assert out["BRAND#S"]["n_items"] == 1
