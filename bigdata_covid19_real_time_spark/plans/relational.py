"""General relational operator surface on the synthetic corpus.

The reference has no joins (SURVEY.md §2.4) — its engine inherits them
from Catalyst.  These queries exercise that inherited surface the way a
user of the new engine would: scan -> filter -> join -> aggregate ->
window -> top-k, with explicit broadcast hints for dimension tables.

Scale notes per query are in the docstrings; the shared rules:
- dimension tables (region/nation/supplier at any SF, customer at small
  SF) are broadcast — no shuffle of the fact table for those joins;
- aggregates do map-side partial aggregation (hash agg);
- top-k is TakeOrderedAndProject (no global sort);
- filters on parquet scans push down (verify: .explain -> PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity) + 1e-9, 2)                                          AS sum_qty,
           ROUND(SUM(l_extendedprice) + 1e-9, 2)                                     AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 2)                  AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 1e-9, 2)    AS sum_charge,
           ROUND(AVG(l_quantity) + 1e-9, 4)                                          AS avg_qty,
           ROUND(AVG(l_extendedprice) + 1e-9, 4)                                     AS avg_price,
           ROUND(AVG(l_discount) + 1e-9, 6)                                          AS avg_disc,
           COUNT(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the engine's flagship scan+agg.

    Scale: single shuffle on the 6-value group key; partial aggregation
    collapses each map partition to <=6 rows before the exchange, so the
    shuffle is O(partitions), not O(rows).  The shipdate filter and an
    11->7 column projection push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(F.sum(disc_price), 2).alias("sum_disc_price"),
            stable_round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            stable_round(F.avg("l_quantity"), 4).alias("avg_qty"),
            stable_round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            stable_round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           ROUND(SUM(o.o_totalprice) + 1e-9, 2) AS revenue,
           COUNT(*)                      AS orders_count
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact(orders) -> dim(customer) -> dim(nation) -> dim(region).

    Scale: nation/region are broadcast unconditionally (25/5 rows at any
    SF).  customer is broadcast too at test SFs; at 100 TB customer joins
    orders via shuffle-hash on the key both sides are naturally keyed by,
    and AQE converts to broadcast when the post-filter side fits.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("orders_count"),
        )
    )


@query(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice + 1e-9, 2) AS o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (D5): planned as TakeOrderedAndProject — per-partition heap
    of k rows, driver merges #partitions*k rows.  Explicit o_orderkey
    tie-break for determinism."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", stable_round("o_totalprice", 2).alias("o_totalprice"), "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "top_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(o.o_totalprice) + 1e-9, 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k.  Aggregation runs on the (custkey,...) key
    *before* the rank-limit, so the TakeOrdered input is already collapsed
    to one row per customer."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(stable_round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "orders_without_lineitems",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    ORDER BY o.o_orderkey
    """,
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (left_anti): orders with no lineitems.  One shuffle on
    the join key; Spark's anti-join needs only key presence, no payload."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@query(
    "user_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 1e-9, 6) AS moving_avg_7
    FROM events
    """,
)
def user_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-style trailing 7-row moving average per user over the events
    stream table.  Single shuffle on user_id, sort within partitions;
    event_id tie-break pins the frame order."""
    events = load_table(spark, sf_dir, "events")
    w7 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return events.select(
        "event_id",
        "user_id",
        stable_round(F.avg("value").over(w7), 6).alias("moving_avg_7"),
    )


@query(
    "user_value_growth",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 0
                THEN ROUND((value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                           / lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) + 1e-9, 6)
                ELSE 0.0 END AS growth_rate
    FROM events
    """,
)
def user_value_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/W4-style lag + guarded growth rate (NULL lag -> 0.0, the
    reference's first-row semantics at covid_streaming.py:76-78)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value", 1).over(w)
    return events.select(
        "event_id",
        "user_id",
        F.when(prev > 0, stable_round((F.col("value") - prev) / prev, 6))
        .otherwise(F.lit(0.0))
        .alias("growth_rate"),
    )


@query(
    "events_5min_rollup",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*)                   AS events_count,
           ROUND(SUM(value) + 1e-9, 2)       AS total_value,
           COUNT(DISTINCT user_id)    AS distinct_users
    FROM events
    GROUP BY 1, 2
    """,
)
def events_5min_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/T4-style tumbling 5-minute event-time window rollup, batch form.
    Window start emitted as a formatted string (cross-engine timestamp
    comparison is timezone-fraught).  Exact countDistinct for parity with
    the reference (covid_streaming.py:169)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("events_count"),
            stable_round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("distinct_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "events_count",
            "total_value",
            "distinct_users",
        )
    )


@query(
    "daily_event_summary",
    oracle="""
    SELECT CAST(ts AS DATE)        AS event_date,
           COUNT(DISTINCT user_id) AS active_users,
           COUNT(*)                AS events_count,
           ROUND(SUM(value) + 1e-9, 2)    AS total_value,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error_count
    FROM events
    GROUP BY 1
    """,
)
def daily_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-style per-day dashboard rollup (mirrors covid_dashboard_summary,
    init.sql:92-103: date-truncated group, distinct count, conditional
    count)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.countDistinct("user_id").alias("active_users"),
        F.count(F.lit(1)).alias("events_count"),
        stable_round(F.sum("value"), 2).alias("total_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("error_count"),
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                                            AS events_count,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)) + 1e-9, 6)   AS k_avg
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-style schema-applied JSON decode on the props payload column
    (the engine's from_json path), then aggregate.  Demonstrates JSON
    parse staying JVM-side (no UDF)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events_count"),
        F.sum(k).alias("k_total"),
        stable_round(F.avg(k), 6).alias("k_avg"),
    )


@query(
    "event_type_rankings",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value) + 1e-9, 2) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS events_count,
           CAST(ROW_NUMBER() OVER (ORDER BY SUM(value) DESC, event_type ASC) AS INTEGER) AS ranking_position
    FROM events
    GROUP BY event_type
    """,
)
def event_type_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/W8-style agg + global ranking (mirrors country_rankings,
    init.sql:81-90).  The global window runs on the post-agg rows (one
    per event_type) — a single-partition exchange of a tiny frame."""
    events = load_table(spark, sf_dir, "events")
    ranked = Window.orderBy(F.desc("total_value"), F.asc("event_type"))
    return (
        events.groupBy("event_type")
        .agg(
            stable_round(F.sum("value"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("events_count"),
        )
        .withColumn("ranking_position", F.row_number().over(ranked))
    )


@query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-06-01'
      AND l_shipdate > DATE '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers x date-filtered orders
    x lineitems, revenue per order, top 10.  Catalyst pushes all three
    filters into the scans and broadcast-joins the filtered customer
    side; ordering on the ROUNDED revenue keeps the top-10 cut
    deterministic across engines (epsilon-rounded sums)."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"])
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(stable_round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )
