"""Customer/behavioral feature-engineering batch: RFM segmentation,
time-decay feature aggregation, interval-counting backlog, YoY growth,
and hour-of-day activity profiling — the standard feature/reporting
queries a warehouse layer derives from the fact tables, all exactly
SQL-expressible (full hash gates).

Scale notes (each also in SCALE.md):

- RFM buckets reuse ``percentile_rank_buckets`` — integer-ceil
  percentile ranks over collapsed per-value frames, NOT ``ntile`` (a
  global single-partition sort) and NOT interpolated float boundaries
  (cross-engine comparison hazards).  Monetary sums quantize to 2
  decimals before bucketing so the collapsed frame groups on stable
  values.
- The backlog query counts open intervals WITHOUT an interval
  self-join: event-ify each order into a +1 (start month) and -1
  (close month) delta, aggregate deltas to the month grain, and
  cumulative-sum over the ~84-row month frame.  An interval x days
  join is O(n * span); this is one groupBy plus a window over a frame
  six orders of magnitude smaller.
- Time-decay aggregation is a single groupBy whose weight
  ``exp(-lambda * age_days)`` folds into the aggregate expression —
  the reference date joins as a broadcast 1-row frame, never a
  driver-side collect.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.quality import (
    percentile_rank_buckets,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: RFM quantile buckets per dimension.
RFM_BUCKETS = 4

#: Half-life (days) for the recency-weighted value feature.
DECAY_HALF_LIFE_DAYS = 14.0

_BUCKET_SQL = """
    {name}_cnt AS (SELECT {col} AS v, COUNT(*) AS c FROM base GROUP BY 1),
    {name}_map AS (
      SELECT v,
             CAST(({k} * SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   + SUM(c) OVER () - 1) // SUM(c) OVER () AS INTEGER) AS b
      FROM {name}_cnt
    )"""


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS ref FROM orders),
    base AS (
      SELECT o_custkey,
             DATE_DIFF('day', MAX(o_orderdate), (SELECT ref FROM mx))
               AS recency,
             COUNT(*) AS freq,
             ROUND(SUM(o_totalprice) + 1e-9, 2) AS monetary
      FROM orders GROUP BY 1
    ),
    {_BUCKET_SQL.format(name="r", col="recency", k=RFM_BUCKETS)},
    {_BUCKET_SQL.format(name="f", col="freq", k=RFM_BUCKETS)},
    {_BUCKET_SQL.format(name="m", col="monetary", k=RFM_BUCKETS)},
    seg AS (
      SELECT r_map.b AS r_bucket, f_map.b AS f_bucket, m_map.b AS m_bucket,
             base.monetary
      FROM base
      JOIN r_map ON base.recency = r_map.v
      JOIN f_map ON base.freq = f_map.v
      JOIN m_map ON base.monetary = m_map.v
    )
    SELECT r_bucket, f_bucket, m_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(monetary) + 1e-9, 2) AS avg_monetary
    FROM seg GROUP BY 1, 2, 3
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days since last order,
    vs the table's max order date), frequency (order count), monetary
    (2-decimal-quantized spend), each percentile-rank-bucketed into
    quartiles WITHOUT a global sort (see module docstring), then the
    segment grid (<= 4^3 cells) with population and average spend."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    ref = F.broadcast(orders.agg(F.max("o_orderdate").alias("__ref")))
    base = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("__last"),
            F.count(F.lit(1)).alias("freq"),
            stable_round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(ref)
        .select(
            "o_custkey",
            F.datediff(F.col("__ref"), F.col("__last")).alias("recency"),
            "freq",
            "monetary",
        )
    )
    for col in ("recency", "freq", "monetary"):
        base = percentile_rank_buckets(
            base, col, RFM_BUCKETS, bucket_col=f"{col[0]}_bucket"
        )
    return base.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        stable_round(F.avg("monetary"), 2).alias("avg_monetary"),
    )


@query(
    "user_recency_weighted_value",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(CAST(ts AS DATE)) AS ref FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value * EXP(-LN(2) / {DECAY_HALF_LIFE_DAYS}
                 * DATE_DIFF('day', CAST(ts AS DATE), (SELECT ref FROM mx))))
                 + 1e-9, 4) AS decayed_value
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
    GROUP BY 1
    """,
)
def user_recency_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay feature: per user, the half-life-weighted
    sum of event values relative to the corpus max date — the standard
    recency-weighted engagement/LTV feature.  One groupBy; the decay
    weight folds into the aggregate expression; the reference date is a
    broadcast 1-row frame."""
    lam = math.log(2.0) / DECAY_HALF_LIFE_DAYS
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .select("user_id", "value", F.to_date("ts").alias("d"))
    )
    ref = F.broadcast(ev.agg(F.max("d").alias("__ref")))
    return (
        ev.crossJoin(ref)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            stable_round(
                F.sum(
                    F.col("value")
                    * F.exp(-F.lit(lam) * F.datediff("__ref", "d"))
                ),
                4,
            ).alias("decayed_value"),
        )
    )


@query(
    "orders_open_backlog",
    oracle="""
    WITH span AS (
      SELECT o.o_orderdate AS start_d, MAX(l.l_shipdate) AS end_d
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    starts AS (
      SELECT CAST(DATE_TRUNC('month', start_d) AS DATE) AS month, COUNT(*) AS n
      FROM span GROUP BY 1
    ),
    ends AS (
      SELECT CAST(DATE_TRUNC('month', end_d) AS DATE) AS month, COUNT(*) AS n
      FROM span GROUP BY 1
    ),
    months AS (
      SELECT COALESCE(s.month, e.month) AS month,
             COALESCE(s.n, 0) AS n_started,
             COALESCE(e.n, 0) AS n_closed
      FROM starts s FULL OUTER JOIN ends e ON s.month = e.month
    )
    SELECT month,
           CAST(n_started AS BIGINT) AS n_started,
           CAST(n_closed AS BIGINT) AS n_closed,
           CAST(SUM(n_started - n_closed) OVER (
                  ORDER BY month ROWS UNBOUNDED PRECEDING
                ) AS BIGINT) AS backlog_eom
    FROM months
    """,
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by interval event-ification: each
    order contributes +1 in its start month (order date) and -1 in its
    close month (last lineitem shipment); the end-of-month backlog is
    the cumulative net over the ~84-row month frame.  No interval
    self-join, no per-day explode (see module docstring).  Months with
    zero activity are absent (the backlog carries across the gap
    unchanged)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("end_d"))
        .select(
            F.trunc("o_orderdate", "month").alias("start_m"),
            F.trunc("end_d", "month").alias("end_m"),
        )
    )
    starts = span.groupBy(F.col("start_m").alias("month")).agg(
        F.count(F.lit(1)).alias("n_started")
    )
    ends = span.groupBy(F.col("end_m").alias("month")).agg(
        F.count(F.lit(1)).alias("n_closed")
    )
    months = (
        starts.join(ends, "month", "full_outer")
        .select(
            "month",
            F.coalesce("n_started", F.lit(0)).alias("n_started"),
            F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
        )
    )
    cum = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return months.select(
        "month",
        F.col("n_started").cast("long").alias("n_started"),
        F.col("n_closed").cast("long").alias("n_closed"),
        F.sum(F.col("n_started") - F.col("n_closed"))
        .over(cum)
        .cast("long")
        .alias("backlog_eom"),
    )


@query(
    "nation_revenue_yoy",
    oracle="""
    WITH rev AS (
      SELECT n.n_name, CAST(YEAR(o.o_orderdate) AS INTEGER) AS yr,
             SUM(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, yr, ROUND(revenue + 1e-9, 2) AS revenue,
           ROUND((revenue - LAG(revenue) OVER w)
                 / LAG(revenue) OVER w + 1e-9, 6) AS yoy_growth
    FROM rev
    WINDOW w AS (PARTITION BY n_name ORDER BY yr)
    """,
)
def nation_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation: broadcast the
    two small dimensions onto orders, aggregate to the (nation, year)
    grid, then lag over that tiny frame.  First year per nation has
    NULL growth."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum("o_totalprice").alias("__rev"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    return rev.select(
        "n_name",
        "yr",
        stable_round(F.col("__rev"), 2).alias("revenue"),
        stable_round(
            (F.col("__rev") - F.lag("__rev").over(w))
            / F.lag("__rev").over(w),
            6,
        ).alias("yoy_growth"),
    )


@query(
    "events_hourly_profile",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(HOUR(ts) AS INTEGER) AS hr, COUNT(*) AS n
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type, hr, n,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY n DESC, hr ASC
             ) AS r,
             SUM(n) OVER (PARTITION BY event_type) AS total,
             COUNT(*) OVER (PARTITION BY event_type) AS n_active_hours
      FROM h
    )
    SELECT event_type, hr AS peak_hour,
           ROUND(n * 1.0 / total + 1e-9, 6) AS peak_share,
           CAST(n_active_hours AS BIGINT) AS n_active_hours
    FROM rk WHERE r = 1
    """,
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type: the peak hour (ties
    break to the earliest hour), its traffic share, and the number of
    active hours — the intraday complement of the day-of-week
    seasonality query.  One (type, hour) pre-aggregation; all windows
    run on the <= 24-rows-per-type frame."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    typ = Window.partitionBy("event_type")
    peak = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("hr")
    )
    return (
        h.withColumn("r", F.row_number().over(peak))
        .withColumn("total", F.sum("n").over(typ))
        .withColumn("n_active_hours", F.count(F.lit(1)).over(typ))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("hr").alias("peak_hour"),
            stable_round(F.col("n") * F.lit(1.0) / F.col("total"), 6).alias(
                "peak_share"
            ),
            F.col("n_active_hours").cast("long").alias("n_active_hours"),
        )
    )
