"""Distribution-audit and feature-statistics queries: lag-k
autocorrelation, Benford leading-digit audit, smoothed target encoding,
categorical mutual information, Gini revenue concentration, and an
equi-width histogram.

These extend the analytics/drift family (SURVEY.md §2 extension brief)
with the checks a feature-engineering or data-quality pipeline runs
before trusting a column.  The reference engine has no counterpart
operators (its analytics end at windowed rollups,
``covid_streaming.py:120-180``) — this is net-new surface on the same
tables.

All six queries are exactly SQL-expressible, so each carries a full
DuckDB oracle.  Scale shapes (see ``operators/infostats.py`` for the
helper-level analysis):

- ``events_daily_autocorr``: one fact-table shuffle (the per-day
  groupBy); the lag windows run over the tiny (type x day) frame.
- ``orders_benford_audit``: one map-side-combinable digit groupBy; the
  9-row result joins the grand total as a broadcast.
- ``nation_order_target_encoding``: orders->customer shuffle join on
  the customer key, nation as a broadcast, global mean as a broadcast
  1-row aggregate — the canonical smoothed-mean-encoding shape.
- ``events_type_dow_mutual_info``: ONE events shuffle; everything else
  re-aggregates the contingency table (ReuseExchange serves all
  branches).
- ``nation_customer_gini``: per-nation ranked window over one row per
  customer; spillable sort, output one row per nation.
- ``lineitem_qty_histogram``: one groupBy to bucket counts; share and
  cumulative-share windows run over the ~30-row bucket frame.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.infostats import (
    autocorr_by_group,
    gini_by_group,
    leading_digit,
    mutual_info_by_x,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Smoothing pseudo-count for the target encoder (in orders).
TE_SMOOTHING = 50

#: Equi-width histogram bucket width (quantity units).
QTY_BUCKET = 5


@query(
    "events_daily_autocorr",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, CAST(cnt AS DOUBLE) AS v,
             LAG(CAST(cnt AS DOUBLE), 1) OVER w AS l1,
             LAG(CAST(cnt AS DOUBLE), 7) OVER w AS l7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(CORR(v, l1) + 1e-9, 4) AS ac_lag1,
           ROUND(CORR(v, l7) + 1e-9, 4) AS ac_lag7
    FROM lagged GROUP BY 1
    """,
)
def events_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of each event type's daily count
    series — the "does this series carry daily/weekly memory" feature a
    forecasting pipeline derives before model choice.  Lags are in
    observed days (the synthetic series is dense, so observed ==
    calendar here)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    ac = autocorr_by_group(daily, "event_type", "d", "cnt", [1, 7])
    return ac.select(
        "event_type",
        "n_points",
        stable_round(F.col("ac_lag1"), 4).alias("ac_lag1"),
        stable_round(F.col("ac_lag7"), 4).alias("ac_lag7"),
    )


@query(
    "orders_benford_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS lead_digit
      FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
    ),
    obs AS (SELECT lead_digit, COUNT(*) AS n FROM digits GROUP BY 1),
    tot AS (SELECT SUM(n) AS n_tot FROM obs)
    SELECT lead_digit,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / n_tot + 1e-9, 6) AS obs_share,
           ROUND(LN(1.0 + 1.0 / lead_digit) / LN(10.0) + 1e-9, 6)
             AS benford_share,
           ROUND(POW(n - n_tot * (LN(1.0 + 1.0 / lead_digit) / LN(10.0)), 2)
                 / (n_tot * (LN(1.0 + 1.0 / lead_digit) / LN(10.0)))
                 + 1e-9, 4) AS chi_contrib
    FROM obs CROSS JOIN tot
    """,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed leading-digit
    shares vs the log10(1 + 1/d) expectation, with per-digit chi-square
    contributions (sum them for the 8-dof test statistic).  Fabricated
    or clipped money columns jump out here long before a model does.
    Digit extraction stays in the integer domain (`leading_digit`) to
    dodge cross-engine floor(log10(x)) boundary FP."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 0)
    )
    obs = orders.select(
        leading_digit(F.col("o_totalprice")).alias("lead_digit")
    ).groupBy("lead_digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("n_tot"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("lead_digit")) / F.log(
        F.lit(10.0)
    )
    exp_n = F.col("n_tot") * benford
    return obs.crossJoin(F.broadcast(tot)).select(
        "lead_digit",
        F.col("n").cast("long").alias("n"),
        stable_round(F.col("n") / F.col("n_tot"), 6).alias("obs_share"),
        stable_round(benford, 6).alias("benford_share"),
        stable_round(F.pow(F.col("n") - exp_n, 2) / exp_n, 4).alias(
            "chi_contrib"
        ),
    )


@query(
    "nation_order_target_encoding",
    oracle=f"""
    WITH g AS (SELECT AVG(o_totalprice) AS gmean FROM orders),
    per_nation AS (
      SELECT n.n_name, COUNT(*) AS n_orders, SUM(o.o_totalprice) AS s
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT n_name,
           CAST(n_orders AS BIGINT) AS n_orders,
           ROUND(s / n_orders + 1e-9, 4) AS raw_mean,
           ROUND((s + {TE_SMOOTHING} * g.gmean)
                 / (n_orders + {TE_SMOOTHING}) + 1e-9, 4) AS encoded_mean,
           ROUND({TE_SMOOTHING} * 1.0 / (n_orders + {TE_SMOOTHING}) + 1e-9, 6)
             AS shrinkage
    FROM per_nation CROSS JOIN g
    """,
)
def nation_order_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean (target) encoding of customer nation against order
    value: enc = (sum + m*global_mean) / (n + m) with pseudo-count
    m=50 — the standard leakage-resistant categorical encoder.  Orders
    join customers on the customer key (both sides shuffle-partitioned
    on it); nation and the 1-row global mean enter as broadcasts."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    g = orders.agg(F.avg("o_totalprice").alias("gmean"))
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("s"),
        )
    )
    m = F.lit(float(TE_SMOOTHING))
    return per_nation.crossJoin(F.broadcast(g)).select(
        "n_name",
        F.col("n_orders").cast("long").alias("n_orders"),
        stable_round(F.col("s") / F.col("n_orders"), 4).alias("raw_mean"),
        stable_round(
            (F.col("s") + m * F.col("gmean")) / (F.col("n_orders") + m), 4
        ).alias("encoded_mean"),
        stable_round(m / (F.col("n_orders") + m), 6).alias("shrinkage"),
    )


@query(
    "events_type_dow_mutual_info",
    # dow parity: Spark dayofweek() is 1=Sunday..7, DuckDB's
    # date_part('dow') is 0=Sunday..6 — the Spark side subtracts 1
    # (same convention as events_dow_seasonality).
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    joint AS (SELECT event_type, dow, COUNT(*) AS n_xy FROM ev GROUP BY 1, 2),
    xm AS (SELECT event_type, SUM(n_xy) AS n_x FROM joint GROUP BY 1),
    ym AS (SELECT dow, SUM(n_xy) AS n_y FROM joint GROUP BY 1),
    tot AS (SELECT SUM(n_xy) AS n_tot FROM joint)
    SELECT j.event_type,
           CAST(MAX(x.n_x) AS BIGINT) AS n_events,
           ROUND(SUM((j.n_xy * 1.0 / t.n_tot)
                     * LN(j.n_xy * 1.0 * t.n_tot / (x.n_x * y.n_y)))
                 + 1e-9, 6) AS mi_contrib
    FROM joint j
    JOIN xm x ON j.event_type = x.event_type
    JOIN ym y ON j.dow = y.dow
    CROSS JOIN tot t
    GROUP BY 1
    """,
)
def events_type_dow_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type contribution to the mutual information between
    event type and day-of-week (nats; dataset MI = sum over types).
    Near-zero everywhere means weekday carries no signal for that type
    — the feature-selection question answered with ONE events shuffle
    (the contingency groupBy); marginals reuse that exchange."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "event_type", (F.dayofweek("ts") - F.lit(1)).alias("dow")
    )
    mi = mutual_info_by_x(ev, "event_type", "dow")
    return mi.select(
        "event_type",
        "n_events",
        stable_round(F.col("mi_contrib"), 6).alias("mi_contrib"),
    )


@query(
    "nation_customer_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(o_totalprice) AS r
      FROM orders GROUP BY 1
    ),
    units AS (
      SELECT n.n_name, c.c_custkey, COALESCE(rev.r, 0.0) AS x
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN rev ON rev.o_custkey = c.c_custkey
    ),
    ranked AS (
      SELECT n_name, x,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY x, c_custkey) AS i
      FROM units
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_units,
           ROUND(SUM(x) + 1e-9, 2) AS total,
           ROUND(CASE WHEN SUM(x) > 0
                 THEN 2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
                      - (COUNT(*) + 1.0) / COUNT(*)
                 END + 1e-9, 4) AS gini
    FROM ranked GROUP BY 1
    """,
)
def nation_customer_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order-revenue concentration across customers
    within each nation (customers with no orders count as zero-revenue
    units).  0 = revenue spread evenly, ->1 = one customer holds it
    all.  Rank-identity form — no pairwise O(n^2) differences; the only
    per-nation cost is one spillable ranked window over one row per
    customer."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    units = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(rev, cust.c_custkey == rev.o_custkey, "left")
        .select(
            "n_name",
            "c_custkey",
            F.coalesce(F.col("r"), F.lit(0.0)).alias("x"),
        )
    )
    g = gini_by_group(units, "n_name", "x", "c_custkey")
    return g.select(
        "n_name",
        "n_units",
        stable_round(F.col("total"), 2).alias("total"),
        stable_round(F.col("gini"), 4).alias("gini"),
    )


@query(
    "lineitem_qty_histogram",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag,
             CAST(FLOOR((l_quantity - 1) / {QTY_BUCKET}) AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity >= 1
      GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(bucket * {QTY_BUCKET} + 1 AS BIGINT) AS bucket_lo,
           CAST(bucket * {QTY_BUCKET} + {QTY_BUCKET} AS BIGINT) AS bucket_hi,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY l_returnflag) + 1e-9, 6)
             AS share,
           ROUND(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bucket
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
                 * 1.0 / SUM(n) OVER (PARTITION BY l_returnflag) + 1e-9, 6)
             AS cum_share
    FROM b
    """,
)
def lineitem_qty_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of line-item quantity (width-5 buckets) per
    return flag, with per-bucket share and cumulative share — the
    distribution-sketch complement to the equi-depth
    ``docs_length_deciles``.  One map-side-combinable groupBy collapses
    the fact table; the share/cumulative windows run over the ~30-row
    bucket frame."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & (F.col("l_quantity") >= 1)
    )
    b = li.groupBy(
        "l_returnflag",
        F.floor((F.col("l_quantity") - 1) / QTY_BUCKET).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    flag_tot = Window.partitionBy("l_returnflag")
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return b.select(
        "l_returnflag",
        (F.col("bucket") * QTY_BUCKET + 1).cast("long").alias("bucket_lo"),
        (F.col("bucket") * QTY_BUCKET + QTY_BUCKET)
        .cast("long")
        .alias("bucket_hi"),
        F.col("n").cast("long").alias("n"),
        stable_round(F.col("n") / F.sum("n").over(flag_tot), 6).alias("share"),
        stable_round(
            F.sum("n").over(cum) / F.sum("n").over(flag_tot), 6
        ).alias("cum_share"),
    )
