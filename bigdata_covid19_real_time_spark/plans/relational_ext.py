"""Extended relational surface: grouping sets, as-of join, session
windows, set operations, exact percentiles, semi-joins.

None of these exist in the reference (its operator inventory stops at
plain groupBy/window/filter — SURVEY.md §2); they round out the query
surface a user of a general analytics engine expects, each expressed as
the Catalyst-native construct (``rollup``/``cube``, ``session_window``,
``left_semi``, ``exceptAll``) rather than a hand-built expansion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.asof import asof_join
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "events_rollup",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           CAST(COUNT(*) AS BIGINT) AS events_count,
           ROUND(SUM(value) + 1e-9, 2) AS total_value
    FROM events
    GROUP BY ROLLUP (event_date, event_type)
    HAVING COUNT(*) > 0
    """,
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: (date, type), (date), () — subtotals and a
    grand total in one pass.  Catalyst plans one Expand + one hash agg:
    rows duplicate x3 map-side, but each grouping's partial agg collapses
    before the single shuffle — no three-scan union.

    Empty-input contract: grouping-set rows are emitted only for
    NON-EMPTY groups (Spark's grouping-sets semantics — no grand-total
    row over an empty relation; the SQL standard and DuckDB emit one).
    The oracle's HAVING COUNT(*) > 0 encodes that contract and is a
    no-op on any non-empty input (every emitted group has >= 1 row)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.rollup(F.to_date("ts").alias("event_date"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("events_count"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "events_cube",
    oracle="""
    SELECT event_type, CAST(hour(ts) AS INTEGER) AS event_hour,
           CAST(COUNT(*) AS BIGINT) AS events_count,
           ROUND(AVG(value) + 1e-9, 4) AS avg_value
    FROM events
    GROUP BY CUBE (event_type, event_hour)
    HAVING COUNT(*) > 0
    """,
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, hour-of-day): all four grouping sets in one
    Expand+agg — the OLAP dashboard shape.  Empty-input contract as in
    ``events_rollup``: no grand-total row over an empty relation
    (Spark grouping-sets semantics, encoded by the oracle's no-op-on-
    data HAVING COUNT(*) > 0)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.cube(
            F.col("event_type"), F.hour("ts").cast("int").alias("event_hour")
        )
        .agg(
            F.count(F.lit(1)).alias("events_count"),
            stable_round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@query(
    "purchase_asof_click",
    oracle="""
    WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS click_ts, event_id AS click_event_id FROM events WHERE event_type = 'click')
    SELECT p.user_id, p.event_id, p.value AS purchase_value,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.click_event_id,
           CASE WHEN c.click_ts IS NULL THEN NULL
                ELSE strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') END AS click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.click_ts <= p.ts
    """,
)
def purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase attributed to the
    user's latest click at-or-before it — the union-merge form, one
    shuffle on user_id, no range cross-join.  Oracle: DuckDB ASOF JOIN."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_event_id"),
    )
    joined = asof_join(
        purchases, clicks, on=["user_id"], left_time="ts", right_time="click_ts"
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("value").alias("purchase_value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "click_event_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


@query(
    "user_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS events_count,
           ROUND(SUM(value) + 1e-9, 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via ``session_window`` (30-min inactivity gap) —
    Spark's native merging session agg (streaming-capable with a
    watermark; here batch).  The oracle rebuilds sessions with the
    classic gap-flag + running-sum idiom; Spark's session end is
    last-event + gap, mirrored in the oracle."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("events_count"),
            stable_round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "events_count",
            "session_value",
        )
    )


@query(
    "error_only_user_days",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS event_date FROM events WHERE event_type = 'error'
    EXCEPT
    SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'purchase'
    ORDER BY user_id, event_date
    """,
)
def error_only_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT DISTINCT via ``subtract``): (user, day)
    pairs with an error but no purchase.  Spark plans a left-anti over
    distinct keys — one shuffle on the pair."""
    events = load_table(spark, sf_dir, "events")
    err = events.filter(F.col("event_type") == "error").select(
        "user_id", F.to_date("ts").alias("event_date")
    )
    pur = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("event_date")
    )
    return err.subtract(pur).orderBy("user_id", "event_date")


@query(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5) + 1e-9, 4)  AS p50,
           ROUND(quantile_cont(value, 0.9) + 1e-9, 4)  AS p90,
           ROUND(quantile_cont(value, 0.99) + 1e-9, 4) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (``percentile`` —
    sort-based exact agg; both engines linear-interpolate).  At 100 TB
    swap for ``approx_percentile`` (t-digest sketch, mergeable,
    single-pass) — exact percentile shuffles every value."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        stable_round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        stable_round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "orders_with_big_items",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, ROUND(o.o_totalprice + 1e-9, 2) AS o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 5000)
    ORDER BY o.o_orderkey
    """,
)
def orders_with_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS): orders containing any lineitem over 5000.
    ``left_semi`` carries no right payload through the shuffle; the
    extendedprice filter pushes into the lineitem parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    big = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") > 5000
    ).select("l_orderkey")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .select(
            "o_orderkey",
            "o_orderstatus",
            stable_round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "events_sliding_rollup",
    oracle="""
    WITH w AS (
      SELECT e.*, time_bucket(INTERVAL '5 minutes', e.ts) - u.k * INTERVAL '5 minutes' AS wstart
      FROM events e, unnest(range(0, 2)) AS u(k)
      WHERE e.ts < time_bucket(INTERVAL '5 minutes', e.ts) - u.k * INTERVAL '5 minutes' + INTERVAL '10 minutes'
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS events_count,
           ROUND(SUM(value) + 1e-9, 2) AS total_value
    FROM w
    GROUP BY 1, 2
    """,
)
def events_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (10-min length, 5-min slide): every
    event lands in two windows.  Spark plans one Expand (x2 rows) + one
    hash agg — the same shape as rollup, not a self-union.  The oracle
    derives each event's two window starts arithmetically."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("events_count"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "events_count",
            "total_value",
        )
    )


@query(
    "customer_order_coverage",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS orders_count,
           ROUND(COALESCE(SUM(o.o_totalprice), 0.0) + 1e-9, 2) AS revenue
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def customer_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers (COUNT of the
    null-extended side is 0, SUM coalesced).  One shuffle on the key;
    at scale the orders side pre-aggregates per custkey before the join
    would be the next optimization — here the join feeds the agg
    directly so Catalyst's partial agg handles it."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("orders_count"),
            stable_round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "order_rank_spectrum",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(RANK()       OVER w AS INTEGER) AS price_rank,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS price_dense_rank,
           CAST(NTILE(4)     OVER w AS INTEGER) AS price_quartile,
           ROUND(CUME_DIST() OVER w + 1e-9, 6)  AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def order_rank_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function spectrum (rank, dense_rank, ntile,
    cume_dist) per priority class — W8 generalized beyond row_number.
    One shuffle on the partition key; all four functions share a single
    sorted window pass."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
        stable_round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


@query(
    "daily_event_summary_sketch",
    # Sketch values are engine-specific (Spark HLL++ / t-digest cannot
    # equal DuckDB's implementations bit-for-bit), but the sketches'
    # ACCURACY CONTRACT is oracle-checkable: emit error-bound booleans
    # (|approx - exact| <= rel_tol * |exact| + abs_tol, evaluated inside
    # Spark against the exact aggregate) and have the oracle expect TRUE.
    # Both engines agree on the exact events_count, so the row identity
    # is still value-hashed, not just counted.
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(COUNT(*) AS BIGINT) AS events_count,
           TRUE AS approx_users_within_2pct,
           TRUE AS approx_p50_within_5pct,
           TRUE AS approx_p99_within_5pct
    FROM events
    GROUP BY 1
    """,
)
def daily_event_summary_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the dashboard rollup: HLL++
    ``approx_count_distinct`` (no expand+second-shuffle like exact
    distinct) and t-digest ``approx_percentile`` (single-pass mergeable
    sketch vs the exact percentile's full-value shuffle).  Same plan
    shape as the exact twins, sketch state instead of value state.

    Gate shape: the exact twins run in the same aggregate purely to
    evaluate the error bounds; at 100 TB you run only the sketch half —
    the exact columns here are the verification harness, not the op.

    Bound semantics match each sketch's actual guarantee: HLL bounds
    VALUE error (rsd 0.01 -> 2% relative + 1.5 absolute slack for tiny
    per-day cardinalities, where the sparse encoding is near-exact); the
    percentile sketch bounds RANK error — the approx value must lie
    between the exact p+/-5% quantiles.  A value-relative percentile
    bound would be wrong: on a 30-row day the sketch returns a dataset
    element while the exact percentile interpolates between elements,
    and the inter-element gap can exceed any fixed value tolerance.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("event_date")

    # TWO passes joined on the 30-row result, not one mixed aggregate:
    # a distinct aggregate (countDistinct) mixed with percentile buffers
    # makes Catalyst Expand every input row through every agg buffer,
    # and separate percentile(p) calls each sort their own buffer.  The
    # sketch pass is pure single-phase; the exact pass uses the
    # array-percentile form (one sort serves all four quantiles).
    sketch = events.groupBy(day).agg(
        F.count(F.lit(1)).alias("events_count"),
        F.approx_count_distinct("user_id", 0.01).cast("double").alias("__au"),
        F.expr("approx_percentile(value, array(0.5, 0.99), 1000)").alias("__ap"),
    )
    exact = events.groupBy(day).agg(
        F.countDistinct("user_id").cast("double").alias("__eu"),
        F.expr("percentile(value, array(0.45, 0.55, 0.94, 1.0))").alias("__ep"),
    )
    agg = sketch.join(exact, "event_date")

    def rank_bound(approx: Column, lo: Column, hi: Column) -> Column:
        return (approx >= lo - F.lit(1e-9)) & (approx <= hi + F.lit(1e-9))

    ap, ep = F.col("__ap"), F.col("__ep")
    return agg.select(
        "event_date",
        "events_count",
        (
            F.abs(F.col("__au") - F.col("__eu"))
            <= F.lit(0.02) * F.col("__eu") + F.lit(1.5)
        ).alias("approx_users_within_2pct"),
        rank_bound(ap[0], ep[0], ep[1]).alias("approx_p50_within_5pct"),
        rank_bound(ap[1], ep[2], ep[3]).alias("approx_p99_within_5pct"),
    ).orderBy("event_date")


@query(
    "events_pivot_by_type",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN value END), 0.0) + 1e-9, 2) AS click,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN value END), 0.0) + 1e-9, 2) AS error,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN value END), 0.0) + 1e-9, 2) AS purchase,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN value END), 0.0) + 1e-9, 2) AS signup,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN value END), 0.0) + 1e-9, 2) AS view
    FROM events
    GROUP BY 1
    """,
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per event type, daily value totals.  Explicit
    pivot values — with them Catalyst plans a single-pass pivot agg;
    without, it must first scan for distinct values (an extra job)."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        events.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", types)
        .sum("value")
    )
    return out.select(
        "event_date",
        *[stable_round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(t) for t in types],
    )


@query(
    "events_unpivot_daily_metrics",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS event_date,
             CAST(COUNT(*) AS DOUBLE) AS events,
             CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS users,
             ROUND(SUM(value) + 1e-9, 2) AS total_value
      FROM events GROUP BY 1
    )
    SELECT event_date, metric, val
    FROM daily
    UNPIVOT (val FOR metric IN (events, users, total_value))
    """,
)
def events_unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide daily metrics to (date, metric, value) rows —
    the long format dashboards and metric stores ingest.  Narrow Expand
    op, no shuffle beyond the upstream agg."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count(F.lit(1)).cast("double").alias("events"),
        F.countDistinct("user_id").cast("double").alias("users"),
        stable_round(F.sum("value"), 2).alias("total_value"),
    )
    return daily.unpivot(
        ["event_date"], ["events", "users", "total_value"], "metric", "val"
    )


@query(
    "user_event_type_sets",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
           CAST(COUNT(DISTINCT event_type) AS INTEGER) AS type_count
    FROM events
    GROUP BY user_id
    """,
)
def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregation: per-user sorted distinct event-type set
    (collect_set + array_sort for deterministic output), projected as a
    comma-joined string — the gate's pandas canonicalization cannot hash
    a raw array column (round-1 gate crash: "unhashable type: 'list'"),
    and the string form carries the identical information."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.countDistinct("event_type").cast("int").alias("type_count"),
    )


@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice + 1e-9, 2) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (SELECT AVG(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o.o_orderkey
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the engine's SQL entry path
    (``spark.sql`` over a registered view): orders 1.5x above their own
    customer's average.  Catalyst decorrelates to an aggregate + join —
    no per-row subquery execution."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               ROUND(o.o_totalprice + 1e-9, 2) AS o_totalprice
        FROM orders_v o
        WHERE o.o_totalprice > 1.5 * (SELECT AVG(o2.o_totalprice)
                                      FROM orders_v o2
                                      WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o.o_orderkey
        """
    )


@query(
    "purchase_window_clicks",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, ts AS w_start,
             ts + INTERVAL 1 HOUR AS w_end
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (SELECT ts AS click_ts, value AS click_value FROM events
          WHERE event_type = 'click')
    SELECT purchase_id, CAST(COUNT(click_ts) AS BIGINT) AS clicks_1h,
           ROUND(COALESCE(SUM(click_value), 0) + 1e-9, 4) AS click_value_1h
    FROM p LEFT JOIN c ON click_ts >= w_start AND click_ts < w_end
    GROUP BY purchase_id
    """,
)
def purchase_window_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/range_join.py): clicks falling in the hour
    after each purchase, per purchase.  The naive formulation is a
    nested-loop theta-join (the oracle runs exactly that); the engine
    buckets both sides on an hourly grid so Catalyst executes a hash
    equi-join on an 8-byte bucket id — the O(matches) plan that survives
    100 TB.  Purchases with no clicks are kept with zero counts."""
    from bigdata_covid19_real_time_spark.operators.range_join import (
        bucketed_interval_join,
    )

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    matched = bucketed_interval_join(
        clicks, purchases, "click_ts", "w_start", "w_end", bucket_seconds=3600
    )
    agg = matched.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("clicks_1h"),
        F.sum("click_value").alias("click_value_1h"),
    )
    return purchases.select("purchase_id").join(agg, "purchase_id", "left").select(
        "purchase_id",
        F.coalesce("clicks_1h", F.lit(0)).cast("long").alias("clicks_1h"),
        stable_round(F.coalesce("click_value_1h", F.lit(0.0)), 4).alias(
            "click_value_1h"
        ),
    )


@query(
    "purchase_attribution_join",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, c.click_id,
           strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.purchase_id,
           strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CAST(date_diff('microsecond', c.click_ts, p.purchase_ts)
                // 1000000 AS BIGINT) AS delay_sec
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
    """,
)
def purchase_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream interval join
    (streaming/joins.py:interval_join_streams — the reference pattern:
    identical transform, batch frame): every purchase a user makes
    within 30 minutes of a click is attributed to that click, emitting
    one (click, purchase) row per attribution with the delay.

    Scale: the transform is an equi-join on user_id with the time range
    as a residual predicate — one hash-partitioned shuffle per side,
    per-user row groups are small so the residual scan is bounded.  In
    streaming mode the same plan bounds its buffered state by
    watermark + max_delay per side; here Catalyst executes it as a
    plain shuffled join.  delay_sec is computed in exact integer
    microseconds then floor-divided, so both engines agree at second
    boundaries."""
    from bigdata_covid19_real_time_spark.streaming.joins import (
        interval_join_streams,
    )

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = interval_join_streams(
        clicks,
        purchases,
        key="user_id",
        left_time="click_ts",
        right_time="purchase_ts",
        max_delay="30 minutes",
        watermark="30 minutes",
    )
    return joined.select(
        "user_id",
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.expr(
            "timestampdiff(MICROSECOND, click_ts, purchase_ts) div 1000000"
        ).alias("delay_sec"),
    )


@query(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE c.c_nationkey = s.s_nationkey
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join where customer and supplier must share
    a nation (an equality BETWEEN two join branches, not a key lookup),
    region filter, date-range filter, per-nation revenue.

    Scale: the o_orderdate range and the region restriction (via the
    broadcast nation->region lookup on the supplier branch) are pushed
    to the scans; lineitem joins orders/supplier on their natural keys;
    the cross-branch ``c_nationkey = s_nationkey`` runs as a post-join
    filter on already-co-located rows — no extra shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("items"),
        )
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
                   / SUM(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 6
           ) AS promo_share_pct,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS total_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate over a fact->dim join —
    the share of revenue from PROMO parts in a ship-date window.

    Scale: part is the broadcast side (fits any executor at 100 TB
    corpus scale — |part| grows with SF but stays dim-sized relative to
    lineitem; if not, AQE falls back to shuffle-hash on p_partkey); the
    date range is pushed to the lineitem scan; the CASE folds into one
    partial aggregate — no second pass over the join.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .agg(
            stable_round(100.0 * F.sum(promo) / F.sum(rev), 6).alias(
                "promo_share_pct"
            ),
            stable_round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


@query(
    "disjunctive_brand_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1  AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of per-brand conjunctions spanning both
    join sides — the classic disjunctive-predicate pushdown test.

    Scale: Catalyst splits the disjunction into the part-only residue
    (brand/size, pushed below the join so the broadcast build side
    shrinks to the 3 brands) and the mixed l_quantity terms evaluated
    after the join; the lineitem scan stays a full range scan (the OR
    gives it no common conjunct), which is the correct plan, not a
    missed optimization.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (q >= 10)
            & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(1, 35)
            & (q >= 20)
            & (q <= 40)
        )
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("items"),
        )
    )


@query(
    "lineitem_corr_stats",
    # corr/covar_samp/stddev_samp/var_samp have identical definitions in
    # Spark and DuckDB (sample variants, Welford-style merge); rounding
    # absorbs float merge-order noise, the established policy for every
    # double aggregate in this registry.
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS items,
           ROUND(corr(l_quantity, l_extendedprice) + 1e-9, 6)        AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice) + 1e-9, 4)  AS qty_price_covar,
           ROUND(stddev_samp(l_extendedprice) + 1e-9, 4)             AS price_stddev,
           ROUND(var_samp(l_quantity) + 1e-9, 4)                     AS qty_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def lineitem_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments per return flag: correlation, sample
    covariance/variance/stddev — single-pass mergeable aggregates
    (partial Welford states combine associatively, so the 100 TB plan
    is one map-side-combined groupBy, same shape as a SUM)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("items"),
        stable_round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        stable_round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        stable_round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        stable_round(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


@query(
    "purchase_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS first_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT)                           AS users_total,
           CAST((SELECT COUNT(*) FROM v WHERE first_view IS NOT NULL) AS BIGINT) AS viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT)                           AS clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT)                           AS purchased_after_click
    """,
)
def purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel: users who viewed, then clicked strictly
    after their first view, then purchased strictly after that click.

    Scale: three conditional-min aggregations, each shuffling only
    (user_id, ts) pairs; the stage joins are user_id-keyed and reuse
    the same partitioning (no re-shuffle under AQE); final counts
    collapse to one row."""
    ev = load_table(spark, sf_dir, "events")
    # v/c persisted: each feeds BOTH the next stage's join and its own
    # final count branch, and sibling branches are never exchange-reused
    # — uncached, the per-stage fact re-scans compounded multiplicatively
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view")
    ).persist()
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
        .persist()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.agg(
            F.count(F.lit(1)).alias("users_total"),
            F.count("first_view").alias("viewed"),
        )
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )


@query(
    "big_quantity_orders",
    # TPC-H Q18 shape: HAVING-subquery feeding a 3-way join
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice + 1e-9, 2) AS o_totalprice,
           ROUND(b.sum_qty + 1e-9, 2) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def big_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the lineitem HAVING
    aggregate collapses to one row per qualifying order BEFORE joining
    orders/customer, so the expensive table is reduced first and the
    join input is ~1% of orders.  Catalyst turns the qualifying-key
    join into a broadcast under AQE at this selectivity."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            stable_round("o_totalprice", 2).alias("o_totalprice"),
            stable_round("sum_qty", 2).alias("sum_qty"),
        )
    )


@query(
    "idle_rich_customers",
    # TPC-H Q22 shape: scalar-subquery threshold + anti join + rollup
    oracle="""
    WITH threshold AS (
      SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal) + 1e-9, 2) AS totacctbal
    FROM customer, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
    GROUP BY 1
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-customer-counting): customers with
    above-average positive balance and no TOP-DECILE order (every
    customer here has *some* order, so the pristine "no orders at all"
    predicate selects nothing — the filtered NOT EXISTS keeps the
    anti-join shape with a non-trivial result), rolled up by market
    segment.  The scalar threshold is a broadcast 1-row frame (no
    driver-side collect); the anti join shuffles only the key column
    of the pre-filtered orders side."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_totalprice") > 450000.0).select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "user_trailing_week_avg",
    # true RANGE frame over integer day offsets: gap-aware (a user idle
    # for 5 days still averages over the calendar week, not the last 7
    # rows — the rows-frame twin user_moving_avg gets that wrong by
    # design)
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, SUM(value) AS daily_value
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, d, ROUND(daily_value + 1e-9, 2) AS daily_value,
           ROUND(AVG(daily_value) OVER (
             PARTITION BY user_id ORDER BY (d - DATE '1970-01-01')
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) + 1e-9, 2)
             AS trailing_week_avg
    FROM daily
    """,
)
def user_trailing_week_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-aware trailing average: per-user daily totals, then a
    RANGE window over integer day offsets (6 preceding + current = a
    7-day calendar window that handles gaps correctly).  One shuffle on
    user_id serves both the daily rollup and the window sort."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("user_id", F.to_date("ts").alias("d"), "value")
        .groupBy("user_id", "d")
        .agg(F.sum("value").alias("daily_value"))
    )
    day_no = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(day_no)
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "d",
        stable_round("daily_value", 2).alias("daily_value"),
        stable_round(F.avg("daily_value").over(w), 2).alias("trailing_week_avg"),
    )


@query(
    "click_and_purchase_user_days",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS event_date FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'purchase'
    ORDER BY user_id, event_date
    """,
)
def click_and_purchase_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (INTERSECT DISTINCT via ``intersect``): (user,
    day) pairs with BOTH a click and a purchase — completes the set-op
    family next to ``error_only_user_days``'s EXCEPT.  Spark plans a
    left-semi over distinct keys — one shuffle on the pair."""
    events = load_table(spark, sf_dir, "events")
    clk = events.filter(F.col("event_type") == "click").select(
        "user_id", F.to_date("ts").alias("event_date")
    )
    pur = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("event_date")
    )
    return clk.intersect(pur).orderBy("user_id", "event_date")


@query(
    "bloom_pruned_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
    FROM lineitem l
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey
        AND o.o_orderpriority = '1-URGENT'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1996-02-01 00:00:00')
    GROUP BY l_returnflag
    """,
)
def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter semi-join: revenue of lineitems belonging to
    urgent January-1996 orders (~0.2% of orders), with the fact scan
    pruned through a relational Bloom filter BEFORE the exact semi-join
    (operators/bloom.py).  The result is exactly the plain semi-join —
    the bloom stage only cuts the rows that reach it, which at 100 TB
    is the difference between shuffling the whole fact table and
    shuffling ~0.2% of it."""
    from bigdata_covid19_real_time_spark.operators.bloom import bloom_semi_join

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    kept = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("items"),
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@query(
    "lineitem_expectations",
    oracle="""
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS checked,
        CAST(COALESCE(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END), 0) AS BIGINT) AS v_discount_domain,
        CAST(COALESCE(SUM(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END), 0) AS BIGINT) AS v_price_positive,
        CAST(COALESCE(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END), 0) AS BIGINT) AS v_quantity_range,
        CAST(COALESCE(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END), 0) AS BIGINT) AS v_returnflag_domain,
        CAST(COALESCE(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END), 0) AS BIGINT) AS v_shipdate_not_null,
        CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS v_unique_line_key
      FROM lineitem
    )
    SELECT u.rule, u.violations, b.checked, u.violations = 0 AS passed
    FROM base b, (
      SELECT 'discount_domain' AS rule, v_discount_domain AS violations FROM base
      UNION ALL SELECT 'price_positive', v_price_positive FROM base
      UNION ALL SELECT 'quantity_range', v_quantity_range FROM base
      UNION ALL SELECT 'returnflag_domain', v_returnflag_domain FROM base
      UNION ALL SELECT 'shipdate_not_null', v_shipdate_not_null FROM base
      UNION ALL SELECT 'unique_line_key', v_unique_line_key FROM base
    ) u
    ORDER BY u.rule
    """,
)
def lineitem_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over the fact table: domain,
    range, null, and key-uniqueness checks evaluated in ONE scan
    (operators/constraints.py) — the ingest gate a 100 TB pipeline runs
    before publishing a snapshot."""
    from bigdata_covid19_real_time_spark.operators.constraints import (
        expectation_report,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return expectation_report(
        li,
        rules={
            "quantity_range": F.col("l_quantity").between(1, 50),
            "discount_domain": F.col("l_discount").between(0.0, 0.1),
            "price_positive": F.col("l_extendedprice") > 0,
            "shipdate_not_null": F.col("l_shipdate").isNotNull(),
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        },
        unique_keys={"unique_line_key": ["l_orderkey", "l_linenumber"]},
    )


@query(
    "orders_expectations",
    oracle="""
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS checked,
        CAST(COALESCE(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END), 0) AS BIGINT) AS v_totalprice_positive,
        CAST(COALESCE(SUM(CASE WHEN o_orderpriority IN
          ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
          THEN 0 ELSE 1 END), 0) AS BIGINT) AS v_priority_domain,
        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_unique_orderkey,
        CAST(COALESCE(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer)
          THEN 0 ELSE 1 END), 0) AS BIGINT) AS v_custkey_resolves
      FROM orders
    )
    SELECT u.rule, u.violations, b.checked, u.violations = 0 AS passed
    FROM base b, (
      SELECT 'custkey_resolves' AS rule, v_custkey_resolves AS violations FROM base
      UNION ALL SELECT 'priority_domain', v_priority_domain FROM base
      UNION ALL SELECT 'totalprice_positive', v_totalprice_positive FROM base
      UNION ALL SELECT 'unique_orderkey', v_unique_orderkey FROM base
    ) u
    ORDER BY u.rule
    """,
)
def orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders including the REFERENTIAL rule
    (every o_custkey resolves in customer — a broadcast anti-join,
    operators/constraints.py::referential_report) unioned with the
    one-scan predicate/uniqueness report."""
    from bigdata_covid19_real_time_spark.operators.constraints import (
        expectation_report,
        referential_report,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = expectation_report(
        orders,
        rules={
            "totalprice_positive": F.col("o_totalprice") > 0,
            "priority_domain": F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
        },
        unique_keys={"unique_orderkey": ["o_orderkey"]},
    )
    ref = referential_report(
        orders, F.broadcast(customer), "o_custkey", "c_custkey", "custkey_resolves"
    )
    return base.unionByName(ref).orderBy("rule")


@query(
    "events_user_daily_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS event_date, SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(event_date) AS mn, MAX(event_date) AS mx
      FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT b.user_id,
             CAST(b.mn + to_days(CAST(u.i AS INTEGER)) AS DATE) AS event_date
      FROM bounds b, unnest(range(0, CAST(b.mx - b.mn AS INTEGER) + 1)) AS u(i)
    ),
    joined AS (
      SELECT g.user_id, g.event_date, d.v
      FROM grid g LEFT JOIN daily d USING (user_id, event_date)
    ),
    islands AS (
      SELECT user_id, event_date, v,
             COUNT(v) OVER (PARTITION BY user_id ORDER BY event_date
                            ROWS UNBOUNDED PRECEDING) AS isl
      FROM joined
    )
    SELECT user_id, event_date,
           v IS NOT NULL AS observed,
           ROUND(COALESCE(v, 0) + 1e-9, 2) AS value_zero,
           ROUND(MAX(v) OVER (PARTITION BY user_id, isl) + 1e-9, 2) AS value_ffill
    FROM islands
    """,
)
def events_user_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample + gap-fill per user (operators/timeseries.py):
    every day between a user's first and last event exists exactly
    once, with zero-fill (flow semantics) and forward-fill (state
    semantics, gaps-and-islands) side by side — the regularization the
    reference's ROWS-frame forecaster silently assumes."""
    from bigdata_covid19_real_time_spark.operators.timeseries import daily_gapfill

    ev = load_table(spark, sf_dir, "events")
    out = daily_gapfill(ev, "user_id", "ts", "value")
    return out.select(
        "user_id",
        "event_date",
        "observed",
        stable_round("value_zero", 2).alias("value_zero"),
        stable_round("value_ffill", 2).alias("value_ffill"),
    )


#: Deterministic MERGE fixture over orders, shared by the merge and
#: diff queries: urgent-every-100th rows update (price *1.1, status U),
#: every-1000th rows are tombstones, every-97th rows insert under a
#: shifted key.  SQL twin inlined in both oracles.
def _orders_merge_frames(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    updates = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .withColumn("o_totalprice", stable_round(F.col("o_totalprice") * 1.1, 2))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    inserts = orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    source = updates.unionByName(inserts)
    return orders, source


_MERGE_SRC_SQL = """
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             ROUND(o_totalprice * 1.1 + 1e-9, 2) AS o_totalprice,
             o_orderdate, o_orderpriority,
             o_orderkey % 1000 = 0 AS del
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, FALSE
      FROM orders WHERE o_orderkey % 97 = 0
"""


@query(
    "orders_merge_preview",
    oracle=f"""
    WITH src AS ({_MERGE_SRC_SQL}),
    merged AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM src WHERE NOT del
      UNION ALL
      SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
      FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
      WHERE s.o_orderkey IS NULL
    )
    SELECT o_orderkey, o_orderstatus,
           ROUND(o_totalprice + 1e-9, 2) AS o_totalprice
    FROM merged
    """,
)
def orders_merge_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level MERGE (operators/merge.py::merge_into): updates replace,
    tombstones delete their match (and never insert), new keys insert,
    the rest carries over — one FULL OUTER join, publishable as the next
    snapshot for an atomic, time-travelable merge."""
    from bigdata_covid19_real_time_spark.operators.merge import merge_into

    orders, source = _orders_merge_frames(spark, sf_dir)
    merged = merge_into(
        orders, source, "o_orderkey",
        # scope the tombstone test to ORIGINAL keys: the insert branch's
        # shifted keys (+10M) can satisfy %1000 too, and a tombstone that
        # never matched must not suppress an insert it wasn't aimed at
        delete_when=(F.col("o_orderkey") % 1000 == 0)
        & (F.col("o_orderkey") < 10_000_000),
    )
    return merged.select(
        "o_orderkey", "o_orderstatus", stable_round("o_totalprice", 2).alias("o_totalprice")
    )


@query(
    "orders_snapshot_diff",
    oracle=f"""
    WITH src AS ({_MERGE_SRC_SQL}),
    new_t AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM src WHERE NOT del
      UNION ALL
      SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
      FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
      WHERE s.o_orderkey IS NULL
    ),
    old_t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           COALESCE(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
           ROUND(COALESCE(n.o_totalprice, o.o_totalprice) + 1e-9, 2) AS o_totalprice,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type
    FROM old_t o FULL OUTER JOIN new_t n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus != n.o_orderstatus
       OR o.o_totalprice != n.o_totalprice
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed by snapshot diff (operators/merge.py::
    snapshot_diff): the row-level insert/update/delete feed recovered
    from two immutable snapshots — CDC without write-time capture.
    The engine compares 8-byte xxhash64 digests; the oracle compares
    the values themselves (identical result barring 2^-64 collisions)."""
    from bigdata_covid19_real_time_spark.operators.merge import (
        merge_into,
        snapshot_diff,
    )

    orders, source = _orders_merge_frames(spark, sf_dir)
    old = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = merge_into(
        orders, source, "o_orderkey",
        delete_when=(F.col("o_orderkey") % 1000 == 0)
        & (F.col("o_orderkey") < 10_000_000),
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    out = snapshot_diff(old, new, "o_orderkey")
    return out.select(
        "o_orderkey",
        "o_orderstatus",
        stable_round("o_totalprice", 2).alias("o_totalprice"),
        "change_type",
    )


@query(
    "orders_profile",
    oracle="""
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_custkey,
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d_custkey,
        CAST(MIN(o_custkey) AS VARCHAR) AS mn_custkey,
        CAST(MAX(o_custkey) AS VARCHAR) AS mx_custkey,
        CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_prio,
        CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d_prio,
        MIN(o_orderpriority) AS mn_prio, MAX(o_orderpriority) AS mx_prio,
        CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_price,
        CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS d_price,
        CAST(MIN(o_totalprice) AS VARCHAR) AS mn_price,
        CAST(MAX(o_totalprice) AS VARCHAR) AS mx_price
      FROM orders
    )
    SELECT u.* FROM base b, (
      SELECT 'o_custkey' AS column, b.rows_ AS rows, n_custkey AS nulls,
             d_custkey AS "distinct", mn_custkey AS min_value, mx_custkey AS max_value FROM base
      UNION ALL SELECT 'o_orderpriority', rows_, n_prio, d_prio, mn_prio, mx_prio FROM base
      UNION ALL SELECT 'o_totalprice', rows_, n_price, d_price, mn_price, mx_price FROM base
    ) u
    ORDER BY u.column
    """,
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile (operators/constraints.py::
    profile_columns): rows / nulls / exact distinct / min / max per
    column — the discovery pass that feeds expectation thresholds."""
    from bigdata_covid19_real_time_spark.operators.constraints import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders, ["o_custkey", "o_orderpriority", "o_totalprice"])
