"""Growth-analytics batch: ordered funnel conversion, growth
accounting (new / retained / resurrected / churned), and log-log
price elasticity.

Three staples of a product/commerce analytics stack (SURVEY.md §2
extension brief: behavioral aggregation family), all collapsed-frame
shapes:

- ``events_funnel_conversion``: the ORDERED funnel signup -> view ->
  purchase — a user converts a step only with an event strictly after
  their previous step's first completion (unordered "did both" counts
  overstate conversion).  Three keyed per-user reductions, each joining
  the per-user step time back to the fact once; the output is one row
  per step.
- ``customer_growth_accounting``: the month-over-month user ledger —
  every active customer classified new (first month), retained (active
  last month too), or resurrected (returning after a gap), plus the
  month's churning-after count.  One distinct (customer, month)
  reduction, lag windows over the per-customer month sequence, then a
  per-month rollup.  Runs on orders (7 years of history) so every
  ledger branch is non-trivially exercised at gate SFs.
- ``brand_price_elasticity``: d ln(qty) / d ln(price) per brand via
  the closed-form OLS slope over mergeable moments (the
  ``group_ols_trend`` pattern) — no window, no per-row state, guarded
  for degenerate variance.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Ordered funnel steps (event_type values, in required order).
FUNNEL_STEPS = ("signup", "view", "purchase")
#: Step timeout: the next step must land within this many hours of the
#: previous step's first completion (an unbounded ordered funnel
#: saturates on any long-lived user base).
FUNNEL_TIMEOUT_H = 24


@query(
    "events_funnel_conversion",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' AND user_id IS NOT NULL
      GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL {FUNNEL_TIMEOUT_H} HOUR
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s2.t2 + INTERVAL {FUNNEL_TIMEOUT_H} HOUR
      GROUP BY 1
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT * FROM (
      SELECT 1 AS step, 'signup' AS event_type,
             CAST(n1 AS BIGINT) AS n_users,
             1.0 AS step_conversion,
             1.0 AS overall_conversion
      FROM counts
      UNION ALL
      SELECT 2, 'view', CAST(n2 AS BIGINT),
             ROUND(CASE WHEN n1 > 0 THEN n2 * 1.0 / n1 ELSE 0 END + 1e-9, 6),
             ROUND(CASE WHEN n1 > 0 THEN n2 * 1.0 / n1 ELSE 0 END + 1e-9, 6)
      FROM counts
      UNION ALL
      SELECT 3, 'purchase', CAST(n3 AS BIGINT),
             ROUND(CASE WHEN n2 > 0 THEN n3 * 1.0 / n2 ELSE 0 END + 1e-9, 6),
             ROUND(CASE WHEN n1 > 0 THEN n3 * 1.0 / n1 ELSE 0 END + 1e-9, 6)
      FROM counts
    )
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup -> view -> purchase with a 24 h step
    timeout: a user advances a step only with an event STRICTLY AFTER
    their first completion of the previous step and within
    FUNNEL_TIMEOUT_H hours of it (the unordered, unbounded "did both
    ever" variant saturates on any long-lived user base).  Each stage
    is one keyed per-user min plus one fact re-join against the
    (small) converted-user frame; the final output is three rows with
    step-over-step and overall conversion."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    timeout = F.expr(f"interval {FUNNEL_TIMEOUT_H} hours")
    # s1/s2 persisted: each feeds BOTH the next step's join and the
    # counts aggregate, and sibling branches are never exchange-reused —
    # uncached, the per-step fact re-scans compounded multiplicatively
    # (the counts frame alone re-ran the whole cascade)
    s1 = (
        events.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist()
    )
    s2 = (
        events.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + timeout))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist()
    )
    s3 = (
        events.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + timeout))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n3")))
    )
    guard = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num / den).otherwise(F.lit(0.0)) + F.lit(1e-9), 6
    )
    # single explode fan-out instead of a 3-branch union: a union of
    # three selects over `counts` re-executed the whole funnel cascade
    # once per output row (18 fact scans); exploding an array of structs
    # evaluates the 1-row counts frame exactly once
    step_structs = F.array(
        F.struct(
            F.lit(1).alias("step"),
            F.lit(FUNNEL_STEPS[0]).alias("event_type"),
            F.col("n1").cast("long").alias("n_users"),
            F.lit(1.0).alias("step_conversion"),
            F.lit(1.0).alias("overall_conversion"),
        ),
        F.struct(
            F.lit(2).alias("step"),
            F.lit(FUNNEL_STEPS[1]).alias("event_type"),
            F.col("n2").cast("long").alias("n_users"),
            guard(F.col("n2"), F.col("n1")).alias("step_conversion"),
            guard(F.col("n2"), F.col("n1")).alias("overall_conversion"),
        ),
        F.struct(
            F.lit(3).alias("step"),
            F.lit(FUNNEL_STEPS[2]).alias("event_type"),
            F.col("n3").cast("long").alias("n_users"),
            guard(F.col("n3"), F.col("n2")).alias("step_conversion"),
            guard(F.col("n3"), F.col("n1")).alias("overall_conversion"),
        ),
    )
    return (
        counts.select(F.explode(step_structs).alias("s")).select("s.*")
    )


@query(
    "customer_growth_accounting",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT o_custkey AS user_id,
             CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
               AS m
      FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ),
    seq AS (
      SELECT user_id, m,
             MIN(m) OVER (PARTITION BY user_id) AS first_m,
             LAG(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m,
             LEAD(m) OVER (PARTITION BY user_id ORDER BY m) AS next_m
      FROM activity
    ),
    tagged AS (
      SELECT m,
             CASE WHEN m = first_m THEN 1 ELSE 0 END AS is_new,
             CASE WHEN prev_m IS NOT NULL
                   AND (EXTRACT(year FROM m) - EXTRACT(year FROM prev_m)) * 12
                     + (EXTRACT(month FROM m) - EXTRACT(month FROM prev_m)) = 1
                  THEN 1 ELSE 0 END AS is_retained,
             CASE WHEN m != first_m AND (prev_m IS NULL
                   OR (EXTRACT(year FROM m) - EXTRACT(year FROM prev_m)) * 12
                     + (EXTRACT(month FROM m) - EXTRACT(month FROM prev_m)) > 1)
                  THEN 1 ELSE 0 END AS is_resurrected,
             CASE WHEN next_m IS NULL
                   OR (EXTRACT(year FROM next_m) - EXTRACT(year FROM m)) * 12
                     + (EXTRACT(month FROM next_m) - EXTRACT(month FROM m)) > 1
                  THEN 1 ELSE 0 END AS churns_after
      FROM seq
    )
    SELECT m AS month,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(is_new) AS BIGINT) AS n_new,
           CAST(SUM(is_retained) AS BIGINT) AS n_retained,
           CAST(SUM(is_resurrected) AS BIGINT) AS n_resurrected,
           CAST(SUM(churns_after) AS BIGINT) AS n_churning_after
    FROM tagged GROUP BY 1
    """,
)
def customer_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth accounting over order activity: every
    active (customer, month) tagged new (first month ever), retained
    (also active the previous calendar month), or resurrected (back
    after a >= 2-month gap), and churning-after (no activity next
    month) — the user ledger behind any DAU/MAU narrative
    (``events_wau_mau_stickiness`` is the ratio sibling; this
    decomposes the CHANGE; the orders fact spans ~7 years so every
    branch is live at gate SFs).  One distinct reduction to
    (customer, month), lag/lead windows over each customer's month
    sequence (exact integer month arithmetic, no date subtraction
    ambiguity), then a per-month rollup bounded by the calendar."""
    activity = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.trunc(F.to_date("o_orderdate"), "MM").alias("m"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("m")
    wu = Window.partitionBy("user_id")
    seq = activity.select(
        "m",
        F.min("m").over(wu).alias("first_m"),
        F.lag("m").over(w).alias("prev_m"),
        F.lead("m").over(w).alias("next_m"),
    )

    def month_gap(a, b):
        return (F.year(a) - F.year(b)) * 12 + (F.month(a) - F.month(b))

    tagged = seq.select(
        "m",
        F.when(F.col("m") == F.col("first_m"), 1).otherwise(0).alias("is_new"),
        F.when(
            F.col("prev_m").isNotNull()
            & (month_gap(F.col("m"), F.col("prev_m")) == 1),
            1,
        )
        .otherwise(0)
        .alias("is_retained"),
        F.when(
            (F.col("m") != F.col("first_m"))
            & (
                F.col("prev_m").isNull()
                | (month_gap(F.col("m"), F.col("prev_m")) > 1)
            ),
            1,
        )
        .otherwise(0)
        .alias("is_resurrected"),
        F.when(
            F.col("next_m").isNull()
            | (month_gap(F.col("next_m"), F.col("m")) > 1),
            1,
        )
        .otherwise(0)
        .alias("churns_after"),
    )
    return tagged.groupBy(F.col("m").alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum("is_new").cast("long").alias("n_new"),
        F.sum("is_retained").cast("long").alias("n_retained"),
        F.sum("is_resurrected").cast("long").alias("n_resurrected"),
        F.sum("churns_after").cast("long").alias("n_churning_after"),
    )


@query(
    "brand_price_elasticity",
    oracle="""
    WITH pts AS (
      SELECT p.p_brand AS brand,
             ln(l.l_quantity) AS y,
             ln(l.l_extendedprice / l.l_quantity) AS x
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ),
    mom AS (
      SELECT brand, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pts GROUP BY 1
    )
    SELECT brand, CAST(n AS BIGINT) AS n_items,
           CASE WHEN n * sxx - sx * sx > 1e-12 THEN
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) + 1e-9, 6)
           END AS elasticity,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 1e-12 THEN
             ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)) + 1e-9, 6)
           END AS r2
    FROM mom
    """,
)
def brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) from mergeable sum-moments (the
    ``group_ols_trend`` pattern — one shuffle, no window), with R² and
    NULL guards for degenerate variance.  Elasticity is THE pricing
    primitive; the closed form over (n, Sx, Sy, Sxx, Syy, Sxy) is
    exactly how it distributes at 100 TB."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    pts = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.col("p_brand").alias("brand"),
            F.log(F.col("l_quantity")).alias("y"),
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
        )
    )
    mom = pts.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return mom.select(
        "brand",
        F.col("n").cast("long").alias("n_items"),
        F.when(den_x > 1e-12, stable_round(num / den_x, 6)).alias(
            "elasticity"
        ),
        F.when(
            den_x * den_y > 1e-12,
            stable_round(num * num / (den_x * den_y), 6),
        ).alias("r2"),
    )
