"""Temporal-analytics queries: per-group closed-form OLS trend
(operators/trend.py) and day-of-week seasonality indices.

``covid_trend_ols`` is the statistical upgrade to the reference's
moving-average forecaster (covid_streaming.py:118-160): instead of a
per-location sorted window pipeline it fits a least-squares line per
location in ONE mergeable-moments aggregation pass — no sort, no
window, constant-width shuffle state per group — and forecasts 7 days
past each location's last observation.

Imported last by plans/__init__ so pre-existing registration positions
(and bench.py's frozen order) are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.dedup import dedup_latest
from bigdata_covid19_real_time_spark.operators.trend import (
    group_ols_trend,
    ols_forecast,
)
from bigdata_covid19_real_time_spark.plans.covid_parity import (
    ORACLE_CLEANED_CTE,
    cleaned_frame,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "covid_trend_ols",
    # full SQL replication: same keep-latest dedup as covid_predict,
    # then the closed-form population-moment OLS formulas — DuckDB's
    # var_pop/covar_pop match Spark's definitions exactly
    oracle=ORACLE_CLEANED_CTE
    + """
    , dd AS (
      SELECT * FROM cleaned
      QUALIFY row_number() OVER (PARTITION BY location, obs_date
                                 ORDER BY obs_ts DESC, uuid DESC) = 1
    ), pts AS (
      SELECT location,
             CAST(obs_date - DATE '1970-01-01' AS DOUBLE) AS x,
             CAST(new_cases AS DOUBLE) AS y
      FROM dd
      WHERE obs_date IS NOT NULL AND new_cases IS NOT NULL
    ), fit AS (
      SELECT location,
             COUNT(*) AS n_obs, MAX(x) AS x_max,
             AVG(x) AS mx, AVG(y) AS my,
             var_pop(x) AS vx, var_pop(y) AS vy,
             covar_pop(x, y) AS cxy
      FROM pts GROUP BY location
    ), line AS (
      SELECT location, n_obs, x_max,
             CASE WHEN vx > 0 THEN cxy / vx END AS slope_raw,
             CASE WHEN vx > 0 THEN my - (cxy / vx) * mx END AS icpt_raw,
             CASE WHEN vx > 0 AND vy > 0 THEN cxy * cxy / (vx * vy) END AS r2_raw
      FROM fit
    )
    SELECT location, CAST(n_obs AS BIGINT) AS n_obs,
           ROUND(slope_raw + 1e-9, 6) AS slope,
           ROUND(icpt_raw + 1e-9, 4) AS intercept,
           ROUND(r2_raw + 1e-9, 6) AS r2,
           ROUND(icpt_raw + slope_raw * (x_max + 7) + 1e-9, 2)
             AS forecast_new_cases_7d,
           CASE WHEN slope_raw IS NULL THEN 'Insufficient'
                WHEN ROUND(slope_raw + 1e-9, 6) > 0 THEN 'Increasing'
                WHEN ROUND(slope_raw + 1e-9, 6) < 0 THEN 'Decreasing'
                ELSE 'Stable' END AS trend_direction
    FROM line
    """,
)
def covid_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-location least-squares case trend + 7-day-ahead forecast
    (operators/trend.py:group_ols_trend — one partial-aggregate pass
    over the deduped daily observations; the scalable counterpart to
    the reference's windowed moving-average forecaster)."""
    df = cleaned_frame(spark, sf_dir)
    deduped = dedup_latest(
        df, ["location", "date"], [F.desc("timestamp"), F.desc("uuid")]
    )
    pts = deduped.filter(
        F.col("date").isNotNull() & F.col("new_cases").isNotNull()
    ).select(
        "location",
        F.datediff(F.col("date"), F.lit("1970-01-01").cast("date")).alias("__x"),
        F.col("new_cases").alias("__y"),
    )
    fit = group_ols_trend(pts, ["location"], "__x", "__y")
    slope_r = stable_round("slope", 6)
    return fit.select(
        "location",
        F.col("n_obs").cast("long").alias("n_obs"),
        slope_r.alias("slope"),
        stable_round("intercept", 4).alias("intercept"),
        stable_round("r2", 6).alias("r2"),
        stable_round(
            ols_forecast(F.col("slope"), F.col("intercept"), F.col("x_max") + 7), 2
        ).alias("forecast_new_cases_7d"),
        F.when(F.col("slope").isNull(), F.lit("Insufficient"))
        .when(slope_r > 0, F.lit("Increasing"))
        .when(slope_r < 0, F.lit("Decreasing"))
        .otherwise(F.lit("Stable"))
        .alias("trend_direction"),
    )


@query(
    "events_dow_seasonality",
    # dow parity: Spark dayofweek() is 1=Sunday..7, DuckDB's
    # date_part('dow') is 0=Sunday..6 — the Spark side subtracts 1
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow,
             value AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), per AS (
      SELECT event_type, dow, COUNT(*) AS n_events,
             SUM(v) AS sv
      FROM g GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, SUM(sv) AS tv, SUM(n_events) AS tn
      FROM per GROUP BY 1
    )
    SELECT p.event_type, p.dow, CAST(p.n_events AS BIGINT) AS n_events,
           ROUND(p.sv / p.n_events + 1e-9, 6) AS avg_value,
           ROUND(CASE WHEN t.tv / t.tn <> 0
                      THEN (p.sv / p.n_events) / (t.tv / t.tn) END + 1e-9, 6)
             AS seasonal_index
    FROM per p JOIN tot t USING (event_type)
    """,
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices per event type: each weekday's mean
    value relative to the type's overall mean.  The per-type totals
    derive from the 7-row-per-type pre-aggregate (no second scan) and
    broadcast back — two partial-agg passes over tiny state."""
    g = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.col("value").alias("v"),
        )
    )
    per = g.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("v").alias("sv")
    )
    tot = per.groupBy("event_type").agg(
        F.sum("sv").alias("tv"), F.sum("n_events").alias("tn")
    )
    ratio = (F.col("sv") / F.col("n_events")) / (F.col("tv") / F.col("tn"))
    return per.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        F.col("n_events").cast("long").alias("n_events"),
        stable_round(F.col("sv") / F.col("n_events"), 6).alias("avg_value"),
        stable_round(
            F.when(F.col("tv") / F.col("tn") != 0, ratio), 6
        ).alias("seasonal_index"),
    )


@query(
    "events_embargo_split",
    # cutoff = max event date - 7 (test window), embargo = the 2 days
    # before the cutoff, excluded from train so trailing-window
    # features computed on train rows cannot overlap the test period
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_d FROM events
                WHERE ts IS NOT NULL),
    assigned AS (
      SELECT CASE
               WHEN CAST(ts AS DATE) >= max_d - 7 THEN 'test'
               WHEN CAST(ts AS DATE) >= max_d - 9 THEN 'embargo'
               ELSE 'train'
             END AS split,
             user_id, CAST(ts AS DATE) AS d
      FROM events CROSS JOIN mx WHERE ts IS NOT NULL
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(d) AS VARCHAR) AS first_date,
           CAST(MAX(d) AS VARCHAR) AS last_date
    FROM assigned GROUP BY 1
    """,
)
def events_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged temporal train/test split: the last 8 calendar days are
    test (``d >= max_d - 7`` is inclusive on both ends), the 2 days
    before them are an EMBARGO (excluded from train) so trailing-window
    features on train rows cannot leak test-period signal — the time-series counterpart of the cluster-atomic
    docs_leakage_free_split.  One broadcast 1-row max-date join, one
    narrow CASE assignment, one partial-agg summary."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    mx = F.broadcast(
        events.agg(F.max(F.to_date("ts")).alias("max_d"))
    )
    d = F.to_date("ts")
    assigned = events.crossJoin(mx).select(
        F.when(d >= F.date_sub(F.col("max_d"), 7), F.lit("test"))
        .when(d >= F.date_sub(F.col("max_d"), 9), F.lit("embargo"))
        .otherwise(F.lit("train"))
        .alias("split"),
        "user_id",
        d.alias("d"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min("d").cast("string").alias("first_date"),
        F.max("d").cast("string").alias("last_date"),
    )
