"""COVID-pipeline operators, oracle-checked through the engine code paths.

The synthetic corpus has no COVID tables, so these queries first map the
``events`` table into the reference's 19-string-column wire shape
(deterministically, with sentinel/garbage injections at fixed keys), then
run the *actual engine operators* — ``clean_observations``,
``predict_future_trends``, ``detect_hotspots``, the aggregation suite —
on it.  Each oracle replicates the mapping + the reference formulas
(covid_streaming.py:63-193) in DuckDB SQL, so a hash match certifies the
engine's cleaning/forecast/rollup semantics end-to-end, not just a
hand-written translation.

Mapping rules (same arithmetic both engines, integers stringified so no
float->string formatting is involved):

- location   := user_id % 20 (a "country"), continent := event_type
- date/timestamp := ts formatted (second precision)
- total_cases := floor(value*1000)+1, with 'null' sentinel at
  event_id%23==0 and an uncastable 'garbage' at event_id%97==0
- new_cases := floor(value*100) ('' sentinel at event_id%31==0) —
  crosses the 10000 hotspot threshold
- total_deaths := floor(value) * (user_id % 80) — death_rate lands in
  0..~0.08, straddling the 0.05 hotspot threshold
- population := (user_id%20+1)*1e6, zeroed at user_id%11==0 to exercise
  division guards
- is_hotspot := 'true'@13 / 'garbage'@17 / 'false'
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.functions.cleaning import clean_observations
from bigdata_covid19_real_time_spark.operators.aggregate import (
    continent_window_stats,
    country_rankings,
    dashboard_summary,
    top_affected_countries,
    windowed_location_stats,
)
from bigdata_covid19_real_time_spark.operators.dedup import dedup_latest
from bigdata_covid19_real_time_spark.operators.hotspot import detect_hotspots
from bigdata_covid19_real_time_spark.operators.predict import predict_future_trends
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

_MAPPING_EXPRS = [
    "CAST(event_id AS STRING) AS uuid",
    "event_type AS continent",
    "CAST(user_id % 20 AS STRING) AS location",
    "concat('C', CAST(user_id % 20 AS STRING)) AS iso_code",
    "date_format(ts, 'yyyy-MM-dd') AS date",
    "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS timestamp",
    "CASE WHEN event_id % 23 = 0 THEN 'null' WHEN event_id % 97 = 0 THEN 'garbage' "
    "ELSE CAST(CAST(floor(value * 1000) + 1 AS BIGINT) AS STRING) END AS total_cases",
    "CASE WHEN event_id % 31 = 0 THEN '' "
    "ELSE CAST(CAST(floor(value * 100) AS BIGINT) AS STRING) END AS new_cases",
    "CAST(CAST(floor(value) * (user_id % 80) AS BIGINT) AS STRING) AS total_deaths",
    "CAST(CAST(floor(value / 20) AS BIGINT) AS STRING) AS new_deaths",
    "CAST(CAST(floor(value * 200) AS BIGINT) AS STRING) AS active_cases",
    "CASE WHEN user_id % 11 = 0 THEN '0' "
    "ELSE CAST((user_id % 20 + 1) * 1000000 AS STRING) END AS population",
    "'' AS recovery_rate",
    "'' AS death_rate",
    "'' AS cases_per_million",
    "'' AS deaths_per_million",
    "'' AS new_cases_ratio",
    "'' AS cases_to_population_ratio",
    "CASE WHEN event_id % 13 = 0 THEN 'true' WHEN event_id % 17 = 0 THEN 'garbage' "
    "ELSE 'false' END AS is_hotspot",
]

#: DuckDB twin of _MAPPING_EXPRS + the cleaning stage (C1-C10).  Every
#: covid oracle starts from this CTE chain.
ORACLE_CLEANED_CTE = """
WITH raw AS (
  SELECT CAST(event_id AS VARCHAR) AS uuid,
         event_type AS continent,
         CAST(user_id % 20 AS VARCHAR) AS location,
         concat('C', CAST(user_id % 20 AS VARCHAR)) AS iso_code,
         strftime(ts, '%Y-%m-%d') AS obs_date_s,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS obs_ts_s,
         CASE WHEN event_id % 23 = 0 THEN 'null' WHEN event_id % 97 = 0 THEN 'garbage'
              ELSE CAST(CAST(floor(value * 1000) + 1 AS BIGINT) AS VARCHAR) END AS total_cases,
         CASE WHEN event_id % 31 = 0 THEN ''
              ELSE CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) END AS new_cases,
         CAST(CAST(floor(value) * (user_id % 80) AS BIGINT) AS VARCHAR) AS total_deaths,
         CAST(CAST(floor(value / 20) AS BIGINT) AS VARCHAR) AS new_deaths,
         CAST(CAST(floor(value * 200) AS BIGINT) AS VARCHAR) AS active_cases,
         CASE WHEN user_id % 11 = 0 THEN '0'
              ELSE CAST((user_id % 20 + 1) * 1000000 AS VARCHAR) END AS population,
         CASE WHEN event_id % 13 = 0 THEN 'true' WHEN event_id % 17 = 0 THEN 'garbage'
              ELSE 'false' END AS is_hotspot
  FROM events
), num AS (
  SELECT uuid, continent, location, iso_code,
         TRY_CAST(obs_date_s AS DATE) AS obs_date,
         TRY_CAST(obs_ts_s AS TIMESTAMP) AS obs_ts,
         CASE WHEN trim(total_cases) IN ('', 'null', 'NULL') THEN 0.0
              ELSE TRY_CAST(trim(total_cases) AS DOUBLE) END AS total_cases,
         CASE WHEN trim(new_cases) IN ('', 'null', 'NULL') THEN 0.0
              ELSE TRY_CAST(trim(new_cases) AS DOUBLE) END AS new_cases,
         CASE WHEN trim(total_deaths) IN ('', 'null', 'NULL') THEN 0.0
              ELSE TRY_CAST(trim(total_deaths) AS DOUBLE) END AS total_deaths,
         CASE WHEN trim(new_deaths) IN ('', 'null', 'NULL') THEN 0.0
              ELSE TRY_CAST(trim(new_deaths) AS DOUBLE) END AS new_deaths,
         CASE WHEN trim(active_cases) IN ('', 'null', 'NULL') THEN 0.0
              ELSE TRY_CAST(trim(active_cases) AS DOUBLE) END AS active_cases,
         CASE WHEN trim(population) IN ('', 'null', 'NULL') THEN 0.0
              ELSE TRY_CAST(trim(population) AS DOUBLE) END AS population,
         TRY_CAST(is_hotspot AS BOOLEAN) AS is_hotspot
  FROM raw
), cleaned AS (
  SELECT *,
         -- + 1e-9 mirrors the engine cleaning stage's epsilon-stable
         -- rounding (functions/cleaning.py, schema.ROUND_EPS)
         CASE WHEN total_cases > 0 THEN ROUND(total_deaths / total_cases + 1e-9, 6) ELSE 0.0 END AS death_rate,
         CASE WHEN population > 0 THEN ROUND(total_cases / population * 1000000 + 1e-9, 2) ELSE 0.0 END AS cases_per_million,
         CASE WHEN population > 0 THEN ROUND(total_deaths / population * 1000000 + 1e-9, 2) ELSE 0.0 END AS deaths_per_million,
         CASE WHEN total_cases > 0 THEN ROUND(new_cases / total_cases + 1e-9, 6) ELSE 0.0 END AS new_cases_ratio,
         CASE WHEN population > 0 THEN ROUND(total_cases / population + 1e-9, 6) ELSE 0.0 END AS cases_to_population_ratio,
         CASE WHEN total_cases > 0 THEN ROUND((total_cases - active_cases - total_deaths) / total_cases + 1e-9, 6) ELSE 0.0 END AS recovery_rate
  FROM num
)
"""


def mapped_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> the reference's 19-string-column RAW shape."""
    return load_table(spark, sf_dir, "events").selectExpr(*_MAPPING_EXPRS)


def cleaned_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mapped raw rows through the engine's actual cleaning stage."""
    return clean_observations(mapped_raw(spark, sf_dir))


@query(
    "covid_clean",
    oracle=ORACLE_CLEANED_CTE
    + """
    SELECT uuid, location, continent, iso_code,
           obs_date AS date,
           strftime(obs_ts, '%Y-%m-%d %H:%M:%S') AS ts,
           total_cases, new_cases, total_deaths, new_deaths, active_cases,
           population, death_rate, cases_per_million, deaths_per_million,
           new_cases_ratio, cases_to_population_ratio, recovery_rate, is_hotspot
    FROM cleaned
    """,
)
def covid_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C10: sentinel normalization, guarded rates, typing — the whole
    cleaning stage, row for row.  Narrow map stage, no shuffle."""
    df = cleaned_frame(spark, sf_dir)
    return df.select(
        "uuid",
        "location",
        "continent",
        "iso_code",
        "date",
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "total_cases",
        "new_cases",
        "total_deaths",
        "new_deaths",
        "active_cases",
        "population",
        "death_rate",
        "cases_per_million",
        "deaths_per_million",
        "new_cases_ratio",
        "cases_to_population_ratio",
        "recovery_rate",
        "is_hotspot",
    )


@query(
    "covid_predict",
    oracle=ORACLE_CLEANED_CTE
    + """
    , dd AS (
      SELECT * FROM cleaned
      QUALIFY row_number() OVER (PARTITION BY location, obs_date
                                 ORDER BY obs_ts DESC, uuid DESC) = 1
    ), g1 AS (
      SELECT location, obs_date, total_cases, new_cases, new_deaths,
             AVG(new_cases)  OVER w7  AS avg_new_cases_7d,
             AVG(new_cases)  OVER w14 AS avg_new_cases_14d,
             AVG(new_deaths) OVER w7  AS avg_new_deaths_7d,
             lag(total_cases, 1) OVER wl AS prev_tc
      FROM dd
      WINDOW wl  AS (PARTITION BY location ORDER BY obs_date),
             w7  AS (PARTITION BY location ORDER BY obs_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
             w14 AS (PARTITION BY location ORDER BY obs_date ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ), g2 AS (
      SELECT *,
             CASE WHEN prev_tc > 0 THEN (total_cases - prev_tc) / prev_tc ELSE 0.0 END AS daily_growth_rate
      FROM g1
    ), g3 AS (
      SELECT *,
             AVG(daily_growth_rate) OVER (PARTITION BY location ORDER BY obs_date
                                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS avg_growth_rate_7d
      FROM g2
    )
    SELECT location, obs_date AS date, obs_date + 1 AS prediction_date,
           ROUND(avg_new_cases_7d + 1e-9, 4)  AS avg_new_cases_7d,
           ROUND(avg_new_cases_14d + 1e-9, 4) AS avg_new_cases_14d,
           ROUND(avg_new_deaths_7d + 1e-9, 4) AS avg_new_deaths_7d,
           ROUND(daily_growth_rate + 1e-9, 6) AS daily_growth_rate,
           ROUND(avg_growth_rate_7d + 1e-9, 6) AS avg_growth_rate_7d,
           ROUND(avg_new_cases_7d * (1 + avg_growth_rate_7d) + 1e-9, 2)  AS predicted_new_cases_next_day,
           ROUND(total_cases + avg_new_cases_7d * (1 + avg_growth_rate_7d) + 1e-9, 2) AS predicted_total_cases_next_day,
           ROUND(avg_new_deaths_7d * (1 + avg_growth_rate_7d) + 1e-9, 2) AS predicted_new_deaths_next_day,
           CASE WHEN avg_new_cases_7d > avg_new_cases_14d THEN 'Increasing'
                WHEN avg_new_cases_7d < avg_new_cases_14d THEN 'Decreasing'
                ELSE 'Stable' END AS trend_direction,
           CASE WHEN abs(avg_growth_rate_7d) < 0.05 THEN 'High'
                WHEN abs(avg_growth_rate_7d) < 0.15 THEN 'Medium'
                ELSE 'Low' END AS prediction_confidence
    FROM g3
    WHERE avg_new_cases_7d * (1 + avg_growth_rate_7d) IS NOT NULL
    """,
)
def covid_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-W7: the full forecaster over deterministically-deduped
    observations (keep-latest per (location, date)).  One shuffle on
    location serves dedup + all window specs."""
    df = cleaned_frame(spark, sf_dir)
    deduped = dedup_latest(
        df, ["location", "date"], [F.desc("timestamp"), F.desc("uuid")]
    )
    preds = predict_future_trends(deduped)
    return preds.select(
        "location",
        "date",
        "prediction_date",
        stable_round("avg_new_cases_7d", 4).alias("avg_new_cases_7d"),
        stable_round("avg_new_cases_14d", 4).alias("avg_new_cases_14d"),
        stable_round("avg_new_deaths_7d", 4).alias("avg_new_deaths_7d"),
        stable_round("daily_growth_rate", 6).alias("daily_growth_rate"),
        stable_round("avg_growth_rate_7d", 6).alias("avg_growth_rate_7d"),
        stable_round("predicted_new_cases_next_day", 2).alias("predicted_new_cases_next_day"),
        stable_round("predicted_total_cases_next_day", 2).alias("predicted_total_cases_next_day"),
        stable_round("predicted_new_deaths_next_day", 2).alias("predicted_new_deaths_next_day"),
        "trend_direction",
        "prediction_confidence",
    )


@query(
    "covid_continent_5min",
    oracle=ORACLE_CLEANED_CTE
    + """
    SELECT strftime(time_bucket(INTERVAL '5 minutes', obs_ts), '%Y-%m-%d %H:%M:%S') AS continent_window_start,
           strftime(time_bucket(INTERVAL '5 minutes', obs_ts) + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS continent_window_end,
           continent,
           SUM(new_cases)            AS continent_new_cases,
           SUM(new_deaths)           AS continent_new_deaths,
           ROUND(AVG(death_rate) + 1e-9, 6) AS continent_avg_death_rate,
           COUNT(DISTINCT location)  AS countries_count,
           SUM(total_cases)          AS continent_total_cases
    FROM cleaned
    GROUP BY 1, 2, 3
    """,
)
def covid_continent_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the tumbling continent rollup through the engine operator
    (parity mode — no watermark on a batch frame)."""
    out = continent_window_stats(cleaned_frame(spark, sf_dir))
    return out.select(
        F.date_format("continent_window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "continent_window_start"
        ),
        F.date_format("continent_window_end", "yyyy-MM-dd HH:mm:ss").alias(
            "continent_window_end"
        ),
        "continent",
        "continent_new_cases",
        "continent_new_deaths",
        stable_round("continent_avg_death_rate", 6).alias("continent_avg_death_rate"),
        "countries_count",
        "continent_total_cases",
    )


@query(
    "covid_windowed_stats",
    oracle=ORACLE_CLEANED_CTE
    + """
    SELECT strftime(time_bucket(INTERVAL '5 minutes', obs_ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(time_bucket(INTERVAL '5 minutes', obs_ts) + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
           location, iso_code,
           SUM(new_cases)            AS total_new_cases_window,
           SUM(new_deaths)           AS total_new_deaths_window,
           ROUND(AVG(death_rate) + 1e-9, 6) AS avg_death_rate_window,
           MAX(total_cases)          AS max_total_cases,
           max_by(active_cases, CAST(uuid AS BIGINT)) AS latest_active_cases
    FROM cleaned
    GROUP BY 1, 2, 3, 4
    """,
)
def covid_windowed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: per-location windowed stats (the declared-but-never-populated
    windowed_covid_stats table, init.sql:42-54), with a deterministic
    "latest" pick keyed on the monotone event id."""
    df = cleaned_frame(spark, sf_dir)
    out = windowed_location_stats(df, latest_by=F.col("uuid").cast("bigint"))
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "location",
        "iso_code",
        "total_new_cases_window",
        "total_new_deaths_window",
        stable_round("avg_death_rate_window", 6).alias("avg_death_rate_window"),
        "max_total_cases",
        "latest_active_cases",
    )


@query(
    "covid_hotspots",
    oracle=ORACLE_CLEANED_CTE
    + """
    SELECT location, iso_code, total_cases, new_cases, death_rate, active_cases,
           strftime(obs_ts, '%Y-%m-%d %H:%M:%S') AS ts
    FROM cleaned
    WHERE new_cases > 10000 OR death_rate > 0.05 OR is_hotspot = true
    QUALIFY row_number() OVER (PARTITION BY location, CAST(obs_ts AS DATE)
                               ORDER BY obs_ts DESC, total_cases DESC, active_cases DESC) = 1
    """,
)
def covid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+C11+D4: compound hotspot predicate, detected-date dedup
    (deterministic keep-latest variant), 8-column projection."""
    out = detect_hotspots(cleaned_frame(spark, sf_dir), deterministic=True)
    return out.select(
        "location",
        "iso_code",
        "total_cases",
        "new_cases",
        "death_rate",
        "active_cases",
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )


@query(
    "covid_dashboard",
    oracle=ORACLE_CLEANED_CTE
    + """
    SELECT CAST(obs_ts AS DATE)     AS report_date,
           COUNT(DISTINCT location) AS countries_count,
           SUM(total_cases)         AS global_total_cases,
           SUM(new_cases)           AS global_new_cases,
           SUM(total_deaths)        AS global_total_deaths,
           SUM(new_deaths)          AS global_new_deaths,
           ROUND(AVG(death_rate) + 1e-9, 6) AS global_avg_death_rate,
           COUNT(CASE WHEN is_hotspot = true THEN 1 END) AS hotspot_count
    FROM cleaned
    GROUP BY 1
    """,
)
def covid_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the covid_dashboard_summary view (init.sql:92-103) re-homed as
    an engine query."""
    out = dashboard_summary(cleaned_frame(spark, sf_dir))
    return out.select(
        "report_date",
        "countries_count",
        "global_total_cases",
        "global_new_cases",
        "global_total_deaths",
        "global_new_deaths",
        stable_round("global_avg_death_rate", 6).alias("global_avg_death_rate"),
        "hotspot_count",
    )


@query(
    "covid_top_affected",
    oracle=ORACLE_CLEANED_CTE
    + """
    SELECT location, iso_code, MAX(total_cases) AS total_cases
    FROM cleaned
    GROUP BY location, iso_code
    ORDER BY total_cases DESC, location ASC
    LIMIT 10
    """,
)
def covid_top_affected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+D5: the top_10_affected_countries view (init.sql:105-110) with a
    deterministic tie-break."""
    return top_affected_countries(cleaned_frame(spark, sf_dir), k=10)


@query(
    "covid_rankings",
    oracle=ORACLE_CLEANED_CTE
    + """
    SELECT location, iso_code,
           MAX(total_cases)          AS max_cases_country,
           SUM(new_cases)            AS total_new_cases_country,
           ROUND(AVG(death_rate) + 1e-9, 6) AS avg_death_rate_country,
           CAST(ROW_NUMBER() OVER (ORDER BY MAX(total_cases) DESC, location ASC) AS INTEGER) AS ranking_position
    FROM cleaned
    GROUP BY location, iso_code
    """,
)
def covid_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+W8: country_rankings (init.sql:81-90) through the engine
    operator — agg then global row_number on the collapsed frame."""
    out = country_rankings(cleaned_frame(spark, sf_dir))
    return out.select(
        "location",
        "iso_code",
        "max_cases_country",
        "total_new_cases_country",
        stable_round("avg_death_rate_country", 6).alias("avg_death_rate_country"),
        "ranking_position",
    )


@query(
    "covid_enrich",
    oracle=ORACLE_CLEANED_CTE
    + """
    SELECT uuid, location,
           CASE WHEN total_cases > 0 THEN ROUND(total_deaths / total_cases + 1e-9, 6) ELSE 0.0 END AS fatality_rate,
           CASE WHEN total_cases > 0 THEN ROUND(active_cases / total_cases + 1e-9, 6) ELSE 0.0 END AS active_cases_ratio,
           CASE WHEN total_cases > 0 THEN ROUND((total_cases - active_cases - total_deaths) / total_cases + 1e-9, 6) ELSE 0.0 END AS recovery_rate_calculated,
           CASE WHEN (total_cases - new_cases) > 0 THEN ROUND(new_cases / (total_cases - new_cases) + 1e-9, 6) ELSE 0.0 END AS growth_rate,
           CASE WHEN new_cases > 50000 OR death_rate > 0.10 THEN 'Critical'
                WHEN new_cases > 10000 OR death_rate > 0.05 THEN 'High'
                WHEN new_cases > 1000  OR death_rate > 0.02 THEN 'Medium'
                ELSE 'Low' END AS severity_level
    FROM cleaned
    """,
)
def covid_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NiFi-contract enrichment stage (functions/enrich.py): the five
    orphan DDL columns of init.sql:30-34 with recovered semantics —
    fatality/active/recovered ratios, day-over-day growth, severity
    bucketing.  Narrow map, no shuffle."""
    from bigdata_covid19_real_time_spark.functions.enrich import enrich_observations

    out = enrich_observations(cleaned_frame(spark, sf_dir))
    return out.select(
        "uuid",
        "location",
        stable_round("fatality_rate", 6).alias("fatality_rate"),
        stable_round("active_cases_ratio", 6).alias("active_cases_ratio"),
        stable_round("recovery_rate_calculated", 6).alias("recovery_rate_calculated"),
        stable_round("growth_rate", 6).alias("growth_rate"),
        "severity_level",
    )
