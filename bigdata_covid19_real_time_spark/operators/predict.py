"""Per-location trend model / next-day forecaster.

Semantics match ``predict_future_trends`` at
/root/reference/spark/covid_streaming.py:63-109 (W1-W7 in SURVEY.md §2.6):

- trailing moving averages over **row** frames (-6..0 and -13..0) per
  location ordered by date — the reference labels these "7d"/"14d" but the
  frame is rows, and when called per micro-batch it only sees that batch's
  rows.  This function is pure, so the caller chooses the scope: per-batch
  (parity) or over an accumulated silver table (the corrected semantics);
- ``lag(total_cases, 1)`` growth rate with a ``lag > 0`` guard — a NULL
  lag (first row per location) fails the guard and yields 0.0;
- next-day forecasts, trend classification (7d vs 14d average), and
  confidence bucketing on ``abs(avg_growth_rate_7d)``;
- rows whose ``predicted_new_cases_next_day`` is NULL are dropped
  (covid_streaming.py:104).

Scale note: one shuffle, partitioned by ``location`` (~200 distinct in the
COVID domain; at 100 TB with high-cardinality keys the same spec holds —
window functions shuffle once on the partition key and sort within).  All
expressions are built-in => whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PREDICTION_COLUMNS = [
    "location",
    "iso_code",
    "continent",
    "date",
    "total_cases",
    "new_cases",
    "total_deaths",
    "new_deaths",
    "avg_new_cases_7d",
    "avg_new_cases_14d",
    "avg_new_deaths_7d",
    "daily_growth_rate",
    "avg_growth_rate_7d",
    "predicted_new_cases_next_day",
    "predicted_total_cases_next_day",
    "predicted_new_deaths_next_day",
    "trend_direction",
    "prediction_confidence",
    "prediction_date",
    "predicted_at",
]


def predict_future_trends(df: DataFrame, clock: Column | None = None) -> DataFrame:
    """Forecast next-day cases/deaths per location from a cleaned frame.

    Expects cleaned columns (typed ``date``, double numerics).  ``clock``
    freezes the ``predicted_at`` audit column for tests.
    """
    clock = clock if clock is not None else F.current_timestamp()

    by_loc = Window.partitionBy("location").orderBy("date")
    trailing7 = by_loc.rowsBetween(-6, 0)
    trailing14 = by_loc.rowsBetween(-13, 0)

    prev_total = F.lag("total_cases", 1).over(by_loc)
    growth = F.when(
        prev_total > 0, (F.col("total_cases") - prev_total) / prev_total
    ).otherwise(F.lit(0.0))

    df = df.withColumns(
        {
            "avg_new_cases_7d": F.avg("new_cases").over(trailing7),
            "avg_new_cases_14d": F.avg("new_cases").over(trailing14),
            "avg_new_deaths_7d": F.avg("new_deaths").over(trailing7),
            "daily_growth_rate": growth,
        }
    ).withColumn("avg_growth_rate_7d", F.avg("daily_growth_rate").over(trailing7))

    growth_factor = 1 + F.col("avg_growth_rate_7d")
    df = df.withColumns(
        {
            "predicted_new_cases_next_day": F.col("avg_new_cases_7d") * growth_factor,
            "predicted_new_deaths_next_day": F.col("avg_new_deaths_7d") * growth_factor,
        }
    ).withColumn(
        "predicted_total_cases_next_day",
        F.col("total_cases") + F.col("predicted_new_cases_next_day"),
    )

    df = df.withColumns(
        {
            "trend_direction": F.when(
                F.col("avg_new_cases_7d") > F.col("avg_new_cases_14d"), F.lit("Increasing")
            )
            .when(F.col("avg_new_cases_7d") < F.col("avg_new_cases_14d"), F.lit("Decreasing"))
            .otherwise(F.lit("Stable")),
            "prediction_confidence": F.when(
                F.abs(F.col("avg_growth_rate_7d")) < 0.05, F.lit("High")
            )
            .when(F.abs(F.col("avg_growth_rate_7d")) < 0.15, F.lit("Medium"))
            .otherwise(F.lit("Low")),
            "prediction_date": F.date_add(F.col("date"), 1),
            "predicted_at": clock,
        }
    )

    return df.select(*PREDICTION_COLUMNS).filter(
        F.col("predicted_new_cases_next_day").isNotNull()
    )
