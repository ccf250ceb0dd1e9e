"""Enrichment columns subsuming the reference's out-of-repo NiFi stage.

The sink DDL (/root/reference/init-db/init.sql:30-34) declares five columns
(``recovery_rate_calculated, fatality_rate, active_cases_ratio,
severity_level, growth_rate``) that no in-repo code computes — they were
produced by the NiFi flow whose definition was not committed (SURVEY.md
§1.2).  Semantics are recovered from the schema contract and the hotspot
thresholds (covid_streaming.py:186):

- ``fatality_rate``        = deaths / cases (guarded)
- ``active_cases_ratio``   = active / cases (guarded)
- ``recovery_rate_calculated`` = (cases - active - deaths) / cases (guarded)
- ``growth_rate``          = new_cases / (cases - new_cases) (guarded)
- ``severity_level``       = threshold bucketing in the style of the
  hotspot rule: Critical / High / Medium / Low.

Pure narrow stage, UDF-free, streaming-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.functions.cleaning import _guarded_ratio


def enrich_observations(df: DataFrame) -> DataFrame:
    """Add the NiFi-contract derived columns to a *cleaned* DataFrame."""
    total_cases = F.col("total_cases")
    total_deaths = F.col("total_deaths")
    new_cases = F.col("new_cases")
    active_cases = F.col("active_cases")
    prior_cases = total_cases - new_cases

    df = df.withColumns(
        {
            "fatality_rate": _guarded_ratio(total_deaths, total_cases, 6),
            "active_cases_ratio": _guarded_ratio(active_cases, total_cases, 6),
            "recovery_rate_calculated": _guarded_ratio(
                total_cases - active_cases - total_deaths, total_cases, 6
            ),
            "growth_rate": _guarded_ratio(new_cases, prior_cases, 6),
        }
    )
    severity = (
        F.when((new_cases > 50000) | (F.col("death_rate") > 0.10), F.lit("Critical"))
        .when((new_cases > 10000) | (F.col("death_rate") > 0.05), F.lit("High"))
        .when((new_cases > 1000) | (F.col("death_rate") > 0.02), F.lit("Medium"))
        .otherwise(F.lit("Low"))
    )
    return df.withColumn("severity_level", severity)
