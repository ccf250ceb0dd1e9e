"""Schemas: the input contract and sink-table schemas.

The input contract mirrors the reference's ``RAW_SCHEMA``
(/root/reference/spark/covid_streaming.py:29-49): 19 fields, all nullable
strings — typing is deferred to the cleaning stage
(functions/cleaning.py).  Sink schemas mirror the MySQL DDL
(/root/reference/init-db/init.sql:9-90) minus auto-increment surrogate ids
(an RDBMS-ism; Spark sinks are append-only files/tables keyed by natural
keys instead).
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

RAW_FIELDS = [
    "uuid",
    "continent",
    "location",
    "iso_code",
    "date",
    "timestamp",
    "total_cases",
    "new_cases",
    "total_deaths",
    "new_deaths",
    "active_cases",
    "population",
    "recovery_rate",
    "death_rate",
    "cases_per_million",
    "deaths_per_million",
    "new_cases_ratio",
    "cases_to_population_ratio",
    "is_hotspot",
]

#: Input contract: 19 nullable strings (cf. covid_streaming.py:29-49).
RAW_SCHEMA = StructType([StructField(name, StringType(), True) for name in RAW_FIELDS])

#: Numeric columns normalized by the cleaning stage (covid_streaming.py:121-132).
NUMERIC_RAW_COLUMNS = [
    "total_cases",
    "new_cases",
    "total_deaths",
    "new_deaths",
    "active_cases",
    "population",
]

#: Rate columns recomputed by the engine; input values discarded
#: (covid_streaming.py:133-145).
DERIVED_RATE_COLUMNS = [
    "death_rate",
    "cases_per_million",
    "deaths_per_million",
    "new_cases_ratio",
    "cases_to_population_ratio",
    "recovery_rate",
]

#: Epsilon added inside every engine ``round``: double divisions of
#: low-decimal inputs land *exactly* on round-half boundaries (dyadic
#: rationals like 29/128 = 0.2265625), where rounding direction depends
#: on the engine's algorithm (Spark: HALF_UP on the shortest decimal
#: repr; DuckDB/C: half-away-from-zero on the binary value) — the same
#: logical value can round differently in different engines.  The shift
#: makes rounding reproducible everywhere.  Divergence from the
#: reference is confined to exact decimal ties at the rounding digit
#: (and negative ties round toward zero instead of away).
ROUND_EPS = 1e-9

#: Natural keys used for dedup per sink (covid_streaming.py:153,159,179,188).
DEDUP_KEYS = {
    "covid_realtime_stats": ["location", "date"],
    "covid_predictions": ["location", "prediction_date"],
    "continent_covid_stats": ["continent_window_start", "continent"],
    "covid_hotspots": ["location", "detected_date"],
}
