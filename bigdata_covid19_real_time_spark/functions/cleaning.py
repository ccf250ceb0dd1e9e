"""Cleaning + typing stage (the reference's ETL core).

Semantics match /root/reference/spark/covid_streaming.py:120-150 (C1-C10 in
SURVEY.md §2.3) exactly:

- sentinel normalization: ``trim(x) in {"", "null", "NULL"} -> 0.0``,
  otherwise ``cast(trim(x) as double)`` — so an *uncastable* non-sentinel
  string becomes SQL NULL, not 0.0, and whitespace-padded numbers parse;
- six rate columns recomputed from the normalized numerics with
  divide-by-zero guards returning 0.0;
- ``date``/``timestamp`` typed with default ISO parsing; ``is_hotspot``
  cast to boolean ("true"/"false" -> bool, anything else -> NULL);
- ``processing_time`` audit column from an injectable clock (tests freeze
  it; the reference hard-codes ``current_timestamp`` at :148).

Everything is built-in Spark SQL expressions — no UDFs — so the whole
stage stays inside whole-stage codegen and is streaming-safe (no actions).
At 100 TB this is a pure narrow map stage: no shuffle, fully pipelined
into whatever consumes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.schema import NUMERIC_RAW_COLUMNS, ROUND_EPS

#: Strings treated as "missing" by the reference (covid_streaming.py:121).
NULL_SENTINELS = ("", "null", "NULL")


def sentinel_to_double(column: str | Column) -> Column:
    """Normalize a stringly-typed numeric: sentinels -> 0.0, else cast.

    Mirrors covid_streaming.py:121-132.  NULL input stays NULL (trim(NULL)
    is NULL, the ``isin`` test is NULL => falls to ``otherwise``, and
    cast(NULL) is NULL) — same as the reference.
    """
    trimmed = F.trim(F.col(column) if isinstance(column, str) else column)
    # try_cast, not cast: the reference ran Spark 3.5 with ANSI off where a
    # malformed cast yields NULL; under Spark 4's ANSI default a plain cast
    # would throw.  try_cast reproduces the reference semantics on any
    # session, whatever its ansi.enabled setting.
    return F.when(trimmed.isin(*NULL_SENTINELS), F.lit(0.0)).otherwise(
        trimmed.try_cast("double")
    )


def _guarded_ratio(numer: Column, denom: Column, scale: int, factor: float | None = None) -> Column:
    """``denom > 0 ? round(numer/denom [* factor], scale) : 0.0``.

    The divide-by-zero guard pattern of covid_streaming.py:133-145.  A NULL
    denominator fails the ``> 0`` test and yields 0.0 via ``otherwise`` —
    matching the reference.  Rounding is epsilon-stabilized (see
    schema.ROUND_EPS) so results reproduce across engines.
    """
    ratio = numer / denom
    if factor is not None:
        ratio = ratio * factor
    return F.when(denom > 0, F.round(ratio + F.lit(ROUND_EPS), scale)).otherwise(
        F.lit(0.0)
    )


def clean_observations(df: DataFrame, clock: Column | None = None) -> DataFrame:
    """Type + enrich a RAW_SCHEMA-shaped DataFrame (batch or streaming).

    ``clock`` overrides the ``processing_time`` audit column for
    deterministic tests; defaults to ``current_timestamp()`` like the
    reference (covid_streaming.py:148).
    """
    clock = clock if clock is not None else F.current_timestamp()

    numerics = {c: sentinel_to_double(c) for c in NUMERIC_RAW_COLUMNS}
    df = df.withColumns(numerics)

    total_cases = F.col("total_cases")
    total_deaths = F.col("total_deaths")
    new_cases = F.col("new_cases")
    active_cases = F.col("active_cases")
    population = F.col("population")

    return df.withColumns(
        {
            # C2-C7: rates recomputed; incoming rate fields are overwritten.
            "death_rate": _guarded_ratio(total_deaths, total_cases, 6),
            "cases_per_million": _guarded_ratio(total_cases, population, 2, 1_000_000),
            "deaths_per_million": _guarded_ratio(total_deaths, population, 2, 1_000_000),
            "new_cases_ratio": _guarded_ratio(new_cases, total_cases, 6),
            "cases_to_population_ratio": _guarded_ratio(total_cases, population, 6),
            "recovery_rate": _guarded_ratio(
                total_cases - active_cases - total_deaths, total_cases, 6
            ),
            # C8: default ISO parsing, unparseable -> NULL (try_* variants
            # keep null-on-error semantics under ANSI sessions).
            "date": F.try_to_timestamp(F.col("date")).cast("date"),
            "timestamp": F.try_to_timestamp(F.col("timestamp")),
            # C9-C10.
            "processing_time": clock,
            "is_hotspot": F.col("is_hotspot").try_cast("boolean"),
        }
    )
