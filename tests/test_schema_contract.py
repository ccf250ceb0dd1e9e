"""Sink-table output contract (the init.sql DDL twin).

Asserts (a) each pipeline stage's output conforms to its registered
StructType, (b) wrong-typed frames are rejected, and (c) the contracts
carry the same column set as the reference DDL
(/root/reference/init-db/init.sql:9-90) minus documented divergences.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.functions.cleaning import clean_observations
from bigdata_covid19_real_time_spark.operators.aggregate import (
    continent_window_stats,
    country_rankings,
    windowed_location_stats,
)
from bigdata_covid19_real_time_spark.operators.hotspot import detect_hotspots
from bigdata_covid19_real_time_spark.operators.predict import predict_future_trends
from bigdata_covid19_real_time_spark.schema import (
    SINK_SCHEMAS,
    SchemaContractError,
    validate_sink_schema,
)
from tests.conftest import frozen_clock, make_raw, obs


@pytest.fixture(scope="module")
def cleaned(spark):
    return clean_observations(
        make_raw(spark, [obs(), obs("France", "2021-03-16")]), clock=frozen_clock()
    )


def test_every_pipeline_stage_conforms(spark, cleaned):
    validate_sink_schema(cleaned, "covid_realtime_stats")
    validate_sink_schema(
        predict_future_trends(cleaned, clock=frozen_clock()), "covid_predictions"
    )
    validate_sink_schema(
        continent_window_stats(cleaned, clock=frozen_clock()),
        "continent_covid_stats",
    )
    validate_sink_schema(
        continent_window_stats(cleaned, clock=frozen_clock(), approx=True),
        "continent_covid_stats",
    )
    validate_sink_schema(
        windowed_location_stats(cleaned, clock=frozen_clock()),
        "windowed_covid_stats",
    )
    validate_sink_schema(
        detect_hotspots(cleaned, clock=frozen_clock()), "covid_hotspots"
    )
    validate_sink_schema(
        country_rankings(cleaned, clock=frozen_clock()), "country_rankings"
    )


def test_wrong_type_rejected(spark, cleaned):
    bad = cleaned.withColumn("total_cases", F.col("total_cases").cast("string"))
    with pytest.raises(SchemaContractError, match="total_cases"):
        validate_sink_schema(bad, "covid_realtime_stats")


def test_missing_and_unexpected_columns_rejected(spark, cleaned):
    with pytest.raises(SchemaContractError, match="missing column 'uuid'"):
        validate_sink_schema(cleaned.drop("uuid"), "covid_realtime_stats")
    with pytest.raises(SchemaContractError, match="unexpected column"):
        validate_sink_schema(
            cleaned.withColumn("rogue", F.lit(1)), "covid_realtime_stats"
        )


def test_optional_nifi_columns_accepted(spark, cleaned):
    from bigdata_covid19_real_time_spark.functions.enrich import enrich_observations

    validate_sink_schema(enrich_observations(cleaned), "covid_realtime_stats")


def test_unregistered_table_passes(spark, cleaned):
    validate_sink_schema(cleaned, "some_custom_table")


def test_contracts_cover_reference_ddl_columns():
    """Column-set parity with init.sql, minus documented divergences
    (no surrogate id; predictions table has no reference DDL)."""
    ddl = {
        "covid_realtime_stats": {
            "uuid", "continent", "location", "iso_code", "date", "timestamp",
            "total_cases", "new_cases", "total_deaths", "new_deaths",
            "active_cases", "population", "recovery_rate", "death_rate",
            "cases_per_million", "deaths_per_million", "new_cases_ratio",
            "cases_to_population_ratio", "is_hotspot", "processing_time",
            # NiFi enrichment columns -> SINK_OPTIONAL_COLUMNS
        },
        "windowed_covid_stats": {
            "window_start", "window_end", "location", "iso_code",
            "total_new_cases_window", "total_new_deaths_window",
            "avg_death_rate_window", "max_total_cases",
            "latest_active_cases", "processed_at",
        },
        "continent_covid_stats": {
            "continent_window_start", "continent_window_end", "continent",
            "continent_new_cases", "continent_new_deaths",
            "continent_avg_death_rate", "countries_count",
            "continent_total_cases", "processed_at",
        },
        "covid_hotspots": {
            "location", "iso_code", "total_cases", "new_cases", "death_rate",
            "active_cases", "timestamp", "detected_at",
        },
        "country_rankings": {
            "location", "iso_code", "max_cases_country",
            "total_new_cases_country", "avg_death_rate_country",
            "ranking_position", "updated_at",
        },
    }
    for table, cols in ddl.items():
        assert {f.name for f in SINK_SCHEMAS[table].fields} == cols, table


def test_pipeline_write_path_enforces_contract(spark):
    """A sink never sees a frame that breaks the contract: the runner's
    _write raises before the sink write starts."""
    from bigdata_covid19_real_time_spark.sinks import MemorySink
    from bigdata_covid19_real_time_spark.streaming.runner import CovidPipeline

    pipe = CovidPipeline(sink=MemorySink())
    bad = make_raw(spark, [obs()])  # raw strings, not the cleaned contract
    with pytest.raises(SchemaContractError):
        pipe._write(bad, 0, "covid_realtime_stats")
