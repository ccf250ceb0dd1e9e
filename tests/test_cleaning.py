"""Golden tests for the cleaning stage (C1-C10, SURVEY.md §2.3).

Edge cases from FIXTURES.md §1: sentinels, padded numbers, uncastable
strings (-> SQL NULL, not 0.0), division guards, negative recovery rate,
boolean-cast garbage, date typing.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.functions.cleaning import (
    clean_observations,
    sentinel_to_double,
)
from bigdata_covid19_real_time_spark.functions.enrich import enrich_observations
from tests.conftest import frozen_clock, make_raw, obs


def clean_one(spark, row: dict) -> dict:
    df = clean_observations(make_raw(spark, [row]), clock=frozen_clock())
    return df.collect()[0].asDict()


def test_sentinels_become_zero(spark):
    for sentinel in ["", "null", "NULL", "  null ", " NULL  "]:
        got = clean_one(spark, obs(total_cases=sentinel, new_cases=sentinel))
        assert got["total_cases"] == 0.0, repr(sentinel)
        assert got["new_cases"] == 0.0


def test_padded_numbers_parse(spark):
    got = clean_one(spark, obs(total_cases=" 42 ", new_deaths="  7"))
    assert got["total_cases"] == 42.0
    assert got["new_deaths"] == 7.0


def test_uncastable_becomes_null_not_zero(spark):
    got = clean_one(spark, obs(total_cases="abc", new_cases="12.3.4"))
    assert got["total_cases"] is None
    assert got["new_cases"] is None


def test_null_input_stays_null(spark):
    got = clean_one(spark, obs(total_cases=None))
    assert got["total_cases"] is None


def test_rates_recomputed_and_input_discarded(spark):
    got = clean_one(
        spark,
        obs(
            total_cases="1000",
            total_deaths="58",
            new_cases="10",
            active_cases="100",
            population="2000000",
            death_rate="0.9999",  # garbage input rate must be overwritten
        ),
    )
    assert got["death_rate"] == 0.058
    assert got["cases_per_million"] == 500.0
    assert got["deaths_per_million"] == 29.0
    assert got["new_cases_ratio"] == 0.01
    assert got["cases_to_population_ratio"] == 0.0005
    assert got["recovery_rate"] == round((1000 - 100 - 58) / 1000, 6)


def test_zero_denominator_guards(spark):
    got = clean_one(spark, obs(total_cases="0", population="0", total_deaths="5"))
    for c in [
        "death_rate",
        "cases_per_million",
        "deaths_per_million",
        "new_cases_ratio",
        "cases_to_population_ratio",
        "recovery_rate",
    ]:
        assert got[c] == 0.0, c


def test_negative_recovery_rate_allowed(spark):
    got = clean_one(
        spark, obs(total_cases="100", active_cases="90", total_deaths="20")
    )
    assert got["recovery_rate"] == -0.1


def test_date_and_timestamp_typing(spark):
    got = clean_one(spark, obs(date="2021-03-15", timestamp="2021-03-15T10:30:00"))
    assert got["date"] == datetime.date(2021, 3, 15)
    assert got["timestamp"] == datetime.datetime(2021, 3, 15, 10, 30)


def test_unparseable_date_is_null(spark):
    got = clean_one(spark, obs(date="not-a-date"))
    assert got["date"] is None


def test_is_hotspot_boolean_cast(spark):
    assert clean_one(spark, obs(is_hotspot="true"))["is_hotspot"] is True
    assert clean_one(spark, obs(is_hotspot="false"))["is_hotspot"] is False
    # Spark's boolean cast accepts y/n/yes/no/t/f/0/1 — "yes" is True (the
    # reference, running on Spark, behaves identically); garbage -> NULL.
    assert clean_one(spark, obs(is_hotspot="yes"))["is_hotspot"] is True
    assert clean_one(spark, obs(is_hotspot="garbage"))["is_hotspot"] is None


def test_frozen_processing_time(spark):
    got = clean_one(spark, obs())
    assert got["processing_time"] == datetime.datetime(2021, 6, 1)


def test_enrichment_columns(spark):
    df = clean_observations(
        make_raw(
            spark,
            [
                obs(
                    total_cases="1000",
                    new_cases="100",
                    total_deaths="50",
                    active_cases="200",
                )
            ],
        ),
        clock=frozen_clock(),
    )
    got = enrich_observations(df).collect()[0].asDict()
    assert got["fatality_rate"] == 0.05
    assert got["active_cases_ratio"] == 0.2
    assert got["recovery_rate_calculated"] == 0.75
    assert got["growth_rate"] == round(100 / 900, 6)
    # death_rate 0.05 is not > 0.05 (High) but is > 0.02 (Medium)
    assert got["severity_level"] == "Medium"


def test_severity_levels(spark):
    def level(**kw):
        df = clean_observations(make_raw(spark, [obs(**kw)]), clock=frozen_clock())
        return enrich_observations(df).collect()[0]["severity_level"]

    assert level(new_cases="60000", total_cases="100000", total_deaths="0") == "Critical"
    assert level(new_cases="20000", total_cases="100000", total_deaths="0") == "High"
    assert level(new_cases="2000", total_cases="100000", total_deaths="0") == "Medium"
    assert level(new_cases="10", total_cases="100000", total_deaths="0") == "Low"
