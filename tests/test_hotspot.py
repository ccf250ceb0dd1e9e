"""Golden tests for hotspot detection (P6/C11/D4).

Boundary rows per FIXTURES.md §1.7: new_cases exactly 10000 (not hotspot)
vs 10001 (hotspot); death_rate straddling 0.05; is_hotspot=true with low
numbers; NULL is_hotspot passes only via numeric disjuncts.
"""

from __future__ import annotations

from bigdata_covid19_real_time_spark.functions.cleaning import clean_observations
from bigdata_covid19_real_time_spark.operators.hotspot import detect_hotspots
from tests.conftest import frozen_clock, make_raw, obs


def hotspots(spark, rows):
    cleaned = clean_observations(make_raw(spark, rows), clock=frozen_clock())
    return detect_hotspots(cleaned, clock=frozen_clock())


def locs(df):
    return {r["location"] for r in df.collect()}


def test_new_cases_boundary(spark):
    got = locs(
        hotspots(
            spark,
            [
                obs(location="AtLimit", new_cases="10000", total_deaths="0", is_hotspot="false"),
                obs(location="Above", new_cases="10001", total_deaths="0", is_hotspot="false"),
            ],
        )
    )
    assert got == {"Above"}


def test_death_rate_boundary(spark):
    got = locs(
        hotspots(
            spark,
            [
                # death_rate = 0.05 exactly -> not a hotspot
                obs(location="AtRate", total_cases="1000", total_deaths="50",
                    new_cases="1", is_hotspot="false"),
                # 0.051 -> hotspot
                obs(location="AboveRate", total_cases="1000", total_deaths="51",
                    new_cases="1", is_hotspot="false"),
            ],
        )
    )
    assert got == {"AboveRate"}


def test_flagged_hotspot_with_low_numbers(spark):
    got = locs(
        hotspots(
            spark,
            [obs(location="Flagged", new_cases="1", total_deaths="0", is_hotspot="true")],
        )
    )
    assert got == {"Flagged"}


def test_null_hotspot_flag_needs_numeric_trigger(spark):
    got = locs(
        hotspots(
            spark,
            [
                obs(location="GarbageFlagQuiet", new_cases="1", total_deaths="0",
                    is_hotspot="garbage"),  # cast -> NULL, numbers quiet -> excluded
                obs(location="GarbageFlagLoud", new_cases="20000", total_deaths="0",
                    is_hotspot="garbage"),
            ],
        )
    )
    assert got == {"GarbageFlagLoud"}


def test_dedup_by_location_and_detected_date(spark):
    df = hotspots(
        spark,
        [
            obs(location="Dup", new_cases="20000", total_deaths="0",
                timestamp="2021-03-15T10:00:00"),
            obs(location="Dup", new_cases="30000", total_deaths="0",
                timestamp="2021-03-15T11:00:00"),  # same detected_date
            obs(location="Dup", new_cases="30000", total_deaths="0",
                timestamp="2021-03-16T11:00:00"),  # next day survives
        ],
    )
    assert df.count() == 2


def test_output_schema(spark):
    df = hotspots(spark, [obs(new_cases="20000")])
    assert df.columns == [
        "location", "iso_code", "total_cases", "new_cases", "death_rate",
        "active_cases", "timestamp", "detected_at",
    ]
