"""Golden tests for aggregation operators (A1, A3, A4/D5, A6, A7)."""

from __future__ import annotations

import datetime

from bigdata_covid19_real_time_spark.functions.cleaning import clean_observations
from bigdata_covid19_real_time_spark.operators.aggregate import (
    continent_window_stats,
    country_rankings,
    dashboard_summary,
    top_affected_countries,
    windowed_location_stats,
)
from tests.conftest import frozen_clock, make_raw, obs


def cleaned(spark, rows):
    return clean_observations(make_raw(spark, rows), clock=frozen_clock())


def test_continent_window_stats(spark):
    rows = [
        obs(location="Egypt", continent="Africa", timestamp="2021-03-15T10:01:00",
            new_cases="100", new_deaths="1", total_cases="1000", total_deaths="58"),
        obs(location="Kenya", continent="Africa", timestamp="2021-03-15T10:04:00",
            new_cases="200", new_deaths="2", total_cases="2000", total_deaths="0"),
        obs(location="Egypt", continent="Africa", timestamp="2021-03-15T10:04:30",
            new_cases="50", new_deaths="0", total_cases="1050", total_deaths="58"),
        # next 5-minute bucket
        obs(location="Egypt", continent="Africa", timestamp="2021-03-15T10:06:00",
            new_cases="10", new_deaths="0", total_cases="1060", total_deaths="58"),
        # other continent, same bucket
        obs(location="France", continent="Europe", timestamp="2021-03-15T10:02:00",
            new_cases="300", new_deaths="3", total_cases="3000", total_deaths="0"),
    ]
    out = continent_window_stats(cleaned(spark, rows), clock=frozen_clock())
    got = {(r["continent_window_start"], r["continent"]): r.asDict() for r in out.collect()}

    b1 = datetime.datetime(2021, 3, 15, 10, 0)
    b2 = datetime.datetime(2021, 3, 15, 10, 5)
    africa_b1 = got[(b1, "Africa")]
    assert africa_b1["continent_new_cases"] == 350.0
    assert africa_b1["continent_new_deaths"] == 3.0
    assert africa_b1["countries_count"] == 2  # Egypt counted once
    assert africa_b1["continent_total_cases"] == 4050.0
    assert africa_b1["continent_window_end"] == b2
    # avg over 3 rows of death_rate: 0.058, 0.0, 58/1050 rounded
    rates = [0.058, 0.0, round(58 / 1050, 6)]
    assert abs(africa_b1["continent_avg_death_rate"] - sum(rates) / 3) < 1e-9
    assert (b2, "Africa") in got
    assert (b1, "Europe") in got
    assert len(got) == 3


def test_windowed_location_stats_latest_is_deterministic(spark):
    rows = [
        obs(location="Egypt", timestamp="2021-03-15T10:01:00", active_cases="100",
            new_cases="10", new_deaths="1", total_cases="900"),
        obs(location="Egypt", timestamp="2021-03-15T10:03:00", active_cases="300",
            new_cases="20", new_deaths="2", total_cases="1000"),
    ]
    out = windowed_location_stats(cleaned(spark, rows), clock=frozen_clock())
    row = out.collect()[0].asDict()
    assert row["total_new_cases_window"] == 30.0
    assert row["total_new_deaths_window"] == 3.0
    assert row["max_total_cases"] == 1000.0
    assert row["latest_active_cases"] == 300.0  # max_by timestamp, not arbitrary last


def test_dashboard_summary(spark):
    rows = [
        obs(location="Egypt", timestamp="2021-03-15T10:00:00", total_cases="1000",
            new_cases="10", total_deaths="58", new_deaths="1", is_hotspot="true"),
        obs(location="Kenya", timestamp="2021-03-15T23:00:00", total_cases="2000",
            new_cases="20", total_deaths="0", new_deaths="0", is_hotspot="false"),
        obs(location="Egypt", timestamp="2021-03-16T01:00:00", total_cases="1100",
            new_cases="100", total_deaths="58", new_deaths="0", is_hotspot="false"),
    ]
    out = dashboard_summary(cleaned(spark, rows))
    got = {r["report_date"].isoformat(): r.asDict() for r in out.collect()}
    d1 = got["2021-03-15"]
    assert d1["countries_count"] == 2
    assert d1["global_total_cases"] == 3000.0
    assert d1["global_new_cases"] == 30.0
    assert d1["hotspot_count"] == 1
    assert got["2021-03-16"]["countries_count"] == 1


def test_top_affected_countries(spark):
    rows = []
    for i in range(15):
        rows.append(obs(location=f"C{i:02d}", iso_code=f"I{i:02d}",
                        total_cases=str(1000 * (i + 1)), date="2021-03-15"))
        rows.append(obs(location=f"C{i:02d}", iso_code=f"I{i:02d}",
                        total_cases=str(500 * (i + 1)), date="2021-03-16"))
    out = top_affected_countries(cleaned(spark, rows), k=10).collect()
    assert len(out) == 10
    assert out[0]["location"] == "C14" and out[0]["total_cases"] == 15000.0
    assert out[-1]["location"] == "C05"


def test_country_rankings(spark):
    rows = [
        obs(location="A", total_cases="5000", new_cases="10", total_deaths="250",
            date="2021-03-15"),
        obs(location="A", total_cases="6000", new_cases="20", total_deaths="250",
            date="2021-03-16"),
        obs(location="B", total_cases="9000", new_cases="5", total_deaths="0",
            date="2021-03-15"),
    ]
    out = country_rankings(cleaned(spark, rows), clock=frozen_clock())
    got = {r["location"]: r.asDict() for r in out.collect()}
    assert got["B"]["ranking_position"] == 1
    assert got["A"]["ranking_position"] == 2
    assert got["A"]["max_cases_country"] == 6000.0
    assert got["A"]["total_new_cases_country"] == 30.0
