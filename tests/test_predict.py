"""Golden tests for the trend forecaster (W1-W7, SURVEY.md §2.6).

Edge cases from FIXTURES.md §1.6/1.8: frames shorter than 7/14 rows, null
lag at partition start -> growth 0.0, trend/confidence boundaries,
avg7 == avg14 -> Stable.
"""

from __future__ import annotations

import datetime

from bigdata_covid19_real_time_spark.functions.cleaning import clean_observations
from bigdata_covid19_real_time_spark.operators.predict import predict_future_trends
from tests.conftest import frozen_clock, make_raw, obs


def series(spark, values: list[tuple[str, float, float]], location="Egypt"):
    """Rows of (date, total_cases, new_cases) for one location."""
    rows = [
        obs(
            location=location,
            date=d,
            total_cases=str(tc),
            new_cases=str(nc),
            total_deaths="0",
            new_deaths="0",
        )
        for d, tc, nc in values
    ]
    cleaned = clean_observations(make_raw(spark, rows), clock=frozen_clock())
    return predict_future_trends(cleaned, clock=frozen_clock())


def by_date(df):
    return {r["date"].isoformat(): r.asDict() for r in df.collect()}


def test_single_row_short_frame(spark):
    got = by_date(series(spark, [("2021-03-01", 100, 10)]))
    row = got["2021-03-01"]
    # frame of one row: averages equal the row itself; null lag -> growth 0
    assert row["avg_new_cases_7d"] == 10.0
    assert row["avg_new_cases_14d"] == 10.0
    assert row["daily_growth_rate"] == 0.0
    assert row["avg_growth_rate_7d"] == 0.0
    assert row["predicted_new_cases_next_day"] == 10.0
    assert row["predicted_total_cases_next_day"] == 110.0
    assert row["trend_direction"] == "Stable"  # avg7 == avg14
    assert row["prediction_confidence"] == "High"  # |growth| = 0
    assert row["prediction_date"] == datetime.date(2021, 3, 2)


def test_growth_and_trailing_frames(spark):
    # 3 days: total 100 -> 110 -> 121 (10% daily growth)
    got = by_date(
        series(
            spark,
            [
                ("2021-03-01", 100, 100),
                ("2021-03-02", 110, 10),
                ("2021-03-03", 121, 11),
            ],
        )
    )
    d3 = got["2021-03-03"]
    assert abs(d3["daily_growth_rate"] - 0.1) < 1e-12
    # avg growth over frame rows: (0.0 + 0.1 + 0.1) / 3
    assert abs(d3["avg_growth_rate_7d"] - (0.2 / 3)) < 1e-12
    # avg new cases over 3 rows: (100 + 10 + 11) / 3
    expected_avg7 = (100 + 10 + 11) / 3
    assert abs(d3["avg_new_cases_7d"] - expected_avg7) < 1e-12
    assert abs(
        d3["predicted_new_cases_next_day"] - expected_avg7 * (1 + 0.2 / 3)
    ) < 1e-9


def test_seven_row_frame_excludes_older_rows(spark):
    # 9 days of new_cases = 1..9; the 7-row frame at day 9 covers days 3..9
    vals = [(f"2021-03-{d:02d}", 100 * d, float(d)) for d in range(1, 10)]
    got = by_date(series(spark, vals))
    d9 = got["2021-03-09"]
    assert d9["avg_new_cases_7d"] == sum(range(3, 10)) / 7
    assert d9["avg_new_cases_14d"] == sum(range(1, 10)) / 9  # frame shorter than 14


def test_trend_directions(spark):
    rising = by_date(
        series(spark, [("2021-03-01", 100, 5), ("2021-03-02", 120, 20)])
    )
    assert rising["2021-03-02"]["trend_direction"] == "Stable"  # avg7==avg14 (same frame rows)

    # 15 rows so the 14-frame differs from the 7-frame: declining new_cases
    vals = [(f"2021-03-{d:02d}", 1000.0 + d, float(30 - d)) for d in range(1, 16)]
    got = by_date(series(spark, vals))
    last = got["2021-03-15"]
    assert last["avg_new_cases_7d"] < last["avg_new_cases_14d"]
    assert last["trend_direction"] == "Decreasing"

    vals = [(f"2021-03-{d:02d}", 1000.0 + d, float(d)) for d in range(1, 16)]
    got = by_date(series(spark, vals))
    assert got["2021-03-15"]["trend_direction"] == "Increasing"


def test_confidence_buckets(spark):
    # growth exactly 0.04 each day -> avg |growth| < 0.05 -> High
    def geometric(rate, n=8):
        total, out = 1000.0, []
        for d in range(1, n + 1):
            out.append((f"2021-03-{d:02d}", round(total, 6), 1.0))
            total *= 1 + rate
        return out

    high = by_date(series(spark, geometric(0.04)))
    assert high["2021-03-08"]["prediction_confidence"] == "High"
    med = by_date(series(spark, geometric(0.10)))
    assert med["2021-03-08"]["prediction_confidence"] == "Medium"
    low = by_date(series(spark, geometric(0.20)))
    assert low["2021-03-08"]["prediction_confidence"] == "Low"


def test_null_new_cases_row_dropped(spark):
    rows = [
        obs(date="2021-03-01", new_cases="abc"),  # uncastable -> NULL avg -> NULL pred
    ]
    cleaned = clean_observations(make_raw(spark, rows), clock=frozen_clock())
    out = predict_future_trends(cleaned, clock=frozen_clock())
    assert out.count() == 0


def test_per_location_partitioning(spark):
    a = [("2021-03-01", 100.0, 10.0), ("2021-03-02", 200.0, 100.0)]
    b = [("2021-03-01", 50.0, 5.0)]
    rows = [
        obs(location="A", date=d, total_cases=str(t), new_cases=str(n),
            total_deaths="0", new_deaths="0")
        for d, t, n in a
    ] + [
        obs(location="B", date=d, total_cases=str(t), new_cases=str(n),
            total_deaths="0", new_deaths="0")
        for d, t, n in b
    ]
    cleaned = clean_observations(make_raw(spark, rows), clock=frozen_clock())
    got = {(r["location"], r["date"].isoformat()): r.asDict()
           for r in predict_future_trends(cleaned, clock=frozen_clock()).collect()}
    # B's single row must not see A's rows
    assert got[("B", "2021-03-01")]["avg_new_cases_7d"] == 5.0
    assert got[("A", "2021-03-02")]["daily_growth_rate"] == 1.0
