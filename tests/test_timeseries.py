"""Daily resample + gap-fill (operators/timeseries.py)."""

from __future__ import annotations

from bigdata_covid19_real_time_spark.operators.timeseries import daily_gapfill


def _events(spark):
    rows = [
        ("a", "2024-01-01 10:00:00", 1.0),
        ("a", "2024-01-01 11:00:00", 2.0),   # same day, summed
        ("a", "2024-01-04 09:00:00", 7.0),   # 2-day hole
        ("b", "2024-01-02 08:00:00", 5.0),   # single-day key
    ]
    return spark.createDataFrame(rows, "k STRING, ts STRING, v DOUBLE")


def test_grid_is_gapless_and_fills(spark):
    out = {
        (r.k, str(r.event_date)): r
        for r in daily_gapfill(_events(spark), "k", "ts", "v").collect()
    }
    # a: 4 consecutive days exactly
    a_days = sorted(d for k, d in out if k == "a")
    assert a_days == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert out[("a", "2024-01-01")].value_zero == 3.0          # same-day sum
    assert out[("a", "2024-01-01")].observed
    hole = out[("a", "2024-01-02")]
    assert not hole.observed and hole.value_zero == 0.0
    assert hole.value_ffill == 3.0                              # carried forward
    assert out[("a", "2024-01-03")].value_ffill == 3.0
    assert out[("a", "2024-01-04")].value_ffill == 7.0          # new observation
    # b: single day, no synthetic rows
    assert sorted(d for k, d in out if k == "b") == ["2024-01-02"]


def test_ffill_never_crosses_keys(spark):
    out = daily_gapfill(_events(spark), "k", "ts", "v").collect()
    b_rows = [r for r in out if r.k == "b"]
    assert all(r.value_ffill == 5.0 for r in b_rows)
