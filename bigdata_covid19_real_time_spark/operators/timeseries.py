"""Time-series regularization: resample to a daily grid and fill gaps.

The reference's forecaster (covid_streaming.py's trailing windows)
implicitly assumes one row per (location, day); real feeds have holes,
and a ROWS-frame window silently treats a 3-day gap as adjacent days.
This module makes the grid explicit: per key, every day between the
key's first and last observation exists exactly once, with two fill
semantics side by side:

- ``value_zero``: missing day -> 0 (flow/count series — absence means
  nothing happened);
- ``value_ffill``: missing day -> last observed value (state/level
  series — absence means unchanged), via the gaps-and-islands trick:
  a running COUNT of non-null observations partitions each key's
  timeline into islands each containing exactly one observation, and
  a per-island MAX broadcasts it forward.  No loop, no UDF, no
  self-join.

Scale: the daily rollup shuffles once on (key, day); the grid is
``explode(sequence(first_day, last_day))`` off the per-key bounds —
rows proportional to key-count x span, never to raw events; both fill
windows sort within the SAME (key) partitioning, so the whole pipeline
is one exchange on the key after the rollup.  Keys with multi-year
spans at 100 TB: the grid is still ~365 rows/key/year — dwarfed by the
raw events it summarizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def daily_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key daily sums on a gapless grid.

    Output: (key, event_date, observed, value_zero, value_ffill) —
    ``observed`` marks real days; ``value_ffill`` is NULL until the
    key's first observation (nothing to carry).
    """
    daily = (
        df.select(
            F.col(key_col), F.to_date(ts_col).alias("event_date"), F.col(value_col)
        )
        .groupBy(key_col, "event_date")
        .agg(F.sum(value_col).alias("__v"))
    )
    bounds = daily.groupBy(key_col).agg(
        F.min("event_date").alias("__first"), F.max("event_date").alias("__last")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(F.sequence("__first", "__last")).alias("event_date"),
    )
    joined = grid.join(daily, [key_col, "event_date"], "left")
    w_run = (
        Window.partitionBy(key_col)
        .orderBy("event_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # island id = how many observations seen so far; each island holds
    # exactly one non-null (its first row), so the island MAX is it
    islands = joined.withColumn("__isl", F.count("__v").over(w_run))
    w_isl = Window.partitionBy(key_col, "__isl")
    return islands.select(
        key_col,
        "event_date",
        F.col("__v").isNotNull().alias("observed"),
        F.coalesce(F.col("__v"), F.lit(0.0)).alias("value_zero"),
        F.max("__v").over(w_isl).alias("value_ffill"),
    )
