"""Incremental materialized-aggregate maintenance: fold new data into a
stored per-key rollup without rescanning history.

The reference recomputes every aggregate from the micro-batch alone
(covid_streaming.py's per-epoch groupBys) — history simply isn't there.
At 100 TB the opposite problem bites: a daily dashboard rollup that
rescans the full fact table is a full-table job for a 0.1% delta.  The
standard fix is incremental view maintenance over DECOMPOSABLE
aggregates: keep the rollup in merge form (count, sum, min, max — the
partial-aggregate states Spark itself shuffles), then each refresh is

    partial-agg(new batch)  UNION  stored rollup  ->  merge groupBy

touching |batch| + |rollup| rows, never |history|.  Averages and rates
derive from (sum, count) at READ time — storing ``avg`` itself would
make the state non-mergeable (the classic IVM mistake).

Snapshot integration: the rollup lives in a versioned table
(sinks/versioned.py), so each refresh publishes atomically, readers
never see a half-merged rollup, and a bad batch rolls back by moving
the pointer.  ``refresh`` reads the CURRENT snapshot and publishes the
NEXT — the single-writer contract versioned.py documents.

Scale: the merge groupBy shuffles rollup+batch keys once with map-side
partial aggregation; the stored side is already one row per key, so
refresh cost tracks key cardinality, not fact history.  MIN/MAX are
monotone under inserts only — this is an append-only view (no
retraction support), which is exactly the streaming-corpus case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.sinks.versioned import (
    latest_version,
    publish_version,
    read_version,
)

#: Merge-form measures maintained for every value column.
_STATE_COLS = ("cnt", "total", "mn", "mx")


def _partial(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("cnt"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def _merge(states: DataFrame, keys: list[str]) -> DataFrame:
    return states.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("total").alias("total"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def refresh_aggregate(
    spark: SparkSession,
    rollup_dir: str,
    batch: DataFrame,
    keys: list[str],
    value_col: str,
) -> int:
    """Fold ``batch`` into the stored rollup and publish the result as
    the next snapshot version.  First call bootstraps the rollup from
    the batch alone.  Returns the published version."""
    fresh = _partial(batch, keys, value_col)
    if latest_version(rollup_dir) is None:
        merged = fresh
    else:
        current = read_version(spark, rollup_dir).select(
            *keys, *_STATE_COLS
        )
        merged = _merge(current.unionByName(fresh), keys)
    return publish_version(merged, rollup_dir)


def read_aggregate(
    spark: SparkSession, rollup_dir: str, version: int | None = None
) -> DataFrame:
    """The rollup with derived measures attached: (keys..., cnt, total,
    mn, mx, avg).  ``avg`` derives from the mergeable state at read
    time; a stored avg would not merge."""
    state = read_version(spark, rollup_dir, version)
    return state.withColumn(
        "avg",
        F.when(F.col("cnt") > 0, F.col("total") / F.col("cnt")),
    )
