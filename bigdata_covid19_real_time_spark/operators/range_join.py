"""Interval-containment (range) join via time bucketing.

Spark has no native band/range join (DataFrame joins with only
inequality conditions fall back to ``BroadcastNestedLoopJoin`` or a
cartesian product — O(|points| * |intervals|) comparisons).  The
standard distributed rewrite buckets both sides on a fixed time grid so
the engine can use a hash equi-join:

- each **point** lands in exactly one bucket (``floor(us / width)``);
- each **interval** is exploded across every bucket it overlaps
  (``sequence(floor(start/width), floor((end-1)/width))``) — for
  intervals no longer than the bucket width that is at most 2 rows;
- the join is then a plain equi-join on the bucket id with the exact
  containment predicate (``start <= ts < end``) applied as a post-join
  filter.  Each (point, interval) match is produced exactly once
  because the point side has a single bucket row.

Cost model: the shuffle key is an 8-byte bucket id; the candidate set
per point is only the intervals overlapping its bucket, so total work
is O(matches + points + intervals * spans) instead of the nested-loop
product.  Pick ``bucket_seconds`` near the typical interval length:
much smaller multiplies the interval explode factor, much larger
inflates per-bucket candidate sets.  At 100 TB both sides shuffle once
on the bucket grid; AQE handles bucket skew (rush-hour buckets) like
any other hash-join skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def _micros(col: str):
    """Microseconds since epoch for TIMESTAMP or TIMESTAMP_NTZ columns.

    ``unix_micros`` only accepts TIMESTAMP_LTZ; parquet written by other
    engines (isAdjustedToUTC=false) loads as TIMESTAMP_NTZ.  The cast is
    a no-op for LTZ and interprets NTZ in the session timezone (pinned
    UTC at the table-load chokepoint), so bucket ids stay consistent
    across both encodings.
    """
    return F.unix_micros(F.col(col).cast("timestamp"))


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join ``points`` rows to every ``intervals`` row whose
    ``[start_col, end_col)`` half-open interval contains ``ts_col``.

    Column names of the two frames must be disjoint (rename before
    calling); the output carries all columns of both sides.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    width = F.lit(int(bucket_seconds) * _US)
    p = points.withColumn("__bucket", F.floor(_micros(ts_col) / width))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_micros(start_col) / width),
                F.floor((_micros(end_col) - 1) / width),
            )
        ),
    )
    return (
        p.join(iv, "__bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bucket")
    )
