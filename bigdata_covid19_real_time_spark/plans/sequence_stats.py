"""Sequence analytics over the event stream: first-order Markov
transition estimation and CUSUM changepoint detection — the two
statistics a behavioural/quality monitoring layer reads off an event
log, both exactly SQL-expressible (full hash gates, no contract
booleans needed).

100 TB shape for both: ONE shuffle of the fact table (by ``user_id``
for transitions, by ``(event_type, day)`` pre-aggregation for CUSUM),
then windows over the already-small grouped frames.  The per-user sort
inside the transition window is bounded by per-user event counts; the
CUSUM windows run over (type x day) frames that are ~6 orders of
magnitude smaller than the input.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL AND event_id IS NOT NULL
    ),
    c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type) + 1e-9, 6)
             AS prob
    FROM c
    """,
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event-type
    sequences: P(next | prev) with exact counts.  The per-user ordering
    is total (ts, then unique event_id), so the lag pairing — and hence
    the whole matrix — is deterministic across engines and partition
    counts."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_total = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        stable_round(
            F.col("n") * F.lit(1.0) / F.sum("n").over(row_total), 6
        ).alias("prob"),
    )


@query(
    "events_value_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS m
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    dev AS (
      SELECT event_type, d,
             m - AVG(m) OVER (PARTITION BY event_type) AS dv
      FROM daily
    ),
    cs AS (
      SELECT event_type, d,
             SUM(dv) OVER (
               PARTITION BY event_type ORDER BY d ROWS UNBOUNDED PRECEDING
             ) AS cusum
      FROM dev
    ),
    rk AS (
      SELECT event_type, d, cusum,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY ROUND(ABS(cusum) + 1e-9, 4) DESC, d ASC
             ) AS r
      FROM cs
    )
    SELECT event_type, d AS changepoint_date,
           ROUND(ABS(cusum) + 1e-9, 4) AS max_abs_cusum
    FROM rk WHERE r = 1
    """,
)
def events_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily mean of ``value`` per
    event type: the day where the cumulative deviation from the type's
    mean-of-daily-means peaks in magnitude is the most likely
    level-shift point.  Two-pass and exact: a (type, day) pre-aggregation
    shuffles the fact table once; the centering, cumulative sum, and
    argmax all run as windows over the tiny daily frame.  Ties on the
    peak break to the earliest day."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.avg("value").alias("m"))
    typ = Window.partitionBy("event_type")
    cum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = daily.withColumn("dv", F.col("m") - F.avg("m").over(typ))
    cs = dev.withColumn("cusum", F.sum("dv").over(cum))
    # argmax over the ROUNDED |cusum| so FP accumulation-order noise
    # cannot flip near-tied peaks across engines/partition counts; the
    # earliest-day tie-break then engages identically in both
    peak = Window.partitionBy("event_type").orderBy(
        stable_round(F.abs(F.col("cusum")), 4).desc(), F.col("d").asc()
    )
    return (
        cs.withColumn("r", F.row_number().over(peak))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("d").alias("changepoint_date"),
            stable_round(F.abs(F.col("cusum")), 4).alias("max_abs_cusum"),
        )
    )
