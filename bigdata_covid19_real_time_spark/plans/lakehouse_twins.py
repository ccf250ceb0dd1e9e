"""Batch-twin queries for the two lakehouse capabilities that were
test-gated only: versioned snapshots / time travel (sinks/versioned.py)
and incremental materialized-aggregate maintenance
(operators/incremental.py).

Each query actually exercises the real publish/read machinery — the
callable publishes immutable snapshot versions to a throwaway directory
and returns a frame read back THROUGH the pointer / pinned-version API,
so the driver's oracle check covers the atomic-publish + time-travel
path end-to-end, not a simulation of it.  The oracle is the plain SQL
recompute the snapshot contents must equal.

The reference has no notion of a snapshot (covid_streaming.py appends
in place, init.sql:9-36 tables are append-only); these are part of the
100 TB extension surface.

Registered in a module imported LAST by plans/__init__, so every
pre-existing query keeps its registration position (bench.py's frozen
headline order stays comparable round-over-round).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

_SCRATCH_DIRS: list[str] = []


def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _SCRATCH_DIRS.clear()


atexit.register(_cleanup_scratch)


def _scratch_dir(prefix: str) -> str:
    """Fresh scratch directory for a one-shot snapshot table.

    Left in place until PROCESS EXIT, not deleted per-call: the returned
    frame reads the published version directories lazily, so deleting
    here would race the caller's action.  Every dir is registered for an
    atexit sweep so repeated bench/selfcheck runs in one process don't
    accumulate table copies under /tmp beyond the process lifetime.
    """
    d = tempfile.mkdtemp(prefix=prefix, dir=os.environ.get("TMPDIR", "/tmp"))
    _SCRATCH_DIRS.append(d)
    return d


@query(
    "orders_time_travel",
    oracle="""
    SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice) + 1e-9, 2) AS total_price
    FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    UNION ALL
    SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice) + 1e-9, 2) AS total_price
    FROM orders
    """,
)
def orders_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over versioned snapshots (sinks/versioned.py):
    publish v1 = pre-1997 orders, then v2 = the full table; read v1 back
    PINNED (time travel) and v2 through the pointer, and summarize each.
    The oracle recomputes both summaries from the raw table — equality
    proves the published snapshots are exact and the pinned read is
    isolated from the later publish.

    Scale: publish is one partitioned parquet write + two renames
    (atomic pointer swap); the snapshot reads are ordinary pruned scans.
    """
    from bigdata_covid19_real_time_spark.sinks.versioned import (
        publish_version,
        read_version,
    )

    base = _scratch_dir("spark_graft_tt_orders_")
    orders = load_table(spark, sf_dir, "orders")
    v1 = publish_version(
        orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")),
        base,
    )
    publish_version(orders, base)

    def _summary(df: DataFrame, version: int) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
        ).select(
            F.lit(version).alias("version"), "n_orders", "total_price"
        )

    pinned = read_version(spark, base, version=v1)  # time travel
    latest = read_version(spark, base)  # pointer
    return _summary(pinned, 1).unionByName(_summary(latest, 2))


@query(
    "events_incremental_rollup",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date,
           CAST(COUNT(value) AS BIGINT) AS cnt,
           ROUND(SUM(value) + 1e-9, 2) AS total,
           ROUND(MIN(value) + 1e-9, 2) AS mn,
           ROUND(MAX(value) + 1e-9, 2) AS mx,
           ROUND(SUM(value) / COUNT(value) + 1e-9, 6) AS avg_value
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    """,
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance
    (operators/incremental.py): the events table arrives as two epochs
    (split on the median-ish timestamp); each epoch folds into the
    stored merge-form rollup — partial-agg(batch) UNION rollup, merge
    groupBy, atomic snapshot publish — touching |batch| + |rollup| rows,
    never history.  The oracle is the FULL recompute over all events;
    equality is the incremental-view-maintenance contract.
    """
    from bigdata_covid19_real_time_spark.operators.incremental import (
        read_aggregate,
        refresh_aggregate,
    )

    rollup = _scratch_dir("spark_graft_inc_events_")
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("event_date"),
        "value",
        "ts",
    )
    split = F.lit("2024-01-15").cast("timestamp")
    keys = ["event_type", "event_date"]
    # NULL-ts rows ride with the first epoch (ts IS NULL OR ts < split):
    # the oracle's full recompute aggregates every row including a NULL
    # event_date group, so the epoch split must partition ALL rows —
    # a plain </>= pair would silently drop NULL timestamps from both
    # batches and break the view-maintenance contract on such data.
    refresh_aggregate(
        spark,
        rollup,
        events.filter(F.col("ts").isNull() | (F.col("ts") < split)).drop("ts"),
        keys,
        "value",
    )
    refresh_aggregate(
        spark, rollup, events.filter(F.col("ts") >= split).drop("ts"), keys, "value"
    )
    state = read_aggregate(spark, rollup)
    return state.select(
        "event_type",
        "event_date",
        F.col("cnt").cast("long").alias("cnt"),
        stable_round("total", 2).alias("total"),
        stable_round("mn", 2).alias("mn"),
        stable_round("mx", 2).alias("mx"),
        stable_round("avg", 6).alias("avg_value"),
    )
