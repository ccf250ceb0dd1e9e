"""Distribution-drift query: exact per-day two-sample KS statistic
(operators/drift.py) — the bin-free complement to ``events_value_psi``.

Imported last by plans/__init__ so pre-existing registration positions
(and bench.py's frozen order) are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "events_value_ks",
    # full SQL replication of the exact KS formula: per-value <= / <
    # ranks for the day and global samples, sup over day points of the
    # step and left-limit differences (single-node window cumsums are
    # fine in the oracle; the engine uses two-pass distributed prefix
    # sums for the same ranks)
    oracle="""
    WITH g AS (SELECT CAST(ts AS DATE) AS d, value AS v FROM events
               WHERE value IS NOT NULL),
    nn AS (SELECT COUNT(*) AS n FROM g),
    gd AS (SELECT v, COUNT(*) AS c FROM g GROUP BY 1),
    gc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS le_g,
                  SUM(c) OVER (ORDER BY v) - c AS lt_g FROM gd),
    dd AS (SELECT d, v, COUNT(*) AS c FROM g GROUP BY 1, 2),
    dc AS (SELECT d, v,
                  SUM(c) OVER (PARTITION BY d ORDER BY v) AS le_d,
                  SUM(c) OVER (PARTITION BY d ORDER BY v) - c AS lt_d
           FROM dd),
    dn AS (SELECT d, COUNT(*) AS nd FROM g GROUP BY 1)
    SELECT d AS event_date, CAST(nd AS BIGINT) AS n_group,
           ROUND(MAX(GREATEST(
             ABS(le_d * 1.0 / nd - le_g * 1.0 / n),
             ABS(lt_d * 1.0 / nd - lt_g * 1.0 / n))) + 1e-9, 6) AS ks_stat
    FROM dc JOIN gc USING (v) JOIN dn USING (d) CROSS JOIN nn
    GROUP BY d, nd
    """,
)
def events_value_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day drift alarm: the EXACT two-sample Kolmogorov-Smirnov
    statistic of each day's ``value`` sample against the global
    distribution (operators/drift.py:ks_by_group — distributed two-pass
    prefix-sum CDF ranks, no single-partition sort, no binning error)."""
    from bigdata_covid19_real_time_spark.operators.drift import ks_by_group

    events = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("event_date"), "value"
    )
    out = ks_by_group(events, "value", "event_date")
    return out.select(
        "event_date",
        F.col("n_group").cast("long").alias("n_group"),
        stable_round("ks_stat", 6).alias("ks_stat"),
    )
