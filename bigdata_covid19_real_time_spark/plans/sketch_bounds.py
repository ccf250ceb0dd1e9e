"""Error-bound certification for Spark's two workhorse cardinality /
rank sketches — the operators that replace exact global aggregation at
100 TB, gated by the strongest contract that is deterministic across
engines: published error bounds emitted as booleans the oracle expects
to be TRUE.

``events_value_quantile_sketch`` runs ``percentile_approx`` (Greenwald-
Khanna) in its genuinely APPROXIMATING regime — ``accuracy=100`` with
group sizes of ~200 / ~2k / ~20k values at sf0.001/0.01/0.1, so the
summary actually compresses — and re-verifies each returned quantile
against the documented GK contract: the returned element's rank set
``[count(v < q) + 1, count(v <= q)]`` must intersect
``[floor((p - eps) * n), ceil((p + eps) * n)]`` with ``eps = 1/accuracy``.
Empirical worst rank error at accuracy=100 is ~0.0106 across all three
SFs (the floor/ceil slack of the published bound covers the excess over
1/100); a broken sketch (shifted or garbage quantiles) trips the boolean.

``events_userday_hll_distinct`` runs ``approx_count_distinct`` (HLL++)
on a derived user-day key whose cardinality (~180 / ~1.7k / ~17k per
event type) sits above the sparse-exact threshold at every SF, so the
dense probabilistic estimator is what's being certified.  Bound:
``|approx - exact| <= ceil(3 * rsd * exact)`` (three relative standard
deviations); observed worst error is ~1.3 * rsd, so the gate has ~2.3x
margin while a wrong estimator (off by the ~30% a mis-sized register
array produces) trips it.

At 100 TB only the sketch half of each query runs (single-pass,
mergeable, constant state per group); the exact half here IS the
verification harness, exactly like ``events_skewed_heavy_hitters_sketch``.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: GK sketch compression target: guarantees rank error <= 1/QUANTILE_ACC
#: (modulo the documented floor/ceil one-rank slack, encoded below).
QUANTILE_ACC = 100
QUANTILE_PS = [0.25, 0.5, 0.75, 0.9, 0.99]

#: HLL++ target relative standard deviation; gate bound is 3 * rsd.
HLL_RSD = 0.04


def gk_rank_contract_ok(p_col, n_col, lt_col, le_col, eps: float):
    """Column: the documented GK rank contract — the returned element's
    rank interval ``[lt+1, le]`` intersects the target interval
    ``[floor((p-eps)*n), ceil((p+eps)*n)]``.  Single source of truth for
    the gate query, its tests, and the sf1 certifier
    (tools/sf1_sketch_check.py)."""
    return (le_col >= F.floor((p_col - eps) * n_col)) & (
        lt_col + 1 <= F.ceil((p_col + eps) * n_col)
    )


def hll_within_bound(approx_col, exact_col, rsd: float):
    """Column: the HLL++ 3-sigma bound
    ``|approx - exact| <= ceil(3 * rsd * exact)`` — shared by the gate
    query and the sf1 certifier."""
    return F.abs(approx_col - exact_col) <= F.ceil(
        F.lit(3.0 * rsd) * exact_col
    )


@query(
    "events_value_quantile_sketch",
    oracle="""
    WITH t AS (
      SELECT DISTINCT event_type FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    ps AS (SELECT * FROM (VALUES (0.25),(0.5),(0.75),(0.9),(0.99)) v(p))
    SELECT event_type, CAST(p AS DOUBLE) AS p, TRUE AS within_bound
    FROM t CROSS JOIN ps
    """,
)
def events_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type quantiles via the GK sketch, each re-verified
    against the documented rank contract (see module docstring).  Plan
    shape: one map-side-combinable sketch aggregation over events, then
    ONE broadcast join of the 25-row (type, p, q) frame back to events
    for the exact-rank verification pass — no second shuffle of the
    fact table, no driver collect."""
    eps = 1.0 / QUANTILE_ACC
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .select("event_type", "value")
    )
    ps_arr = F.array(*[F.lit(p) for p in QUANTILE_PS])
    sk = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", QUANTILE_PS, QUANTILE_ACC).alias("qs")
        )
        .select(
            "event_type", F.posexplode("qs").alias("pos", "q")
        )
        .withColumn("p", F.element_at(ps_arr, F.col("pos") + 1))
    )
    stats = (
        ev.join(F.broadcast(sk), "event_type")
        .groupBy("event_type", "p", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("q")).cast("long")).alias("lt"),
            F.sum((F.col("value") <= F.col("q")).cast("long")).alias("le"),
        )
    )
    return stats.select(
        "event_type",
        F.col("p").cast("double").alias("p"),
        gk_rank_contract_ok(
            F.col("p"), F.col("n"), F.col("lt"), F.col("le"), eps
        ).alias("within_bound"),
    )


@query(
    "events_userday_hll_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id || ':' ||
                      CAST(CAST(ts AS DATE) AS VARCHAR)) AS BIGINT)
             AS exact_ud,
           TRUE AS within_bound
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      AND ts IS NOT NULL
    GROUP BY 1
    """,
)
def events_userday_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active user-days per event type via HLL++ (the 100 TB
    plan: constant-size mergeable registers, no distinct shuffle),
    verified against the exact count with the 3-sigma bound
    ``|approx - exact| <= ceil(3 * rsd * exact)``.  The exact
    ``countDistinct`` half runs in the same single aggregation over the
    keyed frame purely as the harness."""
    keyed = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            "event_type",
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                F.to_date("ts").cast("string"),
            ).alias("ud"),
        )
    )
    return (
        keyed.groupBy("event_type")
        .agg(
            F.approx_count_distinct("ud", HLL_RSD).alias("approx_ud"),
            F.countDistinct("ud").alias("exact_ud"),
        )
        .select(
            "event_type",
            F.col("exact_ud").cast("long").alias("exact_ud"),
            hll_within_bound(
                F.col("approx_ud"), F.col("exact_ud"), HLL_RSD
            ).alias("within_bound"),
        )
    )
