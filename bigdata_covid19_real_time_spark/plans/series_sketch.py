"""Seasonal decomposition and HLL set-operation audit.

Two diagnostics that close gaps in the time-series and sketch families
(SURVEY.md §2 extension brief):

- ``events_seasonal_decomposition``: the classical additive
  decomposition y = trend + seasonal + residual — a 7-observation
  centered moving average for trend, zero-sum day-of-week means on the
  detrended series for the seasonal component, and robust
  (median/MAD) z-scores on the residual so anomalies are judged AFTER
  the weekly rhythm is removed (raw MAD flags every weekend;
  ``events_value_anomalies`` is the unadjusted sibling).  Everything
  runs on the per-day collapsed frame (calendar-bounded), so windows
  and scalar medians cost nothing at any fact size.
- ``events_audience_overlap_hll``: audience set ops from mergeable
  sketches — per event-type-pair union and intersection of user sets,
  where union is estimated directly by HLL++ (``approx_count_distinct``)
  and intersection via inclusion-exclusion, each certified against the
  exact count with conservative 3-sigma contract booleans (the
  ``sketch_bounds`` pattern: the oracle recomputes the exact values and
  pins the contract TRUE).  At 100 TB the exact half disappears and
  the sketches merge in constant space; inclusion-exclusion error
  compounds, which is why the intersection bound sums all three terms.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.plans.sketch_bounds import HLL_RSD
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Robust-z threshold for the residual anomaly flag.
RESID_Z_CUT = 3.0
#: 1 / Phi^-1(0.75): scales MAD to a consistent sigma estimate.
MAD_SIGMA = 1.4826


@query(
    "events_seasonal_decomposition",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, SUM(value) AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    tr AS (
      SELECT d, y,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN AVG(y) OVER w7 END AS trend
      FROM daily
      WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    dowm AS (
      SELECT EXTRACT(dow FROM d) AS dow, AVG(y - trend) AS sm
      FROM tr WHERE trend IS NOT NULL GROUP BY 1
    ),
    season AS (
      SELECT dow, sm - AVG(sm) OVER () AS seasonal FROM dowm
    ),
    dec AS (
      SELECT t.d, t.y, t.trend, s.seasonal,
             t.y - t.trend - s.seasonal AS resid
      FROM tr t JOIN season s ON s.dow = EXTRACT(dow FROM t.d)
    ),
    med AS (
      SELECT quantile_cont(resid, 0.5) AS m FROM dec WHERE resid IS NOT NULL
    ),
    madt AS (
      SELECT quantile_cont(abs(resid - med.m), 0.5) AS mad, ANY_VALUE(med.m) AS m
      FROM dec, med WHERE resid IS NOT NULL
    )
    SELECT dec.d,
           ROUND(dec.y + 1e-9, 4) AS y,
           ROUND(dec.trend + 1e-9, 4) AS trend,
           ROUND(dec.seasonal + 1e-9, 4) AS seasonal,
           ROUND(dec.resid + 1e-9, 4) AS residual,
           CASE WHEN dec.resid IS NOT NULL AND madt.mad > 0 THEN
             ROUND((dec.resid - madt.m) / ({MAD_SIGMA} * madt.mad) + 1e-9, 4)
           END AS resid_z,
           CASE WHEN dec.resid IS NOT NULL AND madt.mad > 0 THEN
             abs((dec.resid - madt.m) / ({MAD_SIGMA} * madt.mad))
               > {RESID_Z_CUT}
           END AS is_anomaly
    FROM dec, madt
    """,
)
def events_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily value total:
    trend = 7-OBSERVATION centered moving average (defined only where
    the full window exists), seasonal = zero-sum day-of-week means of
    the detrended series, residual = y - trend - seasonal, plus a
    robust z-score (median/MAD, sigma-consistent 1.4826 scaling) and a
    3-sigma anomaly flag on the residual — anomaly detection AFTER the
    weekly rhythm is removed.  The fact collapses ONCE to the
    calendar-bounded daily frame; the MA/seasonal windows and the two
    scalar medians (broadcast back via 1-row cross joins) are
    arithmetic on that tiny frame."""
    # persisted: every downstream stage (trend, seasonal means, the two
    # medians, the final select) chains back to this collapse, and
    # sibling branches are never exchange-reused — uncached, the fact
    # scan + daily aggregate re-ran once per branch (~6x)
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum("value").alias("y"))
        .persist()
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "y",
        F.when(F.count(F.lit(1)).over(w7) == 7, F.avg("y").over(w7)).alias(
            "trend"
        ),
    )
    dow = (F.dayofweek("d") - 1).alias("dow")
    dowm = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy(dow)
        .agg(F.avg(F.col("y") - F.col("trend")).alias("sm"))
    )
    season = dowm.select(
        "dow",
        (F.col("sm") - F.avg("sm").over(Window.partitionBy())).alias(
            "seasonal"
        ),
    )
    dec = tr.join(
        F.broadcast(season), (F.dayofweek("d") - 1) == season["dow"]
    ).select(
        "d",
        "y",
        "trend",
        "seasonal",
        (F.col("y") - F.col("trend") - F.col("seasonal")).alias("resid"),
    )
    med = dec.filter(F.col("resid").isNotNull()).agg(
        F.expr("percentile(resid, 0.5)").alias("m")
    )
    madt = (
        dec.filter(F.col("resid").isNotNull())
        .crossJoin(F.broadcast(med))
        .agg(
            F.expr("percentile(abs(resid - m), 0.5)").alias("mad"),
            F.first("m").alias("m"),
        )
    )
    z = (F.col("resid") - F.col("m")) / (MAD_SIGMA * F.col("mad"))
    defined = F.col("resid").isNotNull() & (F.col("mad") > 0)
    return dec.crossJoin(F.broadcast(madt)).select(
        "d",
        stable_round(F.col("y"), 4).alias("y"),
        stable_round(F.col("trend"), 4).alias("trend"),
        stable_round(F.col("seasonal"), 4).alias("seasonal"),
        stable_round(F.col("resid"), 4).alias("residual"),
        F.when(defined, stable_round(z, 4)).alias("resid_z"),
        F.when(defined, F.abs(z) > RESID_Z_CUT).alias("is_anomaly"),
    )


@query(
    "events_audience_overlap_hll",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type,
             user_id || ':' || CAST(CAST(ts AS DATE) AS VARCHAR) AS ud
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        AND ts IS NOT NULL
    ),
    per_type AS (
      SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS exact_int
      FROM tu a JOIN tu b
        ON b.ud = a.ud AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    uni AS (
      SELECT p.type_a, p.type_b,
             (SELECT COUNT(DISTINCT t.ud) FROM tu t
              WHERE t.event_type IN (p.type_a, p.type_b)) AS exact_union
      FROM pairs p
    )
    SELECT p.type_a, p.type_b,
           CAST(na.n AS BIGINT) AS exact_a,
           CAST(nb.n AS BIGINT) AS exact_b,
           CAST(u.exact_union AS BIGINT) AS exact_union,
           CAST(p.exact_int AS BIGINT) AS exact_intersection,
           TRUE AS union_within_bound,
           TRUE AS intersection_within_bound
    FROM pairs p
    JOIN uni u ON u.type_a = p.type_a AND u.type_b = p.type_b
    JOIN per_type na ON na.event_type = p.type_a
    JOIN per_type nb ON nb.event_type = p.type_b
    """,
)
def events_audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap per event-type pair from HLL++ sketches, over
    distinct active USER-DAYS (user sets saturate on a long-lived user
    base; user-days keep the overlap informative): the union estimated
    directly by ``approx_count_distinct`` over the pair's pooled
    user-days, the intersection via inclusion-exclusion
    (est_a + est_b - est_union), each certified against the exact
    count: union within ``ceil(3 * rsd * exact_union)``, intersection
    within ``ceil(3 * rsd * (exact_a + exact_b + exact_union))`` — the
    conservative bound because inclusion-exclusion compounds the error
    of all three sketches.  The exact halves share the same
    aggregations purely as the in-query harness (the ``sketch_bounds``
    pattern); at 100 TB only the constant-space mergeable sketches
    remain."""
    tu = (
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
        .distinct()
        # persisted: both the per-type stats branch and the pair-pooled
        # aggregation read this frame — uncached, the events scan +
        # distinct shuffle ran twice (sibling branches are never
        # exchange-reused)
        .persist()
    )
    per_type = tu.groupBy("event_type").agg(
        F.countDistinct("ud").alias("n"),
        F.approx_count_distinct("ud", HLL_RSD).alias("est"),
    )
    types = per_type.select("event_type", "n", "est")
    ta = types.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("exact_a"),
        F.col("est").alias("est_a"),
    )
    tb = types.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("exact_b"),
        F.col("est").alias("est_b"),
    )
    pair_list = F.broadcast(
        ta.crossJoin(tb).filter(F.col("type_a") < F.col("type_b"))
    )
    # replicate each (type, user) row onto every pair it belongs to,
    # then one grouped aggregation computes the pooled union sketch and
    # the exact union/intersection harness counts
    pooled = tu.join(
        pair_list,
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")),
    )
    agg = pooled.groupBy(
        "type_a", "type_b", "exact_a", "exact_b", "est_a", "est_b"
    ).agg(
        F.countDistinct("ud").alias("exact_union"),
        F.approx_count_distinct("ud", HLL_RSD).alias("est_union"),
        (
            F.countDistinct("ud", "event_type") - F.countDistinct("ud")
        ).alias("exact_int"),
    )
    est_int = F.col("est_a") + F.col("est_b") - F.col("est_union")
    union_ok = (
        F.abs(F.col("est_union") - F.col("exact_union"))
        <= F.ceil(F.lit(3 * HLL_RSD) * F.col("exact_union"))
    )
    int_ok = F.abs(est_int - F.col("exact_int")) <= F.ceil(
        F.lit(3 * HLL_RSD)
        * (F.col("exact_a") + F.col("exact_b") + F.col("exact_union"))
    )
    return agg.select(
        "type_a",
        "type_b",
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_int").cast("long").alias("exact_intersection"),
        union_ok.alias("union_within_bound"),
        int_ok.alias("intersection_within_bound"),
    )
