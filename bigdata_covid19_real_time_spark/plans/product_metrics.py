"""Product/sequence metrics batch: Markov entropy rate, experiment
power analysis, and session bounce/depth rates.

Extends the sequence-analytics and experimentation families
(SURVEY.md §2 extension brief; siblings of
``plans/sequence_stats.py`` and ``plans/experiments.py``): the entropy
rate quantifies how predictable user behavior is from the same
transition matrix ``event_type_transitions`` emits, the power analysis
closes the experimentation loop opened by Welch/CUPED (how big must a
test be BEFORE running it), and bounce/depth is the standard
product-analytics rollup of the ``user_sessions`` gap rule.  All are
closed-form and carry full DuckDB oracles.

Scale shapes:

- ``events_entropy_rate``: the transition groupBy is the only fact
  shuffle (identical shape to ``event_type_transitions``); entropy
  sums run as window aggregates over the |types|^2 transition frame.
- ``events_power_analysis``: one fact shuffle to per-type (n, Sx,
  Sx^2); everything else is scalar arithmetic on the |types|-row
  frame.  The required-n ceil is taken on the 4dp-ROUNDED value so a
  1-ulp cross-engine difference cannot flip the integer.
- ``events_session_bounce``: the same (user, ts) sort serves the gap
  flag, session numbering, and within-session ranks — one exchange;
  the session rollup and the entry-type rollup shuffle only collapsed
  frames.  Durations compare in integer microseconds (``unix_micros``
  / ``epoch_us``) — never engine-specific second truncation.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


def _us(col):
    """Microsecond epoch of an NTZ timestamp (session tz is pinned UTC,
    so the cast is deterministic; ``unix_micros`` rejects NTZ directly
    and DuckDB's ``epoch_us`` reads the same naive instant)."""
    return F.unix_micros(col.cast("timestamp"))

#: Session gap (minutes) — matches ``user_sessions``.
SESSION_GAP_MIN = 30

#: Two-sided alpha=0.05 and power=0.80 normal quantiles.
Z_ALPHA = 1.959963985
Z_BETA = 0.841621234

#: Target lift for the required-sample-size column (fraction of mean).
POWER_TARGET_LIFT = 0.05


@query(
    "events_entropy_rate",
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
    ),
    rowd AS (
      SELECT prev_type, n,
             n * 1.0 / SUM(n) OVER (PARTITION BY prev_type) AS p,
             SUM(n) OVER (PARTITION BY prev_type) AS n_out,
             SUM(n) OVER () AS n_total
      FROM c
    )
    SELECT prev_type AS event_type,
           CAST(MIN(n_out) AS BIGINT) AS n_transitions,
           ROUND(MIN(n_out) * 1.0 / MIN(n_total) + 1e-9, 6) AS pi,
           ROUND(-SUM(p * LN(p)) + 1e-9, 6) AS row_entropy,
           ROUND(MIN(n_out) * 1.0 / MIN(n_total) * -SUM(p * LN(p))
                 + 1e-9, 6) AS contribution
    FROM rowd GROUP BY prev_type
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov entropy rate of user behavior: per source state, the
    conditional next-step entropy -sum p_ij ln p_ij and its
    contribution pi_i * H_i to the chain's entropy rate (pi = empirical
    source-state share) — low rate means predictable flows, a jump
    flags bot traffic or instrumentation drift.  Same single fact
    shuffle as ``event_type_transitions``; the entropy sums are window
    aggregates over the |types|^2 transition frame.  Only observed
    transitions carry mass, so ln(p) never sees zero."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    rowd = c.select(
        "prev_type",
        "n",
        (F.col("n") * F.lit(1.0) / F.sum("n").over(wp)).alias("p"),
        F.sum("n").over(wp).alias("n_out"),
        F.sum("n").over(Window.partitionBy()).alias("n_total"),
    )
    return rowd.groupBy("prev_type").agg(
        F.min("n_out").cast("long").alias("n_transitions"),
        stable_round(F.min("n_out") * F.lit(1.0) / F.min("n_total"), 6).alias(
            "pi"
        ),
        stable_round(-F.sum(F.col("p") * F.log("p")), 6).alias("row_entropy"),
        stable_round(
            F.min("n_out")
            * F.lit(1.0)
            / F.min("n_total")
            * -F.sum(F.col("p") * F.log("p")),
            6,
        ).alias("contribution"),
    ).withColumnRenamed("prev_type", "event_type")


@query(
    "events_power_analysis",
    oracle=f"""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n, SUM(value) AS s,
             SUM(value * value) AS ss
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    v AS (
      SELECT event_type, n, s / n AS mean_v,
             (ss - s * s / n) / (n - 1) AS var_v
      FROM m
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(mean_v + 1e-9, 4) AS mean_value,
           ROUND(CASE WHEN var_v > 0 THEN SQRT(var_v) ELSE 0.0 END + 1e-9, 4)
             AS stddev,
           ROUND(CASE WHEN mean_v > 0
                      THEN 100.0 * ({Z_ALPHA} + {Z_BETA})
                           * SQRT(2 * var_v / n) / mean_v
                      ELSE 0.0 END + 1e-9, 4) AS mde_pct,
           CAST(CEIL(ROUND(CASE WHEN mean_v > 0 AND var_v > 0
                      THEN 2 * var_v * POW({Z_ALPHA} + {Z_BETA}, 2)
                           / POW({POWER_TARGET_LIFT} * mean_v, 2)
                      ELSE 0.0 END + 1e-9, 4)) AS BIGINT) AS n_per_arm_5pct
    FROM v
    """,
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis per metric (event type): the minimum
    detectable effect at the current sample size and the per-arm
    sample size needed to detect a {POWER_TARGET_LIFT:.0%} lift at
    alpha=0.05 / power=0.80 — the design-time companion to
    ``event_value_welch`` (analysis) and ``events_cuped_adjustment``
    (variance reduction).  One fact shuffle to per-type moments; the
    required-n CEIL is taken on the 4dp-ROUNDED value so a 1-ulp
    cross-engine difference cannot flip the integer."""
    m = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    mean_v = F.col("s") / F.col("n")
    var_v = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    zsum = F.lit(Z_ALPHA + Z_BETA)
    v = m.select(
        "event_type",
        "n",
        mean_v.alias("mean_v"),
        var_v.alias("var_v"),
    )
    return v.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        stable_round(F.col("mean_v"), 4).alias("mean_value"),
        stable_round(
            F.when(F.col("var_v") > 0, F.sqrt("var_v")).otherwise(0.0), 4
        ).alias("stddev"),
        stable_round(
            F.when(
                F.col("mean_v") > 0,
                F.lit(100.0)
                * zsum
                * F.sqrt(F.lit(2.0) * F.col("var_v") / F.col("n"))
                / F.col("mean_v"),
            ).otherwise(0.0),
            4,
        ).alias("mde_pct"),
        F.ceil(
            stable_round(
                F.when(
                    (F.col("mean_v") > 0) & (F.col("var_v") > 0),
                    F.lit(2.0)
                    * F.col("var_v")
                    * F.pow(zsum, 2)
                    / F.pow(F.lit(POWER_TARGET_LIFT) * F.col("mean_v"), 2),
                ).otherwise(0.0),
                4,
            )
        )
        .cast("long")
        .alias("n_per_arm_5pct"),
    )


@query(
    "events_session_bounce",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '{SESSION_GAP_MIN} minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL AND event_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id, session_no ORDER BY ts, event_id) AS rn
      FROM numbered
    ),
    sessions AS (
      SELECT user_id, session_no,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
             COUNT(*) AS depth,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0
               AS duration_sec
      FROM ranked GROUP BY 1, 2
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(AVG(CASE WHEN depth = 1 THEN 1.0 ELSE 0.0 END) + 1e-9, 6)
             AS bounce_rate,
           ROUND(AVG(depth * 1.0) + 1e-9, 4) AS avg_depth,
           ROUND(AVG(duration_sec) + 1e-9, 2) AS avg_duration_sec
    FROM sessions GROUP BY 1
    """,
)
def events_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce and depth by session entry type: sessions cut on the
    same {SESSION_GAP_MIN}-minute gap rule as ``user_sessions``,
    attributed to their FIRST event's type — the landing-page view of
    engagement (which entry points hold users, which bounce).  One
    (user, ts) exchange serves the gap flag, numbering, and
    within-session ranks; the session and entry-type rollups touch
    only collapsed frames.  Durations compare in integer microseconds
    in both engines."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                _us(F.col("ts")) - _us(F.lag("ts").over(w))
                > gap_us
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "session_no").orderBy(
                "ts", "event_id"
            )
        ),
    )
    sessions = numbered.groupBy("user_id", "session_no").agg(
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
        F.count(F.lit(1)).alias("depth"),
        (
            (_us(F.max("ts")) - _us(F.min("ts")))
            / F.lit(1_000_000.0)
        ).alias("duration_sec"),
    )
    return sessions.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        stable_round(
            F.avg(F.when(F.col("depth") == 1, 1.0).otherwise(0.0)), 6
        ).alias("bounce_rate"),
        stable_round(F.avg(F.col("depth") * F.lit(1.0)), 4).alias("avg_depth"),
        stable_round(F.avg("duration_sec"), 2).alias("avg_duration_sec"),
    )
