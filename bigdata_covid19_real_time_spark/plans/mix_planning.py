"""Data-mix planning batch: temperature-scaled source sampling,
cohort retention triangle, Neyman stratified allocation, and an A/B
sample-ratio-mismatch check.

The ops a pipeline runs BEFORE committing a training mix or an
experiment readout (SURVEY.md §2 extension brief: sampling + corpus
curation).  All four collapse the fact table once and finish with
closed-form arithmetic on the tiny grouped frame:

- ``docs_temperature_mix_plan``: the multilingual-training standard —
  per-source token shares flattened by ``share^ALPHA`` and
  renormalized, with the expected token draw and epoch count (how many
  times a small source repeats) at a fixed token budget.  One
  narrow-column scan -> per-source frame; the normalization is a
  window sum over sources.
- ``customer_retention_triangle``: classic cohort analysis — customers
  grouped by first-order month, per-(cohort, month-offset) distinct
  actives over the cohort size.  Two key-partitioned shuffles
  (per-customer min, cohort rollup); the triangle is
  months x <= MAX_OFFSET rows regardless of fact size.
- ``events_neyman_allocation``: optimal stratified-sample allocation
  n_h proportional to N_h * S_h — the variance-minimizing budget split
  used when subsampling a corpus for labeling.  Mergeable count/std
  moments per stratum, then window-normalized fractions.
- ``events_ab_srm_check``: sample-ratio-mismatch — the first gate of
  any A/B readout.  Users deterministically split by md5 hash (the
  engine-wide ``hash_bucket`` idiom), per-event-type distinct users
  per arm, and the 1-dof equal-split chi-square with the 95% flag.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.sampling import (
    NUM_BUCKETS,
    hash_bucket,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Temperature exponent for the source mix (the multilingual-sampling
#: convention: alpha < 1 upsamples small sources).
MIX_ALPHA = 0.3
#: Token budget the mix plan is evaluated at.
MIX_BUDGET = 10_000_000
#: Retention triangle depth in months.
MAX_OFFSET = 12
#: Sampling budget for the Neyman allocation.
NEYMAN_BUDGET = 1000
#: Seed for the A/B hash split.
SRM_SEED = 11
#: 95% critical value of chi-square with 1 dof.
CHI2_95 = 3.841


@query(
    "docs_temperature_mix_plan",
    oracle=f"""
    WITH toks AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(length(text) - length(replace(text, ' ', '')) + 1)
               AS tokens
      FROM documents
      WHERE text IS NOT NULL AND source IS NOT NULL
      GROUP BY 1
    ),
    shares0 AS (
      SELECT source, n_docs, tokens,
             tokens * 1.0 / SUM(tokens) OVER () AS p_raw
      FROM toks
    ),
    shares AS (
      SELECT source, n_docs, tokens, p_raw,
             pow(p_raw, {MIX_ALPHA})
               / SUM(pow(p_raw, {MIX_ALPHA})) OVER () AS w
      FROM shares0
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(tokens AS BIGINT) AS tokens,
           ROUND(p_raw + 1e-9, 6) AS raw_share,
           ROUND(w + 1e-9, 6) AS mix_weight,
           CAST(floor({MIX_BUDGET} * ROUND(w + 1e-9, 6) + 0.5) AS BIGINT)
             AS budget_tokens,
           ROUND({MIX_BUDGET} * w / tokens + 1e-9, 4) AS epochs
    FROM shares
    """,
)
def docs_temperature_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training-mix plan per source: raw token share
    p_s, flattened weight w_s = p_s^ALPHA / sum(p^ALPHA) (ALPHA = 0.3,
    the multilingual-sampling convention that upsamples small sources),
    the expected token draw at a 10M-token budget, and the implied
    epoch count (budget draw / available tokens — epochs > 1 means the
    source repeats).  Tokens are the closed-form whitespace count so
    both engines agree exactly; the fact collapses ONCE per source and
    the normalization is a window sum over the tiny source frame."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
                + 1
            ).alias("tokens"),
        )
    )
    w = Window.partitionBy()
    shares = toks.withColumn(
        "p_raw", F.col("tokens") / F.sum("tokens").over(w)
    ).withColumn(
        "w",
        F.pow("p_raw", F.lit(MIX_ALPHA))
        / F.sum(F.pow("p_raw", F.lit(MIX_ALPHA))).over(w),
    )
    return shares.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tokens").cast("long").alias("tokens"),
        stable_round(F.col("p_raw"), 6).alias("raw_share"),
        stable_round(F.col("w"), 6).alias("mix_weight"),
        F.floor(F.lit(MIX_BUDGET) * stable_round(F.col("w"), 6) + 0.5)
        .cast("long")
        .alias("budget_tokens"),
        stable_round(F.lit(MIX_BUDGET) * F.col("w") / F.col("tokens"), 4).alias(
            "epochs"
        ),
    )


@query(
    "customer_retention_triangle",
    oracle=f"""
    WITH activity AS (
      SELECT DISTINCT o_custkey,
             CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
               AS m
      FROM orders WHERE o_orderdate IS NOT NULL
    ),
    cohorts AS (
      SELECT o_custkey, MIN(m) AS cohort_month FROM activity GROUP BY 1
    ),
    sizes AS (
      SELECT cohort_month, COUNT(*) AS n_cohort FROM cohorts GROUP BY 1
    ),
    tri AS (
      SELECT c.cohort_month,
             (EXTRACT(year FROM a.m) - EXTRACT(year FROM c.cohort_month)) * 12
               + (EXTRACT(month FROM a.m) - EXTRACT(month FROM c.cohort_month))
               AS month_offset,
             COUNT(*) AS n_active
      FROM activity a JOIN cohorts c USING (o_custkey)
      GROUP BY 1, 2
    )
    SELECT t.cohort_month,
           CAST(t.month_offset AS INTEGER) AS month_offset,
           CAST(t.n_active AS BIGINT) AS n_active,
           CAST(s.n_cohort AS BIGINT) AS n_cohort,
           ROUND(t.n_active * 1.0 / s.n_cohort + 1e-9, 6) AS retention
    FROM tri t JOIN sizes s USING (cohort_month)
    WHERE t.month_offset BETWEEN 0 AND {MAX_OFFSET}
    """,
)
def customer_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: customers cohorted by first-order
    month; for each (cohort, month offset <= 12) the share of the
    cohort with an order that month.  The classic growth-analytics
    readout, built scale-first: distinct (customer, month) activity,
    per-customer min for the cohort (one key shuffle), and a
    (cohort, offset) rollup whose output is bounded by
    months x 13 rows no matter how large the fact table is.  Month
    offsets are exact integer year/month arithmetic so both engines
    agree on every boundary."""
    activity = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            F.trunc(F.to_date("o_orderdate"), "MM").alias("m"),
        )
        .distinct()
    )
    cohorts = activity.groupBy("o_custkey").agg(
        F.min("m").alias("cohort_month")
    )
    sizes = cohorts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    offset = (F.year("m") - F.year("cohort_month")) * 12 + (
        F.month("m") - F.month("cohort_month")
    )
    tri = (
        activity.join(cohorts, "o_custkey")
        .groupBy("cohort_month", offset.alias("month_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
        .filter(F.col("month_offset").between(0, MAX_OFFSET))
    )
    return tri.join(F.broadcast(sizes), "cohort_month").select(
        "cohort_month",
        F.col("month_offset").cast("int").alias("month_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_cohort").cast("long").alias("n_cohort"),
        stable_round(F.col("n_active") / F.col("n_cohort"), 6).alias(
            "retention"
        ),
    )


@query(
    "events_neyman_allocation",
    oracle=f"""
    WITH strata AS (
      SELECT event_type, COUNT(*) AS n,
             COALESCE(stddev_samp(value), 0.0) AS sd
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    alloc AS (
      SELECT event_type, n, sd,
             CASE WHEN SUM(n * sd) OVER () > 0
                  THEN n * sd / SUM(n * sd) OVER () ELSE 0.0 END AS frac
      FROM strata
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_stratum,
           ROUND(sd + 1e-9, 6) AS value_sd,
           ROUND(frac + 1e-9, 6) AS alloc_frac,
           CAST(floor({NEYMAN_BUDGET} * ROUND(frac + 1e-9, 6) + 0.5)
                AS BIGINT) AS n_sampled
    FROM alloc
    """,
)
def events_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified-sample allocation over event types:
    n_h proportional to N_h * S_h (stratum size times value std) — the
    variance-minimizing way to spend a fixed labeling/inspection budget
    (1000 here).  Mergeable count/std moments per stratum, a window
    normalization over the handful of strata, and the integer
    allocation derived from the ROUNDED fraction so both engines land
    on the same row counts."""
    strata = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.stddev_samp("value"), F.lit(0.0)).alias("sd"),
        )
    )
    w = Window.partitionBy()
    tot = F.sum(F.col("n") * F.col("sd")).over(w)
    frac = F.when(tot > 0, F.col("n") * F.col("sd") / tot).otherwise(0.0)
    return strata.select(
        "event_type",
        F.col("n").cast("long").alias("n_stratum"),
        stable_round(F.col("sd"), 6).alias("value_sd"),
        stable_round(frac, 6).alias("alloc_frac"),
        F.floor(F.lit(NEYMAN_BUDGET) * stable_round(frac, 6) + 0.5)
        .cast("long")
        .alias("n_sampled"),
    )


@query(
    "events_ab_srm_check",
    oracle=f"""
    WITH armed AS (
      SELECT DISTINCT event_type, user_id,
             CAST((('0x' || substr(md5('{SRM_SEED}:' ||
                 CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % {NUM_BUCKETS}) % 2 AS INTEGER) AS arm
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ),
    counts AS (
      SELECT event_type,
             COUNT(*) FILTER (arm = 0) AS n_a,
             COUNT(*) FILTER (arm = 1) AS n_b
      FROM armed GROUP BY 1
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND((n_a - n_b) * (n_a - n_b) * 1.0 / (n_a + n_b) + 1e-9, 6)
             AS chi2,
           (n_a - n_b) * (n_a - n_b) * 1.0 / (n_a + n_b) > {CHI2_95}
             AS srm_flag
    FROM counts
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch gate for a deterministic 50/50 hash split:
    users assigned to arms by the engine-wide md5 ``hash_bucket`` idiom
    (SRM_SEED = 11), per-event-type distinct users per arm, and the
    1-dof equal-split chi-square (n_a - n_b)^2 / (n_a + n_b) with the
    95% critical flag — the first sanity check of any experiment
    readout, and exactly reproducible from the assignment hash.  One
    distinct shuffle, then arithmetic on the per-type frame."""
    armed = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_type",
            "user_id",
            (hash_bucket(F.col("user_id"), SRM_SEED) % 2)
            .cast("int")
            .alias("arm"),
        )
        .distinct()
    )
    counts = armed.groupBy("event_type").agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n_b"),
    )
    chi2 = (
        (F.col("n_a") - F.col("n_b"))
        * (F.col("n_a") - F.col("n_b"))
        / (F.col("n_a") + F.col("n_b"))
    )
    return counts.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        stable_round(chi2, 6).alias("chi2"),
        (chi2 > CHI2_95).alias("srm_flag"),
    )
