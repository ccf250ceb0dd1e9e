"""Closed-form statistical fits and cohort economics: Zipf
rank-frequency slope, Welch two-sample tests, and a cohort LTV curve.

Extends the analytics family (SURVEY.md §2 extension brief — the
reference's analytics end at windowed rollups,
``covid_streaming.py:120-180``) with the model-fit diagnostics a
corpus/product pipeline computes without any iterative solver: every
estimator here is a closed-form expression over mergeable moments, so
each query is exactly SQL-expressible and carries a full DuckDB oracle.

Scale shapes:

- ``docs_zipf_fit``: one token-explode groupBy collapses the corpus to
  a (lang, term) count frame; ranking and the log-log OLS run on the
  top-``ZIPF_TOP_TERMS`` slice per language.  The rank window sorts
  only the collapsed vocabulary, never corpus tokens.
- ``event_value_welch``: ONE fact shuffle to per-type moments (n, Σx,
  Σx²); the pairwise Welch grid is a self-join of the |types|-row
  frame.  No raw value ever crosses the pair join.
- ``cohort_ltv_curve``: first-order month per customer (one orders
  shuffle on the customer key), re-joined to orders on that same key
  (AQE co-partitions), then the (cohort, age) rollup; the cumulative
  window runs over the ~months² grid.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.text import tokens
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Vocabulary slice the Zipf log-log line is fitted on (per language).
ZIPF_TOP_TERMS = 1000


@query(
    "docs_zipf_fit",
    oracle=f"""
    WITH toks AS (
      SELECT lang, u.x AS term
      FROM (SELECT lang, string_split(trim(text), ' ') AS tk
            FROM documents WHERE lang IS NOT NULL), unnest(tk) AS u(x)
    ),
    tf AS (SELECT lang, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    ranked AS (
      SELECT lang, c,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY c DESC, term ASC) AS r
      FROM tf
    ),
    pts AS (
      SELECT lang, LN(r * 1.0) AS x, LN(c * 1.0) AS y
      FROM ranked WHERE r <= {ZIPF_TOP_TERMS}
    ),
    m AS (
      SELECT lang, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pts GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) + 1e-9, 4)
             AS zipf_slope,
           ROUND((sy - sx * (n * sxy - sx * sy) / (n * sxx - sx * sx)) / n
                 + 1e-9, 4) AS intercept,
           ROUND(POW(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) + 1e-9, 6)
             AS r2
    FROM m WHERE n >= 10
    """,
)
def docs_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit per language: OLS slope of ln(freq) on
    ln(rank) over the top-1000 vocabulary — natural text sits near
    slope -1; template/generated corpora drift flat or steep, making
    this a one-row-per-language corpus-health diagnostic.  The fit is
    closed-form from six moments; only the collapsed vocabulary is
    ever ranked."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
    )
    tf = (
        docs.select("lang", F.explode(tokens("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("term").asc())
    pts = (
        tf.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= ZIPF_TOP_TERMS)
        .select(
            "lang",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    m = pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).filter(F.col("n") >= 10)
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "lang",
        F.col("n").cast("long").alias("n_terms"),
        stable_round(slope, 4).alias("zipf_slope"),
        stable_round((F.col("sy") - F.col("sx") * slope) / F.col("n"), 4).alias(
            "intercept"
        ),
        stable_round(
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )


@query(
    "event_value_welch",
    oracle="""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n, SUM(value) AS s,
             SUM(value * value) AS ss
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.n AS na, b.n AS nb,
             a.s / a.n AS ma, b.s / b.n AS mb,
             (a.ss - a.s * a.s / a.n) / (a.n - 1) AS va,
             (b.ss - b.s * b.s / b.n) / (b.n - 1) AS vb
      FROM m a JOIN m b ON a.event_type < b.event_type
    )
    SELECT type_a, type_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(ma + 1e-9, 4) AS mean_a,
           ROUND(mb + 1e-9, 4) AS mean_b,
           ROUND((ma - mb) / SQRT(va / na + vb / nb) + 1e-9, 4) AS t_stat,
           ROUND(POW(va / na + vb / nb, 2)
                 / (POW(va / na, 2) / (na - 1) + POW(vb / nb, 2) / (nb - 1))
                 + 1e-9, 2) AS dof
    FROM pairs
    """,
)
def event_value_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic (unequal variances) for every pair
    of event types' value distributions, with Welch-Satterthwaite
    degrees of freedom — the A/B-test primitive.  One fact shuffle to
    per-type (n, Σx, Σx²) moments; the pair grid is a self-join of the
    |types|-row moment frame, so no raw value crosses the join."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    m = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    a = m.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        (F.col("s") / F.col("n")).alias("ma"),
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)).alias("va"),
    )
    b = m.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        (F.col("s") / F.col("n")).alias("mb"),
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)).alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            stable_round(F.col("ma"), 4).alias("mean_a"),
            stable_round(F.col("mb"), 4).alias("mean_b"),
            stable_round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 4).alias(
                "t_stat"
            ),
            stable_round(
                F.pow(se2, 2)
                / (
                    F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
                    + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
                ),
                2,
            ).alias("dof"),
        )
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH first AS (
      SELECT o_custkey,
             MIN(CAST(strftime(o_orderdate, '%Y') AS INT) * 12
                 + CAST(strftime(o_orderdate, '%m') AS INT)) AS m0
      FROM orders GROUP BY 1
    ),
    sizes AS (SELECT m0, COUNT(*) AS n_customers FROM first GROUP BY 1),
    aged AS (
      SELECT f.m0,
             CAST(strftime(o.o_orderdate, '%Y') AS INT) * 12
             + CAST(strftime(o.o_orderdate, '%m') AS INT) - f.m0 AS age,
             o.o_totalprice AS rev
      FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
    ),
    grid AS (
      SELECT m0, age, SUM(rev) AS revenue FROM aged GROUP BY 1, 2
    )
    SELECT CAST(CAST(FLOOR((g.m0 - 1) / 12.0) AS BIGINT) AS VARCHAR)
             || '-'
             || lpad(CAST(((g.m0 - 1) % 12) + 1 AS VARCHAR), 2, '0')
             AS cohort,
           CAST(g.age AS BIGINT) AS age_months,
           CAST(s.n_customers AS BIGINT) AS n_customers,
           ROUND(g.revenue + 1e-9, 2) AS revenue,
           ROUND(SUM(g.revenue) OVER (PARTITION BY g.m0 ORDER BY g.age
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / s.n_customers + 1e-9, 4) AS cum_ltv_per_customer
    FROM grid g JOIN sizes s ON s.m0 = g.m0
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curve by acquisition cohort: customers
    grouped by first-order month, revenue accumulated by cohort age in
    months, normalized per cohort customer — the retention-cohort
    query's revenue twin (``user_retention_cohorts`` counts activity;
    this sums value).  Cohort month arithmetic stays in integer
    year*12+month space (no cross-engine date truncation); the label
    renders from the integer, so both engines format identically."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("__m"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("__m").alias("m0"))
    sizes = first.groupBy("m0").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    grid = (
        orders.join(first, "o_custkey")
        .groupBy("m0", (F.col("__m") - F.col("m0")).alias("age"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    cum = (
        Window.partitionBy("m0")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mm = ((F.col("m0") - 1) % 12) + 1
    cohort_label = F.concat(
        F.floor((F.col("m0") - 1) / 12).cast("string"),
        F.lit("-"),
        F.lpad(mm.cast("string"), 2, "0"),
    )
    return grid.join(F.broadcast(sizes), "m0").select(
        cohort_label.alias("cohort"),
        F.col("age").cast("long").alias("age_months"),
        F.col("n_customers").cast("long").alias("n_customers"),
        stable_round(F.col("revenue"), 2).alias("revenue"),
        stable_round(
            F.sum("revenue").over(cum) / F.col("n_customers"), 4
        ).alias("cum_ltv_per_customer"),
    )
