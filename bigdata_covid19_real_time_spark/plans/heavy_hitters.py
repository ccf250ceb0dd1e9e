"""Heavy-hitters sketch query: Spark 4's ``approx_top_k`` over the
event stream — the mergeable frequent-items sketch that replaces a full
groupBy + global sort at 100 TB.

Gate shape follows ``daily_event_summary_sketch``: sketch internals are
engine-specific, so the oracle checks the sketch's CONTRACT — here the
returned counts must be exact (``max_items_tracked`` exceeds the
distinct-key cardinality at every test SF, where the summary degrades
to exact counting) and form the true top-k count multiset.  The item
ids themselves are excluded from the projection: under count TIES at
the k boundary the member SET is tie-arbitrary in any engine, while the
count multiset is unique — hashing the counts gates everything that is
deterministic about the answer.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query
from bigdata_covid19_real_time_spark.sources.batch import load_table

K = 20


@query(
    "events_user_heavy_hitters",
    oracle=f"""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n FROM events
      WHERE user_id IS NOT NULL GROUP BY 1
    ),
    top AS (SELECT n FROM c ORDER BY n DESC LIMIT {K})
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC) AS INTEGER) AS pos,
           CAST(n AS BIGINT) AS hh_count,
           TRUE AS count_is_exact,
           TRUE AS in_true_topk
    FROM top
    """,
)
def events_user_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by event volume via the ``approx_top_k`` sketch
    (single-pass, mergeable — no groupBy-then-global-sort).  The exact
    per-user counts run alongside purely as the verification harness
    (the sketch's counts must match them, and every returned count must
    reach the true 20th-highest count); at 100 TB you run only the
    sketch half."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    hh = (
        events.agg(F.expr(f"approx_top_k(user_id, {K}, 65536)").alias("hh"))
        .select(F.explode("hh").alias("e"))
        .select(F.col("e.item").alias("user_id"), F.col("e.count").alias("hh_count"))
    )
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("__exact"))
    kth = F.broadcast(
        exact.select("__exact")
        .orderBy(F.desc("__exact"))
        .limit(K)
        .agg(F.min("__exact").alias("__kth"))
    )
    return (
        hh.join(exact, "user_id")
        .crossJoin(kth)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("hh_count"), F.asc("user_id")))
            .cast("int")
            .alias("pos"),
            F.col("hh_count").cast("long").alias("hh_count"),
            (F.col("hh_count") == F.col("__exact")).alias("count_is_exact"),
            (F.col("hh_count") >= F.col("__kth")).alias("in_true_topk"),
        )
    )


#: Sketch-regime configuration for ``events_skewed_heavy_hitters_sketch``:
#: ``max_items_tracked`` is deliberately far BELOW key cardinality at
#: every test SF (distinct keys ~750 / ~7.5k / ~75k at sf0.001/0.01/0.1
#: vs 256 tracked), so the sketch genuinely purges and approximates —
#: the regime the sibling query above never reaches.  The error-bound
#: constant 3.5/M is the published DataSketches frequent-items epsilon
#: (the sketch behind Spark's ``approx_top_k``); observed errors are
#: ~10x inside it, so the gate boolean is loose enough to be stable and
#: tight enough that a broken sketch (garbage counts) trips it.
SKETCH_M = 256


@query(
    "events_skewed_heavy_hitters_sketch",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN event_id % 4 = 0
                  THEN 'hot_' || CAST(user_id % 4 AS VARCHAR)
                  ELSE 'cold_' || CAST(event_id AS VARCHAR) END AS k
      FROM events WHERE event_id IS NOT NULL AND user_id IS NOT NULL
    ),
    c AS (SELECT k, COUNT(*) AS n FROM base GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM base),
    heavy AS (
      SELECT k, n FROM c CROSS JOIN tot WHERE n * 32 >= total
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, k ASC) AS INTEGER)
             AS pos,
           TRUE AS is_true_heavy,
           TRUE AS count_within_bound
    FROM heavy
    """,
)
def events_skewed_heavy_hitters_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``approx_top_k`` in its APPROXIMATING regime: a derived key space
    with ~0.75·N unique cold keys (far above ``SKETCH_M=256`` tracked
    slots, so the sketch purges constantly) plus 4 hot keys at ~N/16
    occurrences each.  The sketch half is the 100 TB plan; the exact
    count runs alongside purely as the verification harness.  Projected
    contract booleans (the item estimates themselves are
    partitioning-dependent in a purging sketch, so they stay out of the
    hash): every returned above-threshold item is a TRUE heavy key
    (no false positives), every true heavy key is returned (no false
    negatives — one output row per true heavy, matched by the oracle's
    row count), and each estimate is within the DataSketches epsilon
    3.5·N/M of the exact count."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull() & F.col("user_id").isNotNull()
    )
    keyed = events.select(
        F.when(
            F.col("event_id") % 4 == 0,
            F.concat(F.lit("hot_"), (F.col("user_id") % 4).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold_"), F.col("event_id").cast("string")))
        .alias("k")
    )
    hh = (
        keyed.agg(F.expr(f"approx_top_k(k, 10, {SKETCH_M})").alias("hh"))
        .select(F.explode("hh").alias("e"))
        .select(F.col("e.item").alias("k"), F.col("e.count").alias("est"))
    )
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("__exact"))
    tot = F.broadcast(keyed.agg(F.count(F.lit(1)).alias("__total")))
    return (
        hh.crossJoin(tot)
        # above-threshold filter: hot keys sit at ~N/16, cold estimates
        # are bounded by 1 + 3.5·N/M ≈ 0.015·N < N/32 — so the filter
        # deterministically keeps exactly the true heavy keys
        .filter(F.col("est") * 32 >= F.col("__total"))
        .join(exact, "k")
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("__exact"), F.asc("k")))
            .cast("int")
            .alias("pos"),
            F.col("k").startswith("hot_").alias("is_true_heavy"),
            (
                F.abs(F.col("est") - F.col("__exact"))
                <= F.ceil(F.lit(3.5) * F.col("__total") / F.lit(SKETCH_M))
            ).alias("count_within_bound"),
        )
    )
