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
