"""Mining batch: Theil-Sen robust trend estimation and item-item
collaborative-filtering similarity.

Extends the trend and similarity families (SURVEY.md §2 extension
brief): Theil-Sen is the outlier-robust sibling of the OLS trend pair
(``covid_trend_ols`` / ``plans/temporal.py``) — a single wild day
cannot move the median-of-slopes the way it drags a least-squares fit
— and item-CF cosine over customer purchase profiles is the
collaborative-filtering primitive next to ``brand_pair_affinity``'s
count-based lift (continuous quantity profiles vs binary
co-occurrence).

Scale shapes:

- ``events_theilsen_trend``: the fact collapses ONCE to the per-(type,
  day) frame; the pairwise slope grid self-joins THAT collapsed frame
  (days^2 per type, bounded by the calendar — 30 days = 435 pairs),
  never raw events.  The median is an exact percentile over the
  bounded slope frame; the intercept re-joins the 1-row-per-type
  median slope by broadcast.
- ``brand_item_cf_similarity``: the classic item-CF shape — one
  shuffle to the (customer, item, qty) matrix, a customer-key
  self-join that fans out to items-per-customer^2 rows per customer
  (the standard cap point at 100 TB: bound items per user or sample
  heavy users), then a (item, item) rollup; norms broadcast.  The
  min-common-customers floor keeps noise pairs out of the output.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Minimum co-purchasing customers for a CF pair to be reported.
CF_MIN_COMMON = 5


@query(
    "events_theilsen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(value) AS y
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, y,
             date_diff('day', MIN(d) OVER (PARTITION BY event_type), d) AS x
      FROM daily
    ),
    slopes AS (
      SELECT a.event_type, (b.y - a.y) * 1.0 / (b.x - a.x) AS m
      FROM idx a JOIN idx b
        ON b.event_type = a.event_type AND b.x > a.x
    ),
    ts AS (
      SELECT event_type, COUNT(*) AS n_pairs,
             quantile_cont(m, 0.5) AS slope
      FROM slopes GROUP BY 1
    ),
    resid AS (
      SELECT i.event_type, COUNT(*) AS n_days,
             quantile_cont(i.y - ts.slope * i.x, 0.5) AS intercept
      FROM idx i JOIN ts ON ts.event_type = i.event_type
      GROUP BY 1
    )
    SELECT ts.event_type,
           CAST(resid.n_days AS BIGINT) AS n_days,
           CAST(ts.n_pairs AS BIGINT) AS n_pairs,
           ROUND(ts.slope + 1e-9, 6) AS theilsen_slope,
           ROUND(resid.intercept + 1e-9, 4) AS intercept
    FROM ts JOIN resid ON resid.event_type = ts.event_type
    """,
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the MEDIAN of all
    pairwise day-to-day slopes of the daily value total, with the
    matching median-residual intercept — a 29.3%-breakdown estimator
    (one wild day cannot drag it the way it drags OLS;
    ``covid_trend_ols`` is the least-squares sibling).  The pairwise
    grid self-joins the COLLAPSED per-day frame (days^2 per type,
    calendar-bounded), never raw events; medians are exact percentiles
    over that bounded frame."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum("value").alias("y"))
    )
    idx = daily.select(
        "event_type",
        "y",
        F.datediff(
            "d", F.min("d").over(Window.partitionBy("event_type"))
        ).alias("x"),
    )
    a = idx.select("event_type", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = idx.select(
        F.col("event_type").alias("et_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    slopes = a.join(
        b,
        (F.col("event_type") == F.col("et_b")) & (F.col("xb") > F.col("xa")),
    ).select(
        "event_type",
        ((F.col("yb") - F.col("ya")) * F.lit(1.0) / (F.col("xb") - F.col("xa"))).alias(
            "m"
        ),
    )
    ts = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(m, 0.5)").alias("slope"),
    )
    resid = (
        idx.join(F.broadcast(ts.select("event_type", "slope")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.expr("percentile(y - slope * x, 0.5)").alias("intercept"),
        )
    )
    return ts.join(resid, "event_type").select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        stable_round(F.col("slope"), 6).alias("theilsen_slope"),
        stable_round(F.col("intercept"), 4).alias("intercept"),
    )


@query(
    "brand_item_cf_similarity",
    oracle=f"""
    WITH mat AS (
      SELECT o.o_custkey AS cust, p.p_brand AS brand,
             SUM(l.l_quantity) AS q
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    norms AS (SELECT brand, sqrt(SUM(q * q)) AS nrm FROM mat GROUP BY 1),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             COUNT(*) AS n_common, SUM(a.q * b.q) AS dot
      FROM mat a JOIN mat b
        ON b.cust = a.cust AND a.brand < b.brand
      GROUP BY 1, 2 HAVING COUNT(*) >= {CF_MIN_COMMON}
    )
    SELECT brand_a, brand_b, CAST(n_common AS BIGINT) AS n_common,
           ROUND(dot / (na.nrm * nb.nrm) + 1e-9, 6) AS cosine
    FROM pairs
    JOIN norms na ON na.brand = pairs.brand_a
    JOIN norms nb ON nb.brand = pairs.brand_b
    """,
)
def brand_item_cf_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity: cosine between
    brands' customer-quantity profiles — the "customers who buy A buy
    B" primitive behind co-purchase recommenders
    (``brand_pair_affinity`` is the count-based lift sibling; this
    weighs HOW MUCH each shared customer buys).  Classic item-CF
    shape: one shuffle to the (customer, brand, qty) matrix, a
    customer-key self-join (fan-out = brands-per-customer^2, the
    documented cap point at 100 TB scale), an (a, b) rollup, broadcast
    norms.  Pairs below {CF_MIN_COMMON} common customers are noise and
    dropped."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    mat = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("brand"))
        .agg(F.sum("l_quantity").alias("q"))
    )
    norms = F.broadcast(
        mat.groupBy("brand").agg(F.sqrt(F.sum(F.col("q") * F.col("q"))).alias("nrm"))
    )
    a = mat.select("cust", F.col("brand").alias("brand_a"), F.col("q").alias("qa"))
    b = mat.select(
        F.col("cust").alias("cust_b"),
        F.col("brand").alias("brand_b"),
        F.col("q").alias("qb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("cust") == F.col("cust_b"))
            & (F.col("brand_a") < F.col("brand_b")),
        )
        .groupBy("brand_a", "brand_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.col("qa") * F.col("qb")).alias("dot"),
        )
        .filter(F.col("n_common") >= CF_MIN_COMMON)
    )
    na = norms.select(F.col("brand").alias("brand_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("brand").alias("brand_b"), F.col("nrm").alias("nb"))
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.col("n_common").cast("long").alias("n_common"),
            stable_round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
    )
