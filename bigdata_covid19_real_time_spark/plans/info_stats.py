"""Distribution-audit and feature-statistics queries: lag-k
autocorrelation, Benford leading-digit audit, smoothed target encoding,
categorical mutual information, Gini revenue concentration, and an
equi-width histogram.

These extend the analytics/drift family (SURVEY.md §2 extension brief)
with the checks a feature-engineering or data-quality pipeline runs
before trusting a column.  The reference engine has no counterpart
operators (its analytics end at windowed rollups,
``covid_streaming.py:120-180``) — this is net-new surface on the same
tables.

All six queries are exactly SQL-expressible, so each carries a full
DuckDB oracle.  Scale shapes (see ``operators/infostats.py`` for the
helper-level analysis):

- ``events_daily_autocorr``: one fact-table shuffle (the per-day
  groupBy); the lag windows run over the tiny (type x day) frame.
- ``orders_benford_audit``: one map-side-combinable digit groupBy; the
  9-row result joins the grand total as a broadcast.
- ``nation_order_target_encoding``: orders->customer shuffle join on
  the customer key, nation as a broadcast, global mean as a broadcast
  1-row aggregate — the canonical smoothed-mean-encoding shape.
- ``events_type_dow_mutual_info``: ONE events shuffle; everything else
  re-aggregates the contingency table (ReuseExchange serves all
  branches).
- ``nation_customer_gini``: per-nation ranked window over one row per
  customer; spillable sort, output one row per nation.
- ``lineitem_qty_histogram``: one groupBy to bucket counts; share and
  cumulative-share windows run over the ~30-row bucket frame.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.infostats import (
    autocorr_by_group,
    gini_by_group,
    kaplan_meier,
    leading_digit,
    mutual_info_by_x,
    woe_iv,
)
from bigdata_covid19_real_time_spark.operators.text import tokens
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Smoothing pseudo-count for the target encoder (in orders).
TE_SMOOTHING = 50

#: Equi-width histogram bucket width (quantity units).
QTY_BUCKET = 5


@query(
    "events_daily_autocorr",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, CAST(cnt AS DOUBLE) AS v,
             LAG(CAST(cnt AS DOUBLE), 1) OVER w AS l1,
             LAG(CAST(cnt AS DOUBLE), 7) OVER w AS l7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(CORR(v, l1) + 1e-9, 4) AS ac_lag1,
           ROUND(CORR(v, l7) + 1e-9, 4) AS ac_lag7
    FROM lagged GROUP BY 1
    """,
)
def events_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of each event type's daily count
    series — the "does this series carry daily/weekly memory" feature a
    forecasting pipeline derives before model choice.  Lags are in
    observed days (the synthetic series is dense, so observed ==
    calendar here)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    ac = autocorr_by_group(daily, "event_type", "d", "cnt", [1, 7])
    return ac.select(
        "event_type",
        "n_points",
        stable_round(F.col("ac_lag1"), 4).alias("ac_lag1"),
        stable_round(F.col("ac_lag7"), 4).alias("ac_lag7"),
    )


@query(
    "orders_benford_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS lead_digit
      FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
    ),
    obs AS (SELECT lead_digit, COUNT(*) AS n FROM digits GROUP BY 1),
    tot AS (SELECT SUM(n) AS n_tot FROM obs)
    SELECT lead_digit,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / n_tot + 1e-9, 6) AS obs_share,
           ROUND(LN(1.0 + 1.0 / lead_digit) / LN(10.0) + 1e-9, 6)
             AS benford_share,
           ROUND(POW(n - n_tot * (LN(1.0 + 1.0 / lead_digit) / LN(10.0)), 2)
                 / (n_tot * (LN(1.0 + 1.0 / lead_digit) / LN(10.0)))
                 + 1e-9, 4) AS chi_contrib
    FROM obs CROSS JOIN tot
    """,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed leading-digit
    shares vs the log10(1 + 1/d) expectation, with per-digit chi-square
    contributions (sum them for the 8-dof test statistic).  Fabricated
    or clipped money columns jump out here long before a model does.
    Digit extraction stays in the integer domain (`leading_digit`) to
    dodge cross-engine floor(log10(x)) boundary FP."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 0)
    )
    obs = orders.select(
        leading_digit(F.col("o_totalprice")).alias("lead_digit")
    ).groupBy("lead_digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("n_tot"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("lead_digit")) / F.log(
        F.lit(10.0)
    )
    exp_n = F.col("n_tot") * benford
    return obs.crossJoin(F.broadcast(tot)).select(
        "lead_digit",
        F.col("n").cast("long").alias("n"),
        stable_round(F.col("n") / F.col("n_tot"), 6).alias("obs_share"),
        stable_round(benford, 6).alias("benford_share"),
        stable_round(F.pow(F.col("n") - exp_n, 2) / exp_n, 4).alias(
            "chi_contrib"
        ),
    )


@query(
    "nation_order_target_encoding",
    oracle=f"""
    WITH g AS (SELECT AVG(o_totalprice) AS gmean FROM orders),
    per_nation AS (
      SELECT n.n_name, COUNT(*) AS n_orders, SUM(o.o_totalprice) AS s
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT n_name,
           CAST(n_orders AS BIGINT) AS n_orders,
           ROUND(s / n_orders + 1e-9, 4) AS raw_mean,
           ROUND((s + {TE_SMOOTHING} * g.gmean)
                 / (n_orders + {TE_SMOOTHING}) + 1e-9, 4) AS encoded_mean,
           ROUND({TE_SMOOTHING} * 1.0 / (n_orders + {TE_SMOOTHING}) + 1e-9, 6)
             AS shrinkage
    FROM per_nation CROSS JOIN g
    """,
)
def nation_order_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean (target) encoding of customer nation against order
    value: enc = (sum + m*global_mean) / (n + m) with pseudo-count
    m=50 — the standard leakage-resistant categorical encoder.  Orders
    join customers on the customer key (both sides shuffle-partitioned
    on it); nation and the 1-row global mean enter as broadcasts."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    g = orders.agg(F.avg("o_totalprice").alias("gmean"))
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("s"),
        )
    )
    m = F.lit(float(TE_SMOOTHING))
    return per_nation.crossJoin(F.broadcast(g)).select(
        "n_name",
        F.col("n_orders").cast("long").alias("n_orders"),
        stable_round(F.col("s") / F.col("n_orders"), 4).alias("raw_mean"),
        stable_round(
            (F.col("s") + m * F.col("gmean")) / (F.col("n_orders") + m), 4
        ).alias("encoded_mean"),
        stable_round(m / (F.col("n_orders") + m), 6).alias("shrinkage"),
    )


@query(
    "events_type_dow_mutual_info",
    # dow parity: Spark dayofweek() is 1=Sunday..7, DuckDB's
    # date_part('dow') is 0=Sunday..6 — the Spark side subtracts 1
    # (same convention as events_dow_seasonality).
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    joint AS (SELECT event_type, dow, COUNT(*) AS n_xy FROM ev GROUP BY 1, 2),
    xm AS (SELECT event_type, SUM(n_xy) AS n_x FROM joint GROUP BY 1),
    ym AS (SELECT dow, SUM(n_xy) AS n_y FROM joint GROUP BY 1),
    tot AS (SELECT SUM(n_xy) AS n_tot FROM joint)
    SELECT j.event_type,
           CAST(MAX(x.n_x) AS BIGINT) AS n_events,
           ROUND(SUM((j.n_xy * 1.0 / t.n_tot)
                     * LN(j.n_xy * 1.0 * t.n_tot / (x.n_x * y.n_y)))
                 + 1e-9, 6) AS mi_contrib
    FROM joint j
    JOIN xm x ON j.event_type = x.event_type
    JOIN ym y ON j.dow = y.dow
    CROSS JOIN tot t
    GROUP BY 1
    """,
)
def events_type_dow_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type contribution to the mutual information between
    event type and day-of-week (nats; dataset MI = sum over types).
    Near-zero everywhere means weekday carries no signal for that type
    — the feature-selection question answered with ONE events shuffle
    (the contingency groupBy); marginals reuse that exchange."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "event_type", (F.dayofweek("ts") - F.lit(1)).alias("dow")
    )
    mi = mutual_info_by_x(ev, "event_type", "dow")
    return mi.select(
        "event_type",
        "n_events",
        stable_round(F.col("mi_contrib"), 6).alias("mi_contrib"),
    )


@query(
    "nation_customer_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(o_totalprice) AS r
      FROM orders GROUP BY 1
    ),
    units AS (
      SELECT n.n_name, c.c_custkey, COALESCE(rev.r, 0.0) AS x
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN rev ON rev.o_custkey = c.c_custkey
    ),
    ranked AS (
      SELECT n_name, x,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY x, c_custkey) AS i
      FROM units
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_units,
           ROUND(SUM(x) + 1e-9, 2) AS total,
           ROUND(CASE WHEN SUM(x) > 0
                 THEN 2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
                      - (COUNT(*) + 1.0) / COUNT(*)
                 END + 1e-9, 4) AS gini
    FROM ranked GROUP BY 1
    """,
)
def nation_customer_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order-revenue concentration across customers
    within each nation (customers with no orders count as zero-revenue
    units).  0 = revenue spread evenly, ->1 = one customer holds it
    all.  Rank-identity form — no pairwise O(n^2) differences; the only
    per-nation cost is one spillable ranked window over one row per
    customer."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    units = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(rev, cust.c_custkey == rev.o_custkey, "left")
        .select(
            "n_name",
            "c_custkey",
            F.coalesce(F.col("r"), F.lit(0.0)).alias("x"),
        )
    )
    g = gini_by_group(units, "n_name", "x", "c_custkey")
    return g.select(
        "n_name",
        "n_units",
        stable_round(F.col("total"), 2).alias("total"),
        stable_round(F.col("gini"), 4).alias("gini"),
    )


@query(
    "lineitem_qty_histogram",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag,
             CAST(FLOOR((l_quantity - 1) / {QTY_BUCKET}) AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity >= 1
      GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(bucket * {QTY_BUCKET} + 1 AS BIGINT) AS bucket_lo,
           CAST(bucket * {QTY_BUCKET} + {QTY_BUCKET} AS BIGINT) AS bucket_hi,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY l_returnflag) + 1e-9, 6)
             AS share,
           ROUND(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bucket
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
                 * 1.0 / SUM(n) OVER (PARTITION BY l_returnflag) + 1e-9, 6)
             AS cum_share
    FROM b
    """,
)
def lineitem_qty_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of line-item quantity (width-5 buckets) per
    return flag, with per-bucket share and cumulative share — the
    distribution-sketch complement to the equi-depth
    ``docs_length_deciles``.  One map-side-combinable groupBy collapses
    the fact table; the share/cumulative windows run over the ~30-row
    bucket frame."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & (F.col("l_quantity") >= 1)
    )
    b = li.groupBy(
        "l_returnflag",
        F.floor((F.col("l_quantity") - 1) / QTY_BUCKET).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    flag_tot = Window.partitionBy("l_returnflag")
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return b.select(
        "l_returnflag",
        (F.col("bucket") * QTY_BUCKET + 1).cast("long").alias("bucket_lo"),
        (F.col("bucket") * QTY_BUCKET + QTY_BUCKET)
        .cast("long")
        .alias("bucket_hi"),
        F.col("n").cast("long").alias("n"),
        stable_round(F.col("n") / F.sum("n").over(flag_tot), 6).alias("share"),
        stable_round(
            F.sum("n").over(cum) / F.sum("n").over(flag_tot), 6
        ).alias("cum_share"),
    )


#: Minimum corpus support for a bigram to be a PMI collocation candidate.
PMI_MIN_SUPPORT = 3

#: Collocation report size.
PMI_TOP_K = 50


@query(
    "orders_fulfillment_survival",
    oracle="""
    WITH subj AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(MAX(l.l_shipdate) AS DATE)) AS t,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderstatus,
               o.o_orderdate
    ),
    tal AS (
      SELECT o_orderpriority, t, SUM(ev) AS d, SUM(1 - ev) AS c
      FROM subj GROUP BY 1, 2
    ),
    step AS (
      SELECT o_orderpriority, t, d, c,
             SUM(d + c) OVER (PARTITION BY o_orderpriority)
             - COALESCE(SUM(d + c) OVER (
                 PARTITION BY o_orderpriority ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM tal
    ),
    km AS (
      SELECT o_orderpriority, t, d, c, n_risk,
             CASE WHEN d < n_risk THEN LN(1.0 - d * 1.0 / n_risk)
                  ELSE 0.0 END AS term,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
               PARTITION BY o_orderpriority ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
      FROM step
    )
    SELECT o_orderpriority, CAST(t AS BIGINT) AS t,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(c AS BIGINT) AS c_censored,
           ROUND(CASE WHEN dead = 1 THEN 0.0
                 ELSE EXP(SUM(term) OVER (
                   PARTITION BY o_orderpriority ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 END + 1e-9, 6) AS survival
    FROM km
    """,
)
def orders_fulfillment_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve of order fulfillment time per priority class:
    duration = days from order date to last line-item shipment, with
    non-finalized orders (status != 'F') right-censored at their last
    observed shipment.  The product-limit estimator runs as
    exp(cumulative-sum(ln(1 - d/n))) — a window SUM, since a window
    PRODUCT isn't a built-in — with S(t) pinned to exactly 0 from the
    first time the whole risk set dies (``operators/infostats.py:
    kaplan_meier``).  One orders-lineitem shuffle join feeds the
    subject frame; everything after runs on the tiny (priority x
    duration) tally."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    subj = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey", "o_orderpriority", "o_orderstatus", "o_orderdate"
        )
        .agg(F.max("l_shipdate").alias("__ship"))
        .select(
            "o_orderpriority",
            F.datediff("__ship", "o_orderdate").alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
        )
    )
    km = kaplan_meier(subj, "o_orderpriority", "t", "ev")
    return km.select(
        "o_orderpriority",
        "t",
        "n_risk",
        "d_events",
        "c_censored",
        stable_round(F.col("survival"), 6).alias("survival"),
    )


@query(
    "brand_return_woe",
    oracle="""
    WITH j AS (
      SELECT p.p_brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    per_cat AS (
      SELECT p_brand, COUNT(*) AS n, SUM(bad) AS n_bad FROM j GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n_bad) AS bad_tot, SUM(n - n_bad) AS good_tot FROM per_cat
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n,
           CAST(n_bad AS BIGINT) AS n_bad,
           ROUND(n_bad * 1.0 / bad_tot + 1e-9, 6) AS bad_share,
           ROUND((n - n_bad) * 1.0 / good_tot + 1e-9, 6) AS good_share,
           ROUND(CASE WHEN n_bad > 0 AND n - n_bad > 0
                 THEN LN((n_bad * 1.0 / bad_tot)
                         / ((n - n_bad) * 1.0 / good_tot)) END
                 + 1e-9, 6) AS woe,
           ROUND(CASE WHEN n_bad > 0 AND n - n_bad > 0
                 THEN (n_bad * 1.0 / bad_tot - (n - n_bad) * 1.0 / good_tot)
                      * LN((n_bad * 1.0 / bad_tot)
                           / ((n - n_bad) * 1.0 / good_tot)) END
                 + 1e-9, 8) AS iv_contrib
    FROM per_cat CROSS JOIN tot
    """,
)
def brand_return_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence scorecard of part brand against the
    line-item-returned target (l_returnflag = 'R'): per-brand WoE
    log-odds and information-value contribution (sum = the feature's
    IV).  The credit-scoring-style categorical relevance stat that
    complements ``nation_order_target_encoding``'s mean encoding.  One
    lineitem-part join and ONE category shuffle; class totals are
    window sums over the 25-row brand frame
    (``operators/infostats.py:woe_iv``)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand", (F.col("l_returnflag") == "R").alias("__bad")
    )
    w = woe_iv(j, "p_brand", F.col("__bad"))
    return w.select(
        "p_brand",
        "n",
        "n_bad",
        stable_round(F.col("bad_share"), 6).alias("bad_share"),
        stable_round(F.col("good_share"), 6).alias("good_share"),
        stable_round(F.col("woe"), 6).alias("woe"),
        stable_round(F.col("iv_contrib"), 8).alias("iv_contrib"),
    )


@query(
    "docs_bigram_pmi",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents
    ),
    pairs AS (
      SELECT tk[u.i] AS w1, tk[u.i + 1] AS w2
      FROM toks, unnest(range(1, len(tk))) AS u(i)
      WHERE len(tk) >= 2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY 1, 2),
    alltoks AS (SELECT u.x AS term FROM toks, unnest(tk) AS u(x)),
    uni AS (SELECT term, COUNT(*) AS c1 FROM alltoks GROUP BY 1),
    tot AS (SELECT SUM(c1) AS n FROM uni)
    SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
           ROUND(LN(n_pair * 1.0 * t.n / (u1.c1 * u2.c1)) + 1e-9, 6) AS pmi
    FROM c12
    JOIN uni u1 ON u1.term = c12.w1
    JOIN uni u2 ON u2.term = c12.w2
    CROSS JOIN tot t
    WHERE n_pair >= {PMI_MIN_SUPPORT}
    ORDER BY pmi DESC, w1, w2
    LIMIT {PMI_TOP_K}
    """,
)
def docs_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information: corpus bigrams
    with support >= {PMI_MIN_SUPPORT}, scored ln(c12 * N / (c1 * c2))
    — the classic collocation miner (Church & Hanks) a tokenizer
    pipeline uses to pick merge-worthy phrases.  Two corpus explodes
    (pair counts + unigram marginals — an honest two-pass; persisting
    the token frame would trade memory for the second scan), two
    term-keyed joins, broadcast total.  The top-k cut sorts on the
    ROUNDED score (both engines), so cross-engine libm noise in ln
    cannot flip the boundary; ties break lexicographically, and Spark
    plans it as TakeOrderedAndProject (no global sort)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(tokens("text").alias("__t"))
    pairs = (
        toks.filter(F.size("__t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - 1),
                    lambda i: F.struct(
                        F.element_at("__t", i).alias("w1"),
                        F.element_at("__t", i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    c12 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= PMI_MIN_SUPPORT)
    )
    uni = (
        toks.select(F.explode("__t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    tot = uni.agg(F.sum("c1").alias("n"))
    scored = (
        c12.join(uni.select(F.col("term").alias("w1"), F.col("c1").alias("__c1w1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c1").alias("__c1w2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            stable_round(
                F.log(
                    F.col("n_pair")
                    * F.lit(1.0)
                    * F.col("n")
                    / (F.col("__c1w1") * F.col("__c1w2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(PMI_TOP_K)
