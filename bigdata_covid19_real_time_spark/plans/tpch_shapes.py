"""Classic decision-support join shapes (TPC-H Q4/Q7/Q8/Q9/Q13/Q15/Q16/Q21
analogues) adapted to the synthetic corpus schema.

The reference engine (covid_streaming.py) has no joins; SURVEY.md §2.4
records that its join surface is whatever Catalyst provides.  These
queries exercise the *hard* shapes of that inherited surface — the ones
whose physical plan quality decides whether a 100 TB run finishes:
correlated EXISTS (semi-join with a cross-table predicate), multi-fact
nation-pair flows, conditional-share ratios, the group-by-an-aggregate
histogram, global-argmax selection, distinct-count diversity with an
excluded-set anti-join, and the sole-late-supplier triple-correlation.

Shared scale rules (see also plans/relational.py):
- nation/region/supplier are broadcast at every SF (fixed-size dims);
  part/customer broadcast at test SFs and AQE decides at 100 TB;
- every fact-fact join shuffles once on the join key with partial
  aggregation collapsing map output first where an agg follows;
- correlated subqueries are expressed as semi/anti joins — never a
  per-row subquery plan;
- date arithmetic stays NTZ-safe (timestampadd on the column's own
  type) so parquet TIMESTAMP and TIMESTAMP_NTZ both work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: "Late" lineitem: shipped more than 60 days after its order date.
#: The corpus has no commit/receipt dates (TPC-H Q4/Q21 use those), so
#: lateness is defined against o_orderdate — same correlation shape.
_LATE_DAYS = 60


def _late_cond():
    return F.col("l_shipdate") > F.expr(f"timestampadd(DAY, {_LATE_DAYS}, o_orderdate)")


@query(
    "order_priority_pipeline",
    oracle=f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY)
    GROUP BY o_orderpriority
    """,
)
def order_priority_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders (one year) having at least one late lineitem,
    counted per priority.

    Scale: the EXISTS is a LEFT SEMI join on l_orderkey with the
    cross-table lateness predicate evaluated inside the join — one
    shuffle pair on the order key, lineitem pruned to (orderkey,
    shipdate) at the scan.  The date-range filter pushes into the
    orders scan and, at 100 TB, prunes partitions if orders is
    date-partitioned.  Output is ≤5 rows; the final agg is trivial.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    kept = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & _late_cond(),
        "left_semi",
    )
    return kept.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "nation_pair_trade",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INTEGER) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
       OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0')
    GROUP BY 1, 2, 3
    """,
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by year.

    Scale: the supplier-nation filter is applied *before* the fact-fact
    join — supplier⋈nation (both broadcast dims) filters lineitem down
    to the two nations' suppliers ahead of the l_orderkey shuffle, so
    the expensive exchange moves only qualifying rows.  The disjunctive
    pair predicate runs post-join on two broadcast-joined name columns.
    At 100 TB: lineitem⋈orders is the one big shuffle; customer joins
    orders on its natural key (AQE may broadcast the filtered side).
    """
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_0", "NATION_1"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    customer = load_table(spark, sf_dir, "customer").join(
        nation, F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1"))
            | ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "regional_market_share",
    oracle="""
    WITH region_orders AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_partkey,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             YEAR(o.o_orderdate) AS order_year
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT CAST(ro.order_year AS INTEGER) AS order_year,
           ROUND(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN ro.volume ELSE 0 END)
                 / SUM(ro.volume) + 1e-9, 6) AS mkt_share,
           ROUND(SUM(ro.volume) + 1e-9, 2) AS total_volume
    FROM region_orders ro
    JOIN part p     ON ro.l_partkey = p.p_partkey
    JOIN supplier s ON ro.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY 1
    """,
)
def regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_3's share of PROMO-part volume sold into
    ASIA, by order year — a conditional-sum ratio over a 6-way join.

    Scale: part is pre-filtered to PROMO before its (broadcast at test
    SF) join, so the fact rows drop ~6× before any wide exchange; the
    supplier→nation chain is all-broadcast; the customer-region filter
    reduces orders before the l_orderkey shuffle.  The share is two
    partial-aggregable sums — one shuffle on the ≤7-value year key.
    """
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp_nation = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_region = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    vol = F.col("volume")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            stable_round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            stable_round(F.sum(vol), 2).alias("total_volume"),
        )
    )


@query(
    "nation_profit_by_year",
    oracle="""
    SELECT n.n_name AS supp_nation,
           CAST(YEAR(l.l_shipdate) AS INTEGER) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.5 * p.p_retailprice * l.l_quantity) + 1e-9, 2) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on red parts per supplier nation and ship year
    (cost proxy 0.5×retailprice×qty — the corpus has no partsupp table).

    Scale: the %red% filter cannot push to parquet (infix match) but
    runs on the broadcast part dim, not the fact table; lineitem joins
    two broadcast dims and aggregates on a (25 × years) key — partial
    aggregation makes the single shuffle O(partitions × groups).
    """
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    supp_nation = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "supp_nation", F.year("l_shipdate").cast("int").alias("ship_year")
        )
        .agg(stable_round(F.sum(profit), 2).alias("profit"))
    )


@query(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY 1
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY 1
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: histogram of per-customer order counts (excluding
    5-LOW orders), customers with zero orders included — the
    group-by-an-aggregate double shuffle.

    Scale: shuffle 1 keys on c_custkey (LEFT join + count); shuffle 2
    re-keys the collapsed per-customer frame on its count — input to
    the second exchange is |customers| rows of two longs, and partial
    aggregation collapses it to O(distinct counts) per map task.  The
    priority filter lives in the join condition (nulls, not drops, on
    the probe side) exactly like Q13's comment filter.
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "top_revenue_suppliers",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(r.total_revenue + 1e-9, 2) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE ROUND(r.total_revenue + 1e-9, 2) =
          (SELECT MAX(ROUND(total_revenue + 1e-9, 2)) FROM revenue)
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) with the maximum quarterly revenue —
    global-argmax selection over an aggregate (ties all kept).

    Scale: revenue is one partial-aggregated shuffle on l_suppkey over
    a pushed-down 3-month scan.  The global max is NOT a single-
    partition window: the per-supplier frame aggregates to a 1-row max
    that broadcast-joins back (two tiny jobs instead of sorting all
    suppliers into one task).  The argmax compares cent-rounded revenue
    on BOTH engines: raw-float comparison lets two mathematically-tied
    suppliers (sums accumulated in different orders) differ in the last
    ulp and flip which rows the oracle keeps.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    best = F.broadcast(revenue.agg(F.max("total_revenue").alias("__max_rev")))
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        revenue.join(best, F.col("total_revenue") == F.col("__max_rev"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "part_supplier_diversity",
    oracle="""
    SELECT p.p_brand,
           CAST(FLOOR(p.p_size / 10.0) AS INTEGER) AS size_class,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    """,
)
def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, size class), excluding
    one brand and all negative-balance suppliers (the NOT IN set).

    The corpus has no partsupp table, so the part↔supplier relation is
    recovered from lineitem — same distinct-count-over-join shape.

    Scale: the NOT IN set is a broadcast anti-join (suppliers are a
    fixed-size dim; no null-key trap since s_suppkey is a PK), the part
    dim is a broadcast join with the brand filter applied dim-side, and
    countDistinct expands to a two-phase aggregate (distinct shuffle on
    (group, suppkey), then count) — both exchanges carry only keys.
    """
    bad_supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#1")
        .select(
            "p_partkey",
            "p_brand",
            F.floor(F.col("p_size") / 10).cast("int").alias("size_class"),
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "size_class")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "waiting_sole_late_supplier",
    oracle=f"""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
    )
    SELECT s.s_name, CAST(COUNT(DISTINCT lt.l_orderkey) AS BIGINT) AS numwait
    FROM late lt
    JOIN supplier s ON lt.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = lt.l_orderkey AND l2.l_suppkey <> lt.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = lt.l_orderkey AND l3.l_suppkey <> lt.l_suppkey)
    GROUP BY 1
    ORDER BY numwait DESC, s_name ASC
    LIMIT 10
    """,
)
def waiting_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the *only* late supplier on a
    finished multi-supplier order, ranked by how many orders they held up.

    Scale: the EXISTS / NOT-EXISTS pair is NOT two more self-joins — a
    single per-order aggregate computes (distinct suppliers, distinct
    late suppliers, the sole late suppkey via max-on-singleton), so the
    triple correlation costs one l_orderkey shuffle after the
    orders⋈lineitem join.  The qualifying-order frame is |orders|-sized
    and collapses again on suppkey; supplier names broadcast on at the
    end.  Top-10 is TakeOrderedAndProject.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    marked = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        _late_cond().alias("is_late"),
    )
    late_key = F.when(F.col("is_late"), F.col("l_suppkey"))
    per_order = marked.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(late_key).alias("n_late_supp"),
        F.max(late_key).alias("sole_late_suppkey"),
    )
    qualifying = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        qualifying.groupBy("sole_late_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supplier, F.col("sole_late_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


@query(
    "events_grouping_sets",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date,
           CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS events_count,
           ROUND(SUM(value) + 1e-9, 2) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (event_type), (CAST(ts AS DATE)))
    """,
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither a rollup nor a cube lattice):
    (type, day), (type), (day) — three aggregation grains in ONE
    Expand + hash-agg pass, with ``grouping_id`` disambiguating rows
    where a grouping column is NULL-because-aggregated vs NULL-in-data.

    Scale: one Expand (3x map-side rows) + one shuffle with partial
    aggregation — vs three separate scans+shuffles if the grains ran as
    separate queries; exactly the Catalyst feature a reporting layer
    should lean on.
    """
    from bigdata_covid19_real_time_spark.sources.batch import load_table as _lt

    events = _lt(spark, sf_dir, "events")
    typed = events.select(
        "event_type", F.col("ts").cast("date").alias("event_date"), "value"
    )
    return (
        typed.groupingSets(
            [["event_type", "event_date"], ["event_type"], ["event_date"]],
            "event_type",
            "event_date",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("events_count"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "event_type", "event_date", "gid", "events_count", "total_value"
        )
    )


@query(
    "events_user_skew_report",
    oracle="""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS key_rows FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(key_rows) AS total_rows FROM counts)
    SELECT user_id, CAST(key_rows AS BIGINT) AS key_rows,
           CAST(total_rows AS BIGINT) AS total_rows,
           ROUND(key_rows * 1.0 / total_rows + 1e-9, 6) AS share,
           CAST(ROW_NUMBER() OVER (ORDER BY key_rows DESC, user_id ASC) AS INTEGER) AS skew_rank
    FROM counts CROSS JOIN tot
    QUALIFY skew_rank <= 10
    """,
)
def events_user_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 10 heaviest user_id values and
    their row share (operators/skew.py::key_skew_report) — the input
    to the salting / broadcast / AQE decision the module documents."""
    from bigdata_covid19_real_time_spark.operators.skew import key_skew_report

    return key_skew_report(
        load_table(spark, sf_dir, "events"), ["user_id"], k=10
    )


@query(
    "customer_revenue_pareto",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT SUM(revenue) AS total FROM per_cust)
    SELECT o_custkey,
           ROUND(revenue + 1e-9, 2) AS revenue,
           CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, o_custkey ASC) AS INTEGER) AS revenue_rank,
           ROUND(SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / total + 1e-9, 6) AS cum_share
    FROM per_cust CROSS JOIN tot
    ORDER BY revenue_rank
    LIMIT 100
    """,
)
def customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / concentration curve: top-100 customers by revenue with
    their cumulative revenue share — the "top x% produce y%" analysis.

    Scale: revenue collapses per customer first (one partial-agg
    shuffle); the total is a broadcast 1-row frame; the cumulative
    window runs over the top-100 frame ONLY (TakeOrderedAndProject
    first, then the 100-row running sum) — never a single-partition
    window over all customers.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("revenue")
    )
    total = F.broadcast(per_cust.agg(F.sum("revenue").alias("__total")))
    top = (
        per_cust.orderBy(F.desc("revenue"), F.asc("o_custkey"))
        .limit(100)
        .join(total)
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    return (
        top.withColumn("revenue_rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "cum_share",
            stable_round(
                F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("__total"),
                6,
            ),
        )
        .select(
            "o_custkey",
            stable_round("revenue", 2).alias("revenue"),
            "revenue_rank",
            "cum_share",
        )
        .orderBy("revenue_rank")
    )


@query(
    "returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue,
           ROUND(c.c_acctbal + 1e-9, 2) AS c_acctbal
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY 1, 2, 3, 5
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: customers who returned the most merchandise in a
    half-year window — the "lost revenue" report.

    Scale: the returnflag + date filters push to the lineitem/orders
    scans before the l_orderkey shuffle; customer/nation dims broadcast
    at test SF (AQE decides at 100 TB); top-20 is
    TakeOrderedAndProject on the collapsed per-customer frame.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            stable_round("c_acctbal", 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "priority_shipping_punctuality",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(SUM(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count,
           CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def priority_shipping_punctuality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: on-time vs late lineitem counts per order priority —
    two conditional counts folding into ONE partial-aggregated pass
    over the joined fact (no separate scans per condition).

    Scale: one l_orderkey shuffle pair; both CASE sums collapse
    map-side; output is 5 rows.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = _late_cond()
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(~late, 1).otherwise(0)).alias("ontime_count"),
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
        )
    )


@query(
    "small_quantity_brand_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
)
def small_quantity_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost if small-quantity orders (below 20% of
    the part's average) stopped — the per-part correlated-average
    subquery.

    Scale: the correlated subquery plans as ONE per-part aggregate of
    the brand-filtered lineitem joined back on l_partkey — the brand
    filter (broadcast part dim) prunes the fact BEFORE both the
    aggregate and the join, so the threshold table is |brand parts|
    rows and broadcast-eligible; never a per-row subquery.
    """
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    thresholds = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("__qty_cut")
    )
    return (
        li.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("__qty_cut"))
        .agg(stable_round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "forecast_revenue_change",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount) + 1e-9, 2) AS revenue_increase,
           CAST(COUNT(*) AS BIGINT) AS qualifying_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: revenue forgone to mid-range discounts on small orders
    in one year — a pure scan-filter-aggregate with zero joins.

    Scale: the fastest shape the engine runs — every predicate pushes
    to the parquet scan (year range on l_shipdate, discount band,
    quantity), the projection reads 4 columns, and the aggregate is a
    map-side partial collapsing to one row per partition before a
    1-row shuffle.  The plan-quality canary: if this query shuffles
    anything but 32 partial rows, pushdown broke."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        stable_round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_increase"
        ),
        F.count(F.lit(1)).alias("qualifying_items"),
    )


@query(
    "min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             ROUND(AVG(l_extendedprice / l_quantity) + 1e-9, 4) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ),
    regional AS (
      SELECT c.partkey, c.suppkey, c.unit_cost
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, rg.unit_cost
    FROM regional rg
    JOIN part p ON p.p_partkey = rg.partkey AND p.p_size >= 40
    JOIN supplier s ON s.s_suppkey = rg.suppkey
    WHERE rg.unit_cost = (
      SELECT MIN(r2.unit_cost) FROM regional r2 WHERE r2.partkey = rg.partkey)
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each large part, the ASIA supplier(s) offering it
    at the minimum observed unit price — the correlated-MIN selection.
    The corpus has no partsupp, so the part-supplier cost relation is
    recovered as AVG(extendedprice/quantity) over lineitem.

    Scale: the correlated subquery becomes a per-part MIN aggregate
    joined back on (partkey, cost) — two passes over the small cost
    table, never a per-row subquery.  supplier/nation/region fold into
    one broadcast chain applied BEFORE the per-part min, so suppliers
    outside the region never contribute; the part filter is dim-side.
    The argmin compares cent-rounded cost on both engines (ties kept,
    Q15 convention — raw-float equality can flip tie rows cross-engine)."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        stable_round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "unit_cost"
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = F.broadcast(
        supplier.join(nation, supplier["s_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .select("s_suppkey", "s_name")
    )
    regional = cost.join(
        asia_supp, cost["suppkey"] == asia_supp["s_suppkey"]
    ).select("partkey", "suppkey", "unit_cost", "s_suppkey", "s_name")
    per_part_min = regional.groupBy("partkey").agg(
        F.min("unit_cost").alias("__min_cost")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 40)
        .select("p_partkey", "p_brand")
    )
    return (
        regional.join(per_part_min, "partkey")
        .filter(F.col("unit_cost") == F.col("__min_cost"))
        .join(part, F.col("partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "unit_cost")
    )


@query(
    "important_part_stock",
    oracle="""
    WITH flows AS (
      SELECT l.l_partkey, l.l_extendedprice
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_7')
    )
    SELECT l_partkey AS p_partkey,
           ROUND(SUM(l_extendedprice) + 1e-9, 2) AS part_value
    FROM flows
    GROUP BY 1
    HAVING SUM(l_extendedprice) >
           (SELECT SUM(l_extendedprice) * 0.001 FROM flows)
    """,
)
def important_part_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose flow value through two nations' suppliers
    exceeds a fraction of the TOTAL flow — per-group aggregate gated by
    a scalar global aggregate.

    Scale: the nation filter is a broadcast semi-chain applied at the
    scan; the per-part aggregate shuffles once on partkey with partial
    aggregation; the global total is a 1-row aggregate of the SAME
    filtered flow (computed in its own reduced pass, not a second fact
    scan at cluster scale if the per-part table is reused — Catalyst
    plans the subquery as a broadcast scalar).  The HAVING compares raw
    sums in both engines; only the projected value is rounded (a
    boundary-exact group would need sums within 1e-12 of the global
    fraction — impossible on this corpus by inspection)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    supp = F.broadcast(
        supplier.join(
            F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
        ).select("s_suppkey")
    )
    flows = li.join(supp, li["l_suppkey"] == supp["s_suppkey"]).select(
        "l_partkey", "l_extendedprice"
    )
    per_part = flows.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("__value")
    )
    total = flows.agg((F.sum("l_extendedprice") * 0.001).alias("__cut"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("__value") > F.col("__cut"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            stable_round("__value", 2).alias("part_value"),
        )
    )


@query(
    "promo_part_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_5')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%widget%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 100)
    ORDER BY s.s_suppkey
    """,
)
def promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers in a nation set who moved >100 units of any
    'widget' part in 1996 — the nested semi-join chain (part subset ->
    per-(supplier, part) volume threshold -> distinct suppliers ->
    supplier/nation filter).

    Scale: the part-name filter is dim-side on a broadcast, the volume
    aggregate shuffles (suppkey, partkey) pairs of the date-pruned
    scan only, and both membership tests are LEFT SEMI joins — the
    fact table is never joined wide."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    movers = (
        li.join(part, li["l_partkey"] == part["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 100)
        .select("l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_1", "NATION_2", "NATION_5")
        )
    )
    return (
        supplier.join(nation, supplier["s_nationkey"] == nation["n_nationkey"], "left_semi")
        .join(movers, supplier["s_suppkey"] == movers["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
