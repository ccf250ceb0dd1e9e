"""Governance and engagement batch: star-schema referential-integrity
audit, rolling active-user stickiness, and repeat-purchase intervals.

Extends the data-quality and behavioral families (SURVEY.md §2
extension brief; siblings of ``operators/constraints.py``'s per-table
expectation suites and ``plans/behavior.py``): the RI audit is the
cross-TABLE quality gate expectations can't express, DAU/WAU/MAU
stickiness is the canonical product-engagement rollup missing from the
cohort/retention set, and inter-purchase intervals time the repeat
cycle RFM's recency bucket only snapshots.

Scale shapes:

- ``star_schema_integrity``: one left-anti-shaped aggregate per FK
  edge (six edges); dimension keys broadcast, the two fact-sized
  edges shuffle on the join key like any fact join.  Output is six
  rows — the union of per-edge counts.
- ``events_wau_mau_stickiness``: the fact collapses ONCE to the
  distinct (user, day) frame; each trailing window is an explode of
  that frame by its window length (bounded fan-out 7x / 30x on the
  collapsed frame, never the raw events) followed by a distinct
  count per target day.  No cross join, no per-day rescan.
- ``orders_repeat_intervals``: one (custkey, date) sort yields
  consecutive-order gaps via lag; the rollup groups the gap frame by
  market segment.  Date math stays in whole days via date_diff on
  DATE-cast columns (cross-engine exact).

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Trailing engagement windows (days).
WAU_DAYS = 7
MAU_DAYS = 30

#: (edge name, child table, child key, parent table, parent key,
#:  parent is a broadcastable dimension)
FK_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey", False),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey", True),
]


def _edge_sql(edge: str, child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
    SELECT '{edge}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE c.{ckey} IS NULL) AS BIGINT)
             AS n_null_keys,
           CAST(COUNT(*) FILTER (WHERE c.{ckey} IS NOT NULL
                                 AND p.{pkey} IS NULL) AS BIGINT)
             AS n_dangling,
           ROUND(COUNT(*) FILTER (WHERE c.{ckey} IS NOT NULL
                                  AND p.{pkey} IS NULL) * 1.0
                 / GREATEST(1, COUNT(*) FILTER (WHERE c.{ckey} IS NOT NULL))
                 + 1e-9, 6) AS orphan_rate
    FROM {child} c LEFT JOIN {parent} p ON p.{pkey} = c.{ckey}"""


@query(
    "star_schema_integrity",
    oracle="\n    UNION ALL\n".join(
        _edge_sql(e, c, ck, p, pk) for e, c, ck, p, pk, _ in FK_EDGES
    ),
)
def star_schema_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of every star-schema FK edge: row
    count, NULL-key count, dangling-key count (non-null child key with
    no parent), and orphan rate — the cross-table quality gate the
    per-table expectation suites (``operators/constraints.py``) cannot
    express, and the first report to read after any ingest or MERGE.
    Zero everywhere is the healthy state; the counts make silent
    referential rot visible.  Dimension parents broadcast; the two
    fact-sized edges shuffle on their join key.

    The three lineitem edges run as ONE fact scan: every parent key is
    unique (left joins cannot fan out), so one chained
    orders-shuffle + part/supplier-broadcast join feeds a single
    aggregate whose per-edge counts explode into three rows — instead
    of three independent scans of the largest table."""
    li_edges = [e for e in FK_EDGES if e[1] == "lineitem"]
    li = load_table(spark, sf_dir, "lineitem").select(
        *[ck for _, _, ck, _, _, _ in li_edges]
    )
    for edge, _, ckey, parent, pkey, small in li_edges:
        p = load_table(spark, sf_dir, parent).select(
            F.col(pkey).alias(f"__pk_{pkey}")
        )
        if small:
            p = F.broadcast(p)
        li = li.join(p, F.col(ckey) == F.col(f"__pk_{pkey}"), "left")
    def _edge_struct(edge: str, ckey: str, pkey: str):
        # coalesce: SUM over an EMPTY child table is NULL, but the
        # oracle's COUNT(*) FILTER is 0 — and 0 is the right report
        # value for "no rows, no violations" (empty-input sweep, r7)
        nn = F.coalesce(
            F.sum(F.when(F.col(ckey).isNull(), 1).otherwise(0)), F.lit(0)
        )
        nd = F.coalesce(
            F.sum(
                F.when(
                    F.col(ckey).isNotNull() & F.col(f"__pk_{pkey}").isNull(),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        return F.struct(
            F.lit(edge).alias("fk_edge"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            nn.cast("long").alias("n_null_keys"),
            nd.cast("long").alias("n_dangling"),
            stable_round(
                nd
                * F.lit(1.0)
                / F.greatest(
                    F.lit(1).cast("long"),
                    F.sum(F.when(F.col(ckey).isNotNull(), 1).otherwise(0)),
                ),
                6,
            ).alias("orphan_rate"),
        )
    li_rows = (
        li.agg(
            F.array(
                *[_edge_struct(e, ck, pk) for e, _, ck, _, pk, _ in li_edges]
            ).alias("__edges")
        )
        .select(F.explode("__edges").alias("s"))
        .select("s.*")
    )
    frames = [li_rows]
    for edge, child, ckey, parent, pkey, small in FK_EDGES:
        if child == "lineitem":
            continue
        c = load_table(spark, sf_dir, child).select(ckey)
        p = load_table(spark, sf_dir, parent).select(
            F.col(pkey).alias("__pk")
        )
        if small:
            p = F.broadcast(p)
        j = c.join(p, F.col(ckey) == F.col("__pk"), "left")
        # coalesced for the empty-child case (see _edge_struct)
        nn = F.coalesce(
            F.sum(F.when(F.col(ckey).isNull(), 1).otherwise(0)), F.lit(0)
        )
        nd = F.coalesce(
            F.sum(
                F.when(
                    F.col(ckey).isNotNull() & F.col("__pk").isNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        frames.append(
            j.agg(
                F.lit(edge).alias("fk_edge"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                nn.cast("long").alias("n_null_keys"),
                nd.cast("long").alias("n_dangling"),
                stable_round(
                    nd
                    * F.lit(1.0)
                    / F.greatest(
                        F.lit(1).cast("long"),
                        F.sum(F.when(F.col(ckey).isNotNull(), 1).otherwise(0)),
                    ),
                    6,
                ).alias("orphan_rate"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


@query(
    "events_wau_mau_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    span AS (SELECT MAX(d) AS max_d FROM ud),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1),
    wau AS (
      SELECT ud.d + CAST(u.i AS INT) AS d, COUNT(DISTINCT ud.user_id) AS wau
      FROM ud, unnest(range(0, {WAU_DAYS})) AS u(i), span
      WHERE ud.d + CAST(u.i AS INT) <= span.max_d
      GROUP BY 1
    ),
    mau AS (
      SELECT ud.d + CAST(u.i AS INT) AS d, COUNT(DISTINCT ud.user_id) AS mau
      FROM ud, unnest(range(0, {MAU_DAYS})) AS u(i), span
      WHERE ud.d + CAST(u.i AS INT) <= span.max_d
      GROUP BY 1
    )
    SELECT dau.d AS day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           CAST(mau.mau AS BIGINT) AS mau,
           ROUND(dau.dau * 1.0 / mau.mau + 1e-9, 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d JOIN mau ON mau.d = dau.d
    """,
)
def events_wau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: daily/weekly/monthly active users per day
    plus the DAU/MAU stickiness ratio — the canonical product-health
    rollup (a falling ratio means a growing-but-disengaging base).
    Trailing distinct counts aren't window-aggregatable, so each
    (user, day) row is exploded to the <= {WAU_DAYS}/{MAU_DAYS} later
    days it supports — a bounded fan-out of the COLLAPSED user-day
    frame, never the raw events — then distinct-counted per target
    day.  Days with no prior activity window simply truncate at the
    stream edge; target days past the stream end are dropped."""
    ud = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    span = ud.agg(F.max("d").alias("max_d"))
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )

    def _trailing(days: int, alias: str) -> DataFrame:
        return (
            ud.crossJoin(F.broadcast(span))
            .select(
                "user_id",
                F.explode(
                    F.sequence(F.lit(0), F.lit(days - 1))
                ).alias("i"),
                "d",
                "max_d",
            )
            .select(
                "user_id", F.date_add("d", F.col("i")).alias("day"), "max_d"
            )
            .filter(F.col("day") <= F.col("max_d"))
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(alias))
        )

    wau = _trailing(WAU_DAYS, "wau")
    mau = _trailing(MAU_DAYS, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.col("mau").cast("long").alias("mau"),
            stable_round(F.col("dau") * F.lit(1.0) / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


@query(
    "orders_repeat_intervals",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderdate, o_orderkey,
             LAG(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev_date
      FROM orders
    ),
    gaps AS (
      SELECT o_custkey,
             date_diff('day', CAST(prev_date AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap_days
      FROM seq WHERE prev_date IS NOT NULL
    ),
    seg AS (
      SELECT c.c_mktsegment, g.gap_days
      FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_days) + 1e-9, 4) AS mean_gap_days,
           ROUND(quantile_cont(gap_days, 0.5) + 1e-9, 4) AS p50_gap_days,
           ROUND(quantile_cont(gap_days, 0.9) + 1e-9, 4) AS p90_gap_days
    FROM seg GROUP BY 1
    """,
)
def orders_repeat_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase intervals by market segment: days between each
    customer's consecutive orders, rolled up to mean/p50/p90 per
    segment — the repeat-cycle timing RFM's recency bucket only
    snapshots (it drives replenishment-campaign cadence).  One
    (custkey, date) sort yields the gaps via lag; the gap frame joins
    the customer dimension and groups by segment.  Day arithmetic is
    date_diff on DATE-cast columns in both engines — never interval
    subtraction (the DuckDB INTERVAL-cast trap)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
    )
    gaps = seq.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date("prev_date")
        ).alias("gap_days"),
    )
    seg = gaps.join(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        ),
        "o_custkey",
    )
    return seg.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        stable_round(F.avg("gap_days"), 4).alias("mean_gap_days"),
        stable_round(F.expr("percentile(gap_days, 0.5)"), 4).alias(
            "p50_gap_days"
        ),
        stable_round(F.expr("percentile(gap_days, 0.9)"), 4).alias(
            "p90_gap_days"
        ),
    )
