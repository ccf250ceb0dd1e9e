"""Market-basket affinity mining and k-anonymity profiling — the
co-occurrence and privacy-risk queries a curation pipeline runs before
publishing a dataset, both exactly SQL-expressible.

``brand_pair_affinity`` is the frequent-pairs core of association-rule
mining done the distributed way: pair candidates are generated ONLY
within a basket (never across), so the blow-up is bounded by the square
of basket size (TPC-H baskets hold <= 7 items), and the self-join runs
on the already-shuffled basket key so AQE co-partitions both sides.
Support marginals and the basket total join back as broadcasts.  At
100 TB the same plan holds: the basket-key shuffle dominates and is
unavoidable; everything after it is proportional to the pair-type
cardinality (here <= C(25,2) = 300 brand pairs), not the fact table.

``docs_k_anonymity`` groups documents by a quasi-identifier tuple
(lang, source, length bucket) and reports, per (lang, source), the
k-anonymity level (min group size) and the re-identification-risk mass
(groups and docs below k=5) — two map-side-combinable aggregations,
no join, output proportional to the QI-prefix cardinality.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Minimum co-occurrence count for a brand pair to be reported.
MIN_PAIR_SUPPORT = 5

#: k-anonymity threshold: QI groups smaller than this are risky.
K_ANON = 5

#: Quasi-identifier length-bucket width (chars).
QI_BUCKET_CHARS = 500


@query(
    "brand_pair_affinity",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM baskets),
    marg AS (SELECT brand, COUNT(*) AS n FROM baskets GROUP BY 1),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(n_pair AS BIGINT) AS n_pair,
           ROUND(n_pair * 1.0 * t.n_orders / (ma.n * mb.n) + 1e-9, 4)
             AS lift
    FROM pairs
    JOIN marg ma ON ma.brand = brand_a
    JOIN marg mb ON mb.brand = brand_b
    CROSS JOIN tot t
    WHERE n_pair >= {MIN_PAIR_SUPPORT}
    """,
)
def brand_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-ordered brand pairs with lift.  Baskets are the
    distinct (order, brand) pairs; candidate generation is the
    within-basket self-join (bounded blow-up — see module docstring);
    lift = P(a,b) / (P(a) * P(b)) over the order space."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"),
            F.col("b.brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= MIN_PAIR_SUPPORT)
    )
    marg = baskets.groupBy("brand").agg(F.count(F.lit(1)).alias("n"))
    tot = baskets.agg(F.countDistinct("ok").alias("n_orders"))
    return (
        pairs.join(
            F.broadcast(marg.withColumnRenamed("brand", "brand_a")
                        .withColumnRenamed("n", "na")),
            "brand_a",
        )
        .join(
            F.broadcast(marg.withColumnRenamed("brand", "brand_b")
                        .withColumnRenamed("n", "nb")),
            "brand_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            stable_round(
                F.col("n_pair")
                * F.lit(1.0)
                * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                4,
            ).alias("lift"),
        )
    )


@query(
    "docs_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT lang, source,
             CAST(FLOOR(n_chars / {QI_BUCKET_CHARS}) AS BIGINT) AS bucket,
             COUNT(*) AS grp_n
      FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL
        AND n_chars IS NOT NULL
      GROUP BY 1, 2, 3
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(grp_n) AS BIGINT) AS k_anonymity,
           CAST(SUM(CASE WHEN grp_n < {K_ANON} THEN 1 ELSE 0 END)
                AS BIGINT) AS risky_groups,
           CAST(SUM(CASE WHEN grp_n < {K_ANON} THEN grp_n ELSE 0 END)
                AS BIGINT) AS risky_docs,
           MIN(grp_n) >= {K_ANON} AS is_k_anonymous
    FROM qi GROUP BY 1, 2
    """,
)
def docs_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the documents table under the
    quasi-identifier tuple (lang, source, 500-char length bucket):
    per publishing unit (lang, source), the anonymity level k (the
    smallest QI-group size — an adversary who knows a target's QI tuple
    can narrow them to no fewer than k docs) plus the risk mass below
    the k=5 policy threshold."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
        & F.col("source").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    qi = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / QI_BUCKET_CHARS).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    return qi.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("grp_n").cast("long").alias("k_anonymity"),
        F.sum((F.col("grp_n") < K_ANON).cast("long")).alias("risky_groups"),
        F.sum(
            F.when(F.col("grp_n") < K_ANON, F.col("grp_n")).otherwise(0)
        )
        .cast("long")
        .alias("risky_docs"),
        (F.min("grp_n") >= K_ANON).alias("is_k_anonymous"),
    )
