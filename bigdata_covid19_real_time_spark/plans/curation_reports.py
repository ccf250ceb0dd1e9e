"""Curation diagnostics reports: the summary tables an operator of a
100 TB corpus pipeline actually reads — the filter funnel (what each
quality rule removes), the cross-source duplicate-overlap matrix, the
duplicate-cluster size distribution, embedding-norm outliers, and
event run-length (gaps-and-islands) statistics.  All exactly
SQL-expressible.

Scale notes: every report aggregates the fact table ONCE into a frame
proportional to rule/source/label/type cardinality — the reports
themselves are tiny.  The overlap matrix generates source pairs only
WITHIN a duplicate group (the within-basket pattern from
``brand_pair_affinity``), so the blow-up is bounded by sources per
duplicate group, never |sources|² x |corpus|.  Spark groups duplicate
content on its 8-byte ``xxhash64`` fingerprint (the 100 TB shuffle
key); the oracles group on the normalized string itself — identical
memberships modulo hash collisions (~1e-12 at gate SFs; same
equivalence the exact-dedup gate already stands on).

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.quality import quality_filter
from bigdata_covid19_real_time_spark.plans.extensions import (
    _QUALITY_FLAGGED_CTES,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

_NORM_SPARK = lambda c: F.lower(  # noqa: E731  (kept inline-readable)
    F.regexp_replace(F.trim(c), r"\s+", " ")
)
_NORM_SQL = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"


@query(
    "docs_filter_funnel",
    oracle=f"""
    WITH {_QUALITY_FLAGGED_CTES},
    per_rule AS (
      SELECT u.r AS stage, COUNT(*) AS n
      FROM flagged, unnest(flagged.r) AS u(r) GROUP BY 1
    ),
    summary AS (
      SELECT 'kept' AS stage,
             SUM(CASE WHEN len(r) = 0 THEN 1 ELSE 0 END) AS n FROM flagged
      UNION ALL
      SELECT 'any_failed',
             SUM(CASE WHEN len(r) > 0 THEN 1 ELSE 0 END) FROM flagged
      UNION ALL
      SELECT 'total', COUNT(*) FROM flagged
    ),
    allrows AS (
      SELECT * FROM per_rule UNION ALL SELECT * FROM summary
    ),
    tot AS (SELECT COUNT(*) AS t FROM flagged)
    SELECT stage, CAST(n AS BIGINT) AS n_docs,
           ROUND(n * 1.0 / t + 1e-9, 6) AS frac
    FROM allrows, tot
    """,
)
def docs_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter FUNNEL report: per rule, how many documents
    it flags (documents can appear under several rules), plus the
    `kept` / `any_failed` / `total` summary rows — the table a curation
    run prints before anyone commits to a filter config.  One pass of
    the per-doc filter frame; output is |rules|+3 rows."""
    qf = quality_filter(
        load_table(spark, sf_dir, "documents"), fan_out=True
    ).select("keep", "reasons")
    tot = F.broadcast(qf.agg(F.count(F.lit(1)).alias("t")))
    per_rule = (
        qf.filter(F.col("reasons") != "")
        .select(F.explode(F.split("reasons", ",")).alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    summary = qf.agg(
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum((~F.col("keep")).cast("long")).alias("any_failed"),
        F.count(F.lit(1)).alias("total"),
    ).select(
        F.expr(
            "stack(3, 'kept', kept, 'any_failed', any_failed,"
            " 'total', total) AS (stage, n)"
        )
    )
    return (
        per_rule.unionByName(summary)
        .crossJoin(tot)
        .select(
            "stage",
            F.col("n").cast("long").alias("n_docs"),
            # t = 0 on an empty corpus: ANSI division would raise, and
            # the oracle's n/0 is NULL — guard to match (r7 empty sweep)
            stable_round(
                F.when(
                    F.col("t") > 0, F.col("n") * F.lit(1.0) / F.col("t")
                ),
                6,
            ).alias("frac"),
        )
    )


@query(
    "source_overlap_matrix",
    oracle="""
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS t
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    g AS (
      SELECT DISTINCT source,
             t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2] AS gram
      FROM toks, unnest(range(1, len(t) - 1)) AS i(i)
      WHERE len(t) >= 3
    ),
    marg AS (SELECT source, COUNT(*) AS n FROM g GROUP BY 1),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
           ROUND(n_shared * 1.0 / (ma.n + mb.n - n_shared) + 1e-9, 6)
             AS jaccard
    FROM shared
    JOIN marg ma ON ma.source = src_a
    JOIN marg mb ON mb.source = src_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap matrix: for each source pair, the
    number of distinct 3-gram shingles present in BOTH and the shingle
    Jaccard — the matrix that tells a corpus curator which feeds are
    re-crawls / mirrors of each other before they double-weight a mix.
    Pair generation happens only within a shingle's source set
    (self-join on the gram), so cost is bounded by sources-per-gram,
    never |sources|² x corpus; marginals join back as a broadcast.  At
    100 TB the gram key shuffles as ``xxhash64(gram)`` (8 bytes) — the
    string form here keeps the oracle trivially equivalent (the
    documented novelty-query discipline)."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("source", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 3)
    )
    grams = toks.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("t"), i),
                    F.element_at(F.col("t"), i + 1),
                    F.element_at(F.col("t"), i + 2),
                ),
            )
        ).alias("gram"),
    ).distinct()
    marg = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(
                marg.withColumnRenamed("source", "src_a")
                .withColumnRenamed("n", "na")
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                marg.withColumnRenamed("source", "src_b")
                .withColumnRenamed("n", "nb")
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            stable_round(
                F.col("n_shared")
                * F.lit(1.0)
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "docs_dup_cluster_sizes",
    oracle=f"""
    WITH fp AS (
      SELECT {_NORM_SQL} AS f FROM documents WHERE text IS NOT NULL
    ),
    c AS (SELECT f, COUNT(*) AS s FROM fp GROUP BY 1)
    SELECT CAST(s AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(s) AS BIGINT) AS n_docs
    FROM c GROUP BY 1
    """,
)
def docs_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster size distribution: how much of the
    corpus sits in singletons vs dup clusters of each size — the
    one-table summary of dedup headroom.  Two map-side-combinable
    groupBys on the 8-byte fingerprint; output is |distinct sizes|
    rows."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    clusters = docs.select(
        F.xxhash64(_NORM_SPARK(F.col("text"))).alias("f")
    ).groupBy("f").agg(F.count(F.lit(1)).alias("s"))
    return clusters.groupBy(
        F.col("s").cast("long").alias("cluster_size")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("s").cast("long").alias("n_docs"),
    )


@query(
    "embedding_norm_outliers",
    oracle="""
    WITH nrm AS (
      SELECT vec_id, label,
             SQRT(list_sum(list_transform(embedding,
                  v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nm
      FROM embeddings
      WHERE label IS NOT NULL AND embedding IS NOT NULL
    ),
    st AS (
      SELECT label, COUNT(*) AS n, AVG(nm) AS mu, STDDEV_SAMP(nm) AS sd
      FROM nrm GROUP BY 1
    )
    SELECT s.label, CAST(s.n AS BIGINT) AS n_vecs,
           ROUND(s.mu + 1e-9, 6) AS mean_norm,
           ROUND(s.sd + 1e-9, 6) AS sd_norm,
           CAST(SUM(CASE WHEN s.sd > 0
                    AND ROUND(ABS((nm - s.mu) / s.sd) + 1e-9, 4) >= 3.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM nrm JOIN st s USING (label)
    GROUP BY s.label, s.n, s.mu, s.sd
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm health check per label: norm mean/spread and
    the count of 3-sigma outliers (degenerate or corrupted vectors).
    The norm is a narrow in-row fold (no explode, no shuffle of vector
    elements); the per-label moment table broadcasts back for the
    outlier pass — the `events_value_anomalies` shape on vectors.
    The z-threshold compares the ROUNDED z so the boundary is
    cross-engine stable."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull() & F.col("embedding").isNotNull()
    )
    nrm = emb.select(
        "label",
        F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double") * v.cast("double"),
            )
        ).alias("nm"),
    )
    st = nrm.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("nm").alias("mu"),
        F.stddev_samp("nm").alias("sd"),
    )
    z = stable_round(F.abs((F.col("nm") - F.col("mu")) / F.col("sd")), 4)
    return (
        nrm.join(F.broadcast(st), "label")
        .withColumn(
            # when/otherwise (not a boolean cast): a singleton label has
            # sd = NULL (stddev_samp of one row), and NULL.cast(long)
            # would sum to NULL while the oracle's CASE yields 0
            "is_out",
            F.when((F.col("sd") > 0) & (z >= 3.0), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("label")
        .agg(
            F.first("n").cast("long").alias("n_vecs"),
            stable_round(F.first("mu"), 6).alias("mean_norm"),
            stable_round(F.first("sd"), 6).alias("sd_norm"),
            F.sum("is_out").cast("long").alias("n_outliers"),
        )
    )


@query(
    "user_event_runs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) - ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS grp
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL AND event_id IS NOT NULL
    ),
    runs AS (
      SELECT user_id, event_type, grp, COUNT(*) AS run_len
      FROM seq GROUP BY 1, 2, 3
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_runs,
           ROUND(AVG(run_len) + 1e-9, 6) AS avg_run_len,
           CAST(MAX(run_len) AS BIGINT) AS max_run_len
    FROM runs GROUP BY 1
    """,
)
def user_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run-length statistics: consecutive same-type
    runs within each user's (ts, event_id)-ordered stream (row_number
    difference trick — one user_id shuffle, both window sorts reuse
    it), then run-length aggregates per type.  The burst/repetition
    profile of the event feed."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    runs = (
        ev.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias(
                "grp"
            ),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        stable_round(F.avg("run_len"), 6).alias("avg_run_len"),
        F.max("run_len").cast("long").alias("max_run_len"),
    )
