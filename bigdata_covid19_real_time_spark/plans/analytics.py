"""Corpus-statistics and behavioral-analytics queries.

Second extension batch: keyword extraction (TF-IDF), distribution
entropy, percentile-rank binning, cross-document span mining, fixed-k
group sampling, retention cohorts, z-score anomaly flags, and embedding
cluster diagnostics.  Every query carries a full DuckDB oracle
replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.quality import (
    percentile_rank_buckets,
)
from bigdata_covid19_real_time_spark.operators.sampling import group_sample_topk
from bigdata_covid19_real_time_spark.operators.similarity import (
    label_centroid_stats,
)
from bigdata_covid19_real_time_spark.operators.text import duplicate_spans
from bigdata_covid19_real_time_spark.operators.tfidf import (
    tfidf_top_terms,
    unigram_entropy,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "docs_tfidf_topterms",
    oracle="""
    WITH term_rows AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM term_rows GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.doc_freq,
             ROUND(t.tf * LN((n.n_docs + 1.0) / (d.doc_freq + 1.0)) + 1e-9, 6)
               AS tfidf
      FROM tf t JOIN dfreq d ON t.term = d.term CROSS JOIN n
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
           CAST(doc_freq AS BIGINT) AS doc_freq, tfidf,
           CAST(rn AS INTEGER) AS term_rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def docs_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (operators/tfidf.py): keyword
    extraction as explode -> TF groupBy -> DF groupBy -> join -> per-doc
    window.  The corpus size joins in as a broadcast 1-row frame (no
    driver-side count), and the ranking orders by the ROUNDED score so
    the order itself — not just the output — is cross-engine stable."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)


@query(
    "docs_unigram_entropy",
    oracle="""
    WITH term_rows AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM term_rows GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS token_total,
           CAST(COUNT(*) AS BIGINT) AS distinct_terms,
           ROUND(LN(SUM(tf)) - SUM(tf * LN(tf)) / SUM(tf) + 1e-9, 6) AS entropy
    FROM tf GROUP BY doc_id
    """,
)
def docs_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's unigram distribution
    (operators/tfidf.py): the boilerplate signal TTR misses (a doc
    repeating 5 tokens evenly has high TTR-per-window but ~ln(5)
    entropy).  ``H = ln(n) - sum(tf ln tf)/n`` — one explode, two
    groupBys, no join."""
    docs = load_table(spark, sf_dir, "documents")
    return unigram_entropy(docs)


@query(
    "docs_length_deciles",
    oracle="""
    WITH counts AS (SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1),
    cum AS (
      SELECT n_chars, SUM(cnt) OVER (ORDER BY n_chars) AS c,
             SUM(cnt) OVER () AS total
      FROM counts
    ),
    buckets AS (
      SELECT n_chars, CAST((10 * c + total - 1) // total AS INTEGER) AS decile
      FROM cum
    )
    SELECT d.doc_id, d.n_chars, b.decile
    FROM documents d JOIN buckets b USING (n_chars)
    """,
)
def docs_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-rank decile per document by length
    (operators/quality.py::percentile_rank_buckets) — curriculum
    binning with NO global sort and NO float boundaries: the decile is
    ``ceil(10 * rank_of_value / N)`` in pure integer arithmetic,
    computed on the collapsed per-value frame and broadcast-joined
    back."""
    docs = load_table(spark, sf_dir, "documents")
    out = percentile_rank_buckets(
        docs.select("doc_id", "n_chars"), "n_chars", 10, "decile"
    )
    return out.select("doc_id", "n_chars", "decile")


@query(
    "docs_duplicate_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    spans AS (
      SELECT doc_id, array_to_string(t[u.i:u.i+9], ' ') AS span
      FROM toks, unnest(range(1, len(t) - 8)) AS u(i)
      WHERE len(t) >= 10
    )
    SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM spans GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def docs_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated 10-token spans (operators/text.py::
    duplicate_spans) — exact-substring-dedup lite: shared boilerplate
    and copied passages surface with their document reach and total
    occurrence mass.  One explode + one groupBy; the 100 TB variant
    groups on the span hash (8-byte shuffle key)."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, n=10, min_docs=2)


@query(
    "docs_source_topk_sample",
    oracle="""
    SELECT doc_id, source, CAST(rn AS INTEGER) AS sample_rank
    FROM (SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('21:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
    WHERE rn <= 5
    """,
)
def docs_source_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-5-per-source deterministic sample
    (operators/sampling.py::group_sample_topk): rows ranked inside each
    group by md5 key hash — a reproducible per-group shuffle, stable
    under retries — and the first five kept.  The oracle reproduces the
    exact membership, not just the counts."""
    docs = load_table(spark, sf_dir, "documents")
    out = group_sample_topk(docs, k=5, group_col="source", key_col="doc_id", seed=21)
    return out.select("doc_id", "source", F.col("sample_rank").cast("int").alias("sample_rank"))


@query(
    "user_retention_cohorts",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
    firsts AS (SELECT user_id, MIN(d) AS cohort_date FROM ev GROUP BY 1),
    days AS (SELECT DISTINCT user_id, d FROM ev)
    SELECT cohort_date, CAST(d - cohort_date AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM days JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users grouped by first-seen date, counted on
    each later active day offset.  Both the first-seen aggregate and the
    (user, day) distinct shuffle on user_id — co-partitioned, so the
    join adds no third shuffle; the final rollup is on the tiny
    (cohort, offset) grid."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    days = ev.distinct()
    return (
        days.join(firsts, "user_id")
        .withColumn(
            "day_offset", F.datediff(F.col("d"), F.col("cohort_date")).cast("long")
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "events_value_anomalies",
    oracle="""
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY 1
    )
    SELECT event_id, e.event_type, e.value,
           ROUND(ABS((e.value - mu) / sd) + 1e-9, 4) AS abs_zscore
    FROM events e JOIN stats USING (event_type)
    WHERE sd > 0 AND ROUND(ABS((e.value - mu) / sd) + 1e-9, 4) >= 3.0
    """,
)
def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| >= 3): the per-type moment table
    is tiny and broadcasts, so flagging is a narrow map over the event
    stream — the batch shape of a streaming anomaly monitor.  The
    threshold compares the ROUNDED z-score so the boundary itself is
    cross-engine stable."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = stable_round(F.abs((F.col("value") - F.col("mu")) / F.col("sd")), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("abs_zscore", z)
        .filter((F.col("sd") > 0) & (F.col("abs_zscore") >= 3.0))
        .select("event_id", "event_type", "value", "abs_zscore")
    )


@query(
    "embedding_label_centroids",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, u.i - 1 AS pos, CAST(embedding[u.i] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    cent AS (SELECT label, pos, AVG(val) AS c FROM v GROUP BY 1, 2),
    norms AS (SELECT label, SQRT(SUM(c * c)) AS centroid_norm FROM cent GROUP BY 1),
    sq AS (
      SELECT v.label, COUNT(DISTINCT v.vec_id) AS n_vecs,
             SUM((v.val - c.c) * (v.val - c.c)) / COUNT(DISTINCT v.vec_id)
               AS inertia
      FROM v JOIN cent c ON v.label = c.label AND v.pos = c.pos
      GROUP BY 1
    )
    SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
           ROUND(centroid_norm + 1e-9, 6) AS centroid_norm,
           ROUND(inertia + 1e-9, 6) AS inertia
    FROM sq JOIN norms USING (label)
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster diagnostics per label (operators/similarity.py::
    label_centroid_stats): member count, centroid L2 norm, inertia
    (mean squared distance to centroid).  Shuffles (label, pos) pairs —
    never whole vectors — and broadcasts the C*dim centroid table for
    the distance pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = label_centroid_stats(emb)
    return out.select(
        "label",
        "n_vecs",
        stable_round("centroid_norm", 6).alias("centroid_norm"),
        stable_round("inertia", 6).alias("inertia"),
    )


@query(
    "events_value_psi",
    oracle="""
    WITH stats AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    binned AS (
      SELECT CAST(ts AS DATE) AS event_date,
             LEAST(CAST(FLOOR((value - lo) / NULLIF(hi - lo, 0) * 10) AS INTEGER), 9) AS bin
      FROM events CROSS JOIN stats
    ),
    base AS (
      SELECT bin, (COUNT(*) + 1.0) / ((SELECT COUNT(*) FROM binned) + 10.0) AS p
      FROM binned GROUP BY 1
    ),
    daily AS (
      SELECT event_date, bin, COUNT(*) AS n FROM binned GROUP BY 1, 2
    ),
    day_tot AS (SELECT event_date, SUM(n) AS dn FROM daily GROUP BY 1),
    grid AS (
      SELECT dt.event_date, b.bin, b.p,
             (COALESCE(d.n, 0) + 1.0) / (dt.dn + 10.0) AS q
      FROM day_tot dt CROSS JOIN base b
      LEFT JOIN daily d ON d.event_date = dt.event_date AND d.bin = b.bin
    )
    SELECT event_date,
           ROUND(SUM((q - p) * ln(q / p)) + 1e-9, 6) AS psi
    FROM grid GROUP BY 1
    """,
)
def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per-day PSI of the value column
    against the whole-corpus baseline (10 equal-width bins over the
    broadcast global min/max, add-one smoothing) — the ingest-pipeline
    data-quality gauge; PSI > 0.2 conventionally flags a shifted feed.

    Scale: binning is a narrow map over a broadcast 2-value frame; the
    baseline is 10 rows; the per-(day, bin) aggregate partial-collapses
    map-side; the day × bin grid join is broadcast.  Oracle: full SQL
    replication.
    """
    events = load_table(spark, sf_dir, "events")
    stats = F.broadcast(
        events.agg(F.min("value").alias("__lo"), F.max("value").alias("__hi"))
    )
    binned = events.join(stats).select(
        F.to_date("ts").alias("event_date"),
        F.least(
            F.floor(
                (F.col("value") - F.col("__lo"))
                / F.nullif(F.col("__hi") - F.col("__lo"), F.lit(0.0))
                * 10
            ).cast("int"),
            F.lit(9),
        ).alias("bin"),
    )
    # one fact scan: collapse to the (day, bin) cell grid first, then
    # derive the per-bin baseline, per-day totals, and grand total from
    # the tiny cell frame — as four separate groupBys over `binned`,
    # each marginal re-scanned the fact table.  No persist: all readers
    # consume the IDENTICAL aggregate, so AQE ReuseExchange dedups the
    # shuffle at runtime (a persist barrier measured slower)
    daily = binned.groupBy("event_date", "bin").agg(
        F.count(F.lit(1)).alias("__dn")
    )
    total = F.broadcast(daily.agg(F.sum("__dn").alias("__n")))
    base = F.broadcast(
        daily.groupBy("bin")
        .agg(F.sum("__dn").alias("__c"))
        .join(total)
        .select("bin", ((F.col("__c") + 1.0) / (F.col("__n") + 10.0)).alias("__p"))
    )
    day_tot = daily.groupBy("event_date").agg(F.sum("__dn").alias("__dt"))
    grid = (
        day_tot.join(base)
        .join(daily, ["event_date", "bin"], "left")
        .select(
            "event_date",
            "__p",
            ((F.coalesce(F.col("__dn"), F.lit(0)) + 1.0) / (F.col("__dt") + 10.0)).alias(
                "__q"
            ),
        )
    )
    return grid.groupBy("event_date").agg(
        stable_round(
            F.sum((F.col("__q") - F.col("__p")) * F.log(F.col("__q") / F.col("__p"))),
            6,
        ).alias("psi")
    )


@query(
    "events_value_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, ANY_VALUE(med) AS med,
             quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           ROUND(m.med + 1e-9, 4) AS median_value,
           ROUND(m.mad + 1e-9, 4) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS robust_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1, m.med, m.mad
    """,
)
def events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per event type: median absolute deviation and
    the 3-sigma-equivalent robust outlier count (1.4826 * MAD is the
    normal-consistent sigma estimate) — the z-score monitor's
    (events_value_anomalies) heavy-tail-proof sibling.

    Scale: two percentile passes, each one shuffle on event_type with
    the exact-percentile sort confined to per-group partitions; the
    deviation join broadcasts the tiny per-type median table.  At
    100 TB swap ``percentile`` for ``approx_percentile`` and the plan
    shape is unchanged (the sketch-vs-exact contract is gated by
    daily_event_summary_sketch)."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("__med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "__adev", F.abs(F.col("value") - F.col("__med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("__med").alias("__med2"),
        F.expr("percentile(__adev, 0.5)").alias("__mad"),
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "__med2", "__mad")
        .agg(
            F.sum(
                F.when(F.col("__adev") > 3 * 1.4826 * F.col("__mad"), 1).otherwise(0)
            ).alias("robust_outliers")
        )
        .select(
            "event_type",
            stable_round("__med2", 4).alias("median_value"),
            stable_round("__mad", 4).alias("mad"),
            "robust_outliers",
        )
    )
