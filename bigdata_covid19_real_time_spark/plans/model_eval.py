"""Model-evaluation metrics batch: grouped ROC AUC, retrieval quality
(precision@k / MRR / NDCG@k), probability calibration (ECE + Brier),
and inter-rater agreement (Cohen's kappa).

A training-data pipeline is judged by the models it feeds, so the
evaluation primitives belong in the engine next to the data ops
(SURVEY.md §2 extension brief: retrieval + quality scoring).  All four
are collapsed-frame shapes — the fact table reduces ONCE to a tiny
grouped frame (score bins, top-k lists, probability bins, a 2x2
agreement table) and every metric is closed-form arithmetic on that
frame, so the only shuffle is the initial groupBy and the plans hold at
100 TB:

- ``lineitem_discount_auc``: Mann-Whitney AUC from per-(year, score)
  pos/neg counts — the standard distributed AUC (no global sort of raw
  rows; the rank statistic is a prefix sum over the ~11-distinct-score
  collapsed frame per group, tie-corrected).
- ``embedding_retrieval_metrics``: exact cosine top-10 per held-out
  query (reuses operators/similarity.py::cosine_topk), binary
  relevance = label match, then precision@10, MRR, and NDCG@10 with
  the ideal DCG from the per-label corpus count.
- ``events_click_calibration``: reliability diagram over 10 equal-width
  probability bins for a deterministic score, expected-calibration
  error as the count-weighted gap sum, Brier score as a mergeable mean.
- ``docs_rater_kappa``: Cohen's kappa between two closed-form document
  "raters" (char-length vs whitespace-token-count rules) per source —
  the agreement statistic behind labeling-quality audits.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Rater thresholds for the kappa audit (documented closed-form rules so
#: both engines and any re-implementation agree bit-for-bit).
KAPPA_MIN_CHARS = 300
KAPPA_MIN_SPACES = 50


@query(
    "lineitem_discount_auc",
    oracle="""
    WITH scored AS (
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
             l_discount AS score,
             COUNT(*) FILTER (l_returnflag = 'R') AS pos,
             COUNT(*) FILTER (l_returnflag != 'R') AS neg
      FROM lineitem
      WHERE l_shipdate IS NOT NULL AND l_returnflag IS NOT NULL
        AND l_discount IS NOT NULL
      GROUP BY 1, 2
    ),
    pref AS (
      SELECT ship_year, pos, neg,
             COALESCE(SUM(neg) OVER (PARTITION BY ship_year ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM scored
    )
    SELECT ship_year,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
             ROUND(SUM(neg_below * pos + 0.5 * neg * pos)
                   / (SUM(pos) * SUM(neg)) + 1e-9, 6)
           END AS auc
    FROM pref GROUP BY 1
    """,
)
def lineitem_discount_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ship-year ROC AUC of ``l_discount`` as a score for
    ``l_returnflag = 'R'``, via the tie-corrected Mann-Whitney rank
    statistic: AUC = sum over score bins of
    (negatives strictly below) * pos + pos * neg / 2, normalized by
    n_pos * n_neg.  The distributed shape: ONE groupBy collapses the
    fact to (year, score) pos/neg counts (~11 distinct discounts), and
    the prefix sum + final ratio run on that tiny frame — no global
    sort of raw rows, which is what makes AUC computable at 100 TB."""
    scored = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").isNotNull()
            & F.col("l_returnflag").isNotNull()
            & F.col("l_discount").isNotNull()
        )
        .groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.col("l_discount").alias("score"),
        )
        .agg(
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("pos"),
            F.count(F.when(F.col("l_returnflag") != "R", 1)).alias("neg"),
        )
    )
    w = (
        Window.partitionBy("ship_year")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = scored.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    return pref.groupBy("ship_year").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.when(
            (F.sum("pos") > 0) & (F.sum("neg") > 0),
            stable_round(
                F.sum(
                    F.col("neg_below") * F.col("pos")
                    + F.lit(0.5) * F.col("neg") * F.col("pos")
                )
                / (F.sum("pos") * F.sum("neg")),
                6,
            ),
        ).alias("auc"),
    )


@query(
    "embedding_retrieval_metrics",
    # Replays the exact top-10 (the ANN family's shared convention:
    # cosine DESC, neighbor_id ASC tie-break), then binary relevance =
    # label match and the closed-form precision/MRR/NDCG arithmetic.
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, label AS qlabel, embedding AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    c AS (
      SELECT vec_id AS neighbor_id, label AS nlabel, embedding AS cv
      FROM embeddings WHERE vec_id >= 10
    ),
    flat AS (
      SELECT q.query_id, q.qlabel, c.neighbor_id, c.nlabel,
             SUM(CAST(qv[u.i] AS DOUBLE) * CAST(cv[u.i] AS DOUBLE)) AS dp,
             sqrt(SUM(CAST(qv[u.i] AS DOUBLE) * CAST(qv[u.i] AS DOUBLE))) AS qn,
             sqrt(SUM(CAST(cv[u.i] AS DOUBLE) * CAST(cv[u.i] AS DOUBLE))) AS cn
      FROM q, c, unnest(range(1, len(qv) + 1)) AS u(i)
      GROUP BY 1, 2, 3, 4
    ),
    topk AS (
      SELECT query_id, qlabel, nlabel,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               (CASE WHEN qn > 0 AND cn > 0 THEN dp / (qn * cn) ELSE 0.0 END) DESC,
               neighbor_id ASC) AS rank
      FROM flat
      QUALIFY rank <= 10
    ),
    nrel AS (
      SELECT qlabel, COUNT(*) AS n_corpus_rel FROM c
      JOIN (SELECT DISTINCT qlabel FROM q) ql ON ql.qlabel = c.nlabel
      GROUP BY 1
    ),
    perq AS (
      SELECT t.query_id, t.qlabel,
             SUM(CASE WHEN nlabel = t.qlabel THEN 1 ELSE 0 END) AS hits10,
             MAX(CASE WHEN nlabel = t.qlabel THEN 1.0 / rank ELSE 0.0 END) AS mrr,
             SUM(CASE WHEN nlabel = t.qlabel
                 THEN 1.0 / log2(rank + 1) ELSE 0.0 END) AS dcg
      FROM topk t GROUP BY 1, 2
    )
    SELECT p.query_id,
           CAST(p.qlabel AS INTEGER) AS query_label,
           CAST(COALESCE(r.n_corpus_rel, 0) AS BIGINT) AS n_corpus_rel,
           CAST(p.hits10 AS BIGINT) AS hits10,
           ROUND(p.hits10 / 10.0 + 1e-9, 6) AS precision10,
           ROUND(p.mrr + 1e-9, 6) AS mrr,
           CASE WHEN COALESCE(r.n_corpus_rel, 0) > 0 THEN
             ROUND(p.dcg / list_sum(list_transform(
               range(1, CAST(least(r.n_corpus_rel, 10) AS INTEGER) + 1),
               i -> 1.0 / log2(i + 1))) + 1e-9, 6)
           ELSE 0.0 END AS ndcg10
    FROM perq p LEFT JOIN nrel r ON r.qlabel = p.qlabel
    """,
)
def embedding_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality scorecard for the held-out queries (vec_id <
    10) against the labeled corpus: exact cosine top-10 per query
    (operators/similarity.py::cosine_topk — one broadcast of the query
    block, one corpus scan), binary relevance = label match, then
    precision@10, MRR (reciprocal rank of the first relevant hit), and
    NDCG@10 whose ideal DCG comes from the per-label corpus count.
    Everything after the top-k is arithmetic on a <= 100-row frame —
    the eval stays this cheap no matter how large the corpus grows."""
    from bigdata_covid19_real_time_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    top = cosine_topk(corpus, queries_df, k=10)

    qlab = F.broadcast(
        queries_df.select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
        )
    )
    nlab = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    rel = (
        top.join(nlab, "neighbor_id")
        .join(qlab, "query_id")
        .withColumn(
            "is_rel", F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0)
        )
    )
    perq = rel.groupBy("query_id", "qlabel").agg(
        F.sum("is_rel").alias("hits10"),
        F.max(F.col("is_rel") / F.col("rank")).alias("mrr"),
        F.sum(F.col("is_rel") / F.log2(F.col("rank") + 1)).alias("dcg"),
    )
    nrel = F.broadcast(
        corpus.join(
            F.broadcast(qlab.select("qlabel").distinct()),
            corpus["label"] == F.col("qlabel"),
        )
        .groupBy("qlabel")
        .agg(F.count(F.lit(1)).alias("n_corpus_rel"))
    )
    out = perq.join(nrel, "qlabel", "left").withColumn(
        "n_corpus_rel", F.coalesce(F.col("n_corpus_rel"), F.lit(0))
    )
    idcg = F.expr(
        "aggregate(sequence(1, int(least(n_corpus_rel, 10))), 0D,"
        " (acc, i) -> acc + 1.0 / log2(i + 1))"
    )
    return out.select(
        "query_id",
        F.col("qlabel").cast("int").alias("query_label"),
        F.col("n_corpus_rel").cast("long").alias("n_corpus_rel"),
        F.col("hits10").cast("long").alias("hits10"),
        stable_round(F.col("hits10") / F.lit(10.0), 6).alias("precision10"),
        stable_round(F.col("mrr"), 6).alias("mrr"),
        F.when(
            F.col("n_corpus_rel") > 0,
            stable_round(F.col("dcg") / idcg, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg10"),
    )


@query(
    "events_click_calibration",
    oracle="""
    WITH scored AS (
      SELECT least(greatest(value / 500.0, 0.01), 0.99) AS p,
             CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    binned AS (
      SELECT CAST(least(floor(p * 10), 9) AS INTEGER) AS bin,
             COUNT(*) AS n, SUM(p) AS sum_p, SUM(y) AS sum_y,
             SUM((p - y) * (p - y)) AS sum_sq
      FROM scored GROUP BY 1
    )
    SELECT bin,
           CAST(n AS BIGINT) AS n,
           ROUND(sum_p / n + 1e-9, 6) AS avg_confidence,
           ROUND(sum_y / n + 1e-9, 6) AS obs_rate,
           ROUND(abs(sum_p / n - sum_y / n) + 1e-9, 6) AS abs_gap,
           ROUND(SUM(n * abs(sum_p / n - sum_y / n)) OVER ()
                 / SUM(n) OVER () + 1e-9, 6) AS ece,
           ROUND(SUM(sum_sq) OVER () / SUM(n) OVER () + 1e-9, 6) AS brier
    FROM binned
    """,
)
def events_click_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + summary calibration metrics for a
    deterministic probability score (clipped ``value / 500``) against
    the binary outcome ``event_type = 'click'``: 10 equal-width bins
    with per-bin mean confidence, observed rate, and |gap|, plus the
    expected-calibration error (count-weighted gap sum) and Brier score
    repeated on every row.  The fact collapses ONCE to the 10-bin
    frame; ECE/Brier are window sums over those 10 rows — the whole
    reliability analysis costs one shuffle at any scale."""
    scored = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.least(
                F.greatest(F.col("value") / 500.0, F.lit(0.01)), F.lit(0.99)
            ).alias("p"),
            F.when(F.col("event_type") == "click", 1.0).otherwise(0.0).alias("y"),
        )
    )
    binned = scored.groupBy(
        F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("sum_p"),
        F.sum("y").alias("sum_y"),
        F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "sum_sq"
        ),
    )
    w = Window.partitionBy()
    gap = F.abs(F.col("sum_p") / F.col("n") - F.col("sum_y") / F.col("n"))
    return binned.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        stable_round(F.col("sum_p") / F.col("n"), 6).alias("avg_confidence"),
        stable_round(F.col("sum_y") / F.col("n"), 6).alias("obs_rate"),
        stable_round(gap, 6).alias("abs_gap"),
        stable_round(
            F.sum(F.col("n") * gap).over(w) / F.sum("n").over(w), 6
        ).alias("ece"),
        stable_round(F.sum("sum_sq").over(w) / F.sum("n").over(w), 6).alias(
            "brier"
        ),
    )


@query(
    "docs_rater_kappa",
    oracle=f"""
    WITH rated AS (
      SELECT source,
             CASE WHEN n_chars >= {KAPPA_MIN_CHARS} THEN 1 ELSE 0 END AS ra,
             CASE WHEN length(text) - length(replace(text, ' ', ''))
                  >= {KAPPA_MIN_SPACES} THEN 1 ELSE 0 END AS rb
      FROM documents
      WHERE text IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL
    ),
    tab AS (
      SELECT source, COUNT(*) AS n,
             AVG(CASE WHEN ra = rb THEN 1.0 ELSE 0.0 END) AS po,
             AVG(ra) AS pa, AVG(rb) AS pb
      FROM rated GROUP BY 1
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           ROUND(po + 1e-9, 6) AS p_observed,
           ROUND(pa * pb + (1 - pa) * (1 - pb) + 1e-9, 6) AS p_expected,
           CASE WHEN 1 - (pa * pb + (1 - pa) * (1 - pb)) > 1e-12 THEN
             ROUND((po - (pa * pb + (1 - pa) * (1 - pb)))
                   / (1 - (pa * pb + (1 - pa) * (1 - pb))) + 1e-9, 6)
           END AS kappa
    FROM tab
    """,
)
def docs_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per source between two closed-form document
    "raters" — rater A: ``n_chars >= KAPPA_MIN_CHARS`` (300), rater B:
    whitespace count ``>= KAPPA_MIN_SPACES`` (50) — the
    chance-corrected agreement statistic behind labeling-quality audits
    (kappa = (p_o - p_e) / (1 - p_e), NULL when agreement-by-chance
    saturates).  Both rules are exact integer predicates, so the 2x2
    table and kappa are bit-identical across engines; the fact
    collapses ONCE to per-source mergeable means."""
    rated = (
        load_table(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & F.col("source").isNotNull()
            & F.col("n_chars").isNotNull()
        )
        .select(
            "source",
            F.when(F.col("n_chars") >= KAPPA_MIN_CHARS, 1).otherwise(0).alias("ra"),
            F.when(
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
                >= KAPPA_MIN_SPACES,
                1,
            )
            .otherwise(0)
            .alias("rb"),
        )
    )
    tab = rated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.when(F.col("ra") == F.col("rb"), 1.0).otherwise(0.0)).alias("po"),
        F.avg("ra").alias("pa"),
        F.avg("rb").alias("pb"),
    )
    pe = F.col("pa") * F.col("pb") + (1 - F.col("pa")) * (1 - F.col("pb"))
    return tab.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        stable_round(F.col("po"), 6).alias("p_observed"),
        stable_round(pe, 6).alias("p_expected"),
        F.when(
            (1 - pe) > 1e-12,
            stable_round((F.col("po") - pe) / (1 - pe), 6),
        ).alias("kappa"),
    )
