"""Hand-built-fixture tests for the model-evaluation batch (grouped
AUC, retrieval metrics, calibration, Cohen's kappa)."""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F


def _write(spark, d, name, rows, schema, post=None):
    df = spark.createDataFrame(rows, schema)
    if post is not None:
        df = post(df)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate_s string"
)


def _li_row(okey, discount, flag, year):
    return (okey, 1, 1, 1, 1.0, 1.0, discount, 0.0, flag, "O",
            f"{year}-06-01")


def test_auc_perfect_reversed_and_tied(spark):
    """Year 2001: every positive outscores every negative -> AUC 1.0.
    Year 2002: reversed -> 0.0.  Year 2003: one shared score -> the
    tie-correction yields exactly 0.5."""
    rows = []
    k = 0
    for flag, disc in [("R", 0.9), ("N", 0.1)]:
        for _ in range(3):
            rows.append(_li_row(k := k + 1, disc, flag, 2001))
    for flag, disc in [("R", 0.1), ("N", 0.9)]:
        for _ in range(3):
            rows.append(_li_row(k := k + 1, disc, flag, 2002))
    for flag in ["R", "N", "R", "N"]:
        rows.append(_li_row(k := k + 1, 0.5, flag, 2003))
    d = tempfile.mkdtemp()
    _write(spark, d, "lineitem", rows, LI_SCHEMA,
           post=lambda df: df.withColumn(
               "l_shipdate", F.to_date("l_shipdate_s")).drop("l_shipdate_s"))
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {r["ship_year"]: r for r in
           QUERIES["lineitem_discount_auc"](spark, d).collect()}
    assert out[2001]["auc"] == 1.0 and out[2001]["n_pos"] == 3
    assert out[2002]["auc"] == 0.0
    assert out[2003]["auc"] == 0.5


def test_calibration_known_bin_and_brier(spark):
    """Four events at p = 0.5 (value 250), two of them clicks: the
    single occupied bin has zero gap (ECE 0) and Brier is exactly
    0.25."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 250.0, None),
        (2, "2024-01-01 00:01:00", 1, "click", 250.0, None),
        (3, "2024-01-01 00:02:00", 1, "view", 250.0, None),
        (4, "2024-01-01 00:03:00", 1, "view", 250.0, None),
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "events", rows,
           "event_id long, ts_s string, user_id long, event_type string, "
           "value double, props string",
           post=lambda df: df.select(
               "event_id", F.to_timestamp("ts_s").alias("ts"),
               "user_id", "event_type", "value", "props"))
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["events_click_calibration"](spark, d).collect()
    assert row["bin"] == 5 and row["n"] == 4
    assert row["avg_confidence"] == 0.5 and row["obs_rate"] == 0.5
    assert row["abs_gap"] == 0.0 and row["ece"] == 0.0
    assert row["brier"] == 0.25


def _doc(doc_id, source, n_chars, n_spaces):
    text = ("w" * max(n_chars - n_spaces, 1)) + (" " * n_spaces)
    return (doc_id, text, "en", source, n_chars)


def test_kappa_agreement_independence_and_saturation(spark):
    """Source 'agree': raters always match with mixed marginals ->
    kappa 1.  Source 'indep': the four (a, b) cells equally filled ->
    kappa 0.  Source 'both_pos': p_expected saturates at 1 -> NULL."""
    rows = [
        # agree: (1,1) x2 and (0,0) x2  (A: n_chars >= 300, B: spaces >= 50)
        _doc(1, "agree", 400, 60), _doc(2, "agree", 400, 60),
        _doc(3, "agree", 100, 10), _doc(4, "agree", 100, 10),
        # indep: one doc in each agreement cell
        _doc(5, "indep", 400, 60), _doc(6, "indep", 400, 10),
        _doc(7, "indep", 100, 60), _doc(8, "indep", 100, 10),
        # both_pos: everyone positive on both raters
        _doc(9, "both_pos", 400, 60), _doc(10, "both_pos", 500, 70),
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {r["source"]: r for r in
           QUERIES["docs_rater_kappa"](spark, d).collect()}
    assert out["agree"]["kappa"] == 1.0
    assert out["indep"]["kappa"] == 0.0
    assert out["both_pos"]["kappa"] is None
    assert out["both_pos"]["p_expected"] == 1.0


def test_retrieval_metrics_closed_form(spark):
    """Query 0 (label 1) against a 3-vector corpus with a known cosine
    order: ranks are [10, 11, 12], relevance [1, 0, 1], so hits 2,
    MRR 1, and NDCG matches the closed-form DCG/IDCG ratio with
    n_corpus_rel = 2."""
    rows = [
        (0, [1.0, 0.0], 1),          # query
        (10, [1.0, 0.0], 1),         # cosine 1.0, relevant
        (11, [0.9, 0.1], 2),         # cosine ~0.994, irrelevant
        (12, [0.0, 1.0], 1),         # cosine 0.0, relevant
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "embeddings", rows,
           "vec_id long, embedding array<float>, label int")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["embedding_retrieval_metrics"](spark, d).collect()
    assert row["query_id"] == 0 and row["query_label"] == 1
    assert row["n_corpus_rel"] == 2 and row["hits10"] == 2
    assert row["precision10"] == 0.2 and row["mrr"] == 1.0
    dcg = 1.0 / math.log2(2) + 1.0 / math.log2(4)
    idcg = 1.0 / math.log2(2) + 1.0 / math.log2(3)
    assert abs(row["ndcg10"] - dcg / idcg) < 1e-6
