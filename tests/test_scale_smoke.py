"""Closed-form scale smokes for the training-pipeline operators: run the
real plans on ~10^5-10^6 synthetic rows (orders of magnitude above the
parquet fixtures) and check results that are provable by construction —
the cheap insurance that a plan's correctness doesn't depend on the
tiny-corpus regime it was developed against."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.range_join import (
    bucketed_interval_join,
)
from bigdata_covid19_real_time_spark.operators.sampling import deterministic_sample
from bigdata_covid19_real_time_spark.operators.text import repetition_stats

EPOCH = "2024-01-01 00:00:00"


def test_range_join_tiling_intervals_match_every_point_once(spark):
    """500k points every 10 s; hourly intervals tile the whole span ->
    the bucketed join must match every point exactly once."""
    n = 500_000
    points = spark.range(n).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(EPOCH)) + F.col("id") * 10
        ).alias("ts"),
    )
    span_hours = (n * 10) // 3600 + 1
    intervals = spark.range(span_hours).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(EPOCH)) + F.col("id") * 3600
        ).alias("start"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(EPOCH)) + (F.col("id") + 1) * 3600
        ).alias("end"),
    )
    joined = bucketed_interval_join(
        points, intervals, "ts", "start", "end", bucket_seconds=3600
    )
    assert joined.count() == n  # exactly once each — no drops, no dupes
    # and the match is the arithmetically-correct interval
    bad = joined.filter(
        F.col("iid") != F.floor((F.col("pid") * 10) / 3600)
    ).count()
    assert bad == 0


def test_repetition_stats_closed_form_at_width(spark):
    """200k docs in two deterministic text classes -> exactly two metric
    signatures with the analytic values."""
    docs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("x x x y"))
        .otherwise(F.lit("p q r s"))
        .alias("text"),
    )
    out = (
        repetition_stats(docs)
        .groupBy("token_count", "ttr", "top_token_frac", "top_bigram_frac")
        .agg(F.count(F.lit(1)).alias("docs"))
        .collect()
    )
    got = {
        (r.token_count, round(r.ttr, 6), round(r.top_token_frac, 6),
         round(r.top_bigram_frac, 6)): r.docs
        for r in out
    }
    # "x x x y": 4 toks, 2 distinct, top 3/4; bigrams (x x, x x, x y) top 2/3
    # "p q r s": 4 toks, 4 distinct, top 1/4; 3 distinct bigrams top 1/3
    assert got == {
        (4, 0.5, 0.75, round(2 / 3, 6)): 100_000,
        (4, 1.0, 0.25, round(1 / 3, 6)): 100_000,
    }


def test_sampling_rate_and_nesting_at_width(spark):
    df = spark.range(2_000_000).withColumnRenamed("id", "k")
    small = deterministic_sample(df, 0.1, "k", seed=3)
    large = deterministic_sample(df, 0.25, "k", seed=3)
    n_small, n_large = small.count(), large.count()
    assert abs(n_small / 2_000_000 - 0.10) < 0.005
    assert abs(n_large / 2_000_000 - 0.25) < 0.005
    # nesting, verified distributively (no driver-side sets)
    assert small.join(large, "k", "left_anti").count() == 0
