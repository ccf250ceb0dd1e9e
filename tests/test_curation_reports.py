"""Hand-built-fixture tests for the curation diagnostics reports
(filter funnel, source overlap matrix, dup cluster sizes, embedding
norm outliers, gaps-and-islands runs)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def _write(spark, d, name, rows, schema, post=None):
    df = spark.createDataFrame(rows, schema)
    if post is not None:
        df = post(df)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


def test_filter_funnel_totals_consistent(spark):
    """On the real sf0.001 corpus: total = kept + any_failed, every
    per-rule count <= any_failed, and fracs sum sanely."""
    from bigdata_covid19_real_time_spark.plans import QUERIES

    rows = {
        r["stage"]: (r["n_docs"], r["frac"])
        for r in QUERIES["docs_filter_funnel"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    total, kept, failed = (
        rows["total"][0], rows["kept"][0], rows["any_failed"][0]
    )
    assert total == kept + failed and total > 0
    assert abs(rows["total"][1] - 1.0) < 1e-9
    for stage, (n, _) in rows.items():
        if stage not in ("total", "kept", "any_failed"):
            assert 0 < n <= failed, (stage, n, failed)


def test_source_overlap_known_jaccard(spark):
    """Two sources with gram sets {abc, bcd} ('a b c d') and {abc}
    ('a b c'): shared 1, jaccard 1/2; a third source with disjoint
    vocab pairs with nothing (absent rows)."""
    rows = [
        (1, "a b c d", "s1"),
        (2, "a b c", "s2"),
        (3, "x y z w", "s3"),
    ]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "documents", rows,
        "doc_id long, text string, source string",
        post=lambda df: df.withColumn("lang", F.lit("en")).withColumn(
            "n_chars", F.length("text")
        ),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {
        (r["src_a"], r["src_b"]): (r["n_shared"], r["jaccard"])
        for r in QUERIES["source_overlap_matrix"](spark, d).collect()
    }
    assert got == {("s1", "s2"): (1, 0.5)}


def test_dup_cluster_sizes_known(spark):
    """Texts: A x3 (whitespace/case variants normalize together),
    B x1: clusters {3: 1 cluster 3 docs, 1: 1 cluster 1 doc}."""
    rows = [
        (1, "Hello   World", "s"),
        (2, "hello world", "s"),
        (3, "  HELLO WORLD ", "s"),
        (4, "unique doc", "s"),
    ]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "documents", rows,
        "doc_id long, text string, source string",
        post=lambda df: df.withColumn("lang", F.lit("en")).withColumn(
            "n_chars", F.length("text")
        ),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in QUERIES["docs_dup_cluster_sizes"](spark, d).collect()
    }
    assert got == {3: (1, 3), 1: (1, 1)}


def test_norm_outliers_flags_planted_vector(spark):
    """49 unit-norm vectors + one norm-100 vector in one label: the
    planted vector is the single 3-sigma outlier."""
    rows = [(i, [1.0, 0.0], 7) for i in range(49)]
    rows.append((99, [100.0, 0.0], 7))
    d = tempfile.mkdtemp()
    _write(
        spark, d, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = QUERIES["embedding_norm_outliers"](spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_vecs"] == 50 and r["n_outliers"] == 1
    assert abs(r["mean_norm"] - (49 * 1.0 + 100.0) / 50) < 1e-6


def test_event_runs_gaps_and_islands(spark):
    """User stream A A B A: runs AA, B, A -> for type A: 2 runs, avg
    1.5, max 2; for B: 1 run of 1."""
    rows = [
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 00:01:00", "A"),
        (3, 1, "2024-01-01 00:02:00", "B"),
        (4, 1, "2024-01-01 00:03:00", "A"),
    ]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "events", rows,
        "event_id long, user_id long, ts_s string, event_type string",
        post=lambda df: df.select(
            "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"),
            "event_type",
        ).withColumn("value", F.lit(1.0)).withColumn("props", F.lit("{}")),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {
        r["event_type"]: (r["n_runs"], r["avg_run_len"], r["max_run_len"])
        for r in QUERIES["user_event_runs"](spark, d).collect()
    }
    assert got == {"A": (2, 1.5, 2), "B": (1, 1.0, 1)}
