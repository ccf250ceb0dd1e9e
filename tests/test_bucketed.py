"""Bucketed tables: co-located joins plan with zero exchanges
(sinks/bucketed.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.sinks.bucketed import (
    bucket_spec,
    write_bucketed_table,
)


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    b = spark.range(2500).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    write_bucketed_table(a, "bkt_a", "k", 8)
    write_bucketed_table(b, "bkt_b", "k", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the write-time shuffle is the ONLY shuffle: the join itself
        # plans exchange-free on both pre-bucketed sides
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert j.count() == 2500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_aggregation_skips_shuffle(spark, bucketed_pair):
    agg = spark.table("bkt_a").groupBy("k").agg(F.sum("x"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_bucket_spec_roundtrip(spark, bucketed_pair):
    spec = bucket_spec(spark, "bkt_a")
    assert spec == {"columns": ["k"], "n": 8}
    df = spark.range(3).select(F.col("id").alias("k"))
    df.write.mode("overwrite").format("parquet").saveAsTable("bkt_plain")
    try:
        assert bucket_spec(spark, "bkt_plain") is None
    finally:
        spark.sql("DROP TABLE bkt_plain")
