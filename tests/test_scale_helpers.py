"""Scale-path helpers: salted joins and bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.skew import salted_join
from bigdata_covid19_real_time_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
    )
    salted = (
        salted_join(orders, customer, ["o_custkey"], salt_by="o_orderkey", num_salts=4)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
    )
    p = {r.c_nationkey: (r.n, round(r.s, 2)) for r in plain.collect()}
    s = {r.c_nationkey: (r.n, round(r.s, 2)) for r in salted.collect()}
    assert p == s


def test_salted_join_spreads_hot_key(spark):
    # one key carries 90% of the fact rows; salts must split it
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("uniq"),
    )
    dim = spark.createDataFrame([(1, "hot"), (950, "cold")], "k long, v string")
    out = salted_join(fact, dim, ["k"], salt_by="uniq", num_salts=8)
    assert out.filter(F.col("v") == "hot").count() == 900
    # the hot key's rows really landed in >1 salt bucket
    salts = (
        fact.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("uniq"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert salts > 1


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-co-locates the join:
    the physical plan must contain no Exchange (the 100 TB pattern for
    repeatedly-joined fact tables)."""
    # (warehouse dir is a static conf; managed tables land in the
    # session default and are dropped in the finally block)
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("orders_b")
    lineitem.withColumnRenamed("l_orderkey", "o_orderkey").write.bucketBy(
        4, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("lineitem_b")
    try:
        joined = (
            spark.table("orders_b")
            .join(spark.table("lineitem_b"), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join must not shuffle either side: bucket layout already
        # co-locates matching keys
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and results are right
        rows = {r.o_orderstatus: r.q for r in joined.collect()}
        plain = {
            r.o_orderstatus: r.q
            for r in orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
            .collect()
        }
        assert rows == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
