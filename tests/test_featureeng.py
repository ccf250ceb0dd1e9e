"""Hand-built-fixture tests for the feature-engineering batch (EWMA,
SCD2 build, winsorized stats, k-fold balance, readability, posting
lists) — each asserts a closed-form expected value."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.featureeng import (
    EWMA_ALPHA,
    KFOLD_K,
)


def _write(spark, d, name, rows, schema, post=None):
    df = spark.createDataFrame(rows, schema)
    if post is not None:
        df = post(df)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


def test_ewma_matches_adjusted_recursion(spark):
    """Two days of one user, x = [10, 20]: the adjust=True EWMA is
    x1 on day 1 and (x2 + r*x1)/(1 + r) on day 2 (r = 1 - alpha)."""
    rows = [
        (1, "2024-01-01 10:00:00", 7, "view", 4.0),
        (2, "2024-01-01 12:00:00", 7, "view", 6.0),  # day 1 total 10
        (3, "2024-01-02 09:00:00", 7, "view", 20.0),
    ]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "events", rows,
        "event_id long, ts_s string, user_id long, event_type string, value double",
        post=lambda df: df.select(
            "event_id", F.to_timestamp("ts_s").alias("ts"),
            "user_id", "event_type", "value",
        ),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {r["day"].isoformat(): r for r in
           QUERIES["events_value_ewma"](spark, d).collect()}
    r = 1.0 - EWMA_ALPHA
    assert got["2024-01-01"]["ewma"] == 10.0
    expect2 = round((20.0 + r * 10.0) / (1.0 + r) + 1e-9, 4)
    assert got["2024-01-02"]["ewma"] == expect2
    assert got["2024-01-01"]["day_value"] == 10.0


def test_scd2_versions_and_intervals(spark):
    """Orders P1, P1, P2 on days 1/5/9: two versions — P1 valid
    [d1, d9) and P2 open-ended with is_current."""
    rows = [
        (100, 1, "O", 10.0, "2024-01-01", "1-URGENT"),
        (101, 1, "O", 10.0, "2024-01-05", "1-URGENT"),
        (102, 1, "O", 10.0, "2024-01-09", "2-HIGH"),
    ]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, date_s string, o_orderpriority string",
        post=lambda df: df.select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            F.to_timestamp("date_s").alias("o_orderdate"), "o_orderpriority",
        ),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = sorted(
        QUERIES["customer_priority_scd2"](spark, d).collect(),
        key=lambda r: r["version"],
    )
    assert [r["priority"] for r in got] == ["1-URGENT", "2-HIGH"]
    assert got[0]["valid_from"].isoformat() == "2024-01-01"
    assert got[0]["valid_to"].isoformat() == "2024-01-09"
    assert not got[0]["is_current"]
    assert got[1]["valid_to"] is None and got[1]["is_current"]


def test_winsorized_clips_exact_percentile_boundaries(spark):
    """One brand, prices 1..20: p05 = 1.95, p95 = 19.05 (linear
    interpolation), exactly the min and max rows clip, and the
    winsorized mean stays 10.5 by symmetry."""
    li = [(i, 1, 1, 1, 1.0, float(i), 0.0, 0.0, "N", "O", "2024-01-01")
          for i in range(1, 21)]
    part = [(1, "p", "BRAND#1", "t", 1, 1.0)]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, ship_s string",
        post=lambda df: df.select(
            "*", F.to_timestamp("ship_s").alias("l_shipdate")
        ).drop("ship_s"),
    )
    _write(
        spark, d, "part", part,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["brand_winsorized_stats"](spark, d).collect()
    assert row["p_lo"] == 1.95 and row["p_hi"] == 19.05
    assert row["n_clipped"] == 2
    assert row["win_mean"] == 10.5  # 1->1.95 and 20->19.05 are symmetric


def test_kfold_partitions_customers_and_revenue(spark):
    """10 customers x 1 order of 100: folds are a partition (counts
    sum to 10), group-aware (orders follow customers 1:1), and
    revenue shares sum to 1."""
    cust = [(i, f"c{i}", 0, 0.0, "SEG") for i in range(10)]
    orders = [(1000 + i, i, "O", 100.0, "2024-01-01", "1-URGENT")
              for i in range(10)]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "customer", cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    _write(
        spark, d, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, date_s string, o_orderpriority string",
        post=lambda df: df.select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            F.to_timestamp("date_s").alias("o_orderdate"), "o_orderpriority",
        ),
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = QUERIES["customer_kfold_balance"](spark, d).collect()
    assert sum(r["n_customers"] for r in got) == 10
    assert all(0 <= r["fold"] < KFOLD_K for r in got)
    assert all(r["n_orders"] == r["n_customers"] for r in got)  # group-aware
    assert abs(sum(r["revenue_share"] for r in got) - 1.0) < 1e-6


def test_readability_single_doc_closed_form(spark):
    """'hello world.' -> 2 words, 1 sentence mark, 3 vowel groups:
    flesch = 206.835 - 1.015*2 - 84.6*1.5 = 77.905."""
    d = tempfile.mkdtemp()
    _write(
        spark, d, "documents",
        [(1, "hello world.", "en", "s", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["docs_readability"](spark, d).collect()
    assert row["words_per_sentence"] == 2.0
    assert row["syllables_per_word"] == 1.5
    assert row["flesch"] == 77.905


def test_posting_lists_df_band_and_sorted_ids(spark):
    """Bigram 'a b' appears in 6 docs (inside the DF band) with one
    doc repeating it; 'c d' appears in 2 (below the band, dropped).
    Postings come back sorted; tf_total counts occurrences."""
    docs = [(i, "a b a b" if i == 0 else "a b", "en", "s", 7)
            for i in range(6)]
    docs += [(10, "c d", "en", "s", 3), (11, "c d", "en", "s", 3)]
    d = tempfile.mkdtemp()
    _write(
        spark, d, "documents", docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = QUERIES["docs_posting_lists"](spark, d).collect()
    by_bg = {r["bigram"]: r for r in got}
    # 'b a' (df=1 from doc 0's repeat) and 'c d' (df=2) fall below the band
    assert set(by_bg) == {"a b"}
    assert by_bg["a b"]["df"] == 6
    assert by_bg["a b"]["postings"] == "0,1,2,3,4,5"
    # doc 0 contributes 2 occurrences + 1 each from docs 1-5 = 7
    assert by_bg["a b"]["tf_total"] == 7
