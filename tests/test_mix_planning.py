"""Hand-built-fixture tests for the mix-planning batch (temperature
mix, retention triangle, Neyman allocation, SRM check)."""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F


def _write(spark, d, name, rows, schema, post=None):
    df = spark.createDataFrame(rows, schema)
    if post is not None:
        df = post(df)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


def test_temperature_mix_upsamples_small_source(spark):
    """Source big: 9 docs x ~1000 tokens; source small: 1 doc x ~1000.
    With alpha = 0.3 the flattened weight of the small source exceeds
    its raw share, and the epoch count shows the repeat factor."""
    rows = []
    for i in range(9):
        rows.append((i, "w " * 999 + "w", "en", "big", 2000))
    rows.append((100, "w " * 999 + "w", "en", "small", 2000))
    d = tempfile.mkdtemp()
    _write(spark, d, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {r["source"]: r for r in
           QUERIES["docs_temperature_mix_plan"](spark, d).collect()}
    assert out["big"]["tokens"] == 9000 and out["small"]["tokens"] == 1000
    p_small, p_big = 0.1, 0.9
    w_small = p_small ** 0.3 / (p_small ** 0.3 + p_big ** 0.3)
    assert abs(out["small"]["mix_weight"] - w_small) < 1e-5
    assert out["small"]["mix_weight"] > out["small"]["raw_share"]
    # epochs = budget share / available tokens
    assert abs(out["small"]["epochs"]
               - 10_000_000 * w_small / 1000) < 0.1


def test_retention_triangle_closed_form(spark):
    """cust 1 orders in Jan/Feb/Apr, cust 2 in Jan only: cohort Jan has
    size 2, retention 1.0 at offset 0, 0.5 at offsets 1 and 3, and no
    offset-2 row."""
    rows = [
        (1, 1, "O", 10.0, "1995-01-05 00:00:00", "1-URGENT"),
        (2, 1, "O", 10.0, "1995-02-20 00:00:00", "1-URGENT"),
        (3, 1, "O", 10.0, "1995-04-01 00:00:00", "1-URGENT"),
        (4, 2, "O", 10.0, "1995-01-30 00:00:00", "1-URGENT"),
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "orders", rows,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate_s string, o_orderpriority string",
           post=lambda df: df.withColumn(
               "o_orderdate", F.to_timestamp("o_orderdate_s")
           ).drop("o_orderdate_s"))
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {r["month_offset"]: r for r in
           QUERIES["customer_retention_triangle"](spark, d).collect()}
    assert set(out) == {0, 1, 3}
    assert out[0]["n_cohort"] == 2 and out[0]["retention"] == 1.0
    assert out[1]["retention"] == 0.5 and out[3]["retention"] == 0.5


def test_neyman_allocation_zero_variance_stratum(spark):
    """Stratum 'flat' has constant value (sd 0) -> zero allocation;
    stratum 'noisy' takes the whole budget.  A singleton stratum's
    NULL sample-std coalesces to 0."""
    rows = []
    eid = 0
    for v in [5.0, 5.0, 5.0, 5.0]:
        rows.append((eid := eid + 1, "2024-01-01 00:00:00", 1, "flat", v, None))
    for v in [1.0, 9.0, 2.0, 8.0]:
        rows.append((eid := eid + 1, "2024-01-01 00:00:00", 1, "noisy", v, None))
    rows.append((eid := eid + 1, "2024-01-01 00:00:00", 1, "lonely", 3.0, None))
    d = tempfile.mkdtemp()
    _write(spark, d, "events", rows,
           "event_id long, ts_s string, user_id long, event_type string, "
           "value double, props string",
           post=lambda df: df.select(
               "event_id", F.to_timestamp("ts_s").alias("ts"),
               "user_id", "event_type", "value", "props"))
    from bigdata_covid19_real_time_spark.plans import QUERIES

    out = {r["event_type"]: r for r in
           QUERIES["events_neyman_allocation"](spark, d).collect()}
    assert out["flat"]["value_sd"] == 0.0 and out["flat"]["n_sampled"] == 0
    assert out["lonely"]["value_sd"] == 0.0 and out["lonely"]["n_sampled"] == 0
    assert out["noisy"]["alloc_frac"] == 1.0
    assert out["noisy"]["n_sampled"] == 1000


def _expected_arm(user_id: int, seed: int = 11) -> int:
    digest = hashlib.md5(f"{seed}:{user_id}".encode()).hexdigest()
    return (int(digest[:15], 16) % 1_000_000) % 2


def test_srm_check_replays_hash_assignment(spark):
    """Arm counts equal a python replay of the md5 assignment, the
    chi-square matches the closed form, and a clearly imbalanced type
    raises the flag only when it should."""
    rows, eid = [], 0
    users = list(range(1, 41))
    for u in users:
        rows.append((eid := eid + 1, "2024-01-01 00:00:00", u, "view", 1.0, None))
        rows.append((eid := eid + 1, "2024-01-02 00:00:00", u, "view", 2.0, None))
    d = tempfile.mkdtemp()
    _write(spark, d, "events", rows,
           "event_id long, ts_s string, user_id long, event_type string, "
           "value double, props string",
           post=lambda df: df.select(
               "event_id", F.to_timestamp("ts_s").alias("ts"),
               "user_id", "event_type", "value", "props"))
    from bigdata_covid19_real_time_spark.plans import QUERIES

    [row] = QUERIES["events_ab_srm_check"](spark, d).collect()
    n_a = sum(1 for u in users if _expected_arm(u) == 0)
    n_b = len(users) - n_a
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    assert abs(row["chi2"] - chi2) < 1e-6
    assert row["srm_flag"] == (chi2 > 3.841)
