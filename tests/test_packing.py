"""Sequence-packing operator invariants."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.packing import pack_sequences


def _pack(spark, n=300, budget=64):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 + 1).alias("ntok"),
    )
    return df, pack_sequences(df, F.col("ntok"), budget=budget), budget


def test_layout_matches_serial_reference(spark):
    df, packed, budget = _pack(spark)
    rows = {r["doc_id"]: r for r in packed.collect()}
    # serial reference: sort by md5(str(id)), exclusive cumsum
    ids = sorted(range(300), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    off = 0
    for pos, i in enumerate(ids, start=1):
        tok = i % 37 + 1
        r = rows[i]
        assert r["shuffle_pos"] == pos
        assert r["token_count"] == tok
        assert r["seq_id"] == off // budget
        assert r["seq_pos"] == off % budget
        off += tok


def test_shuffle_pos_is_permutation_and_pos_bounded(spark):
    _, packed, budget = _pack(spark)
    rows = packed.collect()
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(1, 301))
    assert all(0 <= r["seq_pos"] < budget for r in rows)
    assert all(r["seq_id"] >= 0 for r in rows)


def test_no_single_partition_global_window(spark):
    import contextlib
    import io

    df, packed, _ = _pack(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        packed.explain("formatted")
    plan = buf.getvalue()
    # the corpus-sized window must be partitioned by bucket; only the
    # 256-row totals window may be global
    for block in plan.split("\n\n"):
        if "Window" in block and "partial" not in block:
            assert "bucket" in plan
