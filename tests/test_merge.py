"""Row-level MERGE and snapshot diff (operators/merge.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.merge import merge_into, snapshot_diff


def _t(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING")


def test_merge_update_insert_delete_carryover(spark):
    target = _t(spark, [(1, "a"), (2, "b"), (3, "c")])
    source = _t(spark, [(2, "B"), (3, "dead"), (4, "d")])
    out = {
        r.k: r.v
        for r in merge_into(
            target, source, "k", delete_when=F.col("v") == "dead"
        ).collect()
    }
    assert out == {1: "a", 2: "B", 4: "d"}  # carry, update, insert; 3 deleted


def test_unmatched_tombstone_never_inserts(spark):
    target = _t(spark, [(1, "a")])
    source = _t(spark, [(9, "dead")])
    out = merge_into(target, source, "k", delete_when=F.col("v") == "dead").collect()
    assert {r.k for r in out} == {1}


def test_merge_without_deletes_is_upsert(spark):
    target = _t(spark, [(1, "a")])
    source = _t(spark, [(1, "A"), (2, "b")])
    out = {r.k: r.v for r in merge_into(target, source, "k").collect()}
    assert out == {1: "A", 2: "b"}


def test_merge_schema_mismatch_rejected(spark):
    with pytest.raises(ValueError):
        merge_into(
            _t(spark, [(1, "a")]),
            spark.createDataFrame([(1, "a")], "k INT, other STRING"),
            "k",
        )


def test_snapshot_diff_classifies_changes(spark):
    old = _t(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _t(spark, [(1, "a"), (2, "B"), (4, "d")])
    out = {r.k: (r.v, r.change_type) for r in snapshot_diff(old, new, "k").collect()}
    assert out == {2: ("B", "update"), 3: ("c", "delete"), 4: ("d", "insert")}
    # unchanged row 1 absent
    assert 1 not in out


def test_diff_of_merge_recovers_the_merge(spark):
    target = _t(spark, [(1, "a"), (2, "b"), (3, "c")])
    source = _t(spark, [(2, "B"), (3, "dead"), (4, "d")])
    merged = merge_into(target, source, "k", delete_when=F.col("v") == "dead")
    out = {r.k: r.change_type for r in snapshot_diff(target, merged, "k").collect()}
    assert out == {2: "update", 3: "delete", 4: "insert"}


def test_diff_identical_snapshots_is_empty(spark):
    t = _t(spark, [(1, "a"), (2, "b")])
    assert snapshot_diff(t, _t(spark, [(2, "b"), (1, "a")]), "k").count() == 0


def test_diff_detects_null_position_swap(spark):
    """xxhash64 skips NULL inputs, so (NULL,'x') -> ('x',NULL) would
    hash identically if the digest hashed bare values; the null-flag
    interleave must classify the swap as an update."""
    schema = "k INT, a STRING, b STRING"
    old = spark.createDataFrame([(1, None, "x"), (2, "s", None)], schema)
    new = spark.createDataFrame([(1, "x", None), (2, None, "s")], schema)
    out = snapshot_diff(old, new, "k").collect()
    assert sorted((r["k"], r["change_type"]) for r in out) == [
        (1, "update"),
        (2, "update"),
    ]


def test_diff_null_flags_do_not_false_positive(spark):
    """Rows identical including their null pattern stay absent from the
    feed (the flag interleave must not perturb equal rows)."""
    schema = "k INT, a STRING, b STRING"
    old = spark.createDataFrame([(1, None, "x"), (2, None, None)], schema)
    new = spark.createDataFrame([(1, None, "x"), (2, None, None)], schema)
    assert snapshot_diff(old, new, "k").count() == 0
