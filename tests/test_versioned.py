"""Versioned snapshot publishing (sinks/versioned.py): atomic publish,
time travel, rollback, vacuum, crash-safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.sinks.versioned import (
    latest_version,
    list_versions,
    publish_version,
    read_version,
    rollback,
    vacuum,
)


def _df(spark, tag: str, n: int = 10):
    return spark.range(n).select("id", F.lit(tag).alias("tag"))


def test_publish_and_read_latest(spark, tmp_path):
    base = str(tmp_path / "tbl")
    assert publish_version(_df(spark, "a"), base) == 1
    assert publish_version(_df(spark, "b", 20), base) == 2
    assert latest_version(base) == 2
    got = read_version(spark, base)
    assert got.count() == 20 and got.first().tag == "b"


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    base = str(tmp_path / "tbl")
    publish_version(_df(spark, "a"), base)
    publish_version(_df(spark, "b"), base)
    old = read_version(spark, base, version=1)
    assert old.select("tag").distinct().collect() == [("a",)]


def test_rollback_is_pointer_only(spark, tmp_path):
    base = str(tmp_path / "tbl")
    publish_version(_df(spark, "a"), base)
    publish_version(_df(spark, "b"), base)
    rollback(base, 1)
    assert latest_version(base) == 1
    assert read_version(spark, base).first().tag == "a"
    assert list_versions(base) == [1, 2]  # v2 still on disk, re-rollable


def test_failed_write_leaves_pointer_and_data_untouched(spark, tmp_path):
    base = str(tmp_path / "tbl")
    publish_version(_df(spark, "a"), base)
    bad = _df(spark, "b").withColumn("boom", F.expr("cast(id as int) / 0"))
    # ANSI division by zero fails the job mid-write
    with pytest.raises(Exception):
        publish_version(bad.withColumn("boom", F.expr("1/0")), base)
    assert latest_version(base) == 1
    assert read_version(spark, base).first().tag == "a"
    # the failed attempt stayed in staging — never a v= dir
    assert list_versions(base) == [1]


def test_vacuum_keeps_pointer_target_and_recent(spark, tmp_path):
    base = str(tmp_path / "tbl")
    for tag in "abcd":
        publish_version(_df(spark, tag), base)
    rollback(base, 2)
    out = vacuum(base, keep_last=1)
    # keeps v4 (newest) AND v2 (pointer), removes 1 and 3
    assert out["removed"] == [1, 3]
    assert sorted(out["kept"]) == [2, 4]
    assert read_version(spark, base).first().tag == "b"
    with pytest.raises(FileNotFoundError):
        read_version(spark, base, version=3)


def test_vacuum_clears_staging_garbage(spark, tmp_path):
    base = str(tmp_path / "tbl")
    publish_version(_df(spark, "a"), base)
    garbage = os.path.join(base, "_staging", "vX-deadbeef")
    os.makedirs(garbage)
    vacuum(base)
    assert not os.path.exists(garbage)


def test_partitioned_publish_round_trips(spark, tmp_path):
    base = str(tmp_path / "tbl")
    df = spark.range(20).select("id", (F.col("id") % 2).alias("bucket"))
    publish_version(df, base, partition_by=["bucket"])
    got = read_version(spark, base)
    assert got.count() == 20
    assert set(r.bucket for r in got.select("bucket").distinct().collect()) == {0, 1}
