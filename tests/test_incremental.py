"""Incremental aggregate maintenance (operators/incremental.py):
refresh-by-merge must equal full recompute, with snapshot semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.incremental import (
    read_aggregate,
    refresh_aggregate,
)
from bigdata_covid19_real_time_spark.sinks.versioned import rollback


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k STRING, v DOUBLE")


def _expect(spark, all_rows):
    return {
        r.k: r
        for r in _batch(spark, all_rows)
        .groupBy("k")
        .agg(
            F.count("v").alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("avg"),
        )
        .collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    d = str(tmp_path / "rollup")
    b1 = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    b2 = [("a", 5.0), ("c", -2.0)]
    b3 = [("b", 0.0), ("c", -8.0), ("a", 1.0)]
    assert refresh_aggregate(spark, d, _batch(spark, b1), ["k"], "v") == 1
    assert refresh_aggregate(spark, d, _batch(spark, b2), ["k"], "v") == 2
    assert refresh_aggregate(spark, d, _batch(spark, b3), ["k"], "v") == 3

    got = {r.k: r for r in read_aggregate(spark, d).collect()}
    want = _expect(spark, b1 + b2 + b3)
    assert set(got) == set(want)
    for k in want:
        for f in ("cnt", "total", "mn", "mx"):
            assert got[k][f] == want[k][f], (k, f)
        assert math.isclose(got[k].avg, want[k].avg)


def test_time_travel_reads_pre_batch_state(spark, tmp_path):
    d = str(tmp_path / "rollup")
    refresh_aggregate(spark, d, _batch(spark, [("a", 1.0)]), ["k"], "v")
    refresh_aggregate(spark, d, _batch(spark, [("a", 9.0)]), ["k"], "v")
    v1 = {r.k: r for r in read_aggregate(spark, d, version=1).collect()}
    assert v1["a"].cnt == 1 and v1["a"].total == 1.0


def test_rollback_then_refresh_discards_bad_batch(spark, tmp_path):
    d = str(tmp_path / "rollup")
    refresh_aggregate(spark, d, _batch(spark, [("a", 1.0)]), ["k"], "v")
    refresh_aggregate(spark, d, _batch(spark, [("a", 1e9)]), ["k"], "v")  # bad feed
    rollback(d, 1)
    refresh_aggregate(spark, d, _batch(spark, [("a", 2.0)]), ["k"], "v")
    got = {r.k: r for r in read_aggregate(spark, d).collect()}
    assert got["a"].cnt == 2 and got["a"].total == 3.0  # bad batch gone


def test_null_values_dont_count(spark, tmp_path):
    d = str(tmp_path / "rollup")
    df = spark.createDataFrame([("a", None), ("a", 4.0)], "k STRING, v DOUBLE")
    refresh_aggregate(spark, d, df, ["k"], "v")
    got = read_aggregate(spark, d).first()
    assert got.cnt == 1 and got.total == 4.0 and got.avg == 4.0


def test_streaming_refresh_via_foreachbatch(spark, tmp_path):
    """Incremental view maintenance as a streaming sink: each micro-batch
    folds into the versioned rollup via foreachBatch, and the final
    snapshot equals a batch recompute over all input — with one
    published version per non-empty epoch for time travel."""
    import json

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows1 = [{"k": "a", "v": 1.0}, {"k": "b", "v": 2.0}]
    rows2 = [{"k": "a", "v": 5.0}, {"k": "c", "v": 7.0}]
    (in_dir / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows1))

    d = str(tmp_path / "rollup")
    stream = (
        spark.readStream.schema("k STRING, v DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )

    def fold(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        refresh_aggregate(spark, d, batch_df, ["k"], "v")

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    (in_dir / "b2.jsonl").write_text("\n".join(json.dumps(r) for r in rows2))
    q2 = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = {r.k: r for r in read_aggregate(spark, d).collect()}
    want = _expect(
        spark, [("a", 1.0), ("b", 2.0), ("a", 5.0), ("c", 7.0)]
    )
    assert set(got) == set(want)
    for k in want:
        assert got[k].cnt == want[k].cnt and got[k].total == want[k].total
    # epoch 1 state is still readable (time travel across epochs)
    v1 = {r.k: r for r in read_aggregate(spark, d, version=1).collect()}
    assert set(v1) == {"a", "b"}


def test_null_ts_rows_ride_the_first_epoch(spark, tmp_path):
    """The events_incremental_rollup twin splits epochs with
    ``ts IS NULL OR ts < split`` / ``ts >= split``: NULL-timestamp rows
    must land in exactly one batch (not zero), so the incremental state
    equals the full recompute INCLUDING the NULL date group."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "rollup_null_ts")
    rows = [
        ("click", "2024-01-10 00:00:00", 1.0),
        ("click", None, 2.0),  # NULL ts — must not be dropped
        ("view", "2024-01-20 00:00:00", 3.0),
    ]
    events = spark.createDataFrame(
        rows, "event_type string, ts_s string, v double"
    ).select(
        "event_type",
        F.to_timestamp("ts_s").alias("ts"),
        F.to_date(F.to_timestamp("ts_s")).alias("event_date"),
        "v",
    )
    split = F.lit("2024-01-15").cast("timestamp")
    keys = ["event_type", "event_date"]
    refresh_aggregate(
        spark,
        d,
        events.filter(F.col("ts").isNull() | (F.col("ts") < split)).drop("ts"),
        keys,
        "v",
    )
    refresh_aggregate(
        spark, d, events.filter(F.col("ts") >= split).drop("ts"), keys, "v"
    )
    state = {
        (r["event_type"], r["event_date"]): r["cnt"]
        for r in read_aggregate(spark, d).collect()
    }
    assert len(state) == 3  # click/Jan10, click/NULL, view/Jan20
    assert state[("click", None)] == 1
