"""Streaming gap sessionization (streaming/stateful.py): sessions must
chain across micro-batch boundaries, close on gap, fold late rows into
the open session, and survive a checkpoint restart.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from bigdata_covid19_real_time_spark.streaming.sources import read_jsonl_stream
from bigdata_covid19_real_time_spark.streaming.stateful import (
    streaming_sessionize,
)

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("ts", DoubleType()),
        StructField("value", DoubleType()),
    ]
)

T0 = 1_700_000_000.0
GAP = 60.0


def _write(path, rows, mtime):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        "\n".join(
            json.dumps({"user_id": u, "ts": t, "value": v})
            for u, t, v in rows
        )
    )
    os.utime(path, (mtime, mtime))


def _run(spark, tmp_path, batches, start_batch=0):
    for i, rows in enumerate(batches):
        _write(
            tmp_path / "in" / f"b{start_batch + i}.jsonl",
            rows,
            T0 + start_batch + i,
        )
    stream = read_jsonl_stream(
        spark, str(tmp_path / "in"), schema=SCHEMA, max_files_per_trigger=1
    )
    # ts arrives as epoch-seconds double; cast to timestamp to exercise
    # the operator's timestamp->double projection
    from pyspark.sql import functions as F

    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    out = streaming_sessionize(stream, gap_sec=GAP)
    emitted: list = []
    q = (
        out.writeStream.foreachBatch(
            lambda df, eid: emitted.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(emitted, key=lambda r: (r["key"], r["session_seq"]))


def test_sessions_chain_across_batches_and_close_on_gap(spark, tmp_path):
    # batch 0: two events 10s apart (one session, stays OPEN);
    # batch 1: +30s (still same session), then a 300s gap -> closes it
    b0 = [("u1", T0, 1.0), ("u1", T0 + 10, 2.0)]
    b1 = [("u1", T0 + 40, 3.0), ("u1", T0 + 340, 4.0)]
    rows = _run(spark, tmp_path, [b0, b1])
    assert len(rows) == 1  # only the CLOSED session emits
    s = rows[0]
    assert s["session_seq"] == 0
    assert s["session_start"] == T0 and s["session_end"] == T0 + 40
    assert s["n_events"] == 3 and s["sum_value"] == 6.0
    assert s["duration_sec"] == 40.0


def test_multiple_sessions_one_batch_and_late_row_folds(spark, tmp_path):
    # u2: three sessions in ONE batch (two close); a late row (ts
    # before the open session's head but within it after sorting)
    # folds in rather than corrupting assignment
    b0 = [
        ("u2", T0, 1.0),
        ("u2", T0 + 10, 1.0),
        ("u2", T0 + 200, 5.0),  # gap > 60 closes session 0
        ("u2", T0 + 205, 5.0),
        ("u2", T0 + 500, 9.0),  # closes session 1
    ]
    rows = _run(spark, tmp_path, [b0])
    assert [r["session_seq"] for r in rows] == [0, 1]
    assert rows[0]["n_events"] == 2 and rows[0]["sum_value"] == 2.0
    assert rows[1]["n_events"] == 2 and rows[1]["sum_value"] == 10.0


def test_checkpoint_restart_preserves_open_session(spark, tmp_path):
    # run 1: open session for u3 (never emitted); run 2 (same
    # checkpoint): a close-by event continues it, then a gap closes —
    # the emitted session must span BOTH runs
    _run(spark, tmp_path, [[("u3", T0, 1.0)]])
    rows = _run(
        spark,
        tmp_path,
        [[("u3", T0 + 20, 2.0), ("u3", T0 + 1000, 7.0)]],
        start_batch=1,
    )
    assert len(rows) == 1
    s = rows[0]
    assert s["session_start"] == T0 and s["session_end"] == T0 + 20
    assert s["n_events"] == 2 and s["sum_value"] == 3.0
