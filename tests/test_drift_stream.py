"""Streaming drift monitor (streaming/stateful.py): Welford baseline +
two-sided Page CUSUM across micro-batches."""

from __future__ import annotations

import json
import math
import os

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from bigdata_covid19_real_time_spark.streaming.sources import read_jsonl_stream
from bigdata_covid19_real_time_spark.streaming.stateful import (
    streaming_drift_monitor,
)

SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

# baseline batches: mean 10, sd ~1 (alternating 9/11);
# drift batch: constant 20 — a +10-sigma-level shift
BASE = [9.0, 11.0] * 10
SHIFT = [20.0] * 10


def _write(path, values, mtime):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        "\n".join(
            json.dumps({"event_type": "click", "value": v}) for v in values
        )
    )
    # the file source orders ties arbitrarily: Hadoop mtimes have
    # millisecond granularity, and four sub-ms writes all tie — space
    # them a second apart so oldest-first processing is deterministic
    os.utime(path, (mtime, mtime))


def _run(spark, tmp_path, batches):
    t0 = 1_700_000_000
    for i, vals in enumerate(batches):
        _write(tmp_path / "in" / f"b{i}.jsonl", vals, t0 + i)
    stream = read_jsonl_stream(
        spark, str(tmp_path / "in"), schema=SCHEMA, max_files_per_trigger=1
    )
    out = streaming_drift_monitor(stream)
    emitted: list = []
    q = (
        out.writeStream.foreachBatch(
            lambda df, eid: emitted.extend((eid, r) for r in df.collect())
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(emitted, key=lambda er: er[0])


def test_drift_fires_on_level_shift(spark, tmp_path):
    rows = _run(spark, tmp_path, [BASE, BASE, SHIFT])
    by_epoch = {e: r for e, r in rows}
    assert len(by_epoch) == 3

    # epoch 0: no baseline yet -> z=0, no drift
    assert by_epoch[0]["z"] == 0.0 and not by_epoch[0]["drift"]
    # epoch 1: same distribution -> |z| small, no drift
    assert abs(by_epoch[1]["z"]) < 3.0 and not by_epoch[1]["drift"]
    # epoch 2: +10 shift vs sd~1 baseline -> huge z, drift fires
    assert by_epoch[2]["z"] > 5.0 and by_epoch[2]["drift"]
    assert by_epoch[2]["cusum_pos"] > 5.0

    # Welford baseline is cumulative across batches
    assert by_epoch[2]["n_total"] == len(BASE) * 2 + len(SHIFT)
    expected_mean = (sum(BASE) * 2 + sum(SHIFT)) / (len(BASE) * 2 + len(SHIFT))
    assert abs(by_epoch[2]["mean"] - expected_mean) < 1e-9


def test_drift_negative_side_and_no_false_alarm(spark, tmp_path):
    low = [0.0] * 10  # -10 shift: fires the NEGATIVE cusum side
    rows = _run(spark, tmp_path, [BASE, BASE, BASE, low])
    by_epoch = {e: r for e, r in rows}
    # three stable epochs never alarm
    assert not any(by_epoch[e]["drift"] for e in (0, 1, 2))
    assert by_epoch[3]["z"] < -5.0 and by_epoch[3]["drift"]
    assert by_epoch[3]["cusum_neg"] > 5.0
    # exact Welford sd sanity vs closed form on the stable prefix
    n = len(BASE) * 3
    mean = sum(BASE * 3) / n
    var = sum((v - mean) ** 2 for v in BASE * 3) / (n - 1)
    assert abs(by_epoch[2]["sd"] - math.sqrt(var)) < 1e-9
