"""Round-8 hardening guards (VERDICT r7 #5 + ADVICE items).

Pins: (1) the stream-replay harness refuses to detach an
unexpectedly-large memory-sink result to the driver instead of
silently ballooning; (2) the harness refuses to run under a non-UTC
session (the pandas detach would silently shift timestamps); (3) the
corpus history read distinguishes a benign empty-commit directory
(only _SUCCESS) from a directory whose data files failed to read —
the latter fails the batch; (4) the per-epoch cache sweep defaults to
BLOCKING teardown (the async variant races the next job's
execution-memory acquisition — observed UnsafeInMemorySorter NPE).
"""

from __future__ import annotations

import inspect

import pytest


def test_run_to_memory_requires_utc_session(spark):
    from bigdata_covid19_real_time_spark.plans.stream_replay import (
        _run_to_memory,
    )

    df = spark.range(1)  # the tz check fires before any streaming use
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(RuntimeError, match="timeZone=UTC"):
            _run_to_memory(df, "/tmp/doesnotmatter_x", "tzguard")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_run_to_memory_result_size_guard(spark, monkeypatch):
    """An SF bump past the documented driver-detach bound fails loudly
    (RuntimeError naming the bound), never a silent toPandas balloon."""
    from bigdata_covid19_real_time_spark.plans import stream_replay

    monkeypatch.setattr(stream_replay, "MAX_SINK_ROWS", 5)
    with pytest.raises(RuntimeError, match="driver-detach bound"):
        stream_replay.events_stream_dedup_replay(
            spark, "/root/testdata/sf0.001"
        )
    # the guard also drops the sink view on the error path
    assert not [
        t for t in spark.catalog.listTables() if t.name.startswith("sr_dedup")
    ]


def test_history_table_empty_dir_is_none_unreadable_raises(spark, tmp_path):
    from bigdata_covid19_real_time_spark.streaming.corpus import (
        CorpusIngest,
        _has_data_files,
    )

    ingest = CorpusIngest(str(tmp_path))
    # missing dir -> no history yet
    assert ingest._history_table(spark, "accepted", 1) is None
    # empty-commit layout: only metadata markers -> still no history
    acc = tmp_path / "accepted"
    (acc / "epoch=0").mkdir(parents=True)
    (acc / "_SUCCESS").write_text("")
    (acc / "epoch=0" / ".part-0.crc").write_bytes(b"\x00")
    assert not _has_data_files(str(acc))
    assert ingest._history_table(spark, "accepted", 1) is None
    # staged leftovers from a CRASHED write live under hidden dirs
    # (_temporary, .spark-staging-*) that Spark's reader ignores —
    # they must NOT count as data, or every retry of the crashed
    # batch would fail forever instead of recovering
    staged = acc / "_temporary" / "0" / "task_0"
    staged.mkdir(parents=True)
    (staged / "part-00000-attempt.parquet").write_bytes(b"staged bytes")
    assert not _has_data_files(str(acc))
    assert ingest._history_table(spark, "accepted", 1) is None
    # a committed DATA file that cannot be read is a storage fault,
    # not "no history": the batch must fail so the trigger retries it
    (acc / "epoch=0" / "part-00000.parquet").write_bytes(b"not a parquet")
    assert _has_data_files(str(acc))
    with pytest.raises(Exception):
        df = ingest._history_table(spark, "accepted", 1)
        # some failures surface only at read time, not inference time
        if df is not None:
            df.collect()


def test_cache_sweep_blocks_by_default():
    from bigdata_covid19_real_time_spark.streaming.corpus import CorpusIngest

    sig = inspect.signature(CorpusIngest._unpersist_new_since)
    assert sig.parameters["blocking"].default is True
