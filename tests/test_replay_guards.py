"""Round-8/9 hardening guards (VERDICT r7 #5 / r8 #1-2 + ADVICE items).

Pins: (1) the stream-replay harness refuses to detach an
unexpectedly-large memory-sink result to the driver instead of
silently ballooning; (2) the harness refuses to run under a non-UTC
session (epoch slicing and the timestamp_ntz re-casts would silently
shift); (3) the corpus history read distinguishes a benign
empty-commit directory (only _SUCCESS) from a directory whose data
files failed to read — the latter fails the batch; (4) the per-epoch
cache sweep defaults to BLOCKING teardown (the async variant races the
next job's execution-memory acquisition — observed
UnsafeInMemorySorter NPE); (5) the memory-sink detach is
Arrow-INDEPENDENT — the round-8 driver gate errored because the old
toPandas -> createDataFrame round-trip rejected null-padded LongType
columns under the driver's Arrow-off session.
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
    (RuntimeError naming the bound), never a silent memory-sink
    balloon on the driver."""
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


def test_replay_detach_null_padded_longs_with_arrow_off(spark):
    """Round-8 driver defect, pinned red-then-green: the driver's
    session runs with spark.sql.execution.arrow.pyspark.enabled=false,
    and the old pandas detach rejected the outer-join replays'
    null-padded LongType columns there (`LongType() can not accept
    object 130.0`).  The detach is now a scratch-parquet write +
    schema-pinned re-read (pure JVM), so the SAME null-padded replay
    must produce typed rows — matched longs as ints, unmatched as None
    — with Arrow explicitly OFF."""
    from bigdata_covid19_real_time_spark.plans import QUERIES

    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        out = QUERIES["events_stream_interval_join_left_replay"](
            spark, "/root/testdata/sf0.001"
        )
        rows = out.collect()
    finally:
        spark.conf.set(key, prev)
    assert dict(out.dtypes)["purchase_id"] == "bigint"
    matched = [r for r in rows if r["purchase_id"] is not None]
    padded = [r for r in rows if r["purchase_id"] is None]
    assert matched and padded, "gate degenerated — both paths must emit"
    assert all(isinstance(r["purchase_id"], int) for r in matched)


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


def test_decontam_id_band_guard(spark, tmp_path):
    """The decontam gate's copy/novel classification is doc_id band
    arithmetic (round-9 advice #1): a corpus whose real ids reach
    COPY_ID_OFFSET must FAIL LOUDLY (the gate would silently misread a
    real doc as a planted copy), while a ZERO-ROW corpus passes
    vacuously (no id can collide; the round-10 EMPTYCHECK regression —
    an empty parquet has no row-group stats to read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_covid19_real_time_spark.plans.stream_replay import (
        COPY_ID_OFFSET,
        docs_stream_decontam_replay,
    )

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, COPY_ID_OFFSET + 5],
                "text": ["a", "b"],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": [1, 1],
            },
            schema=schema,
        ),
        str(bad / "documents.parquet"),
    )
    with pytest.raises(RuntimeError, match="id band"):
        docs_stream_decontam_replay(spark, str(bad))

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(schema.empty_table(), str(empty / "documents.parquet"))
    out = docs_stream_decontam_replay(spark, str(empty))
    # only the planted novel probes survive an empty corpus
    assert all(r["source"] == "probe" for r in out.collect())

    # stats-less footer (round-10 advice #1): when ANY row group lacks
    # doc_id statistics the footer alone cannot bound the band — the
    # guard must fall back to a distributed max and still fail loudly
    # on an out-of-band id, not silently underestimate from whatever
    # stats-bearing groups exist
    nostats = tmp_path / "nostats"
    nostats.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, COPY_ID_OFFSET + 5],
                "text": ["a", "b"],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": [1, 1],
            },
            schema=schema,
        ),
        str(nostats / "documents.parquet"),
        write_statistics=False,
        row_group_size=1,
    )
    with pytest.raises(RuntimeError, match="id band"):
        docs_stream_decontam_replay(spark, str(nostats))

    # all-NULL doc_id (round-10 advice #1): the distributed fallback
    # max is NULL — no non-null id exists, so no band can collide; the
    # guard must pass vacuously, not TypeError on max(None, ...)
    allnull = tmp_path / "allnull"
    allnull.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([None, None], type=pa.int64()),
                "text": ["a", "b"],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": [1, 1],
            },
            schema=schema,
        ),
        str(allnull / "documents.parquet"),
        write_statistics=False,
    )
    out = docs_stream_decontam_replay(spark, str(allnull))
    # null doc_id rows have no epoch band, so only the probes emit —
    # the point here is the guard neither raises nor misclassifies
    assert all(r["source"] == "probe" for r in out.collect())
