"""Batch source readers + partitioned sink layout tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.functions.cleaning import clean_observations
from bigdata_covid19_real_time_spark.schema import RAW_FIELDS
from bigdata_covid19_real_time_spark.sinks import FileSink, ParquetSink
from bigdata_covid19_real_time_spark.sources.batch import read_raw_csv, read_raw_jsonl
from tests.conftest import frozen_clock, make_raw, obs


def test_read_raw_csv_all_string_schema(spark, tmp_path):
    row = obs("Egypt", "2021-03-15")
    csv = tmp_path / "in.csv"
    csv.write_text(
        ",".join(RAW_FIELDS) + "\n" + ",".join(row[f] for f in RAW_FIELDS) + "\n"
    )
    df = read_raw_csv(spark, str(csv))
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 19
    got = df.collect()[0]
    assert got["location"] == "Egypt"
    assert got["total_cases"] == "187000"
    # flows straight into the cleaning stage
    cleaned = clean_observations(df, clock=frozen_clock()).collect()[0]
    assert cleaned["total_cases"] == 187000.0


def test_read_raw_jsonl_malformed_line_is_all_null(spark, tmp_path):
    import json

    p = tmp_path / "in.jsonl"
    p.write_text(json.dumps(obs("Egypt", "2021-03-15")) + "\n{oops\n")
    df = read_raw_jsonl(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    bad = [r for r in rows if r["location"] is None][0]
    assert all(bad[f] is None for f in RAW_FIELDS)


def test_parquet_sink_partitions_prune(spark, tmp_path):
    """Date-partitioned sink layout: a date filter must reach the reader
    as a partition filter (scans touch one directory, not the table)."""
    raw = make_raw(
        spark,
        [obs("Egypt", "2021-03-15"), obs("Egypt", "2021-03-16"), obs("France", "2021-03-16")],
    )
    cleaned = clean_observations(raw, clock=frozen_clock())
    sink = ParquetSink(str(tmp_path), partition_by=["date"])
    sink.write(cleaned, 0, "silver")

    table = spark.read.parquet(str(tmp_path / "silver"))
    q = table.filter(F.col("date") == "2021-03-16")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date" in plan
    assert q.count() == 2
    # partition dirs exist on disk
    assert (tmp_path / "silver" / "date=2021-03-15").exists()


def test_load_table_pins_utc_against_hostile_session_tz(spark):
    """Correctness must not depend on the caller's session timezone (the
    driver's session is not get_spark()'s): load_table re-pins UTC."""
    from bigdata_covid19_real_time_spark.sources.batch import load_table

    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, "/root/testdata/sf0.001", "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        from pyspark.sql import functions as F

        first = df.orderBy("event_id").select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s")
        ).first()["s"]
        assert first == "2024-01-01 00:09:58"  # UTC rendering, not EST
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_file_sink_formats_round_trip(spark, tmp_path):
    """FileSink writes every built-in format; read-back preserves the
    cleaned rows (ORC/parquet typed; JSON/CSV via schema-on-read)."""
    raw = make_raw(spark, [obs("Egypt", "2021-03-15"), obs("France", "2021-03-16")])
    cleaned = clean_observations(raw, clock=frozen_clock()).select(
        "location", "date", "total_cases", "death_rate"
    )
    expect = sorted((r.location, str(r.date), r.total_cases) for r in cleaned.collect())

    for fmt in ["parquet", "orc", "json"]:
        FileSink(str(tmp_path / fmt), fmt=fmt).write(cleaned, 0, "t")
        back = spark.read.format(fmt).load(str(tmp_path / fmt / "t"))
        got = sorted(
            (r["location"], str(r["date"])[:10], float(r["total_cases"]))
            for r in back.collect()
        )
        assert got == expect, fmt

    csv_sink = FileSink(str(tmp_path / "csv"), fmt="csv", options={"header": "true"})
    csv_sink.write(cleaned, 0, "t")
    back = spark.read.option("header", True).csv(str(tmp_path / "csv" / "t"))
    assert sorted(r["location"] for r in back.collect()) == ["Egypt", "France"]
