"""Batch file sources.

The reference's only batch source is a CSV scan in the producer
(producer/covid_producer.py:26-27).  The engine generalizes: parquet/csv/
json readers with explicit schemas where the format needs one.

Scale notes: Parquet scans get predicate pushdown + column pruning from
Catalyst for free *if* callers express filters/projections on the
DataFrame (verify via ``.explain`` -> PushedFilters/ReadSchema).  Never
collect a table to the driver here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.schema import RAW_SCHEMA

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic-corpus table from a scale-factor directory.

    The events table carries TIMESTAMP(NANOS) parquet columns, which
    Spark's reader rejects outright; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a microsecond
    timestamp (integer division — a double division would lose precision
    above 2^53 ns).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Correctness must not depend on the caller's session conf (the
    # driver's session is not get_spark()'s): every timestamp-rendering
    # expression (date_format/to_date/window) evaluates in the session
    # timezone, and the DuckDB oracles are timezone-naive — pin UTC at
    # the single load chokepoint so both engines agree anywhere.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV -> RAW_SCHEMA frame (the producer's input shape,
    covid_producer.py:26-27).  All columns read as nullable strings; typing
    happens in the cleaning stage."""
    return spark.read.option("header", True).schema(RAW_SCHEMA).csv(path)


def read_raw_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines -> RAW_SCHEMA frame (the Kafka wire format without the
    broker; covid_streaming.py:215-217 parse semantics: malformed line ->
    all-NULL row, PERMISSIVE)."""
    return (
        spark.read.text(path)
        .select(F.from_json(F.col("value"), RAW_SCHEMA).alias("data"))
        .select("data.*")
    )


def read_evolving_parquet(
    spark: SparkSession, path: str, merge_schema: bool = True
) -> DataFrame:
    """Parquet read across files written at different schema versions
    (a corpus accumulated over months grows columns): ``mergeSchema``
    unions the per-file schemas, older files surface NULL for columns
    they predate.

    Scale note: schema merging reads every file FOOTER at planning time
    — O(files) driver work, no data scan.  On tables with millions of
    files, pin the schema explicitly (``spark.read.schema(...)``) or
    maintain it in a catalog and skip the merge; this helper is for the
    exploratory/ingest path where the union schema is the point.
    """
    return spark.read.option("mergeSchema", merge_schema).parquet(path)
