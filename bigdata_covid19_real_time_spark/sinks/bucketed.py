"""Bucketed table layout: co-located, exchange-free joins.

The biggest single cost of a 100 TB fact-fact join is shuffling both
sides on the join key.  Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions rows into a fixed bucket count
recorded in the catalog, and Catalyst then plans joins/aggregations on
the bucket key with NO Exchange on either pre-bucketed side (bucket
counts must match or divide; ``sortBy`` additionally pre-sorts buckets
so SortMergeJoin skips its sort).  The nightly-fact-join pipeline shape:
bucket the big tables by their join key at ingest, and every downstream
join is map-side.

Spark constraint: bucketed writes go through the catalog
(``saveAsTable``) — a bare ``parquet(path)`` write silently drops the
bucket spec.  :func:`write_bucketed_table` enforces that; the plan
contract is pinned by tests/test_bucketed.py (join of two co-bucketed
tables plans with zero hashpartitioning Exchanges even with broadcast
disabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog-registered parquet table bucketed (and
    by default sorted) on ``bucket_key``."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> dict | None:
    """The table's bucket spec ({"columns": [...], "n": int}) or None
    if unbucketed — callers verify co-bucketing before relying on the
    exchange-free plan."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in rows}
    if "Num Buckets" not in info:
        return None
    cols = info.get("Bucket Columns", "").strip("[]`").replace("`", "")
    return {
        "columns": [c.strip() for c in cols.split(",") if c.strip()],
        "n": int(info["Num Buckets"]),
    }
