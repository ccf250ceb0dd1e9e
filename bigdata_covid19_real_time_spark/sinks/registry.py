"""Pluggable sinks for the streaming runner.

The reference hard-wires one sink: JDBC append to MySQL inside
``write_to_mysql`` (covid_streaming.py:51-61) — at-least-once, silently
swallowing errors, with ``rdd.isEmpty()``/``count()`` probes costing two
extra jobs per write (SURVEY.md §2.10).  Here:

- a ``Sink`` is anything callable as ``write(df, epoch_id, table)``;
- ``JdbcSink`` is the parity sink (append, optional swallow-errors);
- ``ParquetSink`` appends partitioned files — the cluster-native sink;
- ``IdempotentParquetSink`` solves the reference's replay problem
  (SURVEY.md §4 "sink idempotency"): writes land in an ``epoch=N``
  partition with dynamic partition overwrite, so a replayed epoch
  *replaces* its own previous output instead of duplicating it —
  exactly-once per epoch on top of Spark's at-least-once replay;
- ``MemorySink`` collects to the driver for tests only.

None of the sinks run ``isEmpty``/``count`` probes: writing an empty
DataFrame is cheaper than probing for emptiness first (the probe is a
full extra job; the empty write is a no-op task set).  Row counts for
observability come from ``df.sparkSession`` listeners / write metrics,
not extra actions.
"""

from __future__ import annotations

import logging
from typing import Protocol

from pyspark.sql import DataFrame, functions as F

logger = logging.getLogger(__name__)


class Sink(Protocol):
    def write(self, df: DataFrame, epoch_id: int, table: str) -> None: ...


class MemorySink:
    """Driver-side collected tables — tests only (unbounded memory)."""

    def __init__(self) -> None:
        self.tables: dict[str, list] = {}
        self.epochs: dict[str, list[int]] = {}

    def write(self, df: DataFrame, epoch_id: int, table: str) -> None:
        self.tables.setdefault(table, []).extend(df.collect())
        self.epochs.setdefault(table, []).append(epoch_id)

    def rows(self, table: str) -> list:
        return self.tables.get(table, [])


class FileSink:
    """Plain append to a columnar/row file format: one directory per
    table.  At-least-once on replay (same caveat as the reference's JDBC
    append).  ``fmt`` is any built-in DataSource: parquet (default),
    orc, json, csv — parquet/orc for analytics (column pruning +
    predicate pushdown on read-back), json/csv for interchange."""

    def __init__(
        self,
        base_dir: str,
        partition_by: list[str] | None = None,
        fmt: str = "parquet",
        options: dict[str, str] | None = None,
    ) -> None:
        self.base_dir = base_dir
        self.partition_by = partition_by or []
        self.fmt = fmt
        self.options = options or {}

    def write(self, df: DataFrame, epoch_id: int, table: str) -> None:
        writer = df.write.mode("append").format(self.fmt)
        for k, v in self.options.items():
            writer = writer.option(k, v)
        if self.partition_by:
            cols = [c for c in self.partition_by if c in df.columns]
            if cols:
                writer = writer.partitionBy(*cols)
        writer.save(f"{self.base_dir}/{table}")


class ParquetSink(FileSink):
    """The default analytics sink (kept as its own name — the engine's
    cluster-native format)."""

    def __init__(self, base_dir: str, partition_by: list[str] | None = None) -> None:
        super().__init__(base_dir, partition_by, fmt="parquet")


class IdempotentParquetSink:
    """Exactly-once per epoch: append into an ``epoch=N`` partition with
    dynamic partition overwrite.  A replayed epoch overwrites only its own
    partition; other epochs are untouched.  Readers see the table as the
    union of epoch partitions (partition pruning applies on epoch)."""

    def __init__(self, base_dir: str) -> None:
        self.base_dir = base_dir

    def write(self, df: DataFrame, epoch_id: int, table: str) -> None:
        (
            df.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(f"{self.base_dir}/{table}")
        )


class JdbcSink:
    """Reference-parity JDBC append (covid_streaming.py:51-61).

    ``swallow_errors=True`` reproduces the reference's log-and-continue
    policy; ``False`` fails fast (the right default for anything whose
    output feeds downstream jobs).
    """

    def __init__(
        self,
        url: str,
        properties: dict[str, str],
        swallow_errors: bool = False,
    ) -> None:
        self.url = url
        self.properties = properties
        self.swallow_errors = swallow_errors

    def write(self, df: DataFrame, epoch_id: int, table: str) -> None:
        try:
            writer = (
                df.write.mode("append")
                .format("jdbc")
                .option("url", self.url)
                .option("dbtable", table)
            )
            for k, v in self.properties.items():
                writer = writer.option(k, v)
            writer.save()
        except Exception:
            if not self.swallow_errors:
                raise
            logger.exception("epoch %s: JDBC write to %s failed", epoch_id, table)


class ConsoleSink:
    """Show a bounded preview per epoch — debugging."""

    def __init__(self, num_rows: int = 20) -> None:
        self.num_rows = num_rows

    def write(self, df: DataFrame, epoch_id: int, table: str) -> None:
        print(f"=== epoch {epoch_id} -> {table}")
        df.show(self.num_rows, truncate=False)
