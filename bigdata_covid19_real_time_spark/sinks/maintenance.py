"""Sink-table maintenance: epoch-partition compaction.

Streaming sinks that write per micro-batch (``IdempotentParquetSink``,
``CorpusIngest``) accumulate one small file set per epoch — the classic
small-files problem: at 100 TB the NameNode/listing cost and
footer-per-file overhead of millions of KB-sized files dominates read
time long before the bytes do.  Compaction rewrites the table with a
bounded file count per epoch partition and optional within-file
ordering (clustering rows by a key gives parquet row-group min/max
stats their pruning power — e.g. sorting an accepted-corpus table by
``fingerprint`` makes point-lookups of a fingerprint skip most row
groups).

The rewrite is copy-then-swap: read the live table, write the compacted
copy beside it, atomically rename the old table away and the new one
in.  Readers racing the swap see either the old or the new listing —
never a mix — and the old table is kept at ``<dir>.pre-compact`` until
the caller deletes it (crash during the swap leaves a recoverable
state).  Not run inside the streaming job: compaction is an offline
maintenance pass between epochs, exactly like a Delta/Iceberg OPTIMIZE.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_epoch_table(
    spark: SparkSession,
    table_dir: str,
    files_per_epoch: int = 1,
    sort_by: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite an ``epoch=N``-partitioned parquet table with at most
    ``files_per_epoch`` data files per epoch, optionally sorted by
    ``sort_by`` within files.  Returns {"files_before", "files_after",
    "rows"} for the caller's maintenance log.
    """
    def data_files(d: str) -> list[str]:
        out = []
        for root, _, names in os.walk(d):
            out += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
        return out

    before = len(data_files(table_dir))
    df = spark.read.parquet(table_dir)
    rows = df.count()

    # one shuffle: co-locate each epoch's rows into `files_per_epoch`
    # tasks (epoch + a bounded salt as range keys), then sort within
    # partitions so every output file is internally clustered
    salt = (F.pmod(F.xxhash64(*[F.col(c) for c in df.columns if c != "epoch"]),
                   F.lit(files_per_epoch))
            if files_per_epoch > 1 else F.lit(0))
    epochs = [r["epoch"] for r in df.select("epoch").distinct().collect()]
    shaped = (
        df.withColumn("__salt", salt)
        .repartition(max(len(epochs) * files_per_epoch, 1), "epoch", "__salt")
    )
    if sort_by:
        shaped = shaped.sortWithinPartitions("epoch", *sort_by)
    tmp = table_dir.rstrip("/") + ".compact-tmp"
    old = table_dir.rstrip("/") + ".pre-compact"
    shutil.rmtree(tmp, ignore_errors=True)
    shaped.drop("__salt").write.mode("overwrite").partitionBy("epoch").parquet(tmp)

    shutil.rmtree(old, ignore_errors=True)
    os.rename(table_dir.rstrip("/"), old)
    os.rename(tmp, table_dir.rstrip("/"))
    return {
        "files_before": before,
        "files_after": len(data_files(table_dir)),
        "rows": int(rows),
    }
