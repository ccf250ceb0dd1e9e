"""Scale-adaptive scan fan-out for CPU-heavy narrow maps.

The engine's text/fingerprint operators (shingle hashing, winnowing,
SimHash votes, CDC boundary scans) do heavy per-row JVM work in the
stage that reads the input.  Scan parallelism is decided by file
layout: Spark assigns one task per file split, and a parquet file is
splittable only at row-group boundaries.  A corpus packed into fewer
splits than the cluster has cores therefore serializes the whole map
stage onto a handful of tasks while the rest of the machine idles —
measured at bench scale: 3.5 s of single-task CPU on a 32-core host
for ``docs_winnow_fingerprints`` (the guide's §2 "partitioning should
derive from input size, not a constant" case).

:func:`fan_out_scan` repartitions ONLY when the input's planned
partition count is below the session's default parallelism, so:

- at 100 TB (thousands of splits per table) it is a provable no-op —
  no added exchange, no text riding a shuffle;
- on under-split inputs (one giant gzip, a single-row-group parquet,
  the local bench corpus) it buys full-width parallelism for the price
  of shuffling the pruned input columns once.

When the heavy map feeds a ``groupBy(key)``, pass ``key``: the fan-out
then hash-partitions on that key with the session shuffle-partition
count, and the downstream aggregation reuses the partitioning instead
of inserting its own exchange — same total exchange count as the
un-fanned plan, with the map work distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out_scan(
    df: DataFrame,
    key: str | Column | list | None = None,
    target: int | None = None,
) -> DataFrame:
    """Repartition ``df`` iff its planned partition count is below the
    session's parallelism (see module docstring).  ``key`` keeps the
    fan-out reusable by a downstream ``groupBy(key)``/join on ``key``.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    # Guard: only probe/repartition SCAN-SHAPED frames (scan + narrow
    # ops).  A frame whose lineage already contains a shuffle-inducing
    # node is post-exchange parallel — and, critically, the partition
    # probe below (`df.rdd`) would not be free on it: under AQE,
    # converting to an RDD EXECUTES the upstream query stages eagerly,
    # so probing a derived frame re-runs its whole pipeline (measured
    # 2.3x on the curation waterfall before this guard).
    try:
        analyzed = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — connect/other backends: skip quietly
        return df
    if any(
        tok in analyzed
        for tok in (
            "Join", "Aggregate", "Repartition", "Window", "Sort",
            "Deduplicate", "Distinct", "InMemoryRelation", "Union",
            "GlobalLimit",
        )
    ):
        return df
    if target is None:
        # defaultParallelism (the session's core count) — deliberately
        # NOT spark.sql.shuffle.partitions: a downstream groupBy(key)'s
        # ClusteredDistribution is satisfied by a hash partitioning on
        # the key at ANY partition count, and reading session conf here
        # would widen the package's pinned conf-touch surface
        # (tests/test_conf_surface.py) for no behavioral gain.
        target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning quirk: keep the plan unchanged
        return df
    if n >= target:
        return df
    if key is None:
        return df.repartition(target)
    cols = key if isinstance(key, list) else [key]
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.repartition(target, *cols)
