"""Z-order (Morton) clustering keys for multi-dimensional data layout.

Parquet pruning is only as good as the physical row order: min/max
row-group stats prune a filter on the sort column but are useless for a
second dimension.  Interleaving the bits of several bucketized columns
into one Morton key and range-partitioning + sorting on it gives every
participating column locality — the standard lakehouse layout trick
(Delta/Iceberg ``OPTIMIZE ZORDER``), reproduced here engine-side.

Scale shape:
- bucketization is equal-width over a broadcast 1-row (min, max) frame
  — one tiny agg job, then a narrow map; no per-row rank windows;
- the Morton interleave is a fixed chain of shift/or expressions
  (JVM-side, codegen-friendly) — ``bits`` per column, so two columns at
  16 bits fill a 32-bit key;
- the write is ``repartitionByRange(zkey)`` + ``sortWithinPartitions``:
  one range shuffle, after which BOTH columns' min/max spans per file
  are ~sqrt-of-uniform instead of full-range, which is what makes
  two-dimensional predicate pruning work at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Equal-width bucket id in [0, 2^bits): floor((x-min)/(max-min) * 2^bits),
    clamped so x == max lands in the top bucket; degenerate (min == max)
    columns collapse to bucket 0."""
    n = F.lit((1 << bits) - 1)
    span = cmax - cmin
    raw = F.floor((col.cast("double") - cmin) / span * F.lit(1 << bits))
    return F.when(span <= 0, F.lit(0)).otherwise(F.least(raw, n)).cast("long")


def morton_key(xbucket: Column, ybucket: Column, bits: int = 16) -> Column:
    """Interleave two ``bits``-wide bucket ids: x takes the odd (higher)
    bit positions, y the even — bit i of x lands at 2i+1, of y at 2i."""
    parts = []
    for i in range(bits):
        xbit = F.shiftright(xbucket, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(ybucket, i).bitwiseAND(F.lit(1))
        parts.append(F.shiftleft(xbit, 2 * i + 1))
        parts.append(F.shiftleft(ybit, 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_keys(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16
) -> DataFrame:
    """``df`` + ``__zx``/``__zy`` bucket ids and the interleaved
    ``zkey`` — deterministic given the data (equal-width buckets over
    the global min/max, broadcast as a 1-row frame)."""
    stats = df.agg(
        F.min(F.col(x_col).cast("double")).alias("__xmin"),
        F.max(F.col(x_col).cast("double")).alias("__xmax"),
        F.min(F.col(y_col).cast("double")).alias("__ymin"),
        F.max(F.col(y_col).cast("double")).alias("__ymax"),
    )
    with_stats = df.join(F.broadcast(stats))
    zx = _bucket(F.col(x_col), F.col("__xmin"), F.col("__xmax"), bits)
    zy = _bucket(F.col(y_col), F.col("__ymin"), F.col("__ymax"), bits)
    return (
        with_stats.withColumn("__zx", zx)
        .withColumn("__zy", zy)
        .withColumn("zkey", morton_key(F.col("__zx"), F.col("__zy"), bits))
        .drop("__xmin", "__xmax", "__ymin", "__ymax")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Materialize ``df`` z-ordered on (x_col, y_col): range-partition
    on the Morton key, sort within partitions, write parquet.  Each
    output file then covers a narrow 2-D tile, so row-group min/max
    stats prune filters on EITHER column."""
    keyed = zorder_keys(df, x_col, y_col, bits)
    (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("__zx", "__zy", "zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
