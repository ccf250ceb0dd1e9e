"""Row-level MERGE and snapshot diff (change-data-feed) over
DataFrames — the Delta/Iceberg table operations expressed as pure
transformations, composing with sinks/versioned.py for the write.

The reference can only append (covid_streaming.py's JDBC append per
epoch); corrections overwrite nothing and deletes don't exist.  A
dataset pipeline needs both:

- :func:`merge_into` — the MERGE INTO matched/not-matched contract:
  one FULL OUTER join on the key classifies every row as update /
  delete / insert / carry-over, evaluated in a single codegen'd
  projection.  The result is the post-merge table; publish it as the
  next snapshot and the merge is atomic with time-travelable history.
- :func:`snapshot_diff` — the inverse: given two immutable snapshots,
  emit the row-level change feed (insert / update / delete) that turns
  one into the other.  Diffing versioned snapshots gives CDC output
  without having recorded anything at write time.

Scale: both are a single shuffle on the key (or broadcast when one
side is small).  ``snapshot_diff`` compares rows by a column-pruned
hash (``xxhash64`` over the compared columns), so the join carries
keys + 8-byte digests — full rows only rehydrate for emitted changes.
Deletes in ``merge_into`` use a null-safe condition column, never a
driver-side row list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    delete_when: Column | None = None,
) -> DataFrame:
    """MERGE ``source`` into ``target`` on ``key``.

    Semantics (the standard MERGE contract, whole-row form):
    - matched + ``delete_when`` (evaluated on the source row) -> drop;
    - matched otherwise -> source row replaces the target row;
    - not matched and NOT ``delete_when`` -> source row inserts;
    - not matched and ``delete_when`` -> the tombstone is dropped, it
      never inserts (deleting a row that does not exist is a no-op);
    - target rows without a source match carry over unchanged.

    Both frames must share the schema; the result is the post-merge
    table with that schema.  Each key must appear at most once per
    side (the relational MERGE precondition; enforce upstream with
    dedup — a multi-source key would make the merge ambiguous).
    """
    cols = target.columns
    if source.columns != cols:
        raise ValueError(f"schema mismatch: {source.columns} vs {cols}")
    t = target.select(F.col(key).alias("__k"), F.struct(*cols).alias("__t"))
    s = source.select(
        F.col(key).alias("__k"),
        F.struct(*cols).alias("__s"),
        (delete_when if delete_when is not None else F.lit(False)).alias("__del"),
    )
    joined = t.join(s, "__k", "full_outer")
    merged = joined.filter(
        # matched-with-delete rows vanish; everything else survives
        ~(F.col("__t").isNotNull() & F.col("__s").isNotNull() & F.coalesce("__del", F.lit(False)))
        & ~(F.col("__t").isNull() & F.coalesce("__del", F.lit(False)))
    ).select(F.coalesce(F.col("__s"), F.col("__t")).alias("__r"))
    return merged.select(*[F.col(f"__r.{c}").alias(c) for c in cols])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
) -> DataFrame:
    """Row-level change feed turning ``old`` into ``new``.

    Output: the NEW row for inserts/updates, the OLD row for deletes,
    plus ``change_type`` in {'insert', 'update', 'delete'} — unchanged
    rows are absent.  Schemas must match; keys unique per side.

    The equality check hashes the non-key columns (column order fixed
    by the old schema), so the join compares 8-byte digests; a 64-bit
    hash collision would mask an update — at CDC scales that is the
    accepted contract (add a second seed column if a feed needs
    2^-128).  NULLs need care: Spark's ``xxhash64`` leaves its
    accumulator untouched for a NULL input, so hashing the bare values
    would DETERMINISTICALLY collide rows whose non-null values agree
    after dropping NULLs (e.g. (NULL,'x') vs ('x',NULL)) — the digest
    therefore interleaves an ``isnull`` flag before every value, making
    the null bitmap part of the hashed byte stream.
    """
    cols = old.columns
    if new.columns != cols:
        raise ValueError(f"schema mismatch: {new.columns} vs {cols}")
    value_cols = [c for c in cols if c != key]
    digest = (
        F.xxhash64(
            *[
                part
                for c in value_cols
                for part in (F.isnull(c).cast("int"), F.col(c))
            ]
        )
        if value_cols
        else F.lit(0)
    )
    o = old.select(F.col(key).alias("__k"), digest.alias("__oh"), F.struct(*cols).alias("__o"))
    n = new.select(F.col(key).alias("__k"), digest.alias("__nh"), F.struct(*cols).alias("__n"))
    joined = o.join(n, "__k", "full_outer")
    change = (
        F.when(F.col("__o").isNull(), F.lit("insert"))
        .when(F.col("__n").isNull(), F.lit("delete"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("update"))
    )
    kept = joined.withColumn("change_type", change).filter(
        F.col("change_type").isNotNull()
    )
    row = F.coalesce(F.col("__n"), F.col("__o"))
    return kept.select(
        *[row.getField(c).alias(c) for c in cols], "change_type"
    )
