"""Skew-handling join helpers.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized partitions — but only for sort-merge
joins and only after a shuffle materializes the skew.  Salting is the
plan-level tool for the pathological cases AQE can't reach (e.g. a
broadcast-ineligible dimension joined on a key where one value is >50%
of the fact table):

    fact:  key -> (key, salt = pmod(xxhash64(uniq), S))
    dim :  key -> exploded (key, salt = 0..S-1)   [dim grows x S]
    join on (key, salt)                            [hot key spreads S ways]

``salted_join`` packages that shape.  S trades dim duplication against
per-task balance; at 100 TB pick S ~= hot-key share / target-partition
share.  The salt derives from a unique column (not ``rand()``) so the
plan stays deterministic and re-runnable (speculative retries see the
same salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_by: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted ``num_salts`` ways.

    ``salt_by``: any fact column unique-ish per row (an id) — hashed to
    pick the salt deterministically.  The dim side replicates each row
    ``num_salts`` times (explode of a literal range), so keep this for
    dims that are too big to broadcast but far smaller than the fact.
    Output columns = plain join output (salt dropped).

    Only ``inner`` and ``left`` are accepted: any join that preserves
    unmatched DIM rows (right/full) or projects the dim side alone
    (right_semi/anti shapes) would emit each unmatched dim row once per
    salt replica — ``num_salts`` duplicates.  Flip the sides or use AQE
    skew handling for those.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            f"salted dim side replicates rows {num_salts}x, so join types "
            "preserving unmatched dim rows would duplicate them"
        )
    f = fact.withColumn(_SALT, F.pmod(F.xxhash64(F.col(salt_by)), F.lit(num_salts)))
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return f.join(d, on + [_SALT], how).drop(_SALT)


def key_skew_report(
    df: DataFrame, key_cols: list[str], k: int = 10
) -> DataFrame:
    """Top-``k`` heaviest key values with their row share — the
    diagnostic you run BEFORE picking a skew strategy (broadcast the
    other side / ``salted_join`` with S ~ share ratio / rely on AQE).

    Output: ``(<key_cols...>, key_rows, total_rows, share, skew_rank)``
    sorted by weight.  Share compares against the whole frame, so a
    0.5 share on a join key reads directly as "one task gets half the
    shuffle" under hash partitioning.

    Scale: one partial-aggregated groupBy on the key; the total joins
    as a broadcast 1-row frame; top-k is TakeOrderedAndProject.  Never
    collects per-key counts to the driver.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("key_rows"))
    total = F.broadcast(counts.agg(F.sum("key_rows").alias("total_rows")))
    top = (
        counts.join(total)
        .select(
            *key_cols,
            "key_rows",
            "total_rows",
            F.round(F.col("key_rows") / F.col("total_rows") + F.lit(1e-9), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("key_rows"), *[F.asc(c) for c in key_cols])
        .limit(k)
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("key_rows"), *[F.asc(c) for c in key_cols])
    return top.withColumn("skew_rank", F.row_number().over(w).cast("int"))
