"""As-of (nearest-prior) join — a primitive Spark lacks natively.

``asof_join(left, right)`` matches each left row to the single right row
with the same key and the greatest right-time <= left-time (the
backward as-of of kdb/pandas/DuckDB ``ASOF JOIN``).

Implementation is the scalable union-merge form, not a range cross-join:

    tag left/right -> align schemas -> union
    -> window partitionBy(keys) orderBy(time, tag)
    -> last(right payload, ignoreNulls) over rows(-inf, 0)
    -> keep left rows

One shuffle on the join keys, one sort within partitions — the same
cost envelope as a sort-merge join, independent of time-gap width.  A
range-predicate theta join would explode to |left| x |right| per key;
this stays |left| + |right|.  Right rows order *before* left rows at
equal timestamps (tag sort key), so ``right.time == left.time`` matches
— the standard inclusive as-of.

At 100 TB: both sides shuffle-partition by key; skewed keys behave like
any window skew (salt by coarse time bucket if one key dominates;
per-key state is a single carried row, so memory is flat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward inclusive as-of join.

    Output: every ``left`` row, plus ``right_cols`` (renamed with
    ``suffix`` on collision, plus ``{right_time}{suffix}``) from the
    matched right row — NULL where no right row precedes.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    carried = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }
    time_out = right_time + suffix if right_time in left.columns else right_time

    left_payload = [c for c in left.columns if c not in on and c != left_time]

    l_side = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(carried[c]) for c in right_cols],
        F.lit(None).cast(dict(right.dtypes)[right_time]).alias(time_out),
    )
    r_side = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        *[F.col(c).alias(carried[c]) for c in right_cols],
        F.col(right_time).alias(time_out),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_side.unionByName(r_side).select(
        "*",
        *[
            F.last(carried[c], ignorenulls=True).over(w).alias("__f_" + carried[c])
            for c in right_cols
        ],
        F.last(time_out, ignorenulls=True).over(w).alias("__f_" + time_out),
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *on,
            F.col("__t").alias(left_time),
            *left_payload,
            *[F.col("__f_" + carried[c]).alias(carried[c]) for c in right_cols],
            F.col("__f_" + time_out).alias(time_out),
        )
    )
