"""Distribution-drift statistics: exact two-sample Kolmogorov-Smirnov
per group vs the global distribution.

PSI (plans/analytics.py:events_value_psi) bins the domain — robust but
resolution-bounded.  KS is the bin-free complement: the sup-distance
between empirical CDFs, the standard drift alarm for continuous
features in training-data pipelines.  This computes the EXACT statistic
(no sampling, no binning error) for every group at once.

Exactness: for a group sample x_1 < ... < x_n inside the global sample,
sup_x |F_grp(x) - F_glob(x)| is attained adjacent to group points, so

    D = max_i max( |le_i/n - LE(x_i)/N|, |lt_i/n - LT(x_i)/N| )

with le/lt the group's <=/< counts and LE/LT the global ones — the
left-limit term covers every global-only jump between group points
(F_grp is constant there and F_glob is monotone, so the interval's sup
is its right endpoint's left limit; group points are global points by
construction).

Scale (the part that matters): empirical CDF ranks are prefix sums, and
a ``Window.orderBy(value)`` cumsum is a single-partition sort — the
classic scale killer.  This uses the same two-pass distributed prefix
sum as operators/packing.py:

1. range-bucket values into ``n_bins`` via the broadcast (min, max) —
   bucket order + intra-bucket order == global value order;
2. per-(bucket) and per-(group, bucket) cumsums via PARTITIONED windows
   (parallel);
3. bucket totals (``n_bins`` rows global, ``n_bins`` per group) prefix-
   summed by a window over the TINY totals table only, then joined back.

No window ever sees more than one bucket of data rows; the global steps
touch ``n_bins``-row tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _with_bin(vals: DataFrame, stats: DataFrame, n_bins: int) -> DataFrame:
    span = F.col("hi") - F.col("lo")
    return vals.crossJoin(F.broadcast(stats)).withColumn(
        "bin",
        F.when(span > 0,
               F.least(F.floor((F.col("v") - F.col("lo")) / span * n_bins),
                       F.lit(n_bins - 1)))
        .otherwise(F.lit(0))
        .cast("int"),
    ).drop("lo", "hi")


def ks_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 256,
) -> DataFrame:
    """Exact per-group two-sample KS statistic vs the global sample.

    Output: one row per group — ``(<group_col>, n_group, ks_stat)``.
    NULL values are excluded from both samples.
    """
    vals = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    stats = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))

    # global <=/< counts per distinct value: two-pass prefix sum
    gd = _with_bin(vals.groupBy("v").agg(F.count(F.lit(1)).alias("c")), stats, n_bins)
    intra_g = Window.partitionBy("bin").orderBy("v")
    gd = gd.withColumn("icum", F.sum("c").over(intra_g))
    gtot = (
        gd.groupBy("bin").agg(F.sum("c").alias("bc"))
        .withColumn(
            "before",
            F.coalesce(
                F.sum("bc").over(
                    Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bin", "before")
    )
    glob = (
        gd.join(F.broadcast(gtot), "bin")
        .select(
            "v",
            (F.col("before") + F.col("icum")).alias("le_g"),
            (F.col("before") + F.col("icum") - F.col("c")).alias("lt_g"),
        )
    )

    # per-group <=/< counts per distinct value: same pattern, keyed by
    # (group, bin); the totals table is n_bins rows PER GROUP
    dd = _with_bin(
        vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c")), stats, n_bins
    )
    intra_d = Window.partitionBy("g", "bin").orderBy("v")
    dd = dd.withColumn("icum", F.sum("c").over(intra_d))
    dtot = (
        dd.groupBy("g", "bin").agg(F.sum("c").alias("bc"))
        .withColumn(
            "before",
            F.coalesce(
                F.sum("bc").over(
                    Window.partitionBy("g")
                    .orderBy("bin")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("g", "bin", "before")
    )
    grp = (
        dd.join(dtot, ["g", "bin"])
        .select(
            "g",
            "v",
            (F.col("before") + F.col("icum")).alias("le"),
            (F.col("before") + F.col("icum") - F.col("c")).alias("lt"),
        )
    )

    n_by_g = vals.groupBy("g").agg(F.count(F.lit(1)).alias("n_group"))
    total = vals.agg(F.count(F.lit(1)).alias("N"))

    d1 = F.abs(F.col("le") / F.col("n_group") - F.col("le_g") / F.col("N"))
    d2 = F.abs(F.col("lt") / F.col("n_group") - F.col("lt_g") / F.col("N"))
    return (
        grp.join(glob, "v")
        .join(F.broadcast(n_by_g), "g")
        .crossJoin(F.broadcast(total))
        .groupBy("g", "n_group")
        .agg(F.max(F.greatest(d1, d2)).alias("ks_stat"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_group"),
            "ks_stat",
        )
    )
