"""Per-group closed-form OLS trend fitting in ONE distributed pass.

The reference's forecaster (covid_streaming.py:118-160) extrapolates a
7-day moving average scaled by a mean growth rate — a window-function
pipeline that needs a per-location sort.  This operator is the scalable
statistical upgrade: fit ``y = slope * x + intercept`` per group from
the sufficient statistics (count, means, variance, covariance), which
Spark computes as MERGEABLE partial aggregates — map-side combine, one
shuffle of constant-width state per group, no sort, no window, no
second pass.  At 100 TB this is the difference between a per-group sort
(skew-prone, memory-bound) and a plain partial-agg shuffle.

Formulas (population moments; both engines evaluate identically):

    slope     = covar_pop(x, y) / var_pop(x)
    intercept = avg(y) - slope * avg(x)
    r2        = covar_pop(x, y)^2 / (var_pop(x) * var_pop(y))

Degenerate groups are answered, not dropped: a single observation or a
zero-variance x yields NULL slope/intercept/r2 (no line is defined); a
perfectly flat y on varying x yields slope 0 with r2 NULL (the fit is
exact but r-squared's variance ratio is 0/0 — reported as NULL, the
SQL convention both engines share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def group_ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str | Column,
    y_col: str | Column,
) -> DataFrame:
    """Fit y ~ x per group; one partial-aggregate pass.

    Output per group: ``n_obs``, ``x_max``, ``slope``, ``intercept``,
    ``r2`` (unrounded doubles — callers own presentation rounding).
    Rows where x or y is NULL are excluded pairwise, matching SQL
    ``regr_*`` semantics.
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    xs, ys = F.when(both, x), F.when(both, y)

    agg = df.groupBy(*group_cols).agg(
        F.count(xs).alias("n_obs"),
        F.max(xs).alias("x_max"),
        F.avg(xs).alias("__mx"),
        F.avg(ys).alias("__my"),
        F.var_pop(xs).alias("__vx"),
        F.var_pop(ys).alias("__vy"),
        F.covar_pop(xs, ys).alias("__cxy"),
    )
    slope = F.when(F.col("__vx") > 0, F.col("__cxy") / F.col("__vx"))
    r2 = F.when(
        (F.col("__vx") > 0) & (F.col("__vy") > 0),
        F.col("__cxy") * F.col("__cxy") / (F.col("__vx") * F.col("__vy")),
    )
    return agg.select(
        *group_cols,
        "n_obs",
        "x_max",
        slope.alias("slope"),
        F.when(F.col("__vx") > 0, F.col("__my") - slope * F.col("__mx")).alias(
            "intercept"
        ),
        r2.alias("r2"),
    )


def ols_forecast(slope: Column, intercept: Column, at_x: Column) -> Column:
    """Point forecast of the fitted line at ``at_x`` (NULL-propagating)."""
    return intercept + slope * at_x
