"""Information-statistics operators: Gini concentration, mutual
information, Benford leading-digit extraction, and lag-k
autocorrelation.

These are the distribution-audit primitives a curation/feature pipeline
runs before trusting a column: how concentrated is the value mass
(Gini), how much does one categorical tell you about another (MI), do
the magnitudes look organic or fabricated (Benford), and how much
memory does a daily series carry (autocorrelation).  The reference
engine has no counterpart — these extend its analytics surface the way
SURVEY.md §2's extension brief asks (drift/stats family).

Every helper is a pure DataFrame transformation built from JVM-side
built-ins (no Python UDFs), so Catalyst keeps the whole plan inside
whole-stage codegen.  Scale notes per helper:

- ``gini_by_group``: one groupBy to collapse to (group, unit) value
  rows, one ranked window per group, one final agg.  The window sort is
  per-group and spillable; output is one row per group.  The rank-based
  identity G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n avoids the O(n^2)
  pairwise |x_i - x_j| definition entirely.
- ``mutual_info_by_x``: ONE shuffle over the fact table (the joint
  contingency groupBy); marginals re-aggregate the tiny joint table and
  join back as broadcasts, so Spark's ReuseExchange serves all three
  branches from the same shuffle output.
- ``leading_digit``: integer-domain extraction (value -> cents ->
  string head).  Deliberately avoids floor(log10(x)), whose FP
  boundary behaviour (log10(1000) = 2.9999...) is engine-dependent.
- ``autocorr_by_group``: per-group lag windows over an already
  aggregated daily frame (one row per group x day), then corr — state
  is bounded by the lag depth, output by group cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def leading_digit(col: Column) -> Column:
    """First significant decimal digit of a positive money value.

    Works in the integer domain: value -> rounded cents (bigint) ->
    decimal string -> first character.  Shifting the decimal point never
    changes the leading significant digit, and integer rendering is
    identical across engines, unlike ``floor(log10(x))`` whose result
    can straddle an FP boundary differently per libm.  Callers must
    filter to ``col > 0`` first (cents of a positive price are >= 1, so
    the head character is never '0' or '-').
    """
    cents = F.round(col * F.lit(100), 0).cast("bigint")
    return F.substring(cents.cast("string"), 1, 1).cast("int")


def gini_by_group(
    df: DataFrame, group: str, value: str, tiebreak: str
) -> DataFrame:
    """Per-group Gini coefficient of ``value`` across rows.

    Returns (group, n_units bigint, total double, gini double —
    unrounded; NULL when the group's total mass is 0).  Uses the
    rank-based identity with ``row_number`` ordered by (value,
    tiebreak): for tied values the sum of ranks over the tied block is
    order-invariant, so the tiebreak only pins determinism, never the
    result.
    """
    w = Window.partitionBy(group).orderBy(F.col(value).asc(), F.col(tiebreak).asc())
    ranked = df.withColumn("__i", F.row_number().over(w))
    return (
        ranked.groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum(value).alias("total"),
            F.sum(F.col("__i") * F.col(value)).alias("__swx"),
        )
        .select(
            group,
            F.col("n_units").cast("long").alias("n_units"),
            "total",
            F.when(
                F.col("total") > 0,
                (F.lit(2.0) * F.col("__swx"))
                / (F.col("n_units") * F.col("total"))
                - (F.col("n_units") + F.lit(1.0)) / F.col("n_units"),
            ).alias("gini"),
        )
    )


def mutual_info_by_x(df: DataFrame, x: str, y: str) -> DataFrame:
    """Per-``x`` contribution to the mutual information I(X;Y) in nats.

    Input is one row per observation with categorical columns x and y.
    Returns (x, n_events bigint, mi_contrib double — unrounded); the
    dataset-level MI is the sum of ``mi_contrib`` over all x.  The fact
    table is scanned and shuffled exactly ONCE (the joint contingency
    groupBy); the x/y marginals and the grand total are window sums
    over the resulting |X|*|Y|-row frame, NOT re-aggregations of the
    fact table — separate aggregation branches would each re-scan the
    source (ReuseExchange does not dedup them under AQE).  The global
    window's single-partition hop is safe because the contingency frame
    is bounded by the categorical cross-cardinality, not the data size.
    """
    joint = df.groupBy(x, y).agg(F.count(F.lit(1)).alias("n_xy"))
    enriched = joint.select(
        x,
        y,
        "n_xy",
        F.sum("n_xy").over(Window.partitionBy(x)).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy(y)).alias("n_y"),
        F.sum("n_xy").over(Window.partitionBy()).alias("n_tot"),
    )
    term = (F.col("n_xy") / F.col("n_tot")) * F.log(
        F.col("n_xy") * F.col("n_tot") / (F.col("n_x") * F.col("n_y"))
    )
    return enriched.groupBy(x).agg(
        F.max("n_x").cast("long").alias("n_events"),
        F.sum(term).alias("mi_contrib"),
    )


def autocorr_by_group(
    df: DataFrame,
    group: str,
    order: str,
    value: str,
    lags: Sequence[int],
) -> DataFrame:
    """Lag-k autocorrelations of a per-group ordered series.

    Input is one row per (group, order-point) with a numeric value
    (e.g. a daily count).  Lags are in *observed* steps — over a series
    with gaps, lag 1 means the previous observed point, not the
    previous calendar day; callers wanting calendar lags should gap-fill
    first.  Returns (group, n_points bigint, ac_lag{k} double per
    requested k — unrounded; NULL for constant series where the
    variance is 0).
    """
    w = Window.partitionBy(group).orderBy(order)
    lagged = df.select(
        group,
        order,
        F.col(value).cast("double").alias("__v"),
        *[F.lag(F.col(value).cast("double"), k).over(w).alias(f"__l{k}") for k in lags],
    )
    return lagged.groupBy(group).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        *[_pair_corr("__v", f"__l{k}").alias(f"ac_lag{k}") for k in lags],
    )


def kaplan_meier(
    df: DataFrame, group: str, duration: str, event: str
) -> DataFrame:
    """Kaplan-Meier survival curve per group from one row per subject.

    ``duration`` is a non-negative integer time-to-outcome; ``event`` is
    1 for an observed event, 0 for right-censored.  Returns one row per
    (group, observed time): (group, t, n_risk, d_events, c_censored,
    survival double — unrounded), where n_risk counts subjects with
    duration >= t and S(t) is the product-limit estimator.

    Distributed form: one groupBy to (group, t) tallies, then three
    windows per group over the |times|-row frame — at-risk via a
    1-preceding cumulative, the product via exp(sum(ln(1 - d/n))) (a
    cumulative SUM, unlike a product, is a built-in window aggregate),
    and a cumulative max flag that pins S(t) to exactly 0 from the
    first time where the whole risk set dies (ln(0) never evaluates —
    the CASE guard skips it, matching the oracle's guard).
    """
    tallies = df.groupBy(group, F.col(duration).alias("t")).agg(
        F.sum(F.col(event)).alias("d_events"),
        F.sum(F.lit(1) - F.col(event)).alias("c_censored"),
    )
    wg = Window.partitionBy(group)
    prev = (
        Window.partitionBy(group)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        Window.partitionBy(group)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = tallies.withColumn(
        "n_risk",
        F.sum(F.col("d_events") + F.col("c_censored")).over(wg)
        - F.coalesce(
            F.sum(F.col("d_events") + F.col("c_censored")).over(prev),
            F.lit(0),
        ),
    ).withColumn(
        "__term",
        F.when(
            F.col("d_events") < F.col("n_risk"),
            F.log(F.lit(1.0) - F.col("d_events") / F.col("n_risk")),
        ).otherwise(F.lit(0.0)),
    ).withColumn(
        "__dead", F.max((F.col("d_events") >= F.col("n_risk")).cast("int")).over(cum)
    )
    return stepped.select(
        group,
        F.col("t").cast("long").alias("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_events").cast("long").alias("d_events"),
        F.col("c_censored").cast("long").alias("c_censored"),
        F.when(F.col("__dead") == 1, F.lit(0.0))
        .otherwise(F.exp(F.sum("__term").over(cum)))
        .alias("survival"),
    )


def woe_iv(df: DataFrame, cat: str, target: Column) -> DataFrame:
    """Weight-of-evidence / information-value stats per category.

    ``target`` is a boolean Column (TRUE = "bad"/positive class).
    Returns (cat, n, n_bad bigint, bad_share, good_share, woe,
    iv_contrib — unrounded doubles; WoE and IV are NULL for categories
    missing one of the classes, where the log-odds are undefined).  The
    dataset IV is the sum of ``iv_contrib``.  One fact shuffle (the
    category groupBy); class totals are window sums over the category
    frame — same single-scan shape as ``mutual_info_by_x``.
    """
    per_cat = df.groupBy(cat).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(target.cast("int")).alias("n_bad"),
    )
    wall = Window.partitionBy()
    enriched = per_cat.select(
        cat,
        "n",
        "n_bad",
        (F.col("n") - F.col("n_bad")).alias("__n_good"),
        F.sum("n_bad").over(wall).alias("__bad_tot"),
        F.sum(F.col("n") - F.col("n_bad")).over(wall).alias("__good_tot"),
    )
    bad_share = F.col("n_bad") / F.col("__bad_tot")
    good_share = F.col("__n_good") / F.col("__good_tot")
    woe = F.when(
        (F.col("n_bad") > 0) & (F.col("__n_good") > 0),
        F.log(bad_share / good_share),
    )
    return enriched.select(
        cat,
        F.col("n").cast("long").alias("n"),
        F.col("n_bad").cast("long").alias("n_bad"),
        bad_share.alias("bad_share"),
        good_share.alias("good_share"),
        woe.alias("woe"),
        ((bad_share - good_share) * woe).alias("iv_contrib"),
    )


def _pair_corr(v: str, l: str) -> Column:
    """Pearson correlation over rows where BOTH columns are non-null,
    from when-guarded mergeable moments.

    Not ``F.corr`` because under ANSI mode (the Spark 4 default) corr's
    final division raises DIVIDE_BY_ZERO on a zero-variance series; a
    constant daily count would crash the whole query at scale.  The
    CASE-guarded moment form returns NULL there instead — matching
    DuckDB/ANSI ``CORR`` semantics — and stays map-side combinable.
    A slightly-negative FP moment (constant series) makes ``den`` NaN,
    which the guard also maps to NULL.
    """
    both = F.col(v).isNotNull() & F.col(l).isNotNull()
    n = F.sum(F.when(both, 1).otherwise(0)).cast("double")
    sx = F.sum(F.when(both, F.col(v)))
    sy = F.sum(F.when(both, F.col(l)))
    sxx = F.sum(F.when(both, F.col(v) * F.col(v)))
    syy = F.sum(F.when(both, F.col(l) * F.col(l)))
    sxy = F.sum(F.when(both, F.col(v) * F.col(l)))
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return F.when(den > 0, num / den)
