"""Composed corpus quality filter: the C4/Gopher-style keep/drop rule
stack over the per-document signals from ``operators/text.py``.

Each rule is named; the output carries both the boolean ``keep`` and a
deterministic comma-joined ``reasons`` string (sorted rule names), so a
pipeline can (a) filter on ``keep`` and (b) audit *why* documents were
dropped — the reasons histogram is the first thing you look at when a
filter eats too much of a corpus.

Shape: ``quality_stats`` is a narrow map; ``repetition_stats`` adds two
partial-agg shuffle rounds on hashed grams; the rule evaluation itself
is a projection.  Nothing here is corpus-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.text import (
    quality_stats,
    repetition_stats,
)


def quality_filter(
    df: DataFrame,
    min_tokens: int = 25,
    max_tokens: int = 100_000,
    min_ttr: float = 0.35,
    max_top_bigram_frac: float = 0.07,
    min_alpha_ratio: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    fan_out: bool = False,
) -> DataFrame:
    """Per-document keep/drop with named reasons.

    Output: the id column plus the signal columns (``token_count``,
    ``ttr``, ``top_token_frac``, ``top_bigram_frac``, ``alpha_ratio``),
    ``keep`` boolean, and ``reasons`` (sorted comma-joined failed-rule
    names; empty string when kept).
    """
    stats = quality_stats(df, text_col).select(
        F.col(id_col), "alpha_ratio"
    )
    rep = repetition_stats(df, id_col, text_col, fan_out=fan_out)
    joined = rep.join(stats, id_col)

    rules = {
        "too_few_tokens": F.col("token_count") < min_tokens,
        "too_many_tokens": F.col("token_count") > max_tokens,
        "low_ttr": F.col("ttr") < min_ttr,
        "repetitive_bigrams": F.col("top_bigram_frac") > max_top_bigram_frac,
        "low_alpha": F.col("alpha_ratio") < min_alpha_ratio,
    }
    reasons = F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in sorted(rules.items())
            ]
        )
    )
    return joined.select(
        F.col(id_col),
        "token_count",
        "ttr",
        "top_token_frac",
        "top_bigram_frac",
        "alpha_ratio",
        (F.size(reasons) == 0).alias("keep"),
        F.concat_ws(",", reasons).alias("reasons"),
    )


def percentile_rank_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 10,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row its percentile-rank bucket (1..n_buckets) —
    curriculum binning / quality tiers WITHOUT a global sort.

    ``ntile`` over a global window funnels the corpus through one task;
    interpolated-percentile boundaries introduce cross-engine float
    comparisons.  This instead buckets on the *percentile rank of the
    score value*, in pure integer arithmetic:

        bucket(v) = ceil(n_buckets * |rows with score <= v| / N)

    Plan: groupBy(score) count -> cumulative sum over the collapsed
    per-value frame (tiny: one row per distinct score — quantize
    continuous scores first) -> broadcast-join the (score -> bucket) map
    back onto the corpus.  Ties share a bucket, so bucket populations
    deviate from N/n_buckets only at heavy ties — the honest semantics
    for "top decile by length"-style selection.
    """
    counts = df.groupBy(score_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy(score_col).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    buckets = (
        counts.withColumn("__cum", F.sum("__cnt").over(w_cum))
        .withColumn("__total", F.sum("__cnt").over(w_all))
        .select(
            score_col,
            # integer ceil(n*cum/total) = (n*cum + total - 1) div total:
            # exact in both engines, no float division anywhere
            F.expr(f"({n_buckets} * __cum + __total - 1) div __total")
            .cast("int")
            .alias(bucket_col),
        )
    )
    return df.join(F.broadcast(buckets), score_col)
