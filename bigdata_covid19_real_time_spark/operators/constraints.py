"""Data-quality expectations: declarative constraint checking over a
table in one scan (the Deequ / dbt-test / Delta-constraints capability).

The reference trusts its producer blindly — covid_streaming.py carries
no notion of a constraint, and a malformed feed lands in the sink
(SURVEY.md §2.10 X4's swallow-errors policy makes it silent).  A
training-data pipeline at 100 TB runs expectation suites on every
ingest: null checks, domains, ranges, referential counts, key
uniqueness — and gates publishing (sinks/versioned.py) on the report.

Spark-first shape:
- every predicate rule compiles to ``SUM(CASE WHEN <pred> THEN 0 ELSE
  1 END)`` inside ONE aggregate over ONE scan — adding a rule adds a
  codegen'd expression, not a pass (NULL predicate results count as
  violations: an expectation that cannot be evaluated is not met);
- uniqueness rules add ``COUNT(*) - COUNT(DISTINCT struct(keys))``
  to the same aggregate; Catalyst plans the distinct via expand, so
  the whole suite is still a single job (one shuffle per distinct
  key-set, partial-aggregated);
- the 1-row wide result unpivots to the (rule, violations, checked,
  passed) report via ``stack`` — driver never sees row data.

``violations_sample`` is the debugging companion: the offending rows
themselves, rule-tagged, capped per rule WITHOUT a global sort.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Rule names are interpolated into a ``stack(...)`` SQL expression and
#: into column aliases; anything beyond identifier characters would
#: produce an opaque parse error (or splice into the expr) at run time.
_RULE_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _validate_rule_names(names) -> None:
    bad = sorted(n for n in names if not _RULE_NAME.match(n))
    if bad:
        raise ValueError(
            f"rule names must match {_RULE_NAME.pattern!r} (they are "
            f"interpolated into SQL): {bad}"
        )


def expectation_report(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate all expectations in one scan.

    ``rules`` maps rule name -> boolean Column that is True for GOOD
    rows (NULL counts as a violation).  ``unique_keys`` maps rule name
    -> key column list whose combination must be unique (each duplicate
    row beyond the first counts once).

    Output: (rule, violations, checked, passed), one row per rule,
    sorted by rule name.
    """
    unique_keys = unique_keys or {}
    _validate_rule_names(list(rules) + list(unique_keys))
    overlap = set(rules) & set(unique_keys)
    if overlap:
        raise ValueError(f"rule names used twice: {sorted(overlap)}")
    aggs = [F.count(F.lit(1)).alias("__checked")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(F.when(pred, F.lit(0)).otherwise(F.lit(1))).alias(f"__v_{name}")
        )
    for name, keys in unique_keys.items():
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(k) for k in keys]))
            ).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    names = sorted(list(rules) + list(unique_keys))
    stack_args = ", ".join(f"'{n}', __v_{n}" for n in names)
    return (
        wide.select(
            F.expr(f"stack({len(names)}, {stack_args}) AS (rule, violations)"),
            F.col("__checked").alias("checked"),
        )
        .select(
            "rule",
            F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
            F.col("checked").cast("long").alias("checked"),
            (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
        )
        .orderBy("rule")
    )


def violations_sample(
    df: DataFrame,
    rules: dict[str, Column],
    per_rule: int = 5,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Up to ``per_rule`` offending rows per predicate rule, tagged with
    the rule name — the "show me what broke" companion to the report.

    With ``order_by`` the sample is deterministic (rank over the order
    within each rule); without it you get an arbitrary-but-capped
    sample.  The cap is a per-rule window over only the violating rows
    — no global sort, no driver collection.
    """
    tagged = None
    for name, pred in rules.items():
        part = df.filter(~F.coalesce(pred, F.lit(False))).withColumn(
            "rule", F.lit(name)
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    if tagged is None:
        raise ValueError("no rules given")
    from pyspark.sql.window import Window

    order = (
        [F.col(c) for c in order_by]
        if order_by
        else [F.monotonically_increasing_id()]
    )
    w = Window.partitionBy("rule").orderBy(*order)
    return (
        tagged.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= per_rule)
        .drop("__r")
    )


def referential_report(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    rule: str,
) -> DataFrame:
    """Referential-integrity expectation: fact rows whose key has no
    match in ``dim`` (NULL keys count as violations — an unresolvable
    reference is not met).  Same (rule, violations, checked, passed)
    row shape as :func:`expectation_report`, so suites union the two.

    Scale: one LEFT ANTI join on the key (broadcast when the dim is a
    dimension table; NULL-keyed rows are kept violations via the
    null-rejecting join condition) and two 1-row aggregates.
    """
    orphans = fact.join(
        dim.select(F.col(dim_key).alias("__dim_key")).distinct(),
        F.col(fact_key) == F.col("__dim_key"),
        "left_anti",
    )
    return (
        fact.agg(F.count(F.lit(1)).alias("checked"))
        .crossJoin(orphans.agg(F.count(F.lit(1)).alias("violations")))
        .select(
            F.lit(rule).alias("rule"),
            F.col("violations").cast("long"),
            F.col("checked").cast("long"),
            (F.col("violations") == 0).alias("passed"),
        )
    )


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Deequ-style column profile in ONE scan: per column, row count,
    null count, exact distinct count, and min/max rendered as strings
    (type-uniform output rows).

    Output: (column, rows, nulls, distinct, min_value, max_value),
    one row per requested column, sorted by column name.

    Scale: all measures compile into one aggregate; each
    ``count_distinct`` adds an Expand branch (one shuffle total,
    partial-aggregated).  For wide profiles at 100 TB swap in
    ``approx_count_distinct`` — same plan, sketch state — and gate the
    accuracy separately (the daily_event_summary_sketch pattern).
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__n_{c}"),
            F.count_distinct(F.col(c)).alias(f"__d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = None
    for c in sorted(columns):
        one = wide.select(
            F.lit(c).alias("column"),
            F.col("__rows").cast("long").alias("rows"),
            F.col(f"__n_{c}").cast("long").alias("nulls"),
            F.col(f"__d_{c}").cast("long").alias("distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows.orderBy("column")
