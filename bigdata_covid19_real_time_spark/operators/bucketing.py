"""Bucket-size guard for LSH band joins (MinHash, SimHash).

A band bucket with B members emits ~B^2/2 candidate pairs in the
self-join; one boilerplate-heavy bucket (licence headers, templated
pages — every doc sharing a band) turns the whole job quadratic.  The
guard drops over-cap buckets LOUDLY: the drop count is computed eagerly
(one small aggregate over the already-persisted bucket table) and
logged, never silent — a capped run tells you exactly how many buckets
and member rows it skipped so you can raise the cap or pre-dedup the
boilerplate instead.

Dropping (not splitting) is the honest semantics for near-dup pairing:
a randomly split oversized bucket loses cross-split pairs anyway, while
pretending to be complete.  Members of a dropped bucket still pair
through their other bands (B-1 more chances in MinHash, 3 more bands in
SimHash), so only pairs whose EVERY matching band is over-cap are lost.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def cap_bucket_size(
    buckets: DataFrame,
    key_cols: list[str],
    max_bucket_size: int | None,
    label: str,
) -> DataFrame:
    """Filter out buckets with more than ``max_bucket_size`` member rows.

    ``buckets`` should be persisted by the caller (both the count and
    the anti-join read it).  ``None`` disables the guard.  The over-cap
    bucket list is tiny by construction (it only exists under extreme
    skew), so the anti-join broadcasts.
    """
    if max_bucket_size is None:
        return buckets
    counts = buckets.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__bucket_n"))
    over = counts.filter(F.col("__bucket_n") > max_bucket_size)
    stats = over.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("__bucket_n").alias("n_members"),
    ).collect()[0]
    if not stats["n_buckets"]:
        return buckets
    log.warning(
        "%s: dropping %d over-cap band buckets (>%d members, %d member rows "
        "total); pairs whose every shared band is over-cap are lost — raise "
        "max_bucket_size or pre-dedup boilerplate content",
        label,
        stats["n_buckets"],
        max_bucket_size,
        stats["n_members"],
    )
    return buckets.join(
        F.broadcast(over.select(*key_cols)), list(key_cols), "left_anti"
    )
