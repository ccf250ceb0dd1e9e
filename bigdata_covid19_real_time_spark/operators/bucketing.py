"""Bucket-size guard for LSH band joins (MinHash, SimHash, SemDeDup).

A band bucket with B members emits ~B^2/2 candidate pairs in the
self-join; one boilerplate-heavy bucket (licence headers, templated
pages — every doc sharing a band) turns the whole job quadratic.  The
guard drops over-cap buckets and keeps the drop AUDITABLE: a capped run
can report exactly how many buckets and member rows it skipped so you
can raise the cap or pre-dedup the boilerplate instead.

Plan shape — everything is lazy, nothing runs before the caller's own
action (the round-2 version ran an eager groupBy + collect per call,
a measured 0.6 s regression on ``docs_minhash_lsh`` at sf0.1):

- bucket member counts come from a map-side-combined ``groupBy`` over
  the persisted bucket table — the shuffle carries one row per DISTINCT
  bucket per input partition, not per member row;
- the over-cap bucket list (tiny by construction — it only exists under
  extreme skew) anti-joins the bucket table as a BROADCAST, so the
  whole guard executes inside the caller's first job, as a broadcast
  build subquery — zero extra actions;
- the drop stats are registered as a pending post-hoc report;
  :func:`report_bucket_caps` drains them AFTER the caller's action,
  when the bucket table is still cached, and logs any drops.  The
  streaming corpus builder and the dedup tests call it; ad-hoc callers
  can too.

Dropping (not splitting) is the honest semantics for near-dup pairing:
a randomly split oversized bucket loses cross-split pairs anyway, while
pretending to be complete.  Members of a dropped bucket still pair
through their other bands (B-1 more chances in MinHash, 3 more bands in
SimHash), so only pairs whose EVERY matching band is over-cap are lost.
"""

from __future__ import annotations

import logging
from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

_N = "__bucket_n"

#: Pending (label, cap, over-cap-counts frame) reports; bounded so an
#: operator-heavy session that never drains cannot leak unboundedly.
_PENDING: deque = deque(maxlen=32)


def cap_bucket_size(
    buckets: DataFrame,
    key_cols: list[str],
    max_bucket_size: int | None,
    label: str,
) -> DataFrame:
    """Filter out buckets with more than ``max_bucket_size`` member rows.

    Returns a lazily capped frame; the over-cap list is built inside the
    caller's own job (broadcast anti-join), never as a separate action.
    ``buckets`` is persisted here — both self-join sides and the cap
    subquery read it, so callers must not re-persist.  ``None`` disables
    the guard (the input is still persisted for the self-join's two
    scans).  Call :func:`report_bucket_caps` after an action to log what
    was dropped.
    """
    if max_bucket_size is None:
        return buckets.persist()
    from pyspark.sql.window import Window

    # In-pipeline cap: a count window PARTITIONED BY the bucket key.
    # The band self-join that follows joins on the same key, so the
    # window's exchange+sort IS the join's exchange+sort (SMJ reuse) —
    # no broadcast-build aggregate, no extra stage.  (The round-2
    # broadcast-anti-join variant cost a measured ~1.1 s of plan
    # overhead per call on docs_minhash_lsh at sf0.1.)
    w = Window.partitionBy(*key_cols)
    capped = (
        buckets.withColumn(_N, F.count(F.lit(1)).over(w))
        .filter(F.col(_N) <= max_bucket_size)
        .drop(_N)
        .persist()
    )
    # Audit list recomputes from lineage when drained (post-hoc, rare).
    over = (
        buckets.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias(_N))
        .filter(F.col(_N) > max_bucket_size)
    )
    _PENDING.append((label, max_bucket_size, over))
    return capped


def report_bucket_caps() -> list[dict]:
    """Drain pending cap registrations, log any drops, return the stats.

    Cheap when called right after the operator's action (the bucket
    table is still cached — the stats aggregate is a combine-heavy scan
    of a few distinct keys); recomputes from lineage if the cache was
    already evicted.  Logs one WARNING per operator call that actually
    dropped buckets, nothing for clean runs.
    """
    reports = []
    while _PENDING:
        label, cap, over = _PENDING.popleft()
        stats = over.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(_N).alias("n_members"),
            F.max(_N).alias("max_n"),
        ).first()
        if not stats["n_buckets"]:
            continue
        log.warning(
            "%s: dropped %d over-cap band buckets (>%d members, %d member rows "
            "total, largest %d); pairs whose every shared band is over-cap are "
            "lost — raise max_bucket_size or pre-dedup boilerplate content",
            label,
            stats["n_buckets"],
            cap,
            stats["n_members"],
            stats["max_n"],
        )
        reports.append(
            {
                "label": label,
                "cap": cap,
                "n_buckets": stats["n_buckets"],
                "n_members": stats["n_members"],
                "max_bucket": stats["max_n"],
            }
        )
    return reports
