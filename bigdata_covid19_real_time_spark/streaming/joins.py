"""Stream-stream joins with watermark-bounded state.

Not in the reference (its streaming graph is single-input;
covid_streaming.py joins nothing) — this is engine extension surface: a
training-data ingest frequently correlates two live feeds (impressions
↔ labels, clicks ↔ purchases, raw docs ↔ moderation verdicts).

Structured Streaming only admits a stream-stream inner/outer join when
the engine can bound its buffered state: both sides carry a watermark
and the join condition constrains event time (equality on a window
column, or a time-range predicate).  Without the range bound every past
row must be buffered forever — the unbounded-state analysis rejects the
query at plan time, which is the correct 100 TB behavior.

Scale: state is partitioned by the equi-join key across executors; each
side buffers only rows younger than (watermark + max_delay).  Late rows
beyond the watermark are dropped from the join, never block it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "leftOuter",
) -> DataFrame:
    """Stream-static dimension join: enrich a streaming frame with a
    batch dimension table on ``key``.

    Not in the reference (covid_streaming.py:1-229 joins nothing; its
    sink DDL's descriptive columns arrive pre-joined from NiFi) — this
    is the standard enrichment shape of a training-data ingest: a live
    event/doc feed picks up static attributes (user segment, source
    registry, license tier) from a slowly-changing dimension.

    Structured Streaming evaluates the static side against every
    micro-batch with NO streaming state: the join is stateless, needs
    no watermark, and emits in append mode immediately.  Only the
    stream-on-the-left variants are plannable (``inner``,
    ``leftOuter``, ``leftSemi``, ``leftAnti``) — a right/full outer
    against a static right would require knowing which dim rows never
    match, i.e. unbounded state, and Spark rejects it at plan time; we
    reject it here with a clearer message.

    Scale: the dim is broadcast-hinted — enrichment dims are orders of
    magnitude smaller than the feed, and the broadcast keeps the
    stream side shuffle-free (no repartition of 100 TB of events to
    co-locate with a MB-scale dimension).  A dim too large to
    broadcast is a modeling smell; callers with one can drop the hint
    and accept the shuffle by pre-partitioning the dim themselves.

    Batch degradation (deliberate): ``stream`` is not required to be
    streaming — given a batch frame the same expression is a plain
    broadcast-hash join with identical row semantics, which is what
    makes the batch/streaming twin tests comparable.  Callers that
    need a guarantee the STREAMING path executed should assert
    ``stream.isStreaming`` themselves (the replay gates get it by
    construction — their result comes out of ``writeStream``, which
    does not exist on a batch frame); this helper does not raise,
    because the degradation is semantically sound, not a misuse.
    """
    # normalize the way Spark's JoinType parser does (lowercase, drop
    # underscores) so every alias Spark itself accepts for a
    # stream-preserving variant passes the gate
    supported = {"inner", "leftouter", "left", "leftsemi", "semi",
                 "leftanti", "anti"}
    if how.lower().replace("_", "") not in supported:
        raise ValueError(
            f"stream-static join how={how!r} is not plannable: the "
            "static side is complete but the stream is not, so only "
            f"stream-preserving variants are supported ({sorted(supported)})"
        )
    return stream.join(F.broadcast(dim), on=key, how=how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    ``[left_time, left_time + max_delay]`` — attribution semantics
    (e.g. a purchase attributed to the click that preceded it).

    Both inputs must be streaming frames with event-time columns
    ``left_time`` / ``right_time``; each gets ``watermark`` applied
    here (callers pass raw parsed streams).  ``how`` supports
    ``inner``/``leftOuter``/``rightOuter``/``fullOuter`` — the outer
    variants emit their null-padded rows only once the watermark
    passes, exactly Structured Streaming's contract.

    EVERY right-side column is prefix-renamed before the join (two live
    feeds routinely share ``ts``/payload names; a bare-name resolution
    in the join condition would silently bind the wrong side).  Output
    columns keep their original right-side names where that does not
    collide with a left column; colliding ones come back as
    ``right_<name>``.  The join key comes back as one column, populated
    from whichever side matched.
    """
    lw = left.withWatermark(left_time, watermark)
    # prefix FIRST, then watermark the renamed event-time column, so the
    # watermark tag survives on exactly the column the condition uses
    rw = right.select(
        [F.col(c).alias(f"__r_{c}") for c in right.columns]
    ).withWatermark(f"__r_{right_time}", watermark)
    cond = (
        (lw[key] == rw[f"__r_{key}"])
        & (rw[f"__r_{right_time}"] >= lw[left_time])
        & (rw[f"__r_{right_time}"] <= lw[left_time] + F.expr(f"interval {max_delay}"))
    )
    joined = lw.join(rw, cond, how)
    # one key column out, populated from whichever side matched (outer
    # variants null-pad one side)
    joined = joined.withColumn(
        key, F.coalesce(F.col(key), F.col(f"__r_{key}"))
    ).drop(f"__r_{key}")
    taken = set(left.columns)
    for c in right.columns:
        if c == key:
            continue
        out = c if c not in taken else f"right_{c}"
        while out in taken and out != f"__r_{c}":
            out = f"right_{out}"
        joined = joined.withColumnRenamed(f"__r_{c}", out)
        taken.add(out)
    return joined
