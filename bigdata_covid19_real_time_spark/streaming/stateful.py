"""Custom stateful streaming operator: cross-batch per-location state.

The reference has **no** cross-batch state (SURVEY.md §2.8 T9): its
"7-day" forecaster sees only the rows of the current 30-second
micro-batch, so the trailing averages restart every epoch.  This module
provides the corrected capability as an ``applyInPandasWithState``
operator: per-location running aggregates and an exponentially-weighted
trend that survive micro-batch boundaries via the state store.

Why ``applyInPandasWithState`` and not a composition of built-ins: the
EWMA recurrence ``ewma = a*x + (1-a)*ewma_prev`` across *unbounded*
batches is order-dependent per key — not expressible as a streaming
groupBy aggregate (those must be commutative partial aggregates).  The
state payload is O(1) per location (~5 doubles), so state-store size is
bounded by key cardinality, not data volume — the shape that scales.

Arrow moves each location-group's batch rows into pandas once per epoch;
with ~200 locations the Python-side work is trivial and the shuffle is
on the group key only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: (rows_seen, total_new_cases, max_total_cases, ewma_new_cases, last_total_cases)
STATE_SCHEMA = StructType(
    [
        StructField("rows_seen", LongType()),
        StructField("total_new_cases", DoubleType()),
        StructField("max_total_cases", DoubleType()),
        StructField("ewma_new_cases", DoubleType()),
        StructField("last_total_cases", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("location", StringType()),
        StructField("rows_seen", LongType()),
        StructField("total_new_cases", DoubleType()),
        StructField("max_total_cases", DoubleType()),
        StructField("ewma_new_cases", DoubleType()),
        StructField("predicted_new_cases", DoubleType()),
    ]
)


def _update_location_state(alpha: float):
    """Build the per-group update function (alpha captured by closure)."""

    def update(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            rows, total, mx, ewma, last_tc = state.get
        else:
            rows, total, mx, ewma, last_tc = 0, 0.0, 0.0, None, 0.0

        for pdf in pdfs:
            # deterministic in-batch order: event time then uuid
            pdf = pdf.sort_values(["timestamp", "uuid"], kind="mergesort")
            for nc, tc in zip(pdf["new_cases"], pdf["total_cases"]):
                nc = float(nc) if pd.notna(nc) else 0.0
                tc = float(tc) if pd.notna(tc) else 0.0
                rows += 1
                total += nc
                mx = max(mx, tc)
                ewma = nc if ewma is None else alpha * nc + (1 - alpha) * ewma
                last_tc = tc

        state.update((rows, total, mx, ewma, last_tc))
        yield pd.DataFrame(
            {
                "location": [key[0]],
                "rows_seen": [rows],
                "total_new_cases": [total],
                "max_total_cases": [mx],
                "ewma_new_cases": [ewma if ewma is not None else 0.0],
                "predicted_new_cases": [ewma if ewma is not None else 0.0],
            }
        )

    return update


def cumulative_location_stats(
    cleaned: DataFrame, alpha: float = 0.3
) -> DataFrame:
    """Per-location running stats + EWMA next-step forecast across
    micro-batches (streaming) or over the whole frame (batch).

    Emits one row per location per epoch with the *cumulative* picture —
    what the reference's per-batch forecaster cannot see.  Output mode
    must be ``update``.
    """
    projected = cleaned.select("location", "uuid", "timestamp", "new_cases", "total_cases")
    return projected.groupBy("location").applyInPandasWithState(
        _update_location_state(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: sharded Misra-Gries summaries in the state store
# ---------------------------------------------------------------------------
#
# The batch side runs approx_top_k (plans/heavy_hitters.py); across
# unbounded micro-batches the equivalent is a Misra-Gries summary, whose
# state is BOUNDED (<= capacity counters) no matter how many distinct
# keys the stream carries — the property that makes it state-store-safe
# where exact per-key counting is not.  Items shard by hash, each shard
# keeps its own summary (same-item rows always land in one shard, so
# shard summaries never overlap and merging is a plain union), and the
# per-shard MG guarantee holds: for every item,
#
#     true_count - processed_shard / (capacity + 1) <= est <= true_count
#
# so every item with true count above processed_shard/(capacity+1) is
# GUARANTEED present — the classic frequent-elements contract.

MG_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("processed", LongType()),
    ]
)

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("item", LongType()),
        StructField("est_count", LongType()),
        StructField("processed_in_shard", LongType()),
        StructField("max_undercount", LongType()),
    ]
)


def _mg_update(capacity: int):
    def update(
        key: tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, processed = state.get
            counters = dict(zip(items, counts))
        else:
            counters, processed = {}, 0

        for pdf in pdfs:
            for x in pdf["item"]:
                x = int(x)
                processed += 1
                if x in counters:
                    counters[x] += 1
                elif len(counters) < capacity:
                    counters[x] = 1
                else:  # decrement-all step: every counter pays one
                    counters = {
                        i: c - 1 for i, c in counters.items() if c > 1
                    }

        state.update(
            (list(counters), [counters[i] for i in counters], processed)
        )
        bound = processed // (capacity + 1)
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "item": list(counters),
                "est_count": [counters[i] for i in counters],
                "processed_in_shard": [processed] * len(counters),
                "max_undercount": [bound] * len(counters),
            }
        )

    return update


def streaming_heavy_hitters(
    events: DataFrame,
    item_col: str = "user_id",
    capacity: int = 16,
    n_shards: int = 8,
) -> DataFrame:
    """Cross-batch frequent items: per-shard Misra-Gries summaries that
    survive micro-batch boundaries via the state store.

    Emits every summary entry per epoch (output mode ``update``):
    ``(shard, item, est_count, processed_in_shard, max_undercount)``.
    ``est_count`` never exceeds the true count and undercounts by at
    most ``max_undercount``; any item whose true count exceeds that
    bound is guaranteed present.  State is <= ``capacity`` counters per
    shard — bounded regardless of key cardinality.  Same-item rows
    hash to one shard, so a downstream global top-k is a plain sort of
    the union, no cross-shard merge arithmetic.
    """
    from pyspark.sql import functions as F

    sharded = events.select(
        F.col(item_col).cast("long").alias("item"),
        F.pmod(F.xxhash64(F.col(item_col).cast("long")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    ).filter(F.col("item").isNotNull())
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_update(capacity),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: (n, mean, M2, cusum_pos, cusum_neg, n_batches)
DRIFT_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
        StructField("n_batches", LongType()),
    ]
)

DRIFT_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_total", LongType()),
        StructField("mean", DoubleType()),
        StructField("sd", DoubleType()),
        StructField("batch_n", LongType()),
        StructField("batch_mean", DoubleType()),
        StructField("z", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
        StructField("drift", BooleanType()),
    ]
)


def _drift_update(k_slack: float, h_threshold: float):
    """Build the per-key drift update function (constants captured)."""

    def update(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math as _math

        if state.exists:
            n, mean, m2, s_pos, s_neg, n_batches = state.get
        else:
            n, mean, m2, s_pos, s_neg, n_batches = 0, 0.0, 0.0, 0.0, 0.0, 0

        # the PRE-batch baseline standardizes this batch's mean
        base_n, base_mean = n, mean
        base_sd = _math.sqrt(m2 / (n - 1)) if n > 1 else 0.0

        batch_n, batch_sum = 0, 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values(["value"], kind="mergesort")
            for v in pdf["value"]:
                if pd.isna(v):
                    continue
                v = float(v)
                batch_n += 1
                batch_sum += v
                # Welford running moments (the cross-batch baseline)
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)

        batch_mean = batch_sum / batch_n if batch_n else 0.0
        if base_n > 1 and base_sd > 0 and batch_n > 0:
            z = (batch_mean - base_mean) / (base_sd / _math.sqrt(batch_n))
        else:
            z = 0.0
        s_pos = max(0.0, s_pos + z - k_slack)
        s_neg = max(0.0, s_neg - z - k_slack)
        n_batches += 1
        state.update((n, mean, m2, s_pos, s_neg, n_batches))

        sd = _math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_total": [n],
                "mean": [mean],
                "sd": [sd],
                "batch_n": [batch_n],
                "batch_mean": [batch_mean],
                "z": [z],
                "cusum_pos": [s_pos],
                "cusum_neg": [s_neg],
                "drift": [s_pos > h_threshold or s_neg > h_threshold],
            }
        )

    return update


def streaming_drift_monitor(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    k_slack: float = 0.5,
    h_threshold: float = 5.0,
) -> DataFrame:
    """Cross-batch distribution-drift monitor: per key, Welford running
    moments form the baseline, and each micro-batch's standardized mean
    feeds a two-sided Page CUSUM (``S+ = max(0, S+ + z - k)``,
    ``S- = max(0, S- - z - k)``); ``drift`` flips when either side
    crosses ``h_threshold`` — the streaming twin of the batch
    ``events_value_cusum`` changepoint query.

    Why stateful: both the baseline (unbounded-history moments) and the
    CUSUM recursion are order-dependent across batches — not
    expressible as a commutative streaming aggregate.  State is O(1)
    per key (6 numbers), so the state store is bounded by key
    cardinality regardless of volume.  Output mode ``update``; one row
    per key per epoch.
    """
    from pyspark.sql import functions as F

    projected = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("key").isNotNull())
    return projected.groupBy("key").applyInPandasWithState(
        _drift_update(k_slack, h_threshold),
        outputStructType=DRIFT_OUTPUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: sessionize state: open session (start, last_ts, n_events, sum_value)
#: plus the next session sequence number; n_events = 0 <=> no open session.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start", DoubleType()),
        StructField("last_ts", DoubleType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("next_seq", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_seq", LongType()),
        StructField("session_start", DoubleType()),
        StructField("session_end", DoubleType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("duration_sec", DoubleType()),
    ]
)


def _sessionize_update(gap_sec: float):
    """Build the per-key sessionize update function (gap captured)."""

    def update(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start, last, n_ev, s_val, seq = state.get
        else:
            start, last, n_ev, s_val, seq = 0.0, 0.0, 0, 0.0, 0

        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts", kind="mergesort")
            for ts, v in zip(pdf["ts"], pdf["value"]):
                if pd.isna(ts):
                    continue
                ts = float(ts)
                v = 0.0 if pd.isna(v) else float(v)
                if n_ev == 0:
                    start, last, n_ev, s_val = ts, ts, 1, v
                elif ts - last > gap_sec:
                    closed.append(
                        (key[0], seq, start, last, n_ev, s_val, last - start)
                    )
                    seq += 1
                    start, last, n_ev, s_val = ts, ts, 1, v
                else:
                    # late rows (ts <= last) fold into the open session
                    last = max(last, ts)
                    n_ev += 1
                    s_val += v
        state.update((start, last, n_ev, s_val, seq))
        # column-wise typed construction: ~4x cheaper than building a
        # row-tuple frame and astype-ing it, and this yield runs once
        # per (key, epoch) — the operator's per-micro-batch hot path
        import numpy as np

        cols = list(zip(*closed)) if closed else [[]] * 7
        yield pd.DataFrame(
            {
                "key": pd.Series(cols[0], dtype="object"),
                "session_seq": np.asarray(cols[1], dtype="int64"),
                "session_start": np.asarray(cols[2], dtype="float64"),
                "session_end": np.asarray(cols[3], dtype="float64"),
                "n_events": np.asarray(cols[4], dtype="int64"),
                "sum_value": np.asarray(cols[5], dtype="float64"),
                "duration_sec": np.asarray(cols[6], dtype="float64"),
            }
        )

    return update


def streaming_sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_sec: float = 1800.0,
) -> DataFrame:
    """Cross-batch gap sessionization: per key, events closer than
    ``gap_sec`` chain into one session; a larger gap closes the open
    session (emitted with start/end/count/sum/duration) and opens a new
    one.  Sessions SURVIVE micro-batch boundaries — the open session
    rides the state store until a gap-exceeding event closes it, which
    the built-in ``session_window`` aggregate also achieves, but this
    operator additionally emits the per-session event count, value sum,
    and a stable per-key session sequence number, and tolerates
    unordered arrivals by folding late rows (ts <= last seen) into the
    open session instead of corrupting the window assignment.

    Why stateful: session membership is an order-dependent recurrence
    over unbounded history (exactly like the EWMA above).  State is
    O(1) per key — the OPEN session's 5 numbers, never the event list —
    so the store is bounded by key cardinality.  Output mode
    ``append``: closed sessions are immutable facts.  The final open
    session is deliberately never emitted (no timeout) — at 100 TB the
    operator runs with a watermark-driven close in the caller's
    trigger cadence or a terminal flush batch.
    """
    from pyspark.sql import functions as F

    projected = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("key").isNotNull())
    return projected.groupBy("key").applyInPandasWithState(
        _sessionize_update(gap_sec),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
