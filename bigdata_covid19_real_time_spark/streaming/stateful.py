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
