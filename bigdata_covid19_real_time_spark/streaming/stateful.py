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
    DoubleType,
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
