"""Batch-twin certification of the streaming state-store operators.

The reference keeps no cross-batch state (SURVEY.md §2.8 T9 — its
micro-batch forecaster restarts every epoch; ``covid_streaming.py``'s
only stateful construct is the inert watermark), so the engine's
``applyInPandasWithState`` family (``streaming/stateful.py``) is a
capability extension — and through round 5 it was the ONE family the
driver's correctness gate had never touched, because a streaming query
has no (spark, sf_dir) -> DataFrame shape.

These queries close that gap with deterministic REPLAY: each one
partitions the events table into calendar-day epochs, feeds the epochs
*in order* through the very same per-group update closure the streaming
operator registers (``_sessionize_update`` / ``_mg_update`` /
``_drift_update``, imported — not reimplemented), with a 4-line
GroupState shim standing in for the state store.  Because those
closures touch the ``GroupState`` API only via ``exists`` / ``get`` /
``update``, a replay through the shim computes bit-identically what the
streaming run computes over the same epoch sequence — so a green
driver row here certifies the cross-batch semantics (state survives
epoch boundaries, order-dependent recurrences chain correctly), not a
parallel reimplementation.

Oracle strategy per operator:

- gap sessionization: fully SQL-expressible — DuckDB gaps-and-islands
  over ``epoch_us`` microsecond integers, excluding each key's final
  (still-open) island exactly like the operator, which never emits the
  open session.  Full rows+schema+hash parity, integer-exact times.
- Misra-Gries heavy hitters: the summary content is order-dependent
  and engine-specific, so the gate is the sketch-bounds pattern
  (``plans/sketch_bounds.py``): exact per-shard processed counts and
  true-heavy counts computed in SQL, plus the published MG contract as
  booleans the oracle pins TRUE — estimates never exceed truth,
  undercount <= processed // (capacity+1), and every item above that
  bound is guaranteed present.  The key space reuses the skewed
  derivation of ``events_skewed_heavy_hitters_sketch`` (hot keys at
  ~N/16 against ~0.75N singleton cold keys) so the summary genuinely
  purges at every SF and the guaranteed-presence check is non-vacuous.
- drift monitor: the Welford-baseline + Page-CUSUM recursion unrolls
  as a DuckDB ``WITH RECURSIVE`` over the per-key day sequence — the
  z-standardization and ``max(0, .)`` recursion replicated exactly,
  values compared at rounded precision.  Full rows+schema+hash parity.

Scale: the replay kernels are certification harnesses for the
streaming operators; they inherit the operators' scale shape — state
is O(1) per group, groups shard by key, Arrow moves each group once —
and the per-row Python loop is exactly the work the streaming kernel
does per micro-batch.  At 100 TB you run the streaming operator
itself; the replay exists so the batch correctness gate can see it.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Sessionization gap, MICROSECONDS (30 min).  Times stay integer µs
#: end-to-end (`unix_micros` ↔ DuckDB `epoch_us`), so the gap compare
#: and every emitted boundary are exact in both engines.
SESSION_GAP_US = 1_800 * 1_000_000

#: Misra-Gries replay configuration: far fewer tracked slots per shard
#: than distinct keys (~0.75N cold singletons across 8 shards vs 16
#: slots), so the summary purges constantly — the approximating regime.
MG_CAPACITY = 16
MG_SHARDS = 8

#: Page-CUSUM slack / threshold — the streaming operator's defaults.
DRIFT_K = 0.5
DRIFT_H = 5.0

#: Microseconds per UTC calendar day (the replay epoch).
_DAY_US = 86_400 * 1_000_000


class _ReplayState:
    """Minimal stand-in for ``pyspark...GroupState`` — the three members
    the stateful kernels actually touch.  Feeding epochs through the
    real update closures with this shim replays the streaming
    computation deterministically in batch."""

    __slots__ = ("_t",)

    def __init__(self) -> None:
        self._t = None

    @property
    def exists(self) -> bool:
        return self._t is not None

    @property
    def get(self):
        return self._t

    def update(self, t) -> None:
        self._t = t


def _replay_epochs(pdf: pd.DataFrame, key: tuple, update) -> list[pd.DataFrame]:
    """Feed ``pdf``'s rows through ``update`` one ``epoch`` at a time in
    ascending epoch order (sub-frames keep the operator's own in-batch
    ordering rules), collecting each epoch's emitted frame."""
    state = _ReplayState()
    out = []
    for _, sub in pdf.groupby("epoch", sort=True):
        out.extend(update(key, iter([sub]), state))
    return out


# ---------------------------------------------------------------------------
# 1. Gap sessionization — exact gaps-and-islands oracle
# ---------------------------------------------------------------------------


def _session_replay_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    from bigdata_covid19_real_time_spark.streaming.stateful import (
        _sessionize_update,
    )

    key = (str(pdf["key"].iloc[0]),)
    frames = _replay_epochs(pdf, key, _sessionize_update(float(SESSION_GAP_US)))
    out = pd.concat(frames, ignore_index=True)
    return pd.DataFrame(
        {
            "key": out["key"].astype("string"),
            "session_seq": out["session_seq"].astype("int64"),
            "session_start_us": out["session_start"].astype("int64"),
            "session_end_us": out["session_end"].astype("int64"),
            "n_events": out["n_events"].astype("int64"),
            "sum_value": out["sum_value"].astype("float64"),
            "duration_us": out["duration_sec"].astype("int64"),
        }
    )


@query(
    "events_sessionize_replay",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS key, epoch_us(ts) AS ts_us,
             COALESCE(value, 0.0) AS v
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    brk AS (
      SELECT key, ts_us, v,
             CASE WHEN ts_us - LAG(ts_us) OVER (
                    PARTITION BY key ORDER BY ts_us
                  ) > {SESSION_GAP_US} THEN 1 ELSE 0 END AS b
      FROM ev
    ),
    sess AS (
      SELECT key, ts_us, v,
             SUM(b) OVER (
               PARTITION BY key ORDER BY ts_us ROWS UNBOUNDED PRECEDING
             ) AS seq
      FROM brk
    ),
    agg AS (
      SELECT key, seq,
             MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
             CAST(COUNT(*) AS BIGINT) AS n_events, SUM(v) AS sum_value
      FROM sess GROUP BY 1, 2
    )
    SELECT key, CAST(seq AS BIGINT) AS session_seq,
           session_start_us, session_end_us, n_events,
           ROUND(sum_value + 1e-9, 6) AS sum_value,
           session_end_us - session_start_us AS duration_us
    FROM agg
    QUALIFY seq < MAX(seq) OVER (PARTITION BY key)
    """,
)
def events_sessionize_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch gap sessionization certified by replay: per user, 30
    daily epochs stream through the REAL ``_sessionize_update`` closure
    (``streaming/stateful.py:383``) via the GroupState shim, so every
    session that spans a day boundary proves the open session survived
    the state store hand-off.  The oracle recomputes closed sessions as
    epoch-free gaps-and-islands SQL and drops each key's final (open)
    island — exact integer-microsecond parity on every boundary.

    Plan shape: one narrow projection of events, one shuffle on the
    session key into ``applyInPandas`` (state O(1) per key), no
    collect.  Equal-timestamp rows fold into one session and carry
    order-independent aggregates, so the output is partition-invariant.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.col("user_id").cast("string").alias("key"),
            F.unix_micros(F.col("ts").cast("timestamp")).cast("double").alias("ts"),
            F.col("value").cast("double").alias("value"),
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_DAY_US)).alias("epoch"),
        )
    )
    # Explicit numbered repartition on the group key: the kernel cost is
    # Python-side and invisible to AQE, which would otherwise coalesce
    # this few-MB shuffle into ONE task and serialize ~1500 key-groups
    # of per-row replay (measured 19.6s -> ~2s at sf0.1 on local[32]).
    # groupBy reuses the hash distribution, so no second exchange.
    n_par = spark.sparkContext.defaultParallelism
    replay = ev.repartition(n_par, "key").groupBy("key").applyInPandas(
        _session_replay_kernel,
        schema=(
            "key string, session_seq long, session_start_us long, "
            "session_end_us long, n_events long, sum_value double, "
            "duration_us long"
        ),
    )
    return replay.select(
        "key",
        "session_seq",
        "session_start_us",
        "session_end_us",
        "n_events",
        stable_round(F.col("sum_value"), 6).alias("sum_value"),
        "duration_us",
    )


# ---------------------------------------------------------------------------
# 2. Misra-Gries heavy hitters — contract-boolean oracle (sketch_bounds)
# ---------------------------------------------------------------------------


def _mg_replay_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    from bigdata_covid19_real_time_spark.streaming.stateful import _mg_update

    key = (int(pdf["shard"].iloc[0]),)
    # MG is arrival-order-dependent: pin the deterministic replay order
    # (event time, then item) before the epoch split.
    pdf = pdf.sort_values(["ts_us", "item"], kind="mergesort")
    frames = _replay_epochs(pdf, key, _mg_update(MG_CAPACITY))
    final = frames[-1]  # cumulative summary after the last epoch
    return pd.DataFrame(
        {
            "shard": final["shard"].astype("int64"),
            "item": final["item"].astype("int64"),
            "est_count": final["est_count"].astype("int64"),
            "processed": final["processed_in_shard"].astype("int64"),
            "bound": final["max_undercount"].astype("int64"),
        }
    )


def _mg_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skewed replay key space (shared with the oracle SQL): 4 hot
    keys at ~N/16 occurrences each vs ~0.75N singleton cold keys, so
    every shard's summary purges and the hot keys clear the
    guaranteed-presence bound with ~7x margin."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    return ev.select(
        F.when(F.col("event_id") % 4 == 0, F.col("user_id") % 4)
        .otherwise(F.col("event_id") + 10)
        .cast("long")
        .alias("item"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).select(
        "item",
        "ts_us",
        F.pmod(F.col("item"), F.lit(MG_SHARDS)).cast("long").alias("shard"),
        F.floor(F.col("ts_us") / F.lit(_DAY_US)).alias("epoch"),
    )


@query(
    "events_mg_heavy_hitters_replay",
    oracle=f"""
    WITH base AS (
      SELECT CASE WHEN event_id % 4 = 0 THEN user_id % 4
                  ELSE event_id + 10 END AS item
      FROM events
      WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
    ),
    c AS (
      SELECT item % {MG_SHARDS} AS shard, item, COUNT(*) AS n
      FROM base GROUP BY 1, 2
    ),
    s AS (SELECT shard, CAST(SUM(n) AS BIGINT) AS processed FROM c GROUP BY 1),
    h AS (
      SELECT c.shard,
             CAST(COUNT(*) FILTER (
               WHERE c.n > s.processed // {MG_CAPACITY + 1}
             ) AS BIGINT) AS n_heavy
      FROM c JOIN s USING (shard) GROUP BY 1
    )
    SELECT CAST(s.shard AS BIGINT) AS shard, s.processed, h.n_heavy,
           TRUE AS processed_match,
           TRUE AS all_est_le_true,
           TRUE AS undercount_within_bound,
           TRUE AS all_heavy_present
    FROM s JOIN h USING (shard)
    """,
)
def events_mg_heavy_hitters_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Misra-Gries heavy hitters certified by replay: per
    shard, 30 daily epochs stream through the REAL ``_mg_update``
    closure (``streaming/stateful.py:158``), so the summary that comes
    out is exactly what the state store would hold after 30
    micro-batches.  The exact per-item counts run alongside purely as
    the verification harness (at 100 TB only the MG summary runs); the
    oracle pins the published MG contract — ``est <= true``,
    ``true - est <= processed // (capacity+1)``, and every true-heavy
    item present — plus exact per-shard processed / true-heavy counts.
    """
    keyed = _mg_keyed(spark, sf_dir)
    summary = keyed.groupBy("shard").applyInPandas(
        _mg_replay_kernel,
        schema="shard long, item long, est_count long, processed long, bound long",
    )
    exact = keyed.groupBy("shard", "item").agg(F.count(F.lit(1)).alias("n"))
    shard_tot = exact.groupBy("shard").agg(
        F.sum("n").cast("long").alias("processed_exact")
    )
    bound_col = F.floor(F.col("processed_exact") / F.lit(MG_CAPACITY + 1))
    heavy = (
        exact.join(shard_tot, "shard")
        .withColumn("is_heavy", F.col("n") > bound_col)
        .filter(F.col("is_heavy"))
        .select("shard", "item")
    )
    # per-shard contract checks: every summary estimate vs its exact
    # count, every true-heavy item vs summary membership
    est_checked = (
        summary.join(exact, ["shard", "item"])
        .groupBy("shard")
        .agg(
            F.first("processed").alias("processed_replay"),
            F.bool_and(F.col("est_count") <= F.col("n")).alias(
                "all_est_le_true"
            ),
            F.bool_and(
                F.col("n") - F.col("est_count") <= F.col("bound")
            ).alias("undercount_within_bound"),
        )
    )
    present = (
        heavy.join(
            summary.select("shard", "item", F.lit(True).alias("in_summary")),
            ["shard", "item"],
            "left",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_heavy"),
            F.sum(F.col("in_summary").cast("long")).alias("n_present"),
        )
    )
    return (
        shard_tot.join(est_checked, "shard")
        .join(present, "shard", "left")
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("processed_exact").alias("processed"),
            F.coalesce(F.col("n_heavy"), F.lit(0)).cast("long").alias("n_heavy"),
            (F.col("processed_replay") == F.col("processed_exact")).alias(
                "processed_match"
            ),
            "all_est_le_true",
            "undercount_within_bound",
            # n_present is SUM over in_summary, which is all-NULL when NO
            # true-heavy item made the summary — coalesce it to 0 so that
            # total-absence yields FALSE and fails the gate; the outer
            # coalesce stays TRUE only for shards with zero heavy items
            # (n_heavy NULL from the left join), the genuinely vacuous case.
            F.coalesce(
                F.coalesce(F.col("n_present"), F.lit(0)) == F.col("n_heavy"),
                F.lit(True),
            ).alias("all_heavy_present"),
        )
    )


# ---------------------------------------------------------------------------
# 3. Drift monitor — exact recursive-CTE oracle
# ---------------------------------------------------------------------------


def _drift_replay_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    from bigdata_covid19_real_time_spark.streaming.stateful import _drift_update

    key = (str(pdf["key"].iloc[0]),)
    update = _drift_update(DRIFT_K, DRIFT_H)
    state = _ReplayState()
    rows = []
    for _, sub in pdf.groupby("epoch", sort=True):
        (out,) = list(update(key, iter([sub]), state))
        out = out.assign(d=str(sub["d"].iloc[0]))
        rows.append(out)
    return pd.concat(rows, ignore_index=True)[
        [
            "key",
            "d",
            "n_total",
            "mean",
            "sd",
            "batch_n",
            "batch_mean",
            "z",
            "cusum_pos",
            "cusum_neg",
            "drift",
        ]
    ]


@query(
    "events_drift_monitor_replay",
    oracle=f"""
    WITH RECURSIVE
    daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS bn,
             SUM(value) AS bs, SUM(value * value) AS bss
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    seq AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY d) AS i
      FROM daily
    ),
    rec AS (
      SELECT key, i, d, bn, bn AS n, bs AS s, bss AS ss,
             -- CAST: DuckDB types recursive-CTE columns from this seed
             -- branch; a bare 0.0 is DECIMAL(2,1) and would truncate
             -- every downstream z / CUSUM value to one decimal
             CAST(0.0 AS DOUBLE) AS z,
             CAST(0.0 AS DOUBLE) AS s_pos, CAST(0.0 AS DOUBLE) AS s_neg
      FROM seq WHERE i = 1
      UNION ALL
      SELECT q.key, q.i, q.d, q.bn,
             r.n + q.bn, r.s + q.bs, r.ss + q.bss,
             CASE WHEN r.n > 1
                       AND (r.ss - r.s * r.s / r.n) / (r.n - 1) > 0
                       AND q.bn > 0
                  THEN ((q.bs / q.bn) - (r.s / r.n))
                       / (SQRT((r.ss - r.s * r.s / r.n) / (r.n - 1))
                          / SQRT(q.bn))
                  ELSE 0.0 END,
             GREATEST(0.0, r.s_pos
               + (CASE WHEN r.n > 1
                            AND (r.ss - r.s * r.s / r.n) / (r.n - 1) > 0
                            AND q.bn > 0
                       THEN ((q.bs / q.bn) - (r.s / r.n))
                            / (SQRT((r.ss - r.s * r.s / r.n) / (r.n - 1))
                               / SQRT(q.bn))
                       ELSE 0.0 END) - {DRIFT_K}),
             GREATEST(0.0, r.s_neg
               - (CASE WHEN r.n > 1
                            AND (r.ss - r.s * r.s / r.n) / (r.n - 1) > 0
                            AND q.bn > 0
                       THEN ((q.bs / q.bn) - (r.s / r.n))
                            / (SQRT((r.ss - r.s * r.s / r.n) / (r.n - 1))
                               / SQRT(q.bn))
                       ELSE 0.0 END) - {DRIFT_K})
      FROM rec r JOIN seq q ON q.key = r.key AND q.i = r.i + 1
    )
    SELECT key, CAST(d AS VARCHAR) AS d, n AS n_total,
           ROUND(s / n + 1e-9, 6) AS mean,
           ROUND(CASE WHEN n > 1
                      THEN SQRT(GREATEST((ss - s * s / n) / (n - 1), 0.0))
                      ELSE 0.0 END + 1e-9, 6) AS sd,
           bn AS batch_n,
           ROUND(z + 1e-9, 6) AS z,
           ROUND(s_pos + 1e-9, 6) AS cusum_pos,
           ROUND(s_neg + 1e-9, 6) AS cusum_neg,
           (s_pos > {DRIFT_H} OR s_neg > {DRIFT_H}) AS drift
    FROM rec
    """,
)
def events_drift_monitor_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor certified by replay: per event type, 30
    daily epochs stream through the REAL ``_drift_update`` closure
    (``streaming/stateful.py:261``) — Welford baseline moments, per-epoch
    z-standardization, and the two-sided Page CUSUM recursion
    ``S+ = max(0, S+ + z - k)`` all chain across the state-store shim
    exactly as across micro-batches.  The oracle unrolls the identical
    recursion as a DuckDB ``WITH RECURSIVE`` over the per-key day
    sequence — full value parity on every epoch's moments, z, and both
    CUSUM sides (rounded at 1e-6, far above the ~1e-11 cross-engine
    accumulation noise of these sums).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            F.col("event_type").alias("key"),
            F.col("value").cast("double").alias("value"),
            F.to_date("ts").cast("string").alias("d"),
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_DAY_US)).alias("epoch"),
        )
    )
    replay = ev.groupBy("key").applyInPandas(
        _drift_replay_kernel,
        schema=(
            "key string, d string, n_total long, mean double, sd double, "
            "batch_n long, batch_mean double, z double, cusum_pos double, "
            "cusum_neg double, drift boolean"
        ),
    )
    return replay.select(
        "key",
        "d",
        "n_total",
        stable_round(F.col("mean"), 6).alias("mean"),
        stable_round(F.col("sd"), 6).alias("sd"),
        "batch_n",
        stable_round(F.col("z"), 6).alias("z"),
        stable_round(F.col("cusum_pos"), 6).alias("cusum_pos"),
        stable_round(F.col("cusum_neg"), 6).alias("cusum_neg"),
        "drift",
    )


# ---------------------------------------------------------------------------
# 4. Cumulative per-key stats + EWMA forecast — exact list_reduce oracle
# ---------------------------------------------------------------------------

#: EWMA smoothing factor — the streaming operator's default.
EWMA_ALPHA = 0.3


def _ewma_replay_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    from bigdata_covid19_real_time_spark.streaming.stateful import (
        _update_location_state,
    )

    key = (str(pdf["location"].iloc[0]),)
    update = _update_location_state(EWMA_ALPHA)
    state = _ReplayState()
    rows = []
    for _, sub in pdf.groupby("epoch", sort=True):
        (out,) = list(update(key, iter([sub]), state))
        out = out.assign(d=str(sub["d"].iloc[0]))
        rows.append(out)
    merged = pd.concat(rows, ignore_index=True)
    return pd.DataFrame(
        {
            "key": merged["location"],
            "d": merged["d"],
            "rows_seen": merged["rows_seen"].astype("int64"),
            "total_new_cases": merged["total_new_cases"].astype("float64"),
            "max_total_cases": merged["max_total_cases"].astype("float64"),
            "ewma_new_cases": merged["ewma_new_cases"].astype("float64"),
            "predicted_new_cases": merged["predicted_new_cases"].astype(
                "float64"
            ),
        }
    )


@query(
    "events_ewma_state_replay",
    oracle=f"""
    WITH ev AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS d,
             epoch_us(ts) AS ts_us, event_id,
             COALESCE(value, 0.0) AS x
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND event_id IS NOT NULL
    ),
    daily AS (
      SELECT key, d, CAST(COUNT(*) AS BIGINT) AS bn, SUM(x) AS bs,
             MAX(x) AS bm, list(x ORDER BY ts_us, event_id) AS xs
      FROM ev GROUP BY 1, 2
    ),
    cum AS (
      SELECT a.key, a.d,
             CAST(SUM(b.bn) AS BIGINT) AS rows_seen,
             SUM(b.bs) AS total_x, MAX(b.bm) AS max_x,
             flatten(list(b.xs ORDER BY b.d)) AS all_xs
      FROM daily a JOIN daily b ON b.key = a.key AND b.d <= a.d
      GROUP BY 1, 2
    )
    SELECT key, CAST(d AS VARCHAR) AS d, rows_seen,
           ROUND(total_x + 1e-9, 6) AS total_new_cases,
           ROUND(max_x + 1e-9, 6) AS max_total_cases,
           ROUND(list_reduce(all_xs,
                 (acc, v) -> CAST({EWMA_ALPHA} AS DOUBLE) * v
                           + CAST({1 - EWMA_ALPHA} AS DOUBLE) * acc)
                 + 1e-9, 6) AS ewma_new_cases,
           ROUND(list_reduce(all_xs,
                 (acc, v) -> CAST({EWMA_ALPHA} AS DOUBLE) * v
                           + CAST({1 - EWMA_ALPHA} AS DOUBLE) * acc)
                 + 1e-9, 6) AS predicted_new_cases
    FROM cum
    """,
)
def events_ewma_state_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cumulative-stats + EWMA forecaster — the operator that fixes
    the reference's per-batch forecast restart (its "7-day" trailing
    averages see only one micro-batch, ``covid_streaming.py:117-131``;
    SURVEY.md §2.8 T9) — certified by replay: per key, 30 daily epochs
    stream through the REAL ``_update_location_state`` closure
    (``streaming/stateful.py:63``), so every epoch's row proves the
    running totals, max, and order-dependent EWMA recurrence
    ``ewma = a*x + (1-a)*ewma_prev`` chained across the state store.
    The oracle replicates the recurrence exactly with DuckDB's
    ``list_reduce`` sequential fold over the identically-ordered value
    list — the same float ops in the same order, compared at 1e-6.

    The events mapping feeds the covid-shaped operator columns
    (location=event_type, uuid=event_id for the in-batch tie-break,
    new_cases=total_cases=value) — NULL values fold to 0.0 on both
    sides, rows are never dropped.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            F.col("event_type").alias("location"),
            F.col("event_id").alias("uuid"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("timestamp"),
            F.col("value").cast("double").alias("new_cases"),
            F.col("value").cast("double").alias("total_cases"),
            F.to_date("ts").cast("string").alias("d"),
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_DAY_US)
            ).alias("epoch"),
        )
    )
    replay = ev.groupBy("location").applyInPandas(
        _ewma_replay_kernel,
        schema=(
            "key string, d string, rows_seen long, total_new_cases double, "
            "max_total_cases double, ewma_new_cases double, "
            "predicted_new_cases double"
        ),
    )
    return replay.select(
        "key",
        "d",
        "rows_seen",
        stable_round(F.col("total_new_cases"), 6).alias("total_new_cases"),
        stable_round(F.col("max_total_cases"), 6).alias("max_total_cases"),
        stable_round(F.col("ewma_new_cases"), 6).alias("ewma_new_cases"),
        stable_round(F.col("predicted_new_cases"), 6).alias(
            "predicted_new_cases"
        ),
    )
