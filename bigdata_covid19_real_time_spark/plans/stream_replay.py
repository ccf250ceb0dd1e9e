"""Driver gates for the engine-native streaming stateful operators.

``streaming/runner.py:dedup_within_watermark`` (cross-batch streaming
dedup via ``dropDuplicatesWithinWatermark``) and
``streaming/joins.py:interval_join_streams`` (watermark-bounded
stream-stream interval join) were the last two capability families
with no driver-visible row — both pytest-only through round 6.  The
state-store family closed via closure replay
(``plans/state_replay.py``); these two operators are ENGINE-NATIVE
(their state lives inside Structured Streaming's state store, not in a
Python closure), so the only honest gate is to run the REAL streaming
query: the events table is split into one parquet file per calendar
day, consumed as a file stream with ``maxFilesPerTrigger=1`` under
``Trigger.AvailableNow`` (one micro-batch per day, oldest first — file
mtimes are explicitly 1 s-spaced because HDFS mtime granularity is
milliseconds and sub-ms-written files would tie and scramble epoch
order), through the real operator, into a memory sink.

Oracle strategy — margin-certain watermark semantics: both gates pick
a watermark delay (10 days) longer than the whole 6-day replay
horizon, so within the replay no row is ever late and no state is ever
evicted.  Under that regime the streaming results are EXACTLY
batch-expressible (dedup -> first occurrence per key = the distinct
original rows; interval join -> the plain SQL time-range join), which
is what makes a DuckDB value oracle possible.  What the gate then
certifies end-to-end: the operator accepts and executes the real
multi-batch plan, carries dedup/join state ACROSS micro-batches
(within-batch-only semantics would leave cross-batch duplicates in the
output / drop cross-midnight attributions — both value-visible), and
emits exactly once per match into an append sink.  The
boundary-regime behaviors the margin deliberately avoids (late-row
drops, state eviction + re-admission) are pinned by the streaming
pytest suite (``tests/test_streaming.py``, ``tests/test_drift_stream.py``)
where event-time fixtures are hand-built.

Scale: identical shapes to a production deployment — dedup state is
hash-partitioned by key, join state by the equi-key; each side buffers
only rows younger than watermark + delay.  The replay's per-epoch cost
is ~all fixed micro-batch overhead at gate SFs (the same
harness-not-operator profile as ``docs_corpus_ingest_replay``), so
both queries are bench-EXCLUDED with that rationale and gate-windowed
for correctness instead.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.lakehouse_twins import _scratch_dir
from bigdata_covid19_real_time_spark.plans.registry import query
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Replay horizon: the first six calendar days of the events table
#: (one file-stream micro-batch per day).  The generated corpus starts
#: 2024-01-01 at every SF.
HORIZON_START = "2024-01-01"
HORIZON_END = "2024-01-07"
N_EPOCHS = 6

#: Watermark delay for BOTH gates — longer than the whole horizon, so
#: the replay stays in the margin-certain regime the module docstring
#: describes (no late rows, no state eviction).
WATERMARK = "240 hours"

#: Attribution window for the interval join (purchase within 24 h of a
#: click).  24 h makes cross-midnight pairs — where the purchase
#: arrives one micro-batch AFTER its click and the match can only come
#: from buffered join state — a routine occurrence at every SF.
ATTRIBUTION_DELAY = "24 hours"

#: Hard ceiling on how many rows `_run_to_memory` will let the memory
#: sink accumulate.  The sink holds every output row on the DRIVER for
#: the duration of the run, and the dedup gate's output is "every
#: horizon event", which grows LINEARLY with SF — bounded by
#: construction at gate SFs (2k/0.2k rows at sf0.01, ~20k at sf0.1,
#: ~200k at sf1) but a future SF bump must fail loudly here instead of
#: silently ballooning driver memory.  1M rows of the widest replay
#: schema is ~60 MB on the driver — far under any plausible driver
#: heap, far over any SF this harness is pointed at.
MAX_SINK_ROWS = 1_000_000


def _horizon_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the corpus ts is TIMESTAMP_NTZ; watermarking requires TIMESTAMP.
    # load_table pins the session to UTC, so the cast is value-preserving
    # (and the final selects cast back to NTZ for oracle comparability).
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("ts") < F.lit(HORIZON_END).cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def _write_epoch_files(
    feed: DataFrame, out_dir: str, n_epochs: int = N_EPOCHS
) -> None:
    """One parquet FILE per ``epoch`` value (0..n_epochs-1), mtimes
    1 s apart so the file source consumes them oldest-first
    deterministically."""
    os.makedirs(out_dir, exist_ok=True)
    base_t = time.time() - 3600
    for e in range(n_epochs):
        tmp = os.path.join(out_dir, f"_stage_{e}")
        feed.filter(F.col("epoch") == e).drop("epoch").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dst = os.path.join(out_dir, f"epoch_{e:03d}.parquet")
        os.replace(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base_t + e, base_t + e))


def _feed_rows(feed_dirs: list[str]) -> int:
    """Total row count of the staged epoch files, read from parquet
    FOOTERS (no Spark job — the r7 empty-guard trick)."""
    import pyarrow.dataset as ds

    total = 0
    for d in feed_dirs:
        for f in sorted(glob.glob(os.path.join(d, "epoch_*.parquet"))):
            total += ds.dataset(f).count_rows()
    return total


def _run_to_memory(
    stream_df: DataFrame,
    base: str,
    tag: str,
    feed_dirs: list[str] | None = None,
) -> DataFrame:
    """Execute a streaming frame to completion under AvailableNow into
    a memory sink; return the sink table (query names are unique per
    invocation via the scratch-dir suffix).

    Shuffle partitions are pinned low for the run: each stateful
    micro-batch pays per-partition state-store open/commit/maintenance
    cost regardless of data volume, so a 32-200-partition session conf
    turns six near-empty batches into minutes of pure store overhead
    (measured 161 s -> tens of seconds).  The pin is also what a real
    deployment does — state partitioning is a capacity decision, not
    an inherited batch-session default — and it is deterministic: the
    fresh per-invocation checkpoint records it, and results are
    partitioning-invariant (values, not order, are gated)."""
    spark = stream_df.sparkSession
    # the gate feeds are built with datediff-on-ts epoch arithmetic and
    # every caller casts the emitted TIMESTAMP back to TIMESTAMP_NTZ
    # for oracle comparability — both are value-preserving ONLY under a
    # UTC session (which sources/batch.load_table pins).  Fail loudly
    # rather than let a non-UTC caller get silently shifted timestamps
    # and an opaque oracle mismatch.
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise RuntimeError(
            f"stream replay requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): epoch slicing and the timestamp_ntz "
            "re-casts are only value-preserving under UTC"
        )
    # PRE-FLIGHT size guard: the memory sink accumulates every output
    # row on the driver DURING the run, so a post-hoc check alone
    # cannot stop an oversized replay from exhausting driver memory
    # inside awaitTermination.  The staged feed's footer row counts
    # (no Spark job) bound the dedup gates' output exactly (output <=
    # input) and catch an SF far past the harness's sizing before any
    # streaming starts; join fan-out is data-dependent, so the
    # post-run output count below stays as the backstop.
    if feed_dirs is not None:
        n_in = _feed_rows(feed_dirs)
        if n_in > MAX_SINK_ROWS:
            raise RuntimeError(
                f"stream replay feed has {n_in} rows, over the "
                f"documented {MAX_SINK_ROWS}-row driver-detach bound — "
                "the harness is being run at an SF it was not sized for"
            )
    qname = f"sr_{tag}_{os.path.basename(base).rsplit('_', 1)[-1]}"
    # The pin is a CAP, never a raise (round-12 advice #4, same shape
    # as plans/corpus_replay.py): min(8, session) keeps PARTCHECK's
    # low-parallelism sweep exercising the stateful batches at ITS
    # partition count instead of silently re-widening to 8, while the
    # driver gate (stock 200) and bench (32) still run the measured 8.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # A non-numeric session value (e.g. "auto" on AQE-managed
    # deployments) is left COMPLETELY untouched — no pin, no restore:
    # pinning 8 there could be a RAISE, contradicting the cap-only
    # contract (round-13 advice #2).
    pinned = str(prev_sp).isdigit()
    if pinned:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(8, int(prev_sp)))
        )
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError(f"stream replay {qname} did not drain in 600s")
    finally:
        if pinned:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    # Detach the result from the memory sink: each invocation registers
    # a uniquely-named sink table whose rows would otherwise stay
    # referenced by the catalog for the session's lifetime (a leak for
    # looping callers).  The detach is a scratch-parquet write +
    # schema-pinned re-read — pure JVM, so it is independent of EVERY
    # Python-side session conf.  (The round-8 driver gate proved the
    # previous toPandas -> createDataFrame round-trip conf-dependent:
    # an outer join null-pads LongType columns, pandas widens them to
    # float64, and with spark.sql.execution.arrow.pyspark.enabled=false
    # — the driver's session, unlike b/session.py — the row-verifier
    # path rejects the floats.  tests/test_replay_guards.py now runs a
    # null-padded detach with Arrow explicitly OFF to pin the fix.)
    out = spark.table(qname)
    # result-size guard: the sink rows are already driver-resident, so
    # the count is cheap — refuse to detach an unexpectedly large
    # result (see MAX_SINK_ROWS) rather than balloon driver memory.
    n = out.count()
    if n > MAX_SINK_ROWS:
        spark.catalog.dropTempView(qname)
        raise RuntimeError(
            f"stream replay {qname} produced {n} rows, over the "
            f"documented {MAX_SINK_ROWS}-row driver-detach bound — "
            "the harness is being run at an SF it was not sized for"
        )
    snap = os.path.join(base, f"snap_{tag}")
    out.write.mode("overwrite").parquet(snap)
    spark.catalog.dropTempView(qname)
    # schema pinned explicitly: an empty result writes no data files
    # (only _SUCCESS) and a bare re-read would fail schema inference
    return spark.read.schema(out.schema).parquet(snap)


@query(
    "events_stream_dedup_replay",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE ts < TIMESTAMP '{HORIZON_END}'
    """,
)
def events_stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch streaming dedup through the REAL
    ``dropDuplicatesWithinWatermark`` (``streaming/runner.py:
    dedup_within_watermark``), replayed over six daily micro-batches.

    The feed injects exact-copy duplicates two ways: rows with
    ``event_id % 5 == 0`` repeat WITHIN their own day's file, and rows
    with ``event_id % 5 == 1`` repeat in the NEXT day's file
    (cross-batch — the case per-batch ``dropDuplicates`` cannot catch
    and the reference's D1-D4 leave for the sink, SURVEY.md §2.7).
    With the margin watermark no state evicts, so the exact expected
    output is the distinct original horizon rows; every cross-batch
    duplicate that leaks through is a value-visible extra row.
    """
    base = _scratch_dir("stream_dedup_replay_")
    ev = _horizon_events(spark, sf_dir).withColumn(
        "epoch", F.datediff(F.col("ts"), F.lit(HORIZON_START).cast("date"))
    )
    feed = ev.unionByName(
        ev.filter(F.col("event_id") % 5 == 0)  # within-batch copies
    ).unionByName(
        ev.filter(
            (F.col("event_id") % 5 == 1) & (F.col("epoch") < N_EPOCHS - 1)
        ).withColumn("epoch", F.col("epoch") + 1)  # next-day copies
    )
    in_dir = os.path.join(base, "feed")
    _write_epoch_files(feed, in_dir)

    from bigdata_covid19_real_time_spark.streaming.runner import (
        dedup_within_watermark,
    )

    stream = (
        spark.readStream.schema(feed.drop("epoch").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    deduped = dedup_within_watermark(
        stream, ["event_id"], event_time_col="ts", watermark=WATERMARK
    )
    return _run_to_memory(deduped, base, "dedup", feed_dirs=[in_dir]).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


@query(
    "events_stream_interval_join_replay",
    oracle=f"""
    SELECT c.user_id,
           c.event_id AS click_id, c.ts AS click_ts,
           c.value AS click_value,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts < TIMESTAMP '{HORIZON_END}'
     AND p.ts < TIMESTAMP '{HORIZON_END}'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
    """,
)
def events_stream_interval_join_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark-bounded stream-stream attribution join through the
    REAL ``interval_join_streams`` (``streaming/joins.py``): the click
    and purchase feeds run as two daily-file streams, and each purchase
    joins the clicks of the same user within the preceding 24 h.

    Cross-midnight pairs — purchase arriving one micro-batch after its
    click — are routine at this window width, so the gate exercises
    the buffered-state path (a within-batch-only join would lose every
    such pair, value-visibly).  With the margin watermark nothing is
    late or evicted, so the exact expected output is the plain SQL
    time-range join over the horizon.
    """
    base = _scratch_dir("stream_ijoin_replay_")
    ev = _horizon_events(spark, sf_dir).withColumn(
        "epoch", F.datediff(F.col("ts"), F.lit(HORIZON_START).cast("date"))
    )
    sides = {}
    for tag, etype, prefix in (
        ("clicks", "click", "click"),
        ("purchases", "purchase", "purchase"),
    ):
        feed = ev.filter(F.col("event_type") == etype).select(
            "user_id",
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").alias(f"{prefix}_ts"),
            F.col("value").alias(f"{prefix}_value"),
            "epoch",
        )
        in_dir = os.path.join(base, tag)
        _write_epoch_files(feed, in_dir)
        sides[tag] = (
            spark.readStream.schema(feed.drop("epoch").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )

    from bigdata_covid19_real_time_spark.streaming.joins import (
        interval_join_streams,
    )

    joined = interval_join_streams(
        sides["clicks"],
        sides["purchases"],
        key="user_id",
        left_time="click_ts",
        right_time="purchase_ts",
        max_delay=ATTRIBUTION_DELAY,
        watermark=WATERMARK,
    )
    return _run_to_memory(
        joined, base, "ijoin", feed_dirs=[os.path.join(base, t) for t in sides]
    ).select(
        "user_id",
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        "click_value",
        "purchase_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "purchase_value",
    )


# ---------------------------------------------------------------------------
# Round-8 gates: the watermark BOUNDARY regimes.  The two gates above
# deliberately run margin-certain (nothing late, nothing evicted); the
# behaviors that regime avoids — late-row drops, end-of-batch state
# eviction + re-admission, and the outer join's null-pad-on-watermark
# path — were pytest-only (tests/test_streaming.py).  The gates below
# put driver-visible DuckDB value oracles on them.
# ---------------------------------------------------------------------------

#: Short watermark for the eviction-regime dedup gate: 12 h over a
#: 6-day horizon, so dedup state from day d is provably evicted before
#: day d+3 and rows older than (previous day's end - 12 h) are late.
WATERMARK_EVICT = "12 hours"

#: Key offset for the synthetic LATE rows (must not collide with real
#: event_ids — those are dense small ints at every SF, pinned by the
#: non-vacuousness test).
LATE_ID_OFFSET = 1_000_000_000

#: Key base for the per-epoch CLOCK rows (distinct from LATE ids).
CLOCK_ID_BASE = 2_000_000_000

#: Far-future event time for the left-outer gate's watermark-pusher
#: sentinels: W_final = SENTINEL_TS - WATERMARK (240 h) = 2024-01-21,
#: safely past every real click's join-window end (= 2024-01-08) and
#: safely short of the sentinels' own windows, so ALL real unmatched
#: clicks flush null-padded and NO sentinel ever emits.
SENTINEL_TS = "2024-01-31 00:00:00"


def _literal_rows(spark: SparkSession, structs: list) -> DataFrame:
    """One-row-per-struct frame built as a pure JVM-literal plan
    (range/explode/array-of-structs) — never
    ``createDataFrame(python_rows)``, whose pickled rows would reship
    with every micro-batch re-evaluation (the pickled-reship trap all
    three planted-row builders in this module share)."""
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
    )


def _clock_rows(spark: SparkSession) -> DataFrame:
    """One synthetic row per epoch with ``ts`` pinned to the NEXT
    midnight — the unique maximum event time of its file, making the
    watermark trajectory EXACT by construction (wm during epoch e =
    day_e - delay) independent of which real rows exist at a given SF
    (including zero-row inputs)."""
    return _literal_rows(
        spark,
        [
            F.struct(
                F.lit(CLOCK_ID_BASE + e).cast("long").alias("event_id"),
                F.lit(f"2024-01-{e + 2:02d} 00:00:00")
                .cast("timestamp")
                .alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit("clock").alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit(e).cast("int").alias("epoch"),
            )
            for e in range(N_EPOCHS)
        ],
    )


#: The clock rows the eviction oracle must also expect (they are fresh
#: keys, never late, so the operator emits them).
_CLOCK_VALUES_SQL = ",\n      ".join(
    f"(CAST({CLOCK_ID_BASE + e} AS BIGINT), "
    f"TIMESTAMP '2024-01-{e + 2:02d} 00:00:00', "
    "CAST(-1 AS BIGINT), 'clock', CAST(0.0 AS DOUBLE))"
    for e in range(N_EPOCHS)
)


@query(
    "events_stream_dedup_evict_replay",
    oracle=f"""
    WITH horizon AS (
      SELECT event_id, ts, user_id, event_type, value
      FROM events WHERE ts < TIMESTAMP '{HORIZON_END}'
    )
    -- every original horizon row is emitted on first sight
    SELECT event_id, ts, user_id, event_type, value FROM horizon
    UNION ALL
    -- RE-ADMISSIONS: the +72 h duplicate of a day-d key (d <= 2)
    -- arrives at epoch d+3, AFTER its dedup state was evicted at the
    -- end of epoch d+2 (expiry ts+12 h < watermark day_{{d+2}}-12 h),
    -- so the operator emits the key a SECOND time — the exact rule
    -- pinned by tests/test_streaming.py's boundary-regime test.  The
    -- +24 h duplicates (state still live) and the stale-ts late rows
    -- (ts < watermark) are correctly absent.
    SELECT event_id, ts + INTERVAL 72 HOUR AS ts, user_id, event_type,
           value
    FROM horizon
    WHERE event_id % 7 = 1 AND ts < TIMESTAMP '2024-01-04'
    UNION ALL
    -- the per-epoch clock rows (fresh keys, never late)
    SELECT * FROM (VALUES
      {_CLOCK_VALUES_SQL}
    ) AS clock(event_id, ts, user_id, event_type, value)
    """,
)
def events_stream_dedup_evict_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` under a SHORT (12 h) watermark
    — the EVICTION regime the margin-certain gate above cannot reach.

    Every epoch file carries a midnight CLOCK row pinning that file's
    max event time, so the whole watermark trajectory is EXACT by
    construction.  Structured Streaming runs stateful operators with
    TWO watermark values per batch (Spark's late-events/eviction split,
    SPARK-40925) — both matter here and both were measured against
    this replay before the oracle was frozen:

    - the LATE-RECORD FILTER uses the PREVIOUS batch's watermark:
      wm_late(epoch e) = maxts(epochs <= e-2) - delay = day_{e-1}-12 h;
    - STATE EVICTION at the end of epoch e uses the current one:
      wm_evict(e) = maxts(epochs <= e-1) - delay = day_e - 12 h.

    Planted cases (each with a provable >= 12 h margin from every
    boundary comparison):

    - ``event_id % 7 == 0`` (day d <= 4): exact-key duplicate with
      ts+24 h lands at epoch d+1 while the key's state is still live
      (eviction needs wm_evict > ts+12 h, first true at the END of
      epoch d+2) -> DROPPED as a duplicate.
    - ``event_id % 7 == 1`` (day d <= 2): duplicate with ts+72 h lands
      at epoch d+3, after eviction -> RE-ADMITTED (emitted twice —
      the value-visible difference from the margin-certain answer the
      round-7 verdict asked this gate to produce).
    - ``event_id % 7 == 2`` (day d <= 2): a FRESH key re-using its
      stale day-d ts lands at epoch d+3, where ts < wm_late
      (= day_d+36 h) -> LATE, silently dropped (an implementation
      without the late filter would emit it).  d+3, not d+2: at
      epoch d+2 the LAGGED late watermark is only day_d+12 h, so
      afternoon rows would pass it — observed empirically before the
      oracle was frozen.

    Non-vacuousness (every case populated at every SF) is pinned by
    ``tests/test_streaming.py::test_evict_replay_gate_is_not_vacuous``.
    """
    base = _scratch_dir("stream_dedup_evict_")
    ev = _horizon_events(spark, sf_dir).withColumn(
        "epoch", F.datediff(F.col("ts"), F.lit(HORIZON_START).cast("date"))
    )
    dup_live = (  # state still live -> dropped
        ev.filter(
            (F.col("event_id") % 7 == 0) & (F.col("epoch") < N_EPOCHS - 1)
        )
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 24 HOURS"))
        .withColumn("epoch", F.col("epoch") + 1)
    )
    dup_evicted = (  # state evicted -> re-admitted
        ev.filter(
            (F.col("event_id") % 7 == 1) & (F.col("epoch") < N_EPOCHS - 3)
        )
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 72 HOURS"))
        .withColumn("epoch", F.col("epoch") + 3)
    )
    late = (  # fresh key, stale ts -> late-dropped
        ev.filter(
            (F.col("event_id") % 7 == 2) & (F.col("epoch") < N_EPOCHS - 3)
        )
        .withColumn("event_id", F.col("event_id") + F.lit(LATE_ID_OFFSET))
        .withColumn("epoch", F.col("epoch") + 3)
    )
    feed = (
        ev.unionByName(dup_live)
        .unionByName(dup_evicted)
        .unionByName(late)
        .unionByName(_clock_rows(spark))
    )
    in_dir = os.path.join(base, "feed")
    _write_epoch_files(feed, in_dir)

    from bigdata_covid19_real_time_spark.streaming.runner import (
        dedup_within_watermark,
    )

    stream = (
        spark.readStream.schema(feed.drop("epoch").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    deduped = dedup_within_watermark(
        stream, ["event_id"], event_time_col="ts", watermark=WATERMARK_EVICT
    )
    return _run_to_memory(
        deduped, base, "dedupev", feed_dirs=[in_dir]
    ).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )



def _outer_join_replay(
    spark: SparkSession, sf_dir: str, how: str, prefix: str, tag: str
) -> DataFrame:
    """Shared harness for the outer interval-join gates: six daily
    epoch files per side plus a SENTINEL epoch (non-matching users
    -1/-2, event time SENTINEL_TS) that advances the final watermark
    to SENTINEL_TS - 240 h = 2024-01-21 — past every real click's
    join-window end and every real purchase's event time, so
    Structured Streaming flushes every unmatched real row null-padded
    before the query drains, while the sentinels' own windows stay
    beyond the final watermark and never emit (value-visibly: a
    sentinel leak would be an oracle mismatch)."""
    base = _scratch_dir(prefix)
    ev = _horizon_events(spark, sf_dir).withColumn(
        "epoch", F.datediff(F.col("ts"), F.lit(HORIZON_START).cast("date"))
    )
    sides = {}
    for side_tag, etype, pfx, sentinel_uid in (
        ("clicks", "click", "click", -1),
        ("purchases", "purchase", "purchase", -2),
    ):
        feed = ev.filter(F.col("event_type") == etype).select(
            "user_id",
            F.col("event_id").alias(f"{pfx}_id"),
            F.col("ts").alias(f"{pfx}_ts"),
            F.col("value").alias(f"{pfx}_value"),
            "epoch",
        )
        sentinel = spark.range(1).select(
            F.lit(sentinel_uid).cast("long").alias("user_id"),
            F.lit(sentinel_uid).cast("long").alias(f"{pfx}_id"),
            F.lit(SENTINEL_TS).cast("timestamp").alias(f"{pfx}_ts"),
            F.lit(0.0).alias(f"{pfx}_value"),
            F.lit(N_EPOCHS).cast("int").alias("epoch"),
        )
        feed = feed.unionByName(sentinel)
        in_dir = os.path.join(base, side_tag)
        _write_epoch_files(feed, in_dir, n_epochs=N_EPOCHS + 1)
        sides[side_tag] = (
            spark.readStream.schema(feed.drop("epoch").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )

    from bigdata_covid19_real_time_spark.streaming.joins import (
        interval_join_streams,
    )

    joined = interval_join_streams(
        sides["clicks"],
        sides["purchases"],
        key="user_id",
        left_time="click_ts",
        right_time="purchase_ts",
        max_delay=ATTRIBUTION_DELAY,
        watermark=WATERMARK,
        how=how,
    )
    return _run_to_memory(
        joined, base, tag, feed_dirs=[os.path.join(base, t) for t in sides]
    ).select(
        "user_id",
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        "click_value",
        "purchase_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "purchase_value",
    )


@query(
    "events_stream_interval_join_left_replay",
    oracle=f"""
    WITH c AS (
      SELECT * FROM events
      WHERE event_type = 'click' AND ts < TIMESTAMP '{HORIZON_END}'
    ), p AS (
      SELECT * FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '{HORIZON_END}'
    )
    SELECT c.user_id,
           c.event_id AS click_id, c.ts AS click_ts,
           c.value AS click_value,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM c LEFT JOIN p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
    """,
)
def events_stream_interval_join_left_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """leftOuter stream-stream interval join: the null-pad-on-watermark
    path (``streaming/joins.py`` ``how='leftOuter'``) gets its driver
    row.  Same daily replay as the inner gate, plus a SEVENTH epoch
    carrying one far-future SENTINEL row per side (non-matching
    user_ids -1/-2): the sentinels advance the global watermark to
    SENTINEL_TS - 240 h = 2024-01-21, past every real click's
    join-window end, so Structured Streaming flushes EVERY unmatched
    real click as a null-padded row before the query drains — making
    the expected output exactly the plain SQL LEFT JOIN.  The
    sentinels themselves never emit (the sentinel click's own window
    end lies beyond the final watermark, and a sentinel purchase never
    matches), which the gate relies on value-visibly: a sentinel leak
    would be an oracle mismatch, and
    ``tests/test_streaming.py::test_left_outer_replay_flushes_unmatched``
    additionally pins that both matched, null-padded, and zero
    sentinel rows are present.
    """
    return _outer_join_replay(
        spark, sf_dir, how="leftOuter", prefix="stream_ljoin_replay_", tag="ljoin"
    )


@query(
    "events_stream_interval_join_full_replay",
    oracle=f"""
    WITH c AS (
      SELECT * FROM events
      WHERE event_type = 'click' AND ts < TIMESTAMP '{HORIZON_END}'
    ), p AS (
      SELECT * FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '{HORIZON_END}'
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           c.event_id AS click_id, c.ts AS click_ts,
           c.value AS click_value,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM c FULL JOIN p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
    """,
)
def events_stream_interval_join_full_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """fullOuter stream-stream interval join: BOTH null-pad paths in
    one driver row (the leftOuter gate above flushes unmatched clicks;
    this adds the RIGHT side — purchases no click preceded within
    24 h).  Same daily replay + sentinel-epoch mechanics as the
    leftOuter gate: the final watermark (SENTINEL_TS - 240 h =
    2024-01-21) passes every real click's join-window end AND every
    real purchase's event time, so Structured Streaming flushes every
    unmatched row on either side — a right-side row is safe to
    null-pad once its event time drops below the watermark, because
    any future click old enough to match it would be filtered as late.
    Expected output is therefore exactly the plain SQL FULL OUTER
    JOIN; the sentinels (non-matching users -1/-2, event times at or
    beyond the final watermark) never emit, value-visibly.
    rightOuter shares this right-side path's implementation and gets
    its own direct gate below (``events_stream_interval_join_right_replay``).
    """
    return _outer_join_replay(
        spark, sf_dir, how="fullOuter", prefix="stream_fjoin_replay_", tag="fjoin"
    )


#: Synthetic cross-midnight BRIDGE sessions for the streaming
#: sessionization gate: the driver corpus's natural per-user event
#: density leaves ZERO midnight-spanning sessions at sf0.001/sf0.01
#: (the vacuous-gate trap), so one two-row session is planted across
#: each of the five day boundaries — rows 10 minutes either side of
#: midnight, 20-minute gap < the 30-minute session gap, landing in
#: CONSECUTIVE epoch files.  A within-batch-only sessionizer would
#: emit each as two one-event sessions, value-visibly.  Synthetic
#: user ids are negative (distinct from the -1 sentinel) and the rows
#: are literal, so the oracle reproduces them with a VALUES union and
#: the gate stays exact on any SF including zero-row input.
BRIDGE_USER_BASE = -100

#: (user_id, ts, value, epoch): for each day boundary d|d+1, one row
#: at 23:50 of day d (epoch d) and one at 00:10 of day d+1 (epoch
#: d+1) — a 20-minute gap, one merged session.
_BRIDGE_ROWS = [
    row
    for d in range(N_EPOCHS - 1)
    for row in (
        (BRIDGE_USER_BASE - d, f"2024-01-{d + 1:02d} 23:50:00", 1.0, d),
        (BRIDGE_USER_BASE - d, f"2024-01-{d + 2:02d} 00:10:00", 2.0, d + 1),
    )
]

_BRIDGE_VALUES_SQL = ",\n      ".join(
    f"(CAST({u} AS BIGINT), TIMESTAMP '{ts}', CAST({v} AS DOUBLE))"
    for (u, ts, v, _e) in _BRIDGE_ROWS
)


def _bridge_rows(spark: SparkSession) -> DataFrame:
    """JVM-literal plan of the planted bridge rows (see
    ``_literal_rows`` for the pickled-reship rationale)."""
    return _literal_rows(
        spark,
        [
            F.struct(
                F.lit(u).cast("long").alias("user_id"),
                F.lit(ts).cast("timestamp").alias("ts"),
                F.lit(v).alias("value"),
                F.lit(e).cast("int").alias("epoch"),
            )
            for (u, ts, v, e) in _BRIDGE_ROWS
        ],
    )


@query(
    "events_stream_sessions_replay",
    oracle=f"""
    WITH horizon AS (
      SELECT user_id, ts, value FROM events
      WHERE ts < TIMESTAMP '{HORIZON_END}'
      UNION ALL
      SELECT * FROM (VALUES
      {_BRIDGE_VALUES_SQL}
      ) AS bridge(user_id, ts, value)
    ),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes' OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM horizon
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S')
             AS session_end,
           CAST(COUNT(*) AS BIGINT) AS events_count,
           ROUND(SUM(value) + 1e-9, 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def events_stream_sessions_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING sessionization through the real merging
    ``session_window`` state store, replayed over six daily
    micro-batches — the streaming twin of the driver-certified batch
    ``user_sessions`` (same 30-minute gap, same output shape, same
    gaps-and-islands oracle idiom restricted to the replay horizon).

    What only this gate certifies: session state MERGES ACROSS
    micro-batches (the planted bridge sessions span midnight with rows
    in consecutive epoch files — a within-batch-only sessionizer would
    split each into two one-event rows), and append-mode emission
    waits for the watermark to pass each session's end.  The sentinel
    epoch (user -1, far-future ts) advances the final watermark to
    SENTINEL_TS - 240 h = 2024-01-21, past every real session's end,
    so every real and planted session closes and emits exactly once;
    the sentinel's own session end lies beyond the final watermark and
    never emits (value-visibly — a leak is an oracle mismatch).
    Margin watermark: nothing in the replay is ever late.
    """
    base = _scratch_dir("stream_sessions_replay_")
    ev = (
        _horizon_events(spark, sf_dir)
        .select("user_id", "ts", "value")
        .withColumn(
            "epoch",
            F.datediff(F.col("ts"), F.lit(HORIZON_START).cast("date")),
        )
    )
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(SENTINEL_TS).cast("timestamp").alias("ts"),
        F.lit(0.0).alias("value"),
        F.lit(N_EPOCHS).cast("int").alias("epoch"),
    )
    feed = ev.unionByName(_bridge_rows(spark)).unionByName(sentinel)
    in_dir = os.path.join(base, "feed")
    _write_epoch_files(feed, in_dir, n_epochs=N_EPOCHS + 1)

    stream = (
        spark.readStream.schema(feed.drop("epoch").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    from bigdata_covid19_real_time_spark.plans.registry import stable_round

    sessions = (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("events_count"),
            stable_round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "events_count",
            "session_value",
        )
    )
    return _run_to_memory(sessions, base, "sess", feed_dirs=[in_dir])


# ---------------------------------------------------------------------------
# Round-9 gate: rightOuter, registered at END of module (append-only
# registration order).  The round-8 verdict accepted fullOuter's right
# side as rightOuter's mirror "but it only counts once the fullOuter
# gate itself is green" — one more `_outer_join_replay` call makes the
# mirror-image argument unnecessary entirely.
# ---------------------------------------------------------------------------


@query(
    "events_stream_interval_join_right_replay",
    oracle=f"""
    WITH c AS (
      SELECT * FROM events
      WHERE event_type = 'click' AND ts < TIMESTAMP '{HORIZON_END}'
    ), p AS (
      SELECT * FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '{HORIZON_END}'
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           c.event_id AS click_id, c.ts AS click_ts,
           c.value AS click_value,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM c RIGHT JOIN p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
    """,
)
def events_stream_interval_join_right_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """rightOuter stream-stream interval join — the direct driver row
    the round-8 verdict asked for instead of the fullOuter
    mirror-image argument.  Identical replay + sentinel mechanics to
    the fullOuter gate: a purchase is safe to null-pad once the
    watermark passes its event time (any click old enough to match it
    would be filtered as late), and the sentinel epoch pushes the final
    watermark to 2024-01-21 — past every real purchase — so EVERY
    unmatched real purchase flushes before the query drains.  Expected
    output is exactly the plain SQL RIGHT JOIN; unmatched clicks never
    emit under rightOuter, and the sentinels (non-matching users -1/-2)
    never emit on either side, value-visibly.
    """
    return _outer_join_replay(
        spark, sf_dir, how="rightOuter", prefix="stream_rjoin_replay_", tag="rjoin"
    )


@query(
    "events_stream_static_join_replay",
    oracle=f"""
    SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
           c.c_mktsegment AS segment, n.n_name AS nation
    FROM events e
    LEFT JOIN customer c
      ON c.c_custkey = e.user_id AND c.c_custkey % 3 <> 0
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE e.ts < TIMESTAMP '{HORIZON_END}'
    """,
)
def events_stream_static_join_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-STATIC dimension join (``streaming/joins.py:
    enrich_stream_with_dim``) — the one streaming-join class the
    replay harness did not yet gate (the five join/dedup/session gates
    above all exercise stream-STREAM state).  The daily event feed is
    left-outer enriched per micro-batch with a static customer→nation
    dimension; stream-static joins are STATELESS (no watermark, no
    buffered state — the static side is complete), so the expected
    output is exactly the plain SQL LEFT JOIN over the horizon.

    Non-vacuousness is built in: the dim drops every third customer
    (``c_custkey % 3 == 0``), so events of those users emit
    null-padded (string columns — and the detach is the pure-JVM
    scratch-parquet re-read, so null-padding any type is
    conf-independent) while the rest pick up segment + nation; both
    populations exist at every gate SF (user_ids are dense small
    ints) and ``tests/test_streaming.py`` pins that both are present.

    Scale: the dim rides a broadcast hint — the 100 TB side never
    shuffles to meet a MB-scale dimension; per-batch cost is one
    broadcast-hash-join stage with no state-store open/commit at all.
    """
    base = _scratch_dir("stream_sjoin_replay_")
    ev = _horizon_events(spark, sf_dir).withColumn(
        "epoch", F.datediff(F.col("ts"), F.lit(HORIZON_START).cast("date"))
    )
    in_dir = os.path.join(base, "feed")
    _write_epoch_files(ev, in_dir)

    # cache the dim for the run: Structured Streaming re-evaluates the
    # un-cached static side of a stream-static join EVERY trigger, so
    # without this the customer-nation join would re-run once per
    # micro-batch (6x per invocation) — the same one-materialization
    # discipline a real deployment applies to its dimension snapshot
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 != 0)
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
        )
        .cache()
    )

    from bigdata_covid19_real_time_spark.streaming.joins import (
        enrich_stream_with_dim,
    )

    stream = (
        spark.readStream.schema(ev.drop("epoch").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    enriched = enrich_stream_with_dim(stream, dim, key="user_id")
    try:
        out = _run_to_memory(enriched, base, "sjoin", feed_dirs=[in_dir])
    finally:
        dim.unpersist()
    return out.select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "segment",
        "nation",
    )


#: Id offset for the planted CONTAMINATED COPIES in the streaming
#: decontamination gate (blocklist texts under fresh doc_ids — an
#: id-based filter would keep them, a content-fingerprint filter drops
#: them, value-visibly).  Far above any real doc_id at every SF.
COPY_ID_OFFSET = 10_000_000

#: Id base + deterministic texts for the planted NOVEL probe docs (one
#: per epoch) that must SURVIVE decontamination — proving the operator
#: passes clean rows through rather than dropping everything synthetic.
NOVEL_ID_BASE = 20_000_000
_NOVEL_TEXTS = [
    f"novel probe document {e} zq{e}vx" for e in range(N_EPOCHS)
]

_NOVEL_VALUES_SQL = ",\n      ".join(
    f"(CAST({NOVEL_ID_BASE + e} AS BIGINT), '{t}', 'en', 'probe', "
    f"CAST({len(t)} AS BIGINT))"
    for e, t in enumerate(_NOVEL_TEXTS)
)


@query(
    "docs_stream_decontam_replay",
    oracle=f"""
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents b
      WHERE b.doc_id % 10 = 3 AND md5(b.text) = md5(d.text)
    )
    UNION ALL
    SELECT * FROM (VALUES
      {_NOVEL_VALUES_SQL}
    ) AS probe(doc_id, text, lang, source, n_chars)
    """,
)
def docs_stream_decontam_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING benchmark decontamination: a live document feed is
    left-anti joined per micro-batch against a broadcast blocklist of
    content fingerprints (``streaming/joins.py:enrich_stream_with_dim``
    ``how='leftAnti'`` — the stream-preserving anti variant, whose
    end-to-end streaming path had no driver row; the batch twin is
    ``operators/decontam.py``'s broadcast semi-join report).

    The feed is the documents table in six doc_id-mod epochs, PLUS two
    planted populations that make the CONTENT semantics value-visible:
    (a) contaminated COPIES — every blocklist text re-enters under a
    fresh doc_id (+{COPY_ID_OFFSET}); an id-based filter would pass
    them, the fingerprint filter must drop them; (b) NOVEL probe docs
    (one per epoch, literal texts) that must survive.  The blocklist is
    the md5 of every doc with ``doc_id % 10 == 3`` — so expected output
    is exactly the batch NOT EXISTS over the original table plus the
    novel probes, which the DuckDB oracle states directly (NOT EXISTS,
    not NOT IN, so a NULL text could never flip row membership — the
    same kept-on-null behavior as Spark's left_anti).

    Stateless like the stream-static join gate: no watermark, no state
    store; per-batch cost is one broadcast-hash anti-join stage.  At
    100 TB the blocklist (benchmark shingle/fingerprint sets are
    MB-scale) broadcasts and the corpus never shuffles.
    """
    base = _scratch_dir("stream_decontam_replay_")
    # id-band guard (footer-only, no Spark job — same trick as
    # _feed_rows): the copy/novel classification is an id-band
    # arithmetic on doc_id, so a corpus whose real ids reach
    # COPY_ID_OFFSET would silently corrupt the oracle's semantics
    # (a real doc misread as a planted copy) rather than fail.  Both
    # bands reduce to one bound: max real id < COPY_ID_OFFSET also
    # keeps every copy id (max real + COPY_ID_OFFSET) under
    # NOVEL_ID_BASE, because NOVEL_ID_BASE = 2 * COPY_ID_OFFSET.
    import pyarrow.parquet as pq_meta

    meta = pq_meta.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata
    doc_idx = meta.schema.to_arrow_schema().get_field_index("doc_id")
    maxes = [
        stats.max
        for g in range(meta.num_row_groups)
        for stats in [meta.row_group(g).column(doc_idx).statistics]
        if stats is not None and stats.has_min_max
    ]
    if meta.num_rows > 0 and len(maxes) < meta.num_row_groups:
        # ANY row group without doc_id stats defeats the footer bound
        # (the stats-bearing groups alone could underestimate the true
        # max if the stats-less group holds it), so fall back to one
        # single-column distributed max instead of guessing (still
        # trivial at gate SFs; a zero-row corpus passes vacuously — no
        # band to collide).
        maxes = [
            load_table(spark, sf_dir, "documents")
            .agg(F.max("doc_id"))
            .first()[0]
        ]
    # An all-NULL doc_id column yields max(doc_id) = NULL (and a
    # footer can carry null stats too): no non-null id exists, so no
    # band collision is possible — drop the Nones before comparing.
    maxes = [m for m in maxes if m is not None]
    if maxes and max(maxes) >= COPY_ID_OFFSET:
        raise RuntimeError(
            f"documents.doc_id max {max(maxes)} reaches the "
            f"planted-copy id band (COPY_ID_OFFSET = {COPY_ID_OFFSET}) "
            "— the gate's copy/novel id arithmetic is not sized for "
            "this corpus"
        )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    real = docs.withColumn(
        "epoch", (F.col("doc_id") % N_EPOCHS).cast("int")
    )
    # NULL-text blocklist docs (admissible in the schema) are excluded
    # from the planting: their copy's fingerprint would be NULL, which
    # left_anti KEEPS — the copy would emit while the oracle expects
    # only original rows + probes.  The ORIGINAL null-text rows stay
    # consistent on both engines without the filter (left_anti keeps
    # them; NOT EXISTS's md5(b.text) = md5(d.text) is never true
    # against NULL, so the oracle keeps them too).
    copies = (
        docs.filter((F.col("doc_id") % 10 == 3) & F.col("text").isNotNull())
        .withColumn("doc_id", F.col("doc_id") + F.lit(COPY_ID_OFFSET))
        .withColumn("epoch", ((F.col("doc_id") + 1) % N_EPOCHS).cast("int"))
    )
    novel = _literal_rows(
        spark,
        [
            F.struct(
                F.lit(NOVEL_ID_BASE + e).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("probe").alias("source"),
                F.lit(len(t)).cast("long").alias("n_chars"),
                F.lit(e).cast("int").alias("epoch"),
            )
            for e, t in enumerate(_NOVEL_TEXTS)
        ],
    )
    feed = real.unionByName(copies).unionByName(novel)
    in_dir = os.path.join(base, "feed")
    _write_epoch_files(feed, in_dir)

    # cached for the run: the un-cached static side would re-run the
    # md5 scan + distinct shuffle once per micro-batch (see the
    # stream-static gate above for the discipline)
    blocklist = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .select(F.md5(F.col("text")).alias("fp"))
        .distinct()
        .cache()
    )

    from bigdata_covid19_real_time_spark.streaming.joins import (
        enrich_stream_with_dim,
    )

    stream = (
        spark.readStream.schema(feed.drop("epoch").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .withColumn("fp", F.md5(F.col("text")))
    )
    clean = enrich_stream_with_dim(
        stream, blocklist, key="fp", how="leftAnti"
    )
    try:
        out = _run_to_memory(clean, base, "decontam", feed_dirs=[in_dir])
    finally:
        blocklist.unpersist()
    return out.select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
