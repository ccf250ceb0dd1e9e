"""State-store replay certification queries (plans/state_replay.py).

The core claim these tests pin: replaying epochs through the REAL
``applyInPandasWithState`` update closures with the ``_ReplayState``
shim computes exactly what a streaming run computes over the same
micro-batch sequence — so the driver-gated batch queries genuinely
certify the streaming operators' cross-batch semantics.
"""

from __future__ import annotations

import json
import math
import os

import pandas as pd
import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from bigdata_covid19_real_time_spark.plans.state_replay import (
    DRIFT_H,
    DRIFT_K,
    MG_CAPACITY,
    _mg_replay_kernel,
    _ReplayState,
    _replay_epochs,
)
from bigdata_covid19_real_time_spark.streaming.stateful import (
    _sessionize_update,
    streaming_sessionize,
)

T0 = 1_700_000_000.0
GAP_SEC = 60.0

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("ts", DoubleType()),
        StructField("value", DoubleType()),
    ]
)

#: (user, ts-offset-sec, value) in three "epochs" — sessions span the
#: epoch boundaries, so chaining through state is exercised, and a
#: final gap closes the last-but-one session while one stays open.
ROWS = [
    [("u1", 0.0, 1.0), ("u1", 10.0, 2.0), ("u2", 5.0, 1.0)],
    [("u1", 40.0, 3.0), ("u2", 300.0, 4.0), ("u2", 310.0, 1.0)],
    [("u1", 500.0, 9.0), ("u1", 520.0, 1.0), ("u2", 900.0, 2.0)],
]


def _streaming_closed_sessions(spark, tmp_path):
    for i, rows in enumerate(ROWS):
        p = tmp_path / "in" / f"b{i}.jsonl"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(
            "\n".join(
                json.dumps({"user_id": u, "ts": T0 + dt, "value": v})
                for u, dt, v in rows
            )
        )
        os.utime(p, (T0 + i, T0 + i))
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    emitted: list = []
    q = (
        streaming_sessionize(stream, gap_sec=GAP_SEC)
        .writeStream.foreachBatch(lambda df, eid: emitted.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(
        (
            r["key"],
            r["session_seq"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in emitted
    )


def _replay_closed_sessions():
    out = []
    for key in ("u1", "u2"):
        rows = [
            (T0 + dt, v)
            for i, batch in enumerate(ROWS)
            for (u, dt, v) in batch
            if u == key
        ]
        epochs = [
            i for i, batch in enumerate(ROWS) for (u, dt, v) in batch if u == key
        ]
        pdf = pd.DataFrame(
            {
                "key": key,
                "ts": [t for t, _ in rows],
                "value": [v for _, v in rows],
                "epoch": epochs,
            }
        )
        frames = _replay_epochs(pdf, (key,), _sessionize_update(GAP_SEC))
        for f in frames:
            for r in f.itertuples(index=False):
                out.append(
                    (
                        r.key,
                        r.session_seq,
                        r.session_start,
                        r.session_end,
                        r.n_events,
                        r.sum_value,
                    )
                )
    return sorted(out)


def test_replay_equals_streaming_run(spark, tmp_path):
    """The headline equivalence: epoch replay through the shim emits
    exactly the closed sessions the real streaming run emits over the
    same micro-batch sequence."""
    streaming = _streaming_closed_sessions(spark, tmp_path)
    replay = _replay_closed_sessions()
    assert streaming == replay
    # non-trivial: sessions chained across batch boundaries closed
    assert len(streaming) >= 3


def test_mg_replay_contract_under_purging():
    """MG summary from a skewed replay: genuinely purges (tracked <=
    capacity << distinct), never overcounts, honors the undercount
    bound, and keeps every true-heavy item."""
    import numpy as np

    rng = np.random.RandomState(7)
    # 1 hot item (~N/5) + singleton cold tail, shuffled deterministically
    n_cold = 2000
    items = np.concatenate([np.full(500, 7), np.arange(100, 100 + n_cold)])
    rng.shuffle(items)
    pdf = pd.DataFrame(
        {
            "shard": 0,
            "item": items.astype("int64"),
            "ts_us": np.arange(len(items), dtype="int64"),
            "epoch": (np.arange(len(items)) // 500).astype("int64"),
        }
    )
    out = _mg_replay_kernel(pdf)
    true_counts = pd.Series(items).value_counts()
    processed = len(items)
    bound = processed // (MG_CAPACITY + 1)
    assert (out["processed"] == processed).all()
    assert len(out) <= MG_CAPACITY < true_counts.size  # purging regime
    for r in out.itertuples(index=False):
        assert r.est_count <= true_counts[r.item]
        assert true_counts[r.item] - r.est_count <= bound
    heavy = true_counts[true_counts > bound].index
    assert set(heavy) <= set(out["item"])  # guaranteed presence
    assert len(heavy) >= 1  # non-vacuous: the hot item clears the bound


def test_drift_replay_matches_independent_recursion():
    """Drift replay vs a from-scratch NumPy recomputation of the
    Welford baseline, z-standardization, and two-sided Page CUSUM."""
    import numpy as np

    from bigdata_covid19_real_time_spark.plans.state_replay import (
        _drift_replay_kernel,
    )

    rng = np.random.RandomState(3)
    values = rng.normal(50.0, 5.0, 120)
    values[60:] += 25.0  # level shift halfway -> drift must flip
    epochs = np.arange(120) // 10
    pdf = pd.DataFrame(
        {
            "key": "k",
            "value": values,
            "d": [f"2024-01-{e + 1:02d}" for e in epochs],
            "epoch": epochs.astype("int64"),
        }
    )
    out = _drift_replay_kernel(pdf).set_index("d")

    n = 0
    mean = 0.0
    m2 = 0.0
    s_pos = s_neg = 0.0
    for e in range(12):
        batch = np.sort(values[epochs == e])
        base_n, base_mean = n, mean
        base_sd = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
        for v in batch:
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        bm = float(batch.mean())
        z = (
            (bm - base_mean) / (base_sd / math.sqrt(len(batch)))
            if base_n > 1 and base_sd > 0
            else 0.0
        )
        s_pos = max(0.0, s_pos + z - DRIFT_K)
        s_neg = max(0.0, s_neg - z - DRIFT_K)
        row = out.loc[f"2024-01-{e + 1:02d}"]
        assert row["n_total"] == n
        assert abs(row["mean"] - mean) < 1e-9
        assert abs(row["z"] - z) < 1e-9
        assert abs(row["cusum_pos"] - s_pos) < 1e-9
        assert abs(row["cusum_neg"] - s_neg) < 1e-9
        assert bool(row["drift"]) == (s_pos > DRIFT_H or s_neg > DRIFT_H)
    assert bool(out["drift"].iloc[-1])  # the level shift was caught


def test_replay_state_shim_contract():
    s = _ReplayState()
    assert not s.exists
    s.update((1, 2.0))
    assert s.exists and s.get == (1, 2.0)


@pytest.mark.parametrize("sp", [2, 16])
def test_sessionize_replay_partition_invariant(spark, sp):
    """The registered query's output is identical across shuffle
    partition counts (the explicit repartition spreads Python work but
    must not change results)."""
    from bigdata_covid19_real_time_spark.plans import QUERIES

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    try:
        df = QUERIES["events_sessionize_replay"](
            spark, "/root/testdata/sf0.001"
        )
        rows = sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    if not hasattr(test_sessionize_replay_partition_invariant, "_snap"):
        test_sessionize_replay_partition_invariant._snap = rows
    else:
        assert rows == test_sessionize_replay_partition_invariant._snap


def test_ewma_replay_matches_independent_recursion():
    """EWMA state replay vs a from-scratch fold of the recurrence
    ``ewma = a*x + (1-a)*ewma_prev`` over the globally sorted rows."""
    import numpy as np

    from bigdata_covid19_real_time_spark.plans.state_replay import (
        EWMA_ALPHA,
        _ewma_replay_kernel,
    )

    rng = np.random.RandomState(11)
    n = 90
    vals = rng.uniform(0, 100, n)
    order = rng.permutation(n)  # arrival order != time order
    epochs = np.sort(rng.randint(0, 6, n))
    pdf = pd.DataFrame(
        {
            "location": "k",
            "uuid": order.astype("int64"),
            "timestamp": (epochs * 1000 + order).astype("int64"),
            "new_cases": vals,
            "total_cases": vals * 2.0,
            "d": [f"2024-02-{e + 1:02d}" for e in epochs],
            "epoch": epochs.astype("int64"),
        }
    )
    out = _ewma_replay_kernel(pdf).set_index("d")

    ewma = None
    rows = total = 0
    mx = 0.0
    for e in range(6):
        mask = epochs == e
        sub = pdf[mask].sort_values(["timestamp", "uuid"])
        for nc, tc in zip(sub["new_cases"], sub["total_cases"]):
            rows += 1
            total += nc
            mx = max(mx, tc)
            ewma = nc if ewma is None else EWMA_ALPHA * nc + (1 - EWMA_ALPHA) * ewma
        row = out.loc[f"2024-02-{e + 1:02d}"]
        assert row["rows_seen"] == rows
        assert abs(row["total_new_cases"] - total) < 1e-9
        assert abs(row["max_total_cases"] - mx) < 1e-9
        assert abs(row["ewma_new_cases"] - ewma) < 1e-12
        assert row["predicted_new_cases"] == row["ewma_new_cases"]


# ---------------------------------------------------------------------------
# Property tests: replay kernels vs from-scratch references on random
# streams (pure pandas — no Spark jobs, so examples are cheap)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3_000),  # ts (seconds)
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, width=32
        ),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(ev=_events, gap=st.integers(min_value=1, max_value=500), n_epochs=st.integers(min_value=1, max_value=5))
def test_sessionize_replay_property(ev, gap, n_epochs):
    """For ANY event stream, gap, and epoch split: the epoch replay
    through the real closure emits exactly the gaps-and-islands
    sessions minus the final (open) one, with order-independent
    aggregates — the oracle's construction, proven generatively."""
    ts = sorted(t for t, _ in ev)
    vals = dict()
    rows = sorted(ev)
    pdf = pd.DataFrame(
        {
            "key": "k",
            "ts": [float(t) for t, _ in rows],
            "value": [v for _, v in rows],
            "epoch": [min(int(t * n_epochs / 3_001), n_epochs - 1) for t, _ in rows],
        }
    )
    frames = _replay_epochs(pdf, ("k",), _sessionize_update(float(gap)))
    got = sorted(
        (int(r.session_seq), r.session_start, r.session_end, int(r.n_events), round(r.sum_value, 6))
        for f in frames
        for r in f.itertuples(index=False)
    )
    # reference: gaps-and-islands over the time-sorted stream
    islands = []
    cur = None
    for t, v in sorted(rows):
        if cur is None:
            cur = [t, t, 1, v]
        elif t - cur[1] > gap:
            islands.append(cur)
            cur = [t, t, 1, v]
        else:
            cur[1] = t
            cur[2] += 1
            cur[3] += v
    want = sorted(
        (i, float(s), float(e), n, round(sv, 6))
        for i, (s, e, n, sv) in enumerate(islands)  # open session excluded
    )
    assert got == want


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    items=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    cap=st.integers(min_value=2, max_value=8),
    n_epochs=st.integers(min_value=1, max_value=4),
)
def test_mg_replay_property(items, cap, n_epochs):
    """For ANY item stream, capacity, and epoch split: the replayed MG
    summary never overcounts, undercounts by at most
    processed // (cap+1), and keeps every item above that bound."""
    import numpy as np

    from bigdata_covid19_real_time_spark.streaming.stateful import _mg_update

    pdf = pd.DataFrame(
        {
            "item": np.asarray(items, dtype="int64"),
            "epoch": (np.arange(len(items)) * n_epochs // len(items)).astype(
                "int64"
            ),
        }
    )
    frames = _replay_epochs(pdf, (0,), _mg_update(cap))
    final = frames[-1]
    true = pd.Series(items).value_counts()
    bound = len(items) // (cap + 1)
    assert (final["processed_in_shard"] == len(items)).all()
    assert len(final) <= cap
    for r in final.itertuples(index=False):
        assert r.est_count <= true[r.item]
        assert true[r.item] - r.est_count <= bound
    heavy = set(true[true > bound].index)
    assert heavy <= set(final["item"])
