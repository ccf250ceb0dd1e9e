"""Property-based tests for the round-3 operators: the invariants hold
over GENERATED inputs, not just the hand-picked goldens.

- bloom_semi_join: exactness (== plain semi-join) for any key sets and
  any (m, n_hashes); probe-only never false-negatives.
- sq8_topk with corpus-covering rerank: equals exact cosine top-k for
  any vector corpus (quantization can reorder candidates, never the
  final rerank).
- daily_gapfill: grid is exactly [first, last] per key, zero-fill sums
  preserve the per-key total, forward-fill equals the last observation
  at or before each day.

Spark job per example is ~0.5 s, so example counts stay small; the
strategies bias toward the corners (collisions, duplicates, empty
overlap, single-element keys).
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_covid19_real_time_spark.operators.bloom import bloom_semi_join
from bigdata_covid19_real_time_spark.operators.quantization import sq8_topk
from bigdata_covid19_real_time_spark.operators.similarity import cosine_topk
from bigdata_covid19_real_time_spark.operators.timeseries import daily_gapfill

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=list(HealthCheck))

keysets = st.tuples(
    st.sets(st.integers(0, 200), min_size=0, max_size=60),
    st.sets(st.integers(0, 200), min_size=0, max_size=30),
)


@settings(**_SETTINGS)
@given(ks=keysets, m=st.sampled_from([8, 64, 1 << 20]),
       n_hashes=st.sampled_from([1, 2, 3]))
def test_bloom_semi_join_always_exact(spark, ks, m, n_hashes):
    fact_keys, dim_keys = ks
    fact = spark.createDataFrame([(k,) for k in fact_keys] or [(None,)], "fk INT")
    dim = spark.createDataFrame([(k,) for k in dim_keys] or [(None,)], "dk INT")
    got = {r.fk for r in bloom_semi_join(fact, dim, "fk", "dk",
                                         m=m, n_hashes=n_hashes).collect()}
    assert got == (fact_keys & dim_keys)
    # probe-only: superset of the true matches
    probed = {r.fk for r in bloom_semi_join(fact, dim, "fk", "dk", m=m,
                                            n_hashes=n_hashes, exact=False).collect()}
    assert (fact_keys & dim_keys) <= probed


vectors = st.lists(
    st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=4),
    min_size=6, max_size=20,
)


@settings(**_SETTINGS)
@given(vs=vectors)
def test_sq8_full_rerank_equals_exact(spark, vs):
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    queries = corpus.limit(2)
    got = sq8_topk(corpus, queries, k=3, rerank_factor=len(vs) + 1).collect()
    want = cosine_topk(corpus, queries, k=3).collect()
    key = lambda r: (r.query_id, r.rank)
    assert [(r.query_id, r.neighbor_id) for r in sorted(got, key=key)] == [
        (r.query_id, r.neighbor_id) for r in sorted(want, key=key)
    ]
    assert all(
        math.isclose(a.cosine, b.cosine, abs_tol=1e-9)
        for a, b in zip(sorted(got, key=key), sorted(want, key=key))
    )


series = st.lists(
    st.tuples(st.integers(0, 2),                       # key
              st.integers(0, 12),                      # day offset
              st.floats(-100, 100, allow_nan=False)),  # value
    min_size=1, max_size=25,
)


@settings(**_SETTINGS)
@given(rows=series)
def test_gapfill_grid_and_fill_invariants(spark, rows):
    base = dt.date(2024, 3, 1)
    df = spark.createDataFrame(
        [(str(k), f"{base + dt.timedelta(days=d)} 12:00:00", v) for k, d, v in rows],
        "k STRING, ts STRING, v DOUBLE",
    )
    out = daily_gapfill(df, "k", "ts", "v").collect()
    per_key: dict[str, list] = {}
    for r in out:
        per_key.setdefault(r.k, []).append(r)
    truth: dict[str, dict[dt.date, float]] = {}
    for k, d, v in rows:
        truth.setdefault(str(k), {}).setdefault(base + dt.timedelta(days=d), 0.0)
        truth[str(k)][base + dt.timedelta(days=d)] += v
    for k, rs in per_key.items():
        days = sorted(r.event_date for r in rs)
        # gapless [first, last] grid, each day once
        assert days == [days[0] + dt.timedelta(days=i) for i in range(len(days))]
        assert days[0] == min(truth[k]) and days[-1] == max(truth[k])
        # zero-fill preserves the key's total
        assert math.isclose(sum(r.value_zero for r in rs),
                            sum(truth[k].values()), abs_tol=1e-6)
        # forward-fill == last observation at or before the day
        for r in rs:
            obs_days = [d for d in truth[k] if d <= r.event_date]
            assert obs_days, "grid starts at first observation"
            assert math.isclose(r.value_ffill, truth[k][max(obs_days)], abs_tol=1e-6)
