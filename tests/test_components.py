"""Connected-components / cluster-resolution operator tests."""

from __future__ import annotations

import pytest

from bigdata_covid19_real_time_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _cc_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_chain_and_isolated_pair(spark):
    # chain 1-2-3 plus pair 10-11: transitivity must merge the chain.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    got = _cc_map(connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges_via_pointer_jumping(spark):
    # A 64-node path has diameter 63; plain min-propagation needs ~63
    # rounds, pointer jumping needs ~log2(64)+1. max_iter=10 only
    # passes if the shortcut step works.
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    got = _cc_map(connected_components(pairs, max_iter=10))
    assert got == {i: 0 for i in range(n)}


def test_edge_order_and_direction_invariance(spark):
    fwd = spark.createDataFrame([(5, 9), (9, 7), (2, 1)], ["doc_a", "doc_b"])
    rev = spark.createDataFrame([(1, 2), (7, 9), (9, 5)], ["doc_a", "doc_b"])
    assert _cc_map(connected_components(fwd)) == _cc_map(connected_components(rev))


def test_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        # one round cannot close a 41-node path (distributed path forced:
        # the union-find fast path has no iteration count to exhaust)
        connected_components(pairs, max_iter=1, local_threshold=0)


def test_local_and_distributed_paths_identical(spark):
    """The union-find fast path (edge count under LOCAL_CC_MAX_EDGES)
    must label identically to the pointer-jumping loop: chain + cycle +
    isolated pair + singleton-heavy shapes."""
    edges = (
        [(i, i + 1) for i in range(15)]          # 16-node path
        + [(100, 101), (101, 102), (102, 100)]   # cycle
        + [(200, 201)]                           # isolated pair
        + [(300, 300)]                           # self-loop
    )
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    local = _cc_map(connected_components(pairs))
    dist = _cc_map(connected_components(pairs, local_threshold=0))
    assert local == dist
    assert local[15] == 0 and local[102] == 100 and local[300] == 300


def test_dedup_clusters_survivor_flags(spark):
    pairs = spark.createDataFrame(
        [(3, 1), (1, 2), (8, 9)], ["doc_a", "doc_b"]
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[1]["is_canonical"]
    assert rows[2]["cluster_id"] == 1 and not rows[2]["is_canonical"]
    assert rows[3]["cluster_size"] == 3
    assert rows[8]["cluster_id"] == 8 and rows[8]["is_canonical"]
    assert rows[9]["cluster_size"] == 2
    # exactly one canonical per cluster
    canon = [r for r in rows.values() if r["is_canonical"]]
    assert sorted(c["cluster_id"] for c in canon) == [1, 8]


class TestPageRank:
    def test_uniform_cycle_stays_uniform(self, spark):
        from bigdata_covid19_real_time_spark.operators.pagerank import pagerank

        # 3-cycle: symmetric, no dangling -> ranks stay exactly 1/3
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "src long, dst long"
        )
        out = {r["node"]: r["rank"] for r in pagerank(edges, n_iters=4).collect()}
        for v in out.values():
            assert abs(v - 1 / 3) < 1e-12

    def test_hub_collects_rank_and_mass_conserved(self, spark):
        from bigdata_covid19_real_time_spark.operators.pagerank import pagerank

        # stars into node 9 (dangling): 9 should outrank the spokes and
        # total mass stays 1 (dangling redistribution)
        edges = spark.createDataFrame(
            [(1, 9), (2, 9), (3, 9)], "src long, dst long"
        )
        out = {r["node"]: r["rank"] for r in pagerank(edges, n_iters=3).collect()}
        assert out[9] > out[1] == out[2] == out[3]
        assert abs(sum(out.values()) - 1.0) < 1e-9
