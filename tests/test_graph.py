"""Degree-oriented triangle counting (operators/graph.py)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_covid19_real_time_spark.operators.graph import triangle_count


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list or [(None, None)], "src INT, dst INT")
    return triangle_count(df).first()


def test_known_graphs(spark):
    # K4: C(4,3)=4 triangles
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    r = _run(spark, k4)
    assert (r.nodes, r.edges, r.triangles) == (4, 6, 4)
    # path graph: none
    r = _run(spark, [(0, 1), (1, 2), (2, 3)])
    assert r.triangles == 0
    # two triangles sharing an edge (bowtie-ish)
    r = _run(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3)])
    assert r.triangles == 2


def test_duplicates_direction_and_self_loops_ignored(spark):
    messy = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 1)]
    r = _run(spark, messy)
    assert (r.nodes, r.edges, r.triangles) == (3, 3, 1)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=30,
))
def test_matches_bruteforce(spark, edges):
    canon = {tuple(sorted(e)) for e in edges}
    adj = canon
    expected = sum(
        1
        for a, b, c in combinations(sorted({n for e in canon for n in e}), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    assert _run(spark, list(edges)).triangles == expected
