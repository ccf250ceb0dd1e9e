"""Distributed Gram/covariance + PCA (operators/moments.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from bigdata_covid19_real_time_spark.operators.moments import (
    covariance_matrix,
    gram_partials,
    pca_components,
    project_embeddings,
)


def _emb_df(spark, V, with_null=False):
    rows = [Row(vec_id=i, embedding=[float(x) for x in V[i]])
            for i in range(len(V))]
    if with_null:
        rows.append(Row(vec_id=len(V), embedding=None))
    return spark.createDataFrame(rows)


class TestCovariance:
    def test_gram_matches_numpy(self, spark):
        rng = np.random.default_rng(7)
        V = rng.standard_normal((50, 6))
        out = gram_partials(_emb_df(spark, V).repartition(5)).collect()
        G = V.T @ V
        assert len(out) == 6 * 7 // 2
        for r in out:
            assert r["s_ab"] == pytest.approx(G[r["pos_a"], r["pos_b"]],
                                              rel=1e-12)

    def test_covariance_matches_numpy_and_skips_nulls(self, spark):
        rng = np.random.default_rng(8)
        V = rng.standard_normal((40, 5)) * 2 + 1.5
        out = covariance_matrix(_emb_df(spark, V, with_null=True)).collect()
        C = np.cov(V.T, bias=True)
        for r in out:
            assert r["cov"] == pytest.approx(C[r["pos_a"], r["pos_b"]],
                                             rel=1e-9, abs=1e-12)

    def test_corpus_never_shuffles_before_partials(self, spark):
        rng = np.random.default_rng(9)
        df = _emb_df(spark, rng.standard_normal((30, 4))).repartition(3)
        plan = gram_partials(df)._jdf.queryExecution().executedPlan().toString()
        # downstream of the kernel exactly one exchange exists — the
        # d^2-row partial sum (the test's own repartition(3) sits below
        # the MapInPandas and is not operator cost)
        above_kernel = plan.split("MapInPandas")[0]
        assert above_kernel.count("Exchange ") == 1
        assert "partial_sum" in above_kernel  # map-side combine on partials


class TestPca:
    def test_recovers_planted_direction(self, spark):
        rng = np.random.default_rng(10)
        axis = np.array([3.0, 4.0, 0.0, 0.0]) / 5.0
        V = np.outer(rng.standard_normal(200) * 10, axis) \
            + rng.standard_normal((200, 4)) * 0.01
        comps, ev = pca_components(_emb_df(spark, V), k=2)
        assert abs(float(np.dot(comps[0], axis))) > 0.999
        assert ev[0] > 50 * ev[1]
        assert comps[0][int(np.abs(comps[0]).argmax())] > 0  # sign rule

    def test_projection_matches_numpy(self, spark):
        rng = np.random.default_rng(11)
        V = rng.standard_normal((20, 4))
        comps = np.asarray([[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
        out = project_embeddings(_emb_df(spark, V), comps).collect()
        got = {r["vec_id"]: r["projected"] for r in out}
        for i in range(20):
            assert got[i][0] == pytest.approx(V[i, 0])
            assert got[i][1] == pytest.approx(V[i, 2])


def test_covariance_rejects_ragged_and_null_elements(spark):
    """Fail-loudly contract (r4 ADVICE): ragged vector lengths or NULL
    array elements would desynchronize the Gram and mean/count passes
    (NaN contamination vs silent counting) — both now raise up front."""
    import pytest
    from bigdata_covid19_real_time_spark.operators.moments import (
        covariance_matrix,
    )

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        covariance_matrix(ragged)

    with_null = spark.createDataFrame(
        [(1, [1.0, None]), (2, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="NULL elements"):
        covariance_matrix(with_null)

    # NULL whole vectors stay allowed (documented exclusion)
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    assert covariance_matrix(ok).count() == 3  # d=2 upper triangle
