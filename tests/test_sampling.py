"""Deterministic sampling: retry-stability, nesting, mixing weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    stratified_sample,
)
from bigdata_covid19_real_time_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_sample_is_deterministic_and_repartition_stable(spark, docs):
    ids1 = {r.doc_id for r in deterministic_sample(docs, 0.2, "doc_id", 7).collect()}
    ids2 = {r.doc_id for r in deterministic_sample(docs, 0.2, "doc_id", 7).collect()}
    assert ids1 == ids2
    # partitioning must not change membership (rand()-based sample fails this)
    ids3 = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), 0.2, "doc_id", 7).collect()
    }
    assert ids1 == ids3


def test_samples_nest_across_rates_and_split_across_seeds(spark, docs):
    small = {r.doc_id for r in deterministic_sample(docs, 0.1, "doc_id", 7).collect()}
    large = {r.doc_id for r in deterministic_sample(docs, 0.3, "doc_id", 7).collect()}
    assert small <= large
    other_seed = {
        r.doc_id for r in deterministic_sample(docs, 0.1, "doc_id", 8).collect()
    }
    assert other_seed != small  # independent draw


def test_sample_rate_approximately_holds(spark, docs):
    total = docs.count()
    kept = deterministic_sample(docs, 0.25, "doc_id", 3).count()
    assert abs(kept / total - 0.25) < 0.08


def test_stratified_rates_apply_per_stratum(spark, docs):
    rates = {"en": 0.8, "de": 0.1}
    out = stratified_sample(docs, rates, "lang", "doc_id", seed=5, default_rate=0.0)
    kept = {r.lang: r.kept for r in
            out.groupBy("lang").agg(F.count(F.lit(1)).alias("kept")).collect()}
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(kept) <= {"en", "de"}  # default_rate=0 drops other strata
    assert abs(kept["en"] / totals["en"] - 0.8) < 0.15
    assert kept.get("de", 0) / totals["de"] < 0.3


def test_bucket_uniform_range(spark, docs):
    stats = docs.select(hash_bucket(F.col("doc_id"), 1).alias("b")).agg(
        F.min("b"), F.max("b")
    ).first()
    assert 0 <= stats[0] and stats[1] < 1_000_000


def test_invalid_rates_raise(spark, docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5, "doc_id")
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": -0.1}, "lang", "doc_id")


class TestLeakageFreeSplits:
    def test_clusters_never_straddle_splits(self, spark):
        from bigdata_covid19_real_time_spark.operators.sampling import (
            leakage_free_splits,
        )

        corpus = spark.createDataFrame(
            [(i,) for i in range(200)], "doc_id long"
        )
        # 50 clusters of 3 docs each (0-2 -> 0, 3-5 -> 3, ...)
        clusters = spark.createDataFrame(
            [(i, (i // 3) * 3) for i in range(150)], "doc_id long, cluster_id long"
        )
        out = leakage_free_splits(
            corpus, clusters, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3
        )
        per_cluster = (
            out.groupBy("cluster_key")
            .agg(F.count_distinct("split").alias("n_splits"))
            .collect()
        )
        assert all(r["n_splits"] == 1 for r in per_cluster)
        splits = {r["split"] for r in out.select("split").distinct().collect()}
        assert splits == {"train", "val", "test"}

    def test_rates_must_sum_to_one(self, spark):
        import pytest as _pytest

        from bigdata_covid19_real_time_spark.operators.sampling import (
            leakage_free_splits,
        )

        corpus = spark.createDataFrame([(1,)], "doc_id long")
        empty = spark.createDataFrame([], "doc_id long, cluster_id long")
        with _pytest.raises(ValueError, match="sum to 1"):
            leakage_free_splits(corpus, empty, {"train": 0.5, "val": 0.1})


class TestNegativeSamples:
    def test_negatives_have_different_labels_and_are_stable(self, spark):
        from bigdata_covid19_real_time_spark.operators.sampling import (
            hash_negative_samples,
        )

        pool = spark.createDataFrame(
            [(i, i % 4) for i in range(100)], "vec_id long, label int"
        )
        anchors = pool.filter(F.col("vec_id") < 5)
        out1 = hash_negative_samples(pool, anchors, k=3, seed=1).collect()
        out2 = hash_negative_samples(pool, anchors, k=3, seed=1).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
        labels = {r["vec_id"]: r["label"] for r in pool.collect()}
        for r in out1:
            assert labels[r["negative_id"]] != labels[r["anchor_id"]]
            assert r["negative_id"] != r["anchor_id"]
        per_anchor = {}
        for r in out1:
            per_anchor.setdefault(r["anchor_id"], []).append(r["negative_id"])
        for negs in per_anchor.values():
            assert len(negs) == len(set(negs)) == 3

    def test_different_seed_changes_the_draw(self, spark):
        from bigdata_covid19_real_time_spark.operators.sampling import (
            hash_negative_samples,
        )

        pool = spark.createDataFrame(
            [(i, i % 4) for i in range(100)], "vec_id long, label int"
        )
        anchors = pool.filter(F.col("vec_id") < 5)
        a = {(r["anchor_id"], r["negative_id"])
             for r in hash_negative_samples(pool, anchors, k=3, seed=1).collect()}
        b = {(r["anchor_id"], r["negative_id"])
             for r in hash_negative_samples(pool, anchors, k=3, seed=2).collect()}
        assert a != b


class TestTemperatureMixing:
    def test_high_temperature_flattens_toward_uniform(self, spark):
        from bigdata_covid19_real_time_spark.operators.sampling import (
            temperature_mixing_rates,
        )

        docs = spark.createDataFrame(
            [(i, "big" if i < 900 else "small") for i in range(1000)],
            "doc_id long, source string",
        )
        w1 = {r["source"]: r["weight"]
              for r in temperature_mixing_rates(docs, "source", temperature=1.0).collect()}
        w8 = {r["source"]: r["weight"]
              for r in temperature_mixing_rates(docs, "source", temperature=8.0).collect()}
        # T=1 keeps natural proportions; higher T pulls toward uniform
        assert abs(w1["big"] - 0.9) < 1e-6
        assert w8["big"] < w1["big"] and w8["small"] > w1["small"]
        assert abs(w8["big"] + w8["small"] - 1.0) < 1e-5

    def test_rates_cap_at_one(self, spark):
        from bigdata_covid19_real_time_spark.operators.sampling import (
            temperature_mixing_rates,
        )

        docs = spark.createDataFrame(
            [(i, "big" if i < 990 else "tiny") for i in range(1000)],
            "doc_id long, source string",
        )
        rates = {r["source"]: r["sample_rate"]
                 for r in temperature_mixing_rates(
                     docs, "source", temperature=100.0, target_fraction=0.9
                 ).collect()}
        # near-uniform weights push the tiny source far over its size
        assert rates["tiny"] == 1.0
        assert rates["big"] < 1.0


def test_shuffle_shard_assignment_contract(spark):
    from bigdata_covid19_real_time_spark.operators.sampling import (
        shuffle_shard_assignment,
    )

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = shuffle_shard_assignment(df, n_shards=4, seed=3).collect()
    # every doc exactly once, shards in range
    assert len(a) == 1000 and len({r.doc_id for r in a}) == 1000
    assert {r.shard for r in a} <= set(range(4))
    # dense 0..n-1 positions per shard
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard
    # roughly balanced (hash uniformity: each shard within 25% of mean)
    sizes = [len(ps) for ps in by_shard.values()]
    assert min(sizes) > 0.75 * 250 and max(sizes) < 1.25 * 250
    # pure function of (id, seed): identical on re-run...
    b = shuffle_shard_assignment(df, n_shards=4, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # ...and different under another seed (the shuffle actually shuffles)
    c = shuffle_shard_assignment(df, n_shards=4, seed=4).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    # order destroyed: within a shard, consecutive positions are not
    # consecutive ids
    s0 = sorted((r for r in a if r.shard == 0), key=lambda r: r.pos)
    deltas = [abs(s0[i + 1].doc_id - s0[i].doc_id) for i in range(len(s0) - 1)]
    assert sum(1 for d in deltas if d == 1) < len(deltas) * 0.1


class TestWeightedSample:
    def _df(self, spark):
        # two weight classes: ids 0-49 weight 1, ids 50-99 weight 10
        rows = [(i, 1.0 if i < 50 else 10.0) for i in range(100)]
        return spark.createDataFrame(rows, "doc_id LONG, w DOUBLE")

    def test_deterministic_and_matches_python_replay(self, spark):
        """The sampled SET equals a pure-Python replay of the A-ES
        formula — the exactness the SQL oracle relies on."""
        import hashlib
        import math

        from bigdata_covid19_real_time_spark.operators.sampling import (
            weighted_sample_topk,
        )

        df = self._df(spark)
        got = weighted_sample_topk(df, k=10, weight_col="w", key_col="doc_id", seed=3)
        got_ids = sorted(r["doc_id"] for r in got.collect())
        scores = {}
        for i in range(100):
            h = int(hashlib.md5(f"3:{i}".encode()).hexdigest()[:15], 16)
            u = (h + 1) / float(1 << 60)
            scores[i] = -math.log(u) / (1.0 if i < 50 else 10.0)
        want = sorted(sorted(scores, key=lambda i: (scores[i], i))[:10])
        assert got_ids == want
        # re-run identical
        again = sorted(
            r["doc_id"]
            for r in weighted_sample_topk(
                df.repartition(7), k=10, weight_col="w", key_col="doc_id", seed=3
            ).collect()
        )
        assert again == got_ids

    def test_higher_weight_selected_more_often(self, spark):
        from bigdata_covid19_real_time_spark.operators.sampling import (
            weighted_sample_topk,
        )

        df = self._df(spark)
        heavy = 0
        for seed in range(20):
            ids = [
                r["doc_id"]
                for r in weighted_sample_topk(
                    df, k=10, weight_col="w", key_col="doc_id", seed=seed
                ).collect()
            ]
            heavy += sum(1 for i in ids if i >= 50)
        # 10x weight -> expected ~10/11 of picks heavy; demand a clear
        # majority across 200 draws (p(fail) negligible)
        assert heavy > 140

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from bigdata_covid19_real_time_spark.operators.sampling import (
            weighted_sample_topk,
        )

        df = spark.createDataFrame(
            [(1, 1.0), (2, 0.0), (3, -2.0), (4, None)],
            "doc_id LONG, w DOUBLE",
        )
        ids = [r["doc_id"] for r in weighted_sample_topk(
            df, k=10, weight_col="w", key_col="doc_id"
        ).collect()]
        assert ids == [1]
        with pytest.raises(ValueError):
            weighted_sample_topk(df, k=0, weight_col="w", key_col="doc_id")

    def test_plans_take_ordered_not_global_sort(self, spark):
        from bigdata_covid19_real_time_spark.operators.sampling import (
            weighted_sample_topk,
        )

        df = self._df(spark)
        plan = (
            weighted_sample_topk(df, k=10, weight_col="w", key_col="doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
