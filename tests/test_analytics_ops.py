"""Unit tests for the corpus-statistics operators (tfidf, entropy,
percentile-rank buckets, duplicate spans, group sampling, centroid
diagnostics) on tiny hand-computable corpora."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.quality import (
    percentile_rank_buckets,
)
from bigdata_covid19_real_time_spark.operators.sampling import group_sample_topk
from bigdata_covid19_real_time_spark.operators.similarity import (
    label_centroid_stats,
)
from bigdata_covid19_real_time_spark.operators.text import duplicate_spans
from bigdata_covid19_real_time_spark.operators.tfidf import (
    tfidf_top_terms,
    unigram_entropy,
)


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTfidf:
    def test_distinctive_term_ranks_first(self, spark):
        # "zebra" appears only in doc 2; common filler appears everywhere
        df = docs(
            spark,
            [
                (1, "alpha beta gamma alpha"),
                (2, "alpha beta zebra zebra"),
                (3, "alpha beta gamma delta"),
            ],
        )
        out = tfidf_top_terms(df, k=1).collect()
        by_doc = {r["doc_id"]: r for r in out}
        assert by_doc[2]["term"] == "zebra"
        # tf=2, N=3, df=1 -> 2 * ln(4/2)
        assert by_doc[2]["tfidf"] == pytest.approx(2 * math.log(2), abs=1e-5)

    def test_rank_tie_breaks_on_term(self, spark):
        df = docs(spark, [(1, "b a b a")])  # both terms tf=2, same df
        out = tfidf_top_terms(df, k=2).orderBy("term_rank").collect()
        assert [r["term"] for r in out] == ["a", "b"]


class TestUnigramEntropy:
    def test_uniform_distribution_is_ln_k(self, spark):
        df = docs(spark, [(1, "a b c d")])
        row = unigram_entropy(df).collect()[0]
        assert row["entropy"] == pytest.approx(math.log(4), abs=1e-5)
        assert row["token_total"] == 4 and row["distinct_terms"] == 4

    def test_single_repeated_token_is_zero(self, spark):
        df = docs(spark, [(1, "a a a a a")])
        assert unigram_entropy(df).collect()[0]["entropy"] == pytest.approx(
            0.0, abs=1e-6
        )


class TestPercentileRankBuckets:
    def test_distinct_scores_fill_every_bucket(self, spark):
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(1, 11)], "id long, score long"
        )
        out = percentile_rank_buckets(df, "score", 10).collect()
        assert {r["bucket"] for r in out} == set(range(1, 11))
        top = max(out, key=lambda r: r["score"])
        assert top["bucket"] == 10

    def test_ties_share_a_bucket(self, spark):
        df = spark.createDataFrame(
            [(i, 1) for i in range(9)] + [(9, 2)], "id long, score long"
        )
        out = percentile_rank_buckets(df, "score", 10).collect()
        buckets = {r["score"]: r["bucket"] for r in out}
        # 9 of 10 rows tie at score=1 -> cum 9/10 -> bucket ceil(9) = 9
        assert buckets[1] == 9 and buckets[2] == 10


class TestDuplicateSpans:
    def test_planted_shared_span_found(self, spark):
        shared = " ".join(f"w{i}" for i in range(10))
        df = docs(
            spark,
            [
                (1, f"{shared} unique1 tail1"),
                (2, f"prefix2 {shared} tail2"),
                (3, "totally different words " + " ".join(f"x{i}" for i in range(10))),
            ],
        )
        out = {r["span"]: r for r in duplicate_spans(df, n=10).collect()}
        assert shared in out
        assert out[shared]["n_docs"] == 2 and out[shared]["n_occurrences"] == 2
        # no span private to one doc may appear
        assert all(r["n_docs"] >= 2 for r in out.values())

    def test_repeat_within_one_doc_not_flagged(self, spark):
        span = " ".join(f"w{i}" for i in range(10))
        df = docs(spark, [(1, f"{span} {span}")])
        assert duplicate_spans(df, n=10).count() == 0


class TestGroupSampleTopk:
    def test_exactly_k_per_group_and_stable(self, spark):
        df = spark.createDataFrame(
            [(i, f"g{i % 3}") for i in range(60)], "id long, grp string"
        )
        a = group_sample_topk(df, 4, "grp", "id", seed=5)
        assert a.groupBy("grp").count().filter("count != 4").count() == 0
        assert set(a.select("sample_rank").distinct().toPandas()["sample_rank"]) == {
            1,
            2,
            3,
            4,
        }
        b = group_sample_topk(df, 4, "grp", "id", seed=5)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_seed_changes_membership(self, spark):
        df = spark.createDataFrame(
            [(i, "g") for i in range(100)], "id long, grp string"
        )
        a = {r["id"] for r in group_sample_topk(df, 5, "grp", "id", seed=1).collect()}
        b = {r["id"] for r in group_sample_topk(df, 5, "grp", "id", seed=2).collect()}
        assert a != b


class TestLabelCentroidStats:
    def test_known_two_point_cluster(self, spark):
        df = spark.createDataFrame(
            [
                (1, [0.0, 0.0], 0),
                (2, [2.0, 0.0], 0),
                (3, [0.0, 3.0], 1),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        out = {r["label"]: r for r in label_centroid_stats(df).collect()}
        # label 0: centroid (1, 0), members at distance 1 -> inertia 1
        assert out[0]["n_vecs"] == 2
        assert out[0]["centroid_norm"] == pytest.approx(1.0, abs=1e-9)
        assert out[0]["inertia"] == pytest.approx(1.0, abs=1e-9)
        # label 1: singleton -> zero inertia, norm = |v|
        assert out[1]["inertia"] == pytest.approx(0.0, abs=1e-9)
        assert out[1]["centroid_norm"] == pytest.approx(3.0, abs=1e-9)
