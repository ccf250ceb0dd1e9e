"""SQ8 scalar quantization + kNN classification (operators/quantization.py,
similarity.knn_classify)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.quantization import (
    sq8_quantize,
    sq8_topk,
    sq8_train,
)
from bigdata_covid19_real_time_spark.operators.similarity import (
    cosine_topk,
    knn_classify,
)


def _emb(spark, n=60, dim=8, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT"
    )


def test_train_minmax_and_degenerate_dim(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 5.0, 2.0]), (1, [-3.0, 5.0, 4.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    stats = sq8_train(df).first()
    assert stats["mins"] == [-3.0, 5.0, 2.0]
    assert stats["maxs"] == [1.0, 5.0, 4.0]
    q = sq8_quantize(df, sq8_train(df)).collect()
    by_id = {r.vec_id: r.qvec for r in q}
    assert by_id[0] == [255, 0, 0]  # max->255, degenerate dim->0, min->0
    assert by_id[1] == [0, 0, 255]


def test_codes_bounded_0_255(spark):
    df = _emb(spark)
    codes = sq8_quantize(df, sq8_train(df)).select(F.explode("qvec").alias("c"))
    mn, mx = codes.agg(F.min("c"), F.max("c")).first()
    assert 0 <= mn and mx <= 255


def test_full_rerank_equals_exact_topk(spark):
    # rerank_factor covering the whole corpus makes SQ8 candidate
    # selection irrelevant: output must equal brute-force cosine top-k.
    df = _emb(spark)
    queries = df.filter(F.col("vec_id") < 5)
    got = sq8_topk(df, queries, k=3, rerank_factor=100).collect()
    want = cosine_topk(df, queries, k=3).collect()
    key = lambda r: (r.query_id, r.rank)
    got_s, want_s = sorted(got, key=key), sorted(want, key=key)
    assert [(r.query_id, r.neighbor_id, r.rank) for r in got_s] == [
        (r.query_id, r.neighbor_id, r.rank) for r in want_s
    ]
    assert all(
        math.isclose(a.cosine, b.cosine, abs_tol=1e-9) for a, b in zip(got_s, want_s)
    )


def test_small_rerank_high_recall(spark):
    df = _emb(spark, n=80)
    queries = df.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.neighbor_id) for r in sq8_topk(df, queries, k=3).collect()
    }
    want = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(df, queries, k=3).collect()
    }
    # 8-bit codes at dim 8: candidate lists overwhelmingly contain the
    # true neighbors; demand >=80% set recall on this fixed seed.
    assert len(got & want) >= int(0.8 * len(want))


def test_knn_classify_majority_and_tiebreak(spark):
    # query 100 sits near cluster label 1; a 2-2 vote tie must break to
    # the smaller label.
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.01], 1),
        (2, [0.0, 1.0], 2),
        (3, [0.01, 0.99], 2),
    ]
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    queries = spark.createDataFrame(
        [(100, [0.8, 0.1]), (101, [0.5, 0.5])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = {r.query_id: r for r in knn_classify(corpus, queries, k=4).collect()}
    assert out[100].predicted_label == 1 and out[100].votes == 2
    assert out[101].predicted_label == 1  # exact 2-2 tie -> smaller label
