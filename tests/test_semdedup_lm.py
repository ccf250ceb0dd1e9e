"""Unit tests for semantic dedup (SemDeDup shape) and the unigram-LM
cross-entropy scorer on tiny hand-computable inputs."""

from __future__ import annotations

import math

from pyspark.sql import Row

from bigdata_covid19_real_time_spark.operators.semdedup import semantic_dedup_flags
from bigdata_covid19_real_time_spark.operators.tfidf import unigram_lm_scores


def emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


class TestSemanticDedup:
    def test_lower_id_survives_within_cell(self, spark):
        # ids 1 and 2 identical; id 3 orthogonal.  Centroids force 1 and
        # 2 into cell 0, 3 into cell 1.
        corpus = emb(
            spark, [(1, [1, 0]), (2, [1, 0]), (3, [0, 1])]
        )
        flags = {
            r["vec_id"]: (r["cluster"], r["keep"])
            for r in semantic_dedup_flags(
                corpus, [[1.0, 0.0], [0.0, 1.0]], threshold=0.9
            ).collect()
        }
        assert flags[1] == (0, True)
        assert flags[2] == (0, False)  # duplicate of the lower id
        assert flags[3] == (1, True)

    def test_cross_cell_duplicates_are_kept_by_design(self, spark):
        # identical vectors forced into different cells survive both —
        # SemDeDup's locality contract
        corpus = emb(spark, [(1, [1, 0.1]), (2, [0.1, 1])])
        flags = semantic_dedup_flags(
            corpus, [[1.0, 0.0], [0.0, 1.0]], threshold=0.0
        ).collect()
        # threshold 0 dedups everything sharing a cell; these two don't
        assert all(r["keep"] for r in flags)

    def test_transitive_chain_drops_all_but_minimum(self, spark):
        # 3 near-identical vectors in one cell: only the lowest id kept
        corpus = emb(spark, [(5, [1, 0]), (6, [1, 0.01]), (7, [1, 0.02])])
        flags = {
            r["vec_id"]: r["keep"]
            for r in semantic_dedup_flags(
                corpus, [[1.0, 0.0]], threshold=0.99
            ).collect()
        }
        assert flags == {5: True, 6: False, 7: False}

    def test_gemm_block_loop_spans_block_boundaries(self, spark):
        # Pin the r15 blocked-GEMM kernel's lower-triangular masking
        # across MULTIPLE row blocks: with the block size patched to 2,
        # a 7-vector cell runs the j-loop three times (rows 0-1, 2-3,
        # 4-5; the top id is correctly never a flagger), and the
        # keep/drop set must equal the hand-derived pairwise answer.
        from bigdata_covid19_real_time_spark.operators import semdedup

        orig = semdedup._GEMM_BLOCK
        semdedup._GEMM_BLOCK = 2
        try:
            corpus = emb(
                spark,
                [
                    (10, [1, 0, 0]),
                    (11, [0, 1, 0]),
                    (12, [1, 0.001, 0]),      # dup of 10
                    (13, [0, 1, 0.001]),      # dup of 11
                    (14, [0, 0, 1]),
                    (15, [0, 0.001, 1]),      # dup of 14
                    (16, [1, 0.002, 0]),      # dup of 10 and 12
                ],
            )
            flags = {
                r["vec_id"]: r["keep"]
                for r in semantic_dedup_flags(
                    corpus, [[1.0, 0.0, 0.0]], threshold=0.99
                ).collect()
            }
        finally:
            semdedup._GEMM_BLOCK = orig
        assert flags == {
            10: True, 11: True, 12: False, 13: False,
            14: True, 15: False, 16: False,
        }

    def test_rounded_threshold_boundary_matches_certified_cut(self, spark):
        # Pin the kernel's emission margin against the certified
        # JVM-side cut round(cos + 1e-9, 6) >= threshold: a pair 4e-7
        # BELOW threshold still rounds UP to it (must be emitted by the
        # kernel despite cos < threshold — the _EMIT_MARGIN contract),
        # while a pair 6e-7 below rounds DOWN and survives.  Two cells
        # so the two boundary pairs never compare with each other.
        import math

        c_up, c_down = 0.9 - 4e-7, 0.9 - 6e-7
        corpus = emb(
            spark,
            [
                (1, [1, 0]),
                (2, [c_up, math.sqrt(1 - c_up * c_up)]),
                (3, [0, 1]),
                (4, [math.sqrt(1 - c_down * c_down), c_down]),
            ],
        )
        flags = {
            r["vec_id"]: r["keep"]
            for r in semantic_dedup_flags(
                corpus, [[1.0, 0.0], [0.0, 1.0]], threshold=0.9
            ).collect()
        }
        assert flags == {1: True, 2: False, 3: True, 4: True}

    def test_zero_norm_vectors_score_zero_and_survive(self, spark):
        # The JVM formulation scored any pair with a zero-norm side a
        # literal 0.0 cosine; the GEMM kernel's guarded divide must
        # reproduce that (zero vectors never flagged at a positive
        # threshold, including against each other).
        corpus = emb(spark, [(1, [0, 0]), (2, [0, 0]), (3, [1, 0])])
        flags = semantic_dedup_flags(
            corpus, [[1.0, 0.0]], threshold=0.5
        ).collect()
        assert all(r["keep"] for r in flags)


class TestUnigramLm:
    def test_hand_computed_cross_entropy(self, spark):
        # corpus: doc1 = "a a b", doc2 = "b c"
        # counts: a=2, b=2, c=1; N=5, V=3; p(w) = (c+1)/8
        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "b c")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: (r["token_total"], r["cross_entropy"])
            for r in unigram_lm_scores(docs).collect()
        }
        p = {"a": 3 / 8, "b": 3 / 8, "c": 2 / 8}
        h1 = -(2 * math.log(p["a"]) + math.log(p["b"])) / 3
        h2 = -(math.log(p["b"]) + math.log(p["c"])) / 2
        assert out[1][0] == 3 and abs(out[1][1] - h1) < 1e-5
        assert out[2][0] == 2 and abs(out[2][1] - h2) < 1e-5

    def test_out_of_distribution_doc_scores_higher(self, spark):
        docs = spark.createDataFrame(
            [(i, "the quick brown fox") for i in range(10)]
            + [(99, "zzz qqq xxx yyy")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["cross_entropy"] for r in unigram_lm_scores(docs).collect()}
        assert out[99] > out[0]


class TestBigramLm:
    def test_hand_computed_bigram_entropy(self, spark):
        from bigdata_covid19_real_time_spark.operators.tfidf import bigram_lm_scores

        # corpus: doc1 = "a b a b", doc2 = "b a"
        # bigrams: d1: (a,b)x2, (b,a)x1; d2: (b,a)x1
        # c12: (a,b)=2, (b,a)=2; uni: a=3, b=3; N=6, V=2
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: (r["bigram_total"], r["cross_entropy"])
            for r in bigram_lm_scores(docs, lam=0.7).collect()
        }
        import math

        def p(c12, cw1, cw2):
            return 0.7 * c12 / cw1 + 0.3 * (cw2 + 1.0) / (6 + 2)

        h1 = -(2 * math.log(p(2, 3, 3)) + 1 * math.log(p(2, 3, 3))) / 3
        h2 = -math.log(p(2, 3, 3)) / 1
        assert out[1][0] == 3 and abs(out[1][1] - h1) < 1e-5
        assert out[2][0] == 1 and abs(out[2][1] - h2) < 1e-5

    def test_shuffled_text_scores_higher_than_fluent(self, spark):
        from bigdata_covid19_real_time_spark.operators.tfidf import bigram_lm_scores

        fluent = "the cat sat on the mat"
        docs = spark.createDataFrame(
            [(i, fluent) for i in range(10)] + [(99, "mat the on cat the sat")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["cross_entropy"] for r in bigram_lm_scores(docs).collect()}
        # same unigram profile, broken bigrams -> higher cross entropy
        assert out[99] > out[0]


class TestProductQuantization:
    def test_pq_codes_bounded_and_recall_reasonable(self, spark):
        from bigdata_covid19_real_time_spark.operators.pq import (
            pq_encode,
            pq_topk,
            train_pq_codebooks,
        )
        from bigdata_covid19_real_time_spark.operators.similarity import cosine_topk
        from bigdata_covid19_real_time_spark.sources.batch import load_table
        from pyspark.sql import functions as F

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        books = train_pq_codebooks(emb, m=4, k=16, n_iters=2)
        assert len(books) == 4 and all(len(b) == 16 for b in books)
        codes = pq_encode(emb, books)
        stats = codes.agg(
            *[F.max(f"code_{s}").alias(f"mx{s}") for s in range(4)],
            *[F.min(f"code_{s}").alias(f"mn{s}") for s in range(4)],
        ).collect()[0]
        assert all(0 <= stats[f"mn{s}"] and stats[f"mx{s}"] < 16 for s in range(4))

    def test_pq_recovers_planted_clusters(self, spark):
        """On clustered data (the regime PQ exists for) the compressed
        scorer must recover the true neighbors; unstructured gaussian
        corpora at 4x16 codes are legitimately near-chance and are NOT
        the contract."""
        from pyspark.sql import Row, functions as F

        from bigdata_covid19_real_time_spark.operators.pq import (
            pq_encode,
            pq_topk,
            train_pq_codebooks,
        )
        from bigdata_covid19_real_time_spark.operators.similarity import cosine_topk

        dim, n_proto = 64, 8
        rows = []
        for i in range(64):
            proto = i % n_proto
            vec = [0.0] * dim
            for d in range(dim):
                if d % n_proto == proto:
                    vec[d] = 1.0
            # deterministic per-vector perturbation so members differ
            vec[(i * 7) % dim] += 0.05 * ((i % 3) + 1)
            rows.append(Row(vec_id=i, embedding=vec))
        emb = spark.createDataFrame(rows)

        books = train_pq_codebooks(emb, m=4, k=16, n_iters=2)
        codes = pq_encode(emb, books)
        queries = emb.filter(F.col("vec_id") < 8)  # one per prototype
        approx = pq_topk(codes, queries, books, k_top=5)
        exact = cosine_topk(emb, queries, k=5)
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        recall = len(a & e) / len(e)
        assert recall >= 0.8, f"PQ failed on clustered data: {recall}"


class TestIvfPq:
    def test_recovers_planted_clusters(self, spark):
        """IVF-PQ on clustered data (its contract regime): cell pruning
        plus ADC shortlist plus exact rerank must recover the true
        neighbors — same gate as the PQ-alone planted-cluster test."""
        from pyspark.sql import Row, functions as F

        from bigdata_covid19_real_time_spark.operators.ivf import train_centroids
        from bigdata_covid19_real_time_spark.operators.ivfpq import ivfpq_topk
        from bigdata_covid19_real_time_spark.operators.pq import train_pq_codebooks
        from bigdata_covid19_real_time_spark.operators.similarity import cosine_topk

        dim, n_proto = 64, 8
        rows = []
        for i in range(64):
            proto = i % n_proto
            vec = [0.0] * dim
            for d in range(dim):
                if d % n_proto == proto:
                    vec[d] = 1.0
            vec[(i * 7) % dim] += 0.05 * ((i % 3) + 1)
            rows.append(Row(vec_id=i, embedding=vec))
        emb = spark.createDataFrame(rows)

        centroids = train_centroids(emb, n_clusters=8, n_iters=3)
        books = train_pq_codebooks(emb, m=4, k=16, n_iters=2)
        queries = emb.filter(F.col("vec_id") < 8)
        approx = ivfpq_topk(
            emb, queries, centroids, books, k=5, nprobe=4, rerank_factor=4
        )
        exact = cosine_topk(emb, queries, k=5)
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        recall = len(a & e) / len(e)
        assert recall >= 0.8, f"IVF-PQ failed on clustered data: {recall}"

    def test_rerank_scores_are_true_cosines(self, spark):
        """Returned scores come from the full-precision rerank, not the
        ADC approximation: every (query, neighbor) cosine must match a
        direct numpy computation to the rounding scale."""
        import numpy as np
        from pyspark.sql import Row, functions as F

        from bigdata_covid19_real_time_spark.operators.ivf import train_centroids
        from bigdata_covid19_real_time_spark.operators.ivfpq import ivfpq_topk
        from bigdata_covid19_real_time_spark.operators.pq import train_pq_codebooks

        rng = np.random.default_rng(5)
        V = rng.standard_normal((40, 64))
        emb = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(x) for x in V[i]]) for i in range(40)]
        )
        centroids = train_centroids(emb, n_clusters=4, n_iters=2)
        books = train_pq_codebooks(emb, m=4, k=8, n_iters=2)
        out = ivfpq_topk(
            emb, emb.filter(F.col("vec_id") < 3), centroids, books,
            k=3, nprobe=4, rerank_factor=3,
        )
        norms = np.linalg.norm(V, axis=1)
        for r in out.collect():
            q, n = r["query_id"], r["neighbor_id"]
            true = float(V[q] @ V[n] / (norms[q] * norms[n]))
            assert abs(r["cosine"] - round(true + 1e-9, 6)) < 2e-6
