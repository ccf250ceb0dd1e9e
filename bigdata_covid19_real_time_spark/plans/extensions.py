"""Training-data-pipeline extension queries: dedup, similarity, text.

Each wraps an operator from ``operators/text.py`` /
``operators/similarity.py`` / ``operators/dedup.py`` and carries a DuckDB
oracle so the correctness gate covers the extension surface too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.dedup import canonicalize_duplicates
from bigdata_covid19_real_time_spark.operators.minhash import minhash_lsh_pairs
from bigdata_covid19_real_time_spark.operators.multimodal import (
    attach_media_column,
    decode_image_meta,
    text_as_binary,
)
from bigdata_covid19_real_time_spark.operators.simhash import simhash_pairs
from bigdata_covid19_real_time_spark.operators.similarity import cosine_topk
from bigdata_covid19_real_time_spark.operators.text import (
    STOPWORDS,
    jaccard_pairs,
    quality_stats,
    shingles,
    tokens,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "docs_exact_dedup",
    oracle="""
    SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS copies
    FROM documents
    GROUP BY text
    """,
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content: hash-groupBy on the text, min-id canonical
    representative.  (At 100 TB: group on ``fingerprint`` —
    operators/text.py — to shuffle 8-byte keys, not documents.)"""
    docs = load_table(spark, sf_dir, "documents")
    return canonicalize_duplicates(docs, ["text"], "doc_id").select(
        "canonical_id", "copies"
    )


@query(
    "docs_prefix_neardup",
    oracle="""
    SELECT array_to_string((string_split(text, ' '))[1:8], ' ') AS prefix,
           MIN(doc_id) AS canonical_id,
           COUNT(*)    AS copies
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def docs_prefix_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-key near-dup groups (cheap first-pass clustering: docs
    sharing their first 8 tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(tokens("text"), 1, 8))
    return (
        docs.groupBy(prefix.alias("prefix"))
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("copies"))
        .filter(F.col("copies") > 1)
    )


@query(
    "docs_ngram_jaccard",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] AS shingle
      FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS intersection
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(intersection AS BIGINT) AS intersection,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           ROUND(CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) + 1e-9, 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= 0.6
    """,
)
def docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle-set Jaccard near-dup pairs at threshold 0.6 (the
    corpus has injected near-dups at ~0.9; background pairs sit <0.1)."""
    docs = load_table(spark, sf_dir, "documents")
    out = jaccard_pairs(docs, threshold=0.6, n=3)
    return out.select(
        "doc_a",
        "doc_b",
        "intersection",
        "n_a",
        "n_b",
        stable_round("jaccard", 6).alias("jaccard"),
    )


@query(
    "embedding_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    flat AS (
      SELECT q.query_id, c.neighbor_id,
             SUM(CAST(qv[u.i] AS DOUBLE) * CAST(cv[u.i] AS DOUBLE)) AS dp,
             sqrt(SUM(CAST(qv[u.i] AS DOUBLE) * CAST(qv[u.i] AS DOUBLE))) AS qn,
             sqrt(SUM(CAST(cv[u.i] AS DOUBLE) * CAST(cv[u.i] AS DOUBLE))) AS cn
      FROM q, c, unnest(range(1, len(qv) + 1)) AS u(i)
      WHERE q.query_id != c.neighbor_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             CASE WHEN qn > 0 AND cn > 0 THEN dp / (qn * cn) ELSE 0.0 END AS cos_raw
      FROM flat
    )
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS INTEGER) AS rank,
           ROUND(cos_raw + 1e-9, 6) AS cosine
    FROM scored
    QUALIFY rank <= 5
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors as queries.
    Exact baseline for ANN; the LSH-bucketed scale path shares scoring
    (operators/similarity.py:lsh_bucketed_topk, rows-only checked)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", stable_round("cosine", 6).alias("cosine")
    )


@query(
    "docs_quality_by_lang",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             len(string_split(trim(text), ' ')) AS token_count,
             length(text) AS char_count,
             CASE WHEN len(string_split(trim(text), ' ')) > 0
                  THEN CAST(len(list_filter(string_split(trim(text), ' '),
                       t -> t IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE)
                       / len(string_split(trim(text), ' '))
                  ELSE 0.0 END AS stopword_ratio_en
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS docs,
           ROUND(AVG(token_count) + 1e-9, 4)       AS avg_tokens,
           ROUND(AVG(char_count) + 1e-9, 4)        AS avg_chars,
           ROUND(AVG(stopword_ratio_en) + 1e-9, 6) AS avg_stopword_ratio_en
    FROM per_doc
    GROUP BY lang
    """,
)
def docs_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language rollup of document quality stats (token counting,
    stopword ratio) — the cheap corpus-profiling pass."""
    docs = quality_stats(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        stable_round(F.avg("token_count"), 4).alias("avg_tokens"),
        stable_round(F.avg("char_count"), 4).alias("avg_chars"),
        stable_round(F.avg("stopword_ratio_en"), 6).alias("avg_stopword_ratio_en"),
    )


@query(
    "docs_minhash_lsh",
    # The oracle is the EXACT jaccard pair set: with the fixed seed the
    # banded-LSH candidate pass has verified 100% recall on this corpus
    # (25/25 pairs at sf0.01), and the exact-Jaccard verification step
    # removes all false positives, so LSH output == exact output,
    # deterministically (same seeds, same data, every run).
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] AS shingle
      FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS intersection
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) + 1e-9, 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= 0.6
    """,
)
def docs_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128-perm) + banded LSH (16x8) near-dup pairs, candidates
    verified by exact shingle Jaccard — the bounded-shuffle 100 TB dedup
    path (operators/minhash.py)."""
    docs = load_table(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(docs, threshold=0.6)
    return out.select("doc_a", "doc_b", stable_round("jaccard", 6).alias("jaccard"))


@query("docs_simhash_neardup")  # no SQL oracle: xxhash64 bit-votes are
# not reproducible in DuckDB; the driver records a rows-only check and
# tests/test_neardup.py pins golden pairs
def docs_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs at Hamming<=3 via 16-bit-band bucketing
    (exact for k<=3 by pigeonhole; operators/simhash.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3).orderBy("doc_a", "doc_b")


@query(
    "docs_media_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
           CAST(octet_length(encode(text)) % 1920 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 1080 + 1 AS INTEGER) AS height,
           3 AS n_channels
    FROM documents
    """,
)
def docs_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: text -> binary payload ->
    Arrow-batched mapInPandas decode (deterministic fake kernel) ->
    typed metadata.  The oracle replicates the fake's arithmetic on byte
    length, certifying the batch plumbing row-for-row
    (operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents")
    binary = text_as_binary(docs)
    out = decode_image_meta(binary)
    return out.select(
        "doc_id",
        "size_bytes",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("n_channels").cast("int").alias("n_channels"),
    )


@query("embedding_lsh_topk")  # no SQL oracle: seeded random hyperplanes
# are engine-side constants; the driver records a rows-only check and
# tests compare recall against the exact cosine_topk on the same data
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: random-hyperplane LSH buckets prune the corpus
    before exact cosine scoring (operators/similarity.py:lsh_bucketed_topk).
    The bucket equi-join replaces cosine_topk's broadcast cross-join —
    the 100 TB path where even a broadcast scan per query is too much."""
    import random

    from bigdata_covid19_real_time_spark.operators.similarity import (
        lsh_bucketed_topk,
    )

    rng = random.Random(7)
    emb = load_table(spark, sf_dir, "embeddings")
    # plane width must equal the vector width (zip_with null-pads on
    # mismatch, nulling every signature); read it from one row
    dim = len(emb.select("embedding").first()[0])
    # 16 tables x 3 bits: this corpus's true neighbors sit near cos 0.3
    # (72 deg), so per-table collision is ~(1-72/180)^3 = 0.22 and
    # 16 tables put candidate recall near 1-(0.78)^16 ~ 0.98
    tables = [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(3)] for _ in range(16)
    ]
    out = lsh_bucketed_topk(emb, emb.filter(F.col("vec_id") < 10), tables, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        "rank",
        stable_round("cosine", 6).alias("cosine"),
    ).orderBy("query_id", "rank")


@query(
    "docs_language_scores",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS t FROM documents),
    scored AS (
      SELECT lang,
        CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE)/len(t) ELSE 0.0 END AS s_en,
        CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('der','die','das','und','ist','von','zu','ein'))) AS DOUBLE)/len(t) ELSE 0.0 END AS s_de,
        CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('le','la','les','et','de','un','une','est'))) AS DOUBLE)/len(t) ELSE 0.0 END AS s_fr,
        CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN ('el','la','los','y','de','un','una','es'))) AS DOUBLE)/len(t) ELSE 0.0 END AS s_es
      FROM toks
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
           ROUND(AVG(s_en) + 1e-9, 6) AS avg_score_en,
           ROUND(AVG(s_de) + 1e-9, 6) AS avg_score_de,
           ROUND(AVG(s_fr) + 1e-9, 6) AS avg_score_fr,
           ROUND(AVG(s_es) + 1e-9, 6) AS avg_score_es
    FROM scored
    GROUP BY lang
    """,
)
def docs_language_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID signal: per-language stopword-hit ratios aggregated
    against the corpus's labeled lang column — the n-gram-profile
    language heuristic's Spark shape (narrow map, no UDF;
    operators/text.py:language_scores)."""
    from bigdata_covid19_real_time_spark.operators.text import language_scores

    docs = language_scores(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        stable_round(F.avg("score_en"), 6).alias("avg_score_en"),
        stable_round(F.avg("score_de"), 6).alias("avg_score_de"),
        stable_round(F.avg("score_fr"), 6).alias("avg_score_fr"),
        stable_round(F.avg("score_es"), 6).alias("avg_score_es"),
    )


@query("embedding_ivf_topk")  # no SQL oracle: the k-means index is
# engine-trained state; tests pin recall against the exact baseline
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means coarse quantizer (16 lists, 3
    Lloyd iterations, lowest-id init), queries probe their 6 nearest
    lists and score exactly within them (operators/ivf.py).  The
    inverted-file partition path for corpora where even LSH bucket
    joins are too wide."""
    from bigdata_covid19_real_time_spark.operators.ivf import (
        ivf_topk,
        train_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_centroids(emb, n_clusters=16, n_iters=3)
    out = ivf_topk(emb, emb.filter(F.col("vec_id") < 10), centroids, k=5, nprobe=6)
    return out.select(
        "query_id",
        "neighbor_id",
        "rank",
        stable_round("cosine", 6).alias("cosine"),
    ).orderBy("query_id", "rank")
