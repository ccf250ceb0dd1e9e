"""Composed IVF-PQ ANN query (operators/ivfpq.py) with a FULL SQL
replication oracle: the coarse-quantizer chain (shared
``kmeans_assign_ctes``) and the shared PQ chain (``pq_train_ctes``
with prefix "p" — the SAME generator the plain PQ oracle uses, so the
two gates cannot diverge) compose in one WITH, then probe -> in-cell
ADC -> shortlist -> exact rerank are replayed step for step.  Both pipelines are deterministic pure
functions of the embeddings table, so the composed operator is too —
the gate checks exact row identity, not a recall bound.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.extensions import (
    kmeans_assign_ctes,
    pq_train_ctes,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


def _ivfpq_oracle_sql(
    n_clusters: int,
    ivf_iters: int,
    nprobe: int,
    k_codes: int,
    pq_iters: int,
    sub: int,
    k: int,
    rerank_factor: int,
) -> str:
    shortlist = k * rerank_factor
    return f"""
    WITH {kmeans_assign_ctes(n_clusters, ivf_iters)},
    {pq_train_ctes(k_codes, pq_iters, sub, prefix="p")},
    probes AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cluster DESC) AS rn
        FROM cscore WHERE vec_id < 10) WHERE rn <= {nprobe}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN cassign a USING (cluster)
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.neighbor_id, SUM(qv.val * ct.val) AS sc
      FROM cand c
      JOIN pfassign a ON a.vec_id = c.neighbor_id
      JOIN pcent{pq_iters} ct ON ct.s = a.s AND ct.code = a.code
      JOIN pv qv ON qv.vec_id = c.query_id AND qv.s = ct.s AND qv.pos = ct.pos
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ROUND(sc + 1e-9, 6) DESC, neighbor_id ASC) AS rn
        FROM adc) WHERE rn <= {shortlist}
    ),
    norms AS (SELECT vec_id, sqrt(SUM(val * val)) AS nrm FROM v GROUP BY 1),
    exact AS (
      SELECT s.query_id, s.neighbor_id,
             SUM(qv.val * cv.val) AS dp, qn.nrm AS q_norm, cn.nrm AS c_norm
      FROM short s
      JOIN v qv ON qv.vec_id = s.query_id
      JOIN v cv ON cv.vec_id = s.neighbor_id AND cv.pos = qv.pos
      JOIN norms qn ON qn.vec_id = s.query_id
      JOIN norms cn ON cn.vec_id = s.neighbor_id
      GROUP BY 1, 2, 4, 5
    ),
    cosined AS (
      SELECT query_id, neighbor_id,
             ROUND(CASE WHEN q_norm > 0 AND c_norm > 0
                        THEN dp / (q_norm * c_norm) ELSE 0.0 END + 1e-9, 6)
               AS cosine
      FROM exact
    )
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank,
           cosine
    FROM cosined
    QUALIFY rank <= {k}
    """


@query(
    "embedding_ivfpq_topk",
    oracle=_ivfpq_oracle_sql(
        n_clusters=16, ivf_iters=3, nprobe=6, k_codes=16, pq_iters=2,
        sub=16, k=5, rerank_factor=4,
    ),
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (operators/ivfpq.py): coarse cells prune the
    corpus, ADC on 4x16 PQ codes ranks in-cell candidates compressed,
    and the top-20 shortlist reranks in full precision — the FAISS
    IndexIVFPQ architecture as relational operators, every stage
    deterministic and replayed by the SQL oracle."""
    from bigdata_covid19_real_time_spark.plans.extensions import (
        _empty_embeddings,
    )

    if _empty_embeddings(spark, sf_dir):
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, cosine double"
        )
    from bigdata_covid19_real_time_spark.operators.ivf import (
        collect_training_rows,
        train_centroids,
    )
    from bigdata_covid19_real_time_spark.operators.ivfpq import ivfpq_topk
    from bigdata_covid19_real_time_spark.operators.pq import train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    # one training fetch shared by both trainers (round 15): the same
    # lowest-id TakeOrdered+collect previously ran twice per query
    train_rows = collect_training_rows(emb)
    centroids = train_centroids(emb, n_clusters=16, n_iters=3, train_rows=train_rows)
    books = train_pq_codebooks(emb, m=4, k=16, n_iters=2, train_rows=train_rows)
    out = ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        centroids,
        books,
        k=5,
        nprobe=6,
        rerank_factor=4,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        stable_round("cosine", 6).alias("cosine"),
    )
