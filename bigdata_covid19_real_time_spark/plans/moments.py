"""Second-moment query: the distributed covariance matrix over the
embeddings corpus (operators/moments.py) — the PCA / whitening / linear
-probe building block, computed via per-partition GEMM partials instead
of the n*d^2-row self-join shuffle.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.moments import covariance_matrix
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "embedding_covariance",
    # the oracle is the naive relational formulation this operator
    # exists to avoid at scale: explode + self-join on vec_id +
    # covar_pop per dimension pair
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(u.i - 1 AS INTEGER) AS pos,
             CAST(embedding[u.i] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
      WHERE embedding IS NOT NULL
    )
    SELECT a.pos AS pos_a, b.pos AS pos_b,
           ROUND(covar_pop(a.val, b.val) + 1e-9, 6) + 0 AS cov
    FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.pos <= b.pos
    GROUP BY 1, 2
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance per dimension pair (upper triangle) via
    partition-local ``V.T @ V`` numpy partials + a partitions*d^2-row
    sum — the corpus never shuffles (operators/moments.py).  The oracle
    replicates the exact statistic through the naive explode/self-join
    the distributed form replaces."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = covariance_matrix(emb)
    return out.select(
        F.col("pos_a").cast("int").alias("pos_a"),
        F.col("pos_b").cast("int").alias("pos_b"),
        # `+ 0.0` canonicalizes IEEE -0.0 (a covariance a hair below
        # zero rounds to -0.0 in one engine and 0.0 in the other;
        # -0.0 + 0.0 == +0.0 in both)
        (stable_round("cov", 6) + F.lit(0.0)).alias("cov"),
    )
