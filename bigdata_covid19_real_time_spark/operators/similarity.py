"""Vector similarity search over embedding columns.

Not in the reference (its only data is scalar time-series); this is part
of the engine's training-data-pipeline extension surface (SURVEY.md §7.7).

Design for 100 TB:
- the *query set* is broadcast (it's small by construction); the corpus
  is never collected or shuffled — brute-force scoring is a narrow map
  over corpus partitions followed by a per-query top-k
  (TakeOrderedAndProject-style via window + filter on the tiny
  (query x k) result);
- dot products run JVM-side with ``aggregate``/``zip_with`` higher-order
  functions — no Python/pandas round-trip in the hot path;
- ``lsh_bucketed_topk`` is the scale path: random-hyperplane signatures
  prune the corpus to matching buckets before exact scoring, turning the
  all-pairs cross join into a bucket-equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two numeric array columns (JVM-side,
    deterministic left-to-right fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors in ``corpus`` for every query vector.

    Output: (query_id, neighbor_id, rank, cosine).  Self-pairs (same id)
    are excluded.  Deterministic: rank ties broken by neighbor id.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
        ).withColumn("q_norm", l2_norm(F.col("q_vec")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
    ).withColumn("c_norm", l2_norm(F.col("c_vec")))

    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("q_norm") > 0) & (F.col("c_norm") > 0),
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(vec . plane_i),
    packed into a long.  Cosine-similar vectors collide with probability
    1 - theta/pi per bit."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(vec, p) >= 0).cast("long")
        sig = sig + (bit * F.lit(2**i).cast("long"))
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine scoring restricted to vectors whose
    hyperplane signature matches the query's.

    Scale path vs ``cosine_topk``: the cross join becomes an equi-join on
    the signature, so each query scores only its bucket (corpus/2^bits on
    average).  Recall is tunable via the number of planes; multi-probe or
    banded variants can re-use the same signature column.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
        )
        .withColumn("q_norm", l2_norm(F.col("q_vec")))
        .withColumn("sig", hyperplane_signature(F.col("q_vec"), planes))
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("c_vec"),
        )
        .withColumn("c_norm", l2_norm(F.col("c_vec")))
        .withColumn("sig", hyperplane_signature(F.col("c_vec"), planes))
    )
    scored = (
        c.join(q, "sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("q_norm") > 0) & (F.col("c_norm") > 0),
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
