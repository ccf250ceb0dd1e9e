"""Semantic deduplication over embedding columns (SemDeDup shape).

Exact all-pairs cosine dedup is quadratic in the corpus; the published
scale recipe (SemDeDup, Abbas et al. 2023) bounds it by clustering
first: assign every vector to a k-means cell, then compare only within
cells and drop every vector that has a more-canonical (here: lower-id)
near-identical neighbor in its cell.  Cross-cell near-duplicates are
out of scope *by definition* — that locality is what makes the
operator linear-ish at corpus scale.

Design for 100 TB:
- cluster assignment reuses the IVF coarse quantizer
  (operators/ivf.py): centroids are a driver-side list (C x dim
  floats), assignment is a narrow map — no shuffle;
- the within-cell self-join shuffles both sides once on the cell id;
  per-cell work is quadratic in CELL size, which the quantizer keeps
  bounded (k scales with the corpus), and ``max_cluster_size`` caps
  degenerate cells the same way the MinHash/SimHash band joins cap
  buckets — dropped cells are logged, never silently truncated;
- cosines run JVM-side (``aggregate``/``zip_with``); no Python in the
  hot path.  The pair scorer is one FLAT higher-order dot per
  candidate row — acceptable interpreted cost; if profiling ever shows
  it dominating on huge cells, the exploded-join formulation
  (``similarity.lsh_bucketed_topk``'s scorer) is the codegen
  alternative (see SCALE.md expression-layer rule 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.bucketing import cap_bucket_size
from bigdata_covid19_real_time_spark.operators.ivf import assign_clusters
from bigdata_covid19_real_time_spark.operators.similarity import (
    _as_double,
    dot,
    l2_norm,
)


def semantic_dedup_flags(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.28,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 100_000,
) -> DataFrame:
    """Flag each vector keep/drop: drop iff a lower-id vector in the
    same k-means cell has cosine similarity >= ``threshold``.

    Output: ``(id_col, cluster, keep)`` — one row per input vector,
    deterministic (the lowest id of any within-cell duplicate group is
    always kept, transitively independent: a vector is dropped for
    having *any* lower-id near-neighbor, not only the group minimum).
    """
    assigned = assign_clusters(corpus, centroids, id_col, vec_col).select(
        F.col(id_col), F.col("cluster").cast("int").alias("cluster"), F.col(vec_col)
    )
    prepped = assigned.select(
        F.col(id_col).alias("__id"),
        "cluster",
        _as_double(F.col(vec_col)).alias("__vec"),
    ).withColumn("__norm", l2_norm(F.col("__vec")))
    # always routed through the guard: with a cap it drops (loudly)
    # quadratic cells; either way it persists prepped, which both sides
    # of the within-cell self-join read
    prepped = cap_bucket_size(
        prepped, ["cluster"], max_cluster_size, "semantic_dedup"
    )
    left = prepped.select(
        F.col("__id").alias("__id_a"),
        "cluster",
        F.col("__vec").alias("__vec_a"),
        F.col("__norm").alias("__norm_a"),
    )
    right = prepped.select(
        F.col("__id").alias("__id_b"),
        F.col("cluster").alias("__cluster_b"),
        F.col("__vec").alias("__vec_b"),
        F.col("__norm").alias("__norm_b"),
    )
    cosine = F.when(
        (F.col("__norm_a") > 0) & (F.col("__norm_b") > 0),
        dot(F.col("__vec_a"), F.col("__vec_b"))
        / (F.col("__norm_a") * F.col("__norm_b")),
    ).otherwise(F.lit(0.0))
    dup_ids = (
        left.join(
            right,
            (F.col("cluster") == F.col("__cluster_b"))
            & (F.col("__id_a") < F.col("__id_b")),
        )
        # threshold on the 6-decimal-rounded cosine (same convention as
        # similarity.cosine_neardup_pairs): raw float comparison lets a
        # last-ulp summation difference flip keep/drop between
        # engines/runs for pairs sitting exactly at the threshold
        .filter(F.round(cosine + F.lit(1e-9), 6) >= F.lit(threshold))
        .select(F.col("__id_b").alias("__dup_id"))
        .distinct()
    )
    return (
        assigned.join(
            dup_ids, assigned[id_col] == dup_ids["__dup_id"], "left"
        )
        .select(
            id_col,
            "cluster",
            F.col("__dup_id").isNull().alias("keep"),
        )
    )
