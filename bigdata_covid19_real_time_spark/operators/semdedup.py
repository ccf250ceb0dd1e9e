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
- the within-cell comparison shuffles the vectors ONCE on the cell id
  (round 15; the previous self-join formulation shuffled both sides);
  per-cell work is quadratic in CELL size, which the quantizer keeps
  bounded (k scales with the corpus), and ``max_cluster_size`` caps
  degenerate cells the same way the MinHash/SimHash band joins cap
  buckets — dropped cells are logged, never silently truncated;
- the pairwise cosines run as a per-cell **numpy GEMM** inside an
  Arrow-batched ``applyInPandas`` kernel (the ``similarity._signatures``
  precedent): the previous JVM higher-order ``aggregate(zip_with(...))``
  dot is *interpreted* expression evaluation outside whole-stage
  codegen and measured ~8M lambda evaluations per bench run at sf0.1,
  where the blocked matmul is milliseconds.  The kernel emits one
  candidate row per vector — ``(id, max cosine against any lower-id
  cell-mate)`` under a float-safety margin — and the certified
  6-decimal rounding + threshold decision runs JVM-side on those few
  rows, so the keep/drop CUT is made by exactly the same rounded
  comparison the previous formulation used (rounding is monotone, so
  thresholding the max equals exists-thresholding the pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.bucketing import cap_bucket_size
from bigdata_covid19_real_time_spark.operators.ivf import assign_clusters
from bigdata_covid19_real_time_spark.operators.similarity import _as_double

#: Kernel-side emission margin below the caller's threshold: wide
#: enough to cover both the 6-decimal rounding granularity (5e-7) and
#: accumulation-order noise between the GEMM and any other float64
#: evaluation order (~1e-15), so the JVM-side exact filter never sees
#: a false negative; narrow enough that emitted rows stay ~|dups|.
_EMIT_MARGIN = 2e-6

#: Row-block size for the per-cell GEMM: bounds kernel memory at
#: ~block * |cell| doubles even for cells at the cap.
_GEMM_BLOCK = 512


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
    import numpy as np
    import pandas as pd

    assigned = assign_clusters(corpus, centroids, id_col, vec_col).select(
        F.col(id_col), F.col("cluster").cast("int").alias("cluster"), F.col(vec_col)
    )
    prepped = assigned.select(
        F.col(id_col).alias("__id"),
        "cluster",
        _as_double(F.col(vec_col)).alias("__vec"),
    )
    # always routed through the guard: with a cap it drops (loudly)
    # quadratic cells; either way it persists prepped.  The cap window
    # partitions by the cell id, so its exchange IS the kernel
    # groupBy's exchange — the vectors ride exactly one shuffle.
    prepped = cap_bucket_size(
        prepped, ["cluster"], max_cluster_size, "semantic_dedup"
    )

    id_type = corpus.schema[id_col].dataType.simpleString()
    emit_floor = float(threshold) - _EMIT_MARGIN

    # no type hints on the kernel: with `from __future__ import
    # annotations` the hint is a string pandas can't resolve and Spark
    # emits an eval-type UserWarning per build
    def cell_dups(pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"__dup_id": [], "__cmax": []})
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in pdf["__vec"].iloc[order]]
        )
        norms = np.sqrt((mat * mat).sum(axis=1))
        # zero-norm rows: the JVM formulation scores those pairs a
        # literal 0.0 — dividing the zero vector keeps every dot 0.0,
        # which is the same value
        nz = norms > 0
        matn = np.divide(mat, norms[:, None], out=np.zeros_like(mat), where=nz[:, None])
        # cmax[k] = max cosine of ids[k] against any LOWER id (rows
        # j < k after the sort), computed in row blocks so memory stays
        # ~block * n even at the cell cap
        cmax = np.full(n, -np.inf)
        for j0 in range(0, n - 1, _GEMM_BLOCK):
            j1 = min(j0 + _GEMM_BLOCK, n - 1)
            block = matn[j0:j1] @ matn.T  # (j1-j0) x n
            # mask k <= j (only strictly-lower rows may flag a column)
            cols = np.arange(n)
            mask = cols[None, :] <= np.arange(j0, j1)[:, None]
            block[mask] = -np.inf
            np.maximum(cmax, block.max(axis=0), out=cmax)
        hit = cmax >= emit_floor
        return pd.DataFrame({"__dup_id": ids[hit], "__cmax": cmax[hit]})

    cand = prepped.groupBy("cluster").applyInPandas(
        cell_dups, f"__dup_id {id_type}, __cmax double"
    )
    # threshold on the 6-decimal-rounded cosine (same convention as
    # similarity.cosine_neardup_pairs), applied JVM-side so the cut
    # uses exactly the certified rounding semantics: raw float
    # comparison lets a last-ulp summation difference flip keep/drop
    # between engines/runs for pairs sitting exactly at the threshold
    dup_ids = cand.filter(
        F.round(F.col("__cmax") + F.lit(1e-9), 6) >= F.lit(threshold)
    ).select("__dup_id")
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
