"""Distributed second moments over embedding columns: Gram / covariance
matrix and a PCA projection built on it.

The Gram matrix ``V^T V`` is the building block for PCA, whitening,
ridge regression, and linear probes over embedding corpora.  The naive
relational formulation (explode to (vec_id, pos, val), self-join on
vec_id) shuffles ``n * d^2`` rows — at 100 TB of embeddings that join
IS the job.  This operator uses the MLlib tree-aggregate pattern
instead: an Arrow ``mapInPandas`` kernel computes one numpy ``V.T @ V``
partial per PARTITION (the corpus never shuffles), emits ``d*(d+1)/2``
upper-triangle rows per partition, and a single tiny groupBy sums the
partials — shuffle volume is ``partitions * d^2`` rows, independent of
corpus size.  Same Python-boundary justification as
``similarity._signatures``: a GEMM inside interpreted expressions is
the slow path; the batched matmul is milliseconds.

Covariance assembles from the Gram sums and the per-position means
(``cov(a,b) = S_ab / n - mean_a * mean_b``); means come from a narrow
posexplode + groupBy(pos) — d rows, broadcast back.

``pca_components`` eigensolves the assembled d x d matrix driver-side
(numpy, bounded by d^2 — the same bounded-collect discipline as IVF
centroid training) and ``project_embeddings`` applies the components as
a narrow Arrow map.  Component signs are fixed deterministically
(largest-|loading| coordinate made positive) so results are stable
across BLAS builds.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

_GRAM_SCHEMA = StructType(
    [
        StructField("pos_a", IntegerType()),
        StructField("pos_b", IntegerType()),
        StructField("sp", DoubleType()),
    ]
)


def gram_partials(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Upper-triangle Gram sums ``S_ab = sum_i v_i[a] * v_i[b]``.

    One ``V.T @ V`` numpy partial per partition, summed by a
    ``partitions * d^2``-row groupBy — the corpus itself never moves.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        G = None
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if vecs.empty:
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            G = V.T @ V if G is None else G + V.T @ V
        if G is None:
            return
        d = G.shape[0]
        ia, ib = np.triu_indices(d)
        yield pd.DataFrame(
            {"pos_a": ia.astype("int32"), "pos_b": ib.astype("int32"),
             "sp": G[ia, ib]}
        )

    partial = df.select(vec_col).mapInPandas(kernel, _GRAM_SCHEMA)
    return partial.groupBy("pos_a", "pos_b").agg(F.sum("sp").alias("s_ab"))


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Population covariance per dimension pair (upper triangle):
    ``(pos_a, pos_b, cov)`` with ``cov = S_ab / n - mean_a * mean_b``.

    Means/count come from a narrow posexplode + groupBy(pos) (d rows,
    broadcast); rows with NULL vectors are excluded everywhere.  Ragged
    vector lengths or NULL elements FAIL LOUDLY up front (one narrow
    1-row validation agg): the Gram kernel would turn NULL elements
    into NaN and raggedness into a malformed stack, silently
    contaminating ``S_ab`` while the mean/count pass kept counting —
    the two passes must observe the identical sample or the assembled
    covariance is garbage.
    """
    clean = df.filter(F.col(vec_col).isNotNull())
    shape = clean.agg(
        F.min(F.size(vec_col)).alias("mn"),
        F.max(F.size(vec_col)).alias("mx"),
        F.max(
            F.exists(vec_col, lambda x: x.isNull()).cast("int")
        ).alias("has_null_elem"),
    ).first()
    if shape["mn"] is not None and shape["mn"] != shape["mx"]:
        raise ValueError(
            f"covariance_matrix: ragged {vec_col!r} lengths "
            f"({shape['mn']}..{shape['mx']}) — the Gram and mean passes "
            "cannot agree on a sample; pad or filter to uniform d first"
        )
    if shape["has_null_elem"]:
        raise ValueError(
            f"covariance_matrix: {vec_col!r} contains NULL elements — "
            "they would contaminate the Gram sums as NaN; impute or "
            "drop those vectors first"
        )
    gram = gram_partials(clean, vec_col=vec_col, id_col=id_col)
    means = (
        clean.select(F.posexplode(vec_col).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg("val").alias("mean"), F.count("val").alias("n"))
    )
    ma = F.broadcast(means.select(F.col("pos").alias("pos_a"),
                                  F.col("mean").alias("mean_a"),
                                  F.col("n").alias("n")))
    mb = F.broadcast(means.select(F.col("pos").alias("pos_b"),
                                  F.col("mean").alias("mean_b")))
    return (
        gram.join(ma, "pos_a")
        .join(mb, "pos_b")
        .select(
            "pos_a",
            "pos_b",
            (F.col("s_ab") / F.col("n") - F.col("mean_a") * F.col("mean_b"))
            .alias("cov"),
        )
    )


def pca_components(
    df: DataFrame, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
):
    """Top-k principal components from the distributed covariance.

    Collects only the d x d matrix (bounded by dimensionality, never by
    corpus size) and eigensolves driver-side.  Returns ``(components,
    explained_variance)``: a (k, d) numpy array with deterministic signs
    and the matching eigenvalues, descending.
    """
    import numpy as np

    rows = covariance_matrix(df, vec_col=vec_col, id_col=id_col).collect()
    if not rows:
        raise ValueError(
            "pca_components: no vectors to fit (empty corpus or all-NULL "
            f"{vec_col!r} column)"
        )
    d = max(r["pos_b"] for r in rows) + 1
    C = np.zeros((d, d))
    for r in rows:
        C[r["pos_a"], r["pos_b"]] = r["cov"]
        C[r["pos_b"], r["pos_a"]] = r["cov"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):  # deterministic sign
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order]


def project_embeddings(
    df: DataFrame,
    components,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "projected",
) -> DataFrame:
    """Project vectors onto the components: a narrow Arrow map (one
    ``V @ comps.T`` per batch, components closure-captured — k*d
    floats), preserving the id column."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    comps = np.asarray(components, dtype=np.float64)
    schema = StructType(
        [StructField(id_col, LongType()),
         StructField(out_col, ArrayType(DoubleType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if pdf.empty:
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            P = V @ comps.T
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), out_col: list(P)}
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)
