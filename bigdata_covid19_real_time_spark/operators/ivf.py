"""IVF (inverted-file) approximate nearest neighbor search.

The coarse-quantizer ANN path, complementing the hyperplane-LSH variant
(operators/similarity.py): k-means centroids partition the corpus into
C inverted lists; a query scores only the lists of its ``nprobe``
nearest centroids.  Recall is tuned by ``nprobe`` (probe more lists ->
see more corpus); candidate count ~= nprobe/C of the corpus, vs
L/2^bits for LSH.

Spark-first shape:
- centroids live on the driver (C x dim floats — KBs) and enter the
  plan as literal arrays, so assignment is a narrow map: per vector,
  C codegen'd dot products + argmin.  No shuffle to assign.
- Lloyd iterations are DataFrame aggregations: posexplode(vec) ->
  groupBy (cluster, position) -> avg -> collect C x dim means.  Each
  iteration is one shuffle of (C x dim) partial sums per partition.
- training is deterministic: seeded centroid init from a fixed-id
  sample, fixed iteration count — rerunning reproduces the same index.

Cache lifecycle: ``ivf_topk`` persists the exploded corpus and stats
tables; the cache must outlive the returned lazy frame, so callers
looping invocations should ``spark.catalog.clearCache()`` between them
(bench.py does).

At 100 TB: train on a sample (kmeans quality saturates fast),
partition/bucket the corpus by ``cluster_id`` at write time so each
probe reads only its inverted lists (partition pruning does the "file"
part of inverted-file), and score with the same exploded-join used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _assignment_expr(centroids: list[list[float]]):
    """argmin over squared L2 distance == argmax(dot - |c|^2/2) for unit
    cost; returns a Column picking the nearest centroid id from the
    exploded-sum columns ``__d_0..__d_{C-1}`` (dot products).

    ``array_max`` over (score, -id) structs, NOT a folded
    when/otherwise chain: each fold step embeds the previous tree twice
    (condition + otherwise), so C centroids build a 2^C-node expression
    — 16 centroids OOM'd the driver during analysis.  Struct ordering
    breaks exact score ties toward the lower centroid id.
    """
    entries = F.array(
        *[
            F.struct(
                (F.col(f"__d_{i}") - F.lit(sum(x * x for x in c) / 2.0)).alias("s"),
                F.lit(-i).alias("nc"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return -F.array_max(entries)["nc"]


def _dots_vs_centroids(
    df: DataFrame, id_name: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, __d_0.., norm): dot product against every centroid + L2 norm,
    via posexplode + codegen sum-aggregates (one shuffle on id)."""
    ex = df.select(id_name, F.posexplode(vec_col).alias("__p", "__v"))
    aggs = [
        F.sum(F.col("__v") * F.element_at(F.lit(c), F.col("__p") + 1)).alias(f"__d_{i}")
        for i, c in enumerate(centroids)
    ]
    aggs.append(F.sqrt(F.sum(F.col("__v") * F.col("__v"))).alias("norm"))
    return ex.groupBy(id_name).agg(*aggs)


def train_centroids(
    corpus: DataFrame,
    n_clusters: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic k-means: init = the ``n_clusters`` lowest-id vectors,
    then ``n_iters`` Lloyd steps as DataFrame aggregations.

    Collects only C x dim floats per iteration — never the corpus.
    """
    # persist across Lloyd iterations: every iteration reads vecs twice
    # (dot products + means), and training materializes eagerly inside
    # this function, so the cache can be dropped before returning —
    # unlike the query-shaped operators, no lazy frame escapes.
    vecs = corpus.select(
        F.col(id_col).alias("__id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
    ).persist()
    try:
        init_rows = vecs.orderBy("__id").limit(n_clusters).collect()
        centroids = [list(r["__vec"]) for r in init_rows]

        for _ in range(n_iters):
            dots = _dots_vs_centroids(vecs, "__id", "__vec", centroids)
            assigned = dots.select(
                "__id", _assignment_expr(centroids).alias("__cluster")
            )
            means = (
                vecs.join(assigned, "__id")
                .select("__cluster", F.posexplode("__vec").alias("__p", "__v"))
                .groupBy("__cluster", "__p")
                .agg(F.avg("__v").alias("__m"))
                .collect()
            )
            by_cluster: dict[int, dict[int, float]] = {}
            for r in means:
                by_cluster.setdefault(r["__cluster"], {})[r["__p"]] = r["__m"]
            centroids = [
                [by_cluster[c][p] for p in sorted(by_cluster[c])]
                if c in by_cluster
                else centroids[c]  # empty cluster keeps its old centroid
                for c in range(n_clusters)
            ]
    finally:
        vecs.unpersist()
    return centroids


def assign_clusters(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus + a ``cluster`` column: nearest-centroid id per vector.

    Narrow shape: one shuffle on the id for the exploded dot-product
    aggregate, then a join back to the original rows (broadcast-eligible
    when the corpus is small; co-partitioned on the id otherwise).
    """
    vecs = corpus.select(
        F.col(id_col).alias("__aid"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
    )
    dots = _dots_vs_centroids(vecs, "__aid", "__vec", centroids)
    assigned = dots.select(
        "__aid", _assignment_expr(centroids).alias("cluster")
    )
    return corpus.join(
        assigned, corpus[id_col] == assigned["__aid"]
    ).drop("__aid")


def write_ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the inverted FILE: corpus partitioned by cluster id.

    ``partitionBy("cluster")`` at write time is the "file" half of
    inverted-file: each cluster's vectors land in their own partition
    directory, so a probe that filters ``cluster IN (...)`` scans only
    those directories — partition pruning skips the rest without even
    opening footers.  This is the promised 100 TB read path: a query
    with ``nprobe=6`` of 1024 lists touches ~0.6% of the corpus bytes.
    """
    assign_clusters(corpus, centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cluster").parquet(path)


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k over a materialized ``write_ivf_index`` directory.

    Same output contract as ``ivf_topk``; the difference is WHERE the
    candidate restriction happens: the probed cluster ids are collected
    (a handful of ints — |queries| x nprobe upper bound) and pushed into
    the scan as a literal ``cluster IN (...)`` partition filter, so
    un-probed inverted lists are never read.  The driver-side collect is
    the probe list only, never vectors.
    """
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
    )
    qex = F.broadcast(
        q_vecs.select("query_id", F.posexplode("__vec").alias("__p", "__qv"))
    )
    q_stats = qex.groupBy("query_id").agg(
        *[
            F.sum(F.col("__qv") * F.element_at(F.lit(c), F.col("__p") + 1)).alias(
                f"__d_{i}"
            )
            for i, c in enumerate(centroids)
        ],
        F.sqrt(F.sum(F.col("__qv") * F.col("__qv"))).alias("norm"),
    )
    probe_entries = F.array(
        *[
            F.struct(
                (F.col(f"__d_{i}") - F.lit(sum(x * x for x in c) / 2.0)).alias("s"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    q_probes = q_stats.select(
        "query_id",
        F.col("norm").alias("q_norm"),
        F.explode(F.slice(F.reverse(F.array_sort(probe_entries)), 1, nprobe)).alias(
            "pe"
        ),
    ).select("query_id", "q_norm", F.col("pe.c").alias("cluster")).persist()

    probe_clusters = sorted(
        r["cluster"] for r in q_probes.select("cluster").distinct().collect()
    )
    # literal IN over the partition column -> PartitionFilters on the scan
    pruned = spark.read.parquet(index_path).filter(
        F.col("cluster").isin(probe_clusters)
    )
    cex = pruned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("cluster"),
        F.posexplode(F.transform(vec_col, lambda x: x.cast("double"))).alias(
            "__p", "__cv"
        ),
    )
    c_stats = cex.groupBy("neighbor_id", "cluster").agg(
        F.sqrt(F.sum(F.col("__cv") * F.col("__cv"))).alias("c_norm")
    )
    cands = (
        c_stats.join(F.broadcast(q_probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_norm", "c_norm")
    )
    dp = (
        cands.join(cex.drop("cluster"), "neighbor_id")
        .join(qex, ["query_id", "__p"])
        .groupBy("query_id", "neighbor_id", "q_norm", "c_norm")
        .agg(F.sum(F.col("__cv") * F.col("__qv")).alias("__dp"))
    )
    scored = dp.withColumn(
        "cosine",
        F.when(
            (F.col("q_norm") > 0) & (F.col("c_norm") > 0),
            F.col("__dp") / (F.col("q_norm") * F.col("c_norm")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k restricted to the ``nprobe`` nearest inverted lists.

    Output: (query_id, neighbor_id, rank, cosine) — same contract as
    ``cosine_topk``/``lsh_bucketed_topk``.
    """
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
    )
    cex = c_vecs.select(
        "neighbor_id", F.posexplode("__vec").alias("__p", "__cv")
    ).persist()
    qex = F.broadcast(
        q_vecs.select("query_id", F.posexplode("__vec").alias("__p", "__qv"))
    )

    def stats_from_exploded(ex: DataFrame, id_name: str, val: str) -> DataFrame:
        aggs = [
            F.sum(F.col(val) * F.element_at(F.lit(c), F.col("__p") + 1)).alias(
                f"__d_{i}"
            )
            for i, c in enumerate(centroids)
        ]
        aggs.append(F.sqrt(F.sum(F.col(val) * F.col(val))).alias("norm"))
        return ex.groupBy(id_name).agg(*aggs)

    c_stats = stats_from_exploded(cex, "neighbor_id", "__cv").persist()
    q_stats = stats_from_exploded(qex, "query_id", "__qv").persist()

    c_assign = c_stats.select(
        "neighbor_id",
        F.col("norm").alias("c_norm"),
        _assignment_expr(centroids).alias("cluster"),
    )
    # query probes: rank centroids by the same (dot - |c|^2/2) score and
    # keep the nprobe best -> (query_id, cluster) pairs
    probe_entries = F.array(
        *[
            F.struct(
                (F.col(f"__d_{i}") - F.lit(sum(x * x for x in c) / 2.0)).alias("s"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    q_probes = (
        q_stats.select(
            "query_id",
            F.col("norm").alias("q_norm"),
            F.explode(F.slice(F.reverse(F.array_sort(probe_entries)), 1, nprobe)).alias(
                "pe"
            ),
        )
        .select("query_id", "q_norm", F.col("pe.c").alias("cluster"))
    )

    cands = (
        c_assign.join(F.broadcast(q_probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_norm", "c_norm")
    )
    dp = (
        cands.join(cex, "neighbor_id")
        .join(qex, ["query_id", "__p"])
        .groupBy("query_id", "neighbor_id", "q_norm", "c_norm")
        .agg(F.sum(F.col("__cv") * F.col("__qv")).alias("__dp"))
    )
    scored = dp.withColumn(
        "cosine",
        F.when(
            (F.col("q_norm") > 0) & (F.col("c_norm") > 0),
            F.col("__dp") / (F.col("q_norm") * F.col("c_norm")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
