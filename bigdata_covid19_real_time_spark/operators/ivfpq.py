"""IVF-PQ: the composed 100 TB ANN architecture — an inverted-file
coarse quantizer prunes the corpus to ``nprobe`` cells, ADC scoring on
product-quantization codes ranks ONLY in-cell candidates in the
compressed domain, and a short full-precision rerank fixes the final
order.  (FAISS's IndexIVFPQ, expressed relationally.)

Why the composition matters at scale: IVF alone (operators/ivf.py)
prunes the scan but still rehydrates full vectors for every in-cell
candidate; PQ alone (operators/pq.py) compresses 16x but scans every
code.  Composed, the scan touches ``nprobe/n_cells`` of the corpus AND
carries only m bytes per vector; full vectors load for just
``k * rerank_factor`` rows per query.

Determinism: both trainers are the repo's deterministic k-means
(lowest-id init, fixed iterations, explicit tie-breaks), ADC shortlist
and final rank order by 6-decimal-rounded scores with id tie-breaks —
the whole pipeline is a pure function of the corpus, which is what
makes it fully SQL-oracle-replicable (plans/ann_composed.py).

Plan shape: cell assignment and encoding are broadcast-codebook narrow
maps; the candidate join is index x broadcast(probes); ADC is m
broadcast hash joins on (query, code) + a sum (codegen); the rerank
joins the exploded corpus ONLY against the shortlist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_covid19_real_time_spark.operators.ivf import (
    _cluster_expr,
    _norm,
    _probes,
    centroid_array_frame,
)
from bigdata_covid19_real_time_spark.operators.pq import (
    _books_frame,
    _dot,
    _normalized,
    pq_encode,
)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 4,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k via IVF cell pruning + in-cell ADC + exact rerank.

    Output: (query_id, neighbor_id, rank, cosine) — the ANN-family
    contract.  ``rank``/order come from the exact rerank of the ADC
    shortlist (``k * rerank_factor`` per query), so scores are true
    cosines; recall is bounded by cell pruning and ADC shortlist quality.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    spark = corpus.sparkSession

    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
    )

    # compressed index: (neighbor_id, cluster, code_0..code_{m-1})
    assign = c_vecs.join(F.broadcast(centroid_array_frame(spark, centroids))).select(
        "neighbor_id",
        _cluster_expr(F.col("__vec"), F.col("__cent")).alias("cluster"),
    )
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), *[f"code_{s}" for s in range(m)]
    )
    index = codes.join(assign, "neighbor_id")

    # probed cells per query (broadcast — |q| * nprobe rows)
    q_probes = F.broadcast(_probes(q_vecs, "query_id", centroids, nprobe))
    cand = (
        index.join(q_probes, "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", *[f"code_{s}" for s in range(m)])
    )

    # per-query ADC lookup table, then m broadcast joins + a sum
    qn = q_vecs.select(
        "query_id", _normalized(F.col("__vec")).alias("__q")
    )
    lut = (
        qn.join(_books_frame(spark, codebooks))
        .select("query_id", "__q", F.posexplode(F.col("__books")).alias("__s", "__book"))
        .select("query_id", "__s", F.explode("__book").alias("__c"), "__q")
        .select(
            "query_id",
            "__s",
            F.col("__c.cid").alias("__code"),
            _dot(
                F.slice(F.col("__q"), F.col("__s") * sub + 1, F.lit(sub)),
                F.col("__c.cvec"),
            ).alias("__term"),
        )
    )
    for s in range(m):
        lut_s = F.broadcast(
            lut.filter(F.col("__s") == s).select(
                F.col("query_id").alias(f"__q{s}"),
                F.col("__code").alias(f"__k{s}"),
                F.col("__term").alias(f"__t{s}"),
            )
        )
        cand = cand.join(
            lut_s,
            (F.col("query_id") == F.col(f"__q{s}"))
            & (F.col(f"code_{s}") == F.col(f"__k{s}")),
        )
    adc = sum((F.col(f"__t{s}") for s in range(1, m)), F.col("__t0"))
    shortlist_w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    shortlist = (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(adc + F.lit(1e-9), 6).alias("adc_score"),
        )
        .withColumn("__r", F.row_number().over(shortlist_w))
        .filter(F.col("__r") <= k * rerank_factor)
        .select("query_id", "neighbor_id")
    )

    # exact rerank of the shortlist only: cosine over full vectors,
    # rounded-score ordering (cross-engine-stable, same discipline as
    # the PQ ranking)
    cex = c_vecs.join(shortlist.select("neighbor_id").distinct(), "neighbor_id").select(
        "neighbor_id", F.posexplode("__vec").alias("__p", "__cv")
    )
    qex = F.broadcast(
        q_vecs.select("query_id", F.posexplode("__vec").alias("__p", "__qv"))
    )
    norms_c = c_vecs.select("neighbor_id", _norm(F.col("__vec")).alias("c_norm"))
    norms_q = F.broadcast(
        q_vecs.select("query_id", _norm(F.col("__vec")).alias("q_norm"))
    )
    dp = (
        shortlist.join(cex, "neighbor_id")
        .join(qex, ["query_id", "__p"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("__cv") * F.col("__qv")).alias("__dp"))
        .join(norms_c, "neighbor_id")
        .join(norms_q, "query_id")
    )
    cos = F.when(
        (F.col("q_norm") > 0) & (F.col("c_norm") > 0),
        F.col("__dp") / (F.col("q_norm") * F.col("c_norm")),
    ).otherwise(F.lit(0.0))
    scored = dp.select(
        "query_id",
        "neighbor_id",
        F.round(cos + F.lit(1e-9), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
