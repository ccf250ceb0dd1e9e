"""Quality-weighted corpus selection query (operators/sampling.py::
weighted_sample_topk) — deterministic A-ES weighted sampling without
replacement, the "pick the best-weighted k documents probabilistically"
primitive of LLM data recipes.

Imported last by plans/__init__ (append-only registration)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "docs_weighted_sample",
    # exact SQL replication: same md5-derived uniform, same
    # -ln(u)/weight score, same (score, doc_id) order and k cut
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source,
             -ln((('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                 / 1152921504606846976.0) / n_chars AS s
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, lang, source, ROUND(s + 1e-9, 6) AS sampling_score
    FROM scored
    ORDER BY s ASC, doc_id ASC
    LIMIT 200
    """,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """200 documents drawn by deterministic Efraimidis-Spirakis weighted
    sampling without replacement, weight = document length (stand-in for
    a quality score): retry-stable, seed-addressable, and replicated
    EXACTLY by the SQL oracle — the sampled SET is oracle-gated, not
    just its size.  Top-k plans as TakeOrderedAndProject (no global
    sort)."""
    from bigdata_covid19_real_time_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample_topk(docs, k=200, weight_col="n_chars", key_col="doc_id", seed=7)
    return out.select(
        "doc_id",
        "lang",
        "source",
        stable_round("sampling_score", 6).alias("sampling_score"),
    )
