"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
engine's registered query surface (126 queries covering SURVEY.md §2 plus
the training-data extension operators; COVERAGE.md maps every operator
ID to its query/test), keyed identically so the driver can hash-compare
Spark results against DuckDB oracles at sf0.01.  All carry oracles —
including the approximate operators, each gated by the strongest
expressible contract: MinHash-LSH and hyperplane-LSH ANN against the
exact baselines they provably equal at these SFs (candidate recall 1.0
with fixed seeds + exact rescoring), SimHash against a full SQL
replication of its md5-derived fingerprints, IVF against an unrolled SQL
replication of its deterministic k-means + probe pipeline, the PQ/
PageRank pipelines against unrolled SQL replications of their fixed-
iteration math, and the HLL/t-digest sketch rollup via error-bound
booleans the oracle expects to be TRUE.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the pricing-summary scan+agg."""
    from bigdata_covid19_real_time_spark.plans import QUERIES

    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bigdata_covid19_real_time_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bigdata_covid19_real_time_spark.plans import ORACLES

    return dict(ORACLES)
