"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
engine's registered query surface (40 queries covering SURVEY.md §2 plus
the training-data extension operators; COVERAGE.md maps every operator
ID to its query/test), keyed identically so the driver can hash-compare
Spark results against DuckDB oracles at sf0.01.  38/40 carry oracles;
``docs_simhash_neardup`` and ``embedding_lsh_topk`` are rows-only by
design (hash-function-dependent / approximate operators whose quality is
pinned against exact baselines in tests instead).
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
