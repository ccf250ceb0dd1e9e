"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
engine's registered query surface (217 queries covering SURVEY.md §2 plus
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

#: Queries surfaced FIRST to the driver's correctness gate this round.
#: The gate checks the first ~50 entries in dict order.  Rounds 1-5
#: cumulatively driver-certified 173/210 registered queries with ZERO
#: oracle failures; CORRECTNESS_r05 went 50/50, certifying everything
#: registered before the late-round-5 batches.  This round's window
#: holds exactly the remainder: the 37 late-round-5 registrations that
#: have never received a driver row (all selfcheck-green at 2+ SFs and
#: pytest-oracle-green at sf0.001), the 7 new round-6 queries (the 4
#: state-store replays of plans/state_replay.py — the first
#: driver-visible shape for the applyInPandasWithState family — plus
#: the incremental corpus builder replay, per-language BPE fertility,
#: and the end-to-end curation waterfall), and 4 re-validation
#: canaries rotated from the OLDEST green driver rows (round 1).  A
#: green round makes the registry 217/217 driver-certified.
#:
#: ROUND-7 ROTATION NOTE: if CORRECTNESS_r06 certifies this window,
#: every registered query has a green driver row.  Round 7 should gate
#: any new registrations first, then rotate fresh slices of the
#: long-certified set (oldest driver row first) as canaries.
GATE_PRIORITY = [
    # -- model-eval batch (late r5, never driver-checked) --
    "lineitem_discount_auc",
    "embedding_retrieval_metrics",
    "events_click_calibration",
    "docs_rater_kappa",
    # -- mix-planning batch (late r5) --
    "docs_temperature_mix_plan",
    "customer_retention_triangle",
    "events_neyman_allocation",
    "events_ab_srm_check",
    # -- stewardship batch (late r5) --
    "lineitem_pit_priority_mix",
    "user_erasure_audit",
    "brand_copurchase_communities",
    # -- mining batch (late r5) --
    "events_theilsen_trend",
    "brand_item_cf_similarity",
    # -- growth batch (late r5) --
    "events_funnel_conversion",
    "customer_growth_accounting",
    "brand_price_elasticity",
    # -- series-sketch batch (late r5) --
    "events_seasonal_decomposition",
    "events_audience_overlap_hll",
    # -- behavioral/experimentation batches (late r5) --
    "events_value_ewma",
    "customer_priority_scd2",
    "brand_winsorized_stats",
    "customer_kfold_balance",
    "docs_readability",
    "docs_posting_lists",
    "embedding_mmr_topk",
    "events_walkforward_folds",
    "events_value_bootstrap_ci",
    "events_cuped_adjustment",
    "embedding_hard_negatives",
    "docs_langid_confusion",
    "docs_shard_manifest",
    "events_entropy_rate",
    "events_power_analysis",
    "events_session_bounce",
    "star_schema_integrity",
    "events_wau_mau_stickiness",
    "orders_repeat_intervals",
    # -- new round-6: streaming state-store semantics via epoch replay
    #    through the real applyInPandasWithState closures --
    "events_sessionize_replay",
    "events_mg_heavy_hitters_replay",
    "events_drift_monitor_replay",
    "events_ewma_state_replay",
    # -- new round-6: the streaming incremental corpus builder
    #    (quality gate -> exact dedup -> history dedup -> persistent
    #    LSH band index), replayed over two doc_id%2 epochs through the
    #    real CorpusIngest.process_batch --
    "docs_corpus_ingest_replay",
    # -- new round-6: per-language BPE fertility (tokenizer eval on
    #    the certified trainer+encoder) --
    "docs_bpe_fertility",
    # -- new round-6: the end-to-end curation waterfall (quality ->
    #    exact dedup -> near-dup clusters -> holdout -> decontam),
    #    certifying the COMPOSITION of the individually-certified
    #    stages in one six-row report --
    "docs_curation_waterfall",
    # -- re-validation canaries: oldest green driver rows (round 1) --
    "covid_predict",
    "covid_continent_5min",
    "covid_windowed_stats",
    "docs_exact_dedup",
]


def _gate_order(names) -> list[str]:
    """GATE_PRIORITY first, then everything else in registration order."""
    prio = [n for n in GATE_PRIORITY if n in names]
    rest = [n for n in names if n not in set(GATE_PRIORITY)]
    return prio + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the pricing-summary scan+agg."""
    from bigdata_covid19_real_time_spark.plans import QUERIES

    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bigdata_covid19_real_time_spark.plans import QUERIES

    return {n: QUERIES[n] for n in _gate_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """Keyed like :func:`queries` and iterated in the same order."""
    from bigdata_covid19_real_time_spark.plans import ORACLES, QUERIES

    return {
        n: ORACLES[n] for n in _gate_order(list(QUERIES)) if n in ORACLES
    }
