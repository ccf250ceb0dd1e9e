"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
engine's registered query surface (194 queries covering SURVEY.md §2 plus
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
#: The gate checks the first ~50 entries in dict order.  Rounds 1-4
#: cumulatively driver-certified 125/142 pre-round-5 registered queries with zero
#: oracle failures; the 17 below are the only queries that have never
#: received a green driver row (the 15 round-4 registrations plus two
#: round-1 casualties: `daily_event_summary_sketch`, whose oracle was
#: added after its r1 `no_oracle` run, and `user_event_type_sets`,
#: which hit a since-fixed harness list-canonicalization crash).  This
#: round's window certifies all 17 — the first round with nothing
#: self-certified — guarded by two long-green canaries (`covid_clean`
#: from the reference-parity family and `docs_dedup_clusters` from the
#: dedup family).  Every other query follows in registration order.
#:
#: ROUND-6 ROTATION NOTE: if CORRECTNESS_r05 certifies this window,
#: every query registered BEFORE the late-round-5 batches has a green
#: driver row.  Round 6 must put the 21 late-round-5 registrations
#: first (selfcheck-green x2 SFs, never driver-checked):
#: `events_value_ewma`, `customer_priority_scd2`,
#: `brand_winsorized_stats`, `customer_kfold_balance`,
#: `docs_readability`, `docs_posting_lists`, `embedding_mmr_topk`,
#: `events_walkforward_folds`, `events_value_bootstrap_ci`,
#: `events_cuped_adjustment`, `embedding_hard_negatives`,
#: `docs_langid_confusion`, `docs_shard_manifest`,
#: `events_entropy_rate`, `events_power_analysis`,
#: `events_session_bounce`, `star_schema_integrity`,
#: `events_wau_mau_stickiness`, `orders_repeat_intervals`,
#: `events_theilsen_trend`, `brand_item_cf_similarity`,
#: `lineitem_discount_auc`, `embedding_retrieval_metrics`,
#: `events_click_calibration`, `docs_rater_kappa`,
#: `docs_temperature_mix_plan`, `customer_retention_triangle`,
#: `events_neyman_allocation`, `events_ab_srm_check`,
#: `lineitem_pit_priority_mix`, `user_erasure_audit`,
#: `brand_copurchase_communities`, `events_funnel_conversion`,
#: `customer_growth_accounting`, `brand_price_elasticity`,
#: `events_seasonal_decomposition`, `events_audience_overlap_hll` —
#: then
#: rotate a
#: fresh slice of the long-certified set (oldest driver row first) as
#: re-validation canaries.
GATE_PRIORITY = [
    # round-4 registrations, never driver-checked (selfcheck-green x2 SFs)
    "covid_trend_ols",
    "events_dow_seasonality",
    "events_embargo_split",
    "docs_media_features",
    "docs_thumbnail_plan",
    "docs_audio_meta",
    "embedding_covariance",
    "events_user_heavy_hitters",
    "docs_bpe_pair_counts",
    "docs_bpe_vocab",
    "docs_source_novelty",
    "events_value_ks",
    "docs_weighted_sample",
    # round-3 deferrals (driver-green siblings, never checked themselves)
    "orders_expectations",
    "docs_shuffle_shards",
    # round-1 casualties, fixed since but never re-checked
    "daily_event_summary_sketch",
    "user_event_type_sets",
    # new this round: approx_top_k certified in its genuinely
    # approximating regime (max_items_tracked << key cardinality)
    "events_skewed_heavy_hitters_sketch",
    # new this round: the BPE ENCODER (apply_bpe) driver-gated via the
    # unrolled trainer+encoder oracle
    "docs_bpe_tokenize",
    # new this round: corpus-wide exact-substring dedup (Lee et al.),
    # full SQL replication oracle
    "docs_global_span_dedup",
    # new this round (second batch): sketch error-bound certifications
    # (GK quantiles, HLL++ distinct), sequence analytics (Markov
    # transitions, CUSUM changepoint), market-basket affinity, and
    # k-anonymity profiling
    "events_value_quantile_sketch",
    "events_userday_hll_distinct",
    "event_type_transitions",
    "events_value_cusum",
    "brand_pair_affinity",
    "docs_k_anonymity",
    # new this round (third batch): behavioral feature engineering —
    # RFM segmentation, time-decay features, interval-counting backlog,
    # YoY growth, hourly profiles
    "customer_rfm_segments",
    "user_recency_weighted_value",
    "orders_open_backlog",
    "nation_revenue_yoy",
    "events_hourly_profile",
    # new this round (fourth batch): curation diagnostics — filter
    # funnel, cross-source shingle overlap, dup-cluster sizes,
    # embedding-norm outliers, gaps-and-islands run stats
    "docs_filter_funnel",
    "source_overlap_matrix",
    "docs_dup_cluster_sizes",
    "embedding_norm_outliers",
    "user_event_runs",
    # new this round (fifth batch): distribution-audit / feature
    # statistics — lag-k autocorrelation, Benford leading-digit audit,
    # smoothed target encoding, categorical mutual information, Gini
    # revenue concentration, equi-width histogram
    "events_daily_autocorr",
    "orders_benford_audit",
    "nation_order_target_encoding",
    "events_type_dow_mutual_info",
    "nation_customer_gini",
    "lineitem_qty_histogram",
    # new this round (sixth batch): Kaplan-Meier fulfillment survival,
    # WoE/IV categorical scorecard, PMI collocation mining
    "orders_fulfillment_survival",
    "brand_return_woe",
    "docs_bigram_pmi",
    # new this round (seventh batch): Zipf rank-frequency fit, Welch
    # pairwise two-sample tests, cohort LTV curve
    "docs_zipf_fit",
    "event_value_welch",
    "cohort_ltv_curve",
    # canaries from the long-green set
    "covid_clean",
    "docs_dedup_clusters",
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
