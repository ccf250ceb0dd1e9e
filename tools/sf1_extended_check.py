#!/usr/bin/env python3
"""sf0.1 -> sf1 timing audit for the late-round-5 query families
(feature engineering, experimentation, evaluation, product metrics,
governance, mining).

SF1TIMING.json covers the documents/embeddings heavies; this tool
extends the scaling evidence to the families that read the
events/orders/lineitem tables, which the driver ships only up to
sf0.1.  It generates a seeded 10x synthetic twin of the relational
tables (row counts 10x sf0.1; value/date/key distributions modeled on
the driver corpus: 30-day event span, uniform keys, 25 brands, 5
segments/priorities/event types) plus the existing sf1 document
corpus (sf1_neardup_check.generate — 310-word vocab caveat recorded
there), then times each query at sf0.1 and sf1 with bench.py's
methodology: warmed session, per-query warm-up at sf0.001, min-of-2,
collect-to-noop.

The honest-ratio caveat from sf1_timing.py applies: distributions are
approximate, so ratios certify the SCALING SHAPE (a quadratic plan
shows far above 10x; the ~2 s fixed job overhead at these sizes pulls
honest linear ratios well BELOW 10), not absolute parity with driver
data.

Writes SF1NEW.json at the repo root; run with the repo on PYTHONPATH:
    python tools/sf1_extended_check.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SF1_DIR = os.environ.get("SF1X_DIR", "/tmp/sf1_extended")
SF01_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"

#: The late-round-5 registrations (see __spark_entry__.py's rotation
#: note) — every query new since the frozen-161 series.
NEW_QUERIES = [
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
    "events_theilsen_trend",
    "brand_item_cf_similarity",
]

#: The registrations SF1NEW.json missed (round-6 verdict task 5): the
#: final late-round-5 batches (model-eval, mix-planning, stewardship,
#: growth, series-sketch) plus the round-6 state-store replays.  Run
#: with ``--round6`` to time exactly these and write SF1NEW_r6.json.
ROUND6_QUERIES = [
    "lineitem_discount_auc",
    "embedding_retrieval_metrics",
    "events_click_calibration",
    "docs_rater_kappa",
    "docs_temperature_mix_plan",
    "customer_retention_triangle",
    "events_neyman_allocation",
    "events_ab_srm_check",
    "lineitem_pit_priority_mix",
    "user_erasure_audit",
    "brand_copurchase_communities",
    "events_funnel_conversion",
    "customer_growth_accounting",
    "brand_price_elasticity",
    "events_seasonal_decomposition",
    "events_audience_overlap_hll",
    "events_sessionize_replay",
    "events_mg_heavy_hitters_replay",
    "events_drift_monitor_replay",
    "events_ewma_state_replay",
]

#: Round-7 new/changed queries (round-7 rotation): the two streaming
#: replay gates, the scalarized posting lists, the capped exact-Jaccard
#: fixture (its ratio should now sit near 1 — the input is pinned at
#: sf0.1 size), the empty-word-fixed fertility, the re-flagged MG
#: replay, and the Arrow-CC consumers.  Run with ``--round7`` to time
#: exactly these and write SF1NEW_r7.json.
ROUND7_QUERIES = [
    "events_stream_dedup_replay",
    "events_stream_interval_join_replay",
    "docs_posting_lists",
    "docs_ngram_jaccard",
    "docs_bpe_fertility",
    "events_mg_heavy_hitters_replay",
    "docs_dedup_clusters",
    "docs_leakage_free_split",
    "docs_curation_waterfall",
]

#: Round-8 new/changed queries: the two boundary-regime streaming
#: gates (short-watermark eviction dedup, leftOuter null-pad join),
#: the two r7 replay gates (their `_run_to_memory` grew UTC + row-count
#: guards — sf1 also exercises the guard's headroom: the dedup replay
#: detaches ~200k rows against the documented 1M bound), the
#: corpus-ingest replay (history-read + blocking-teardown hardening in
#: streaming/corpus.py), and the waterfall (error-path unpersist).
#: Run with ``--round8`` to time exactly these and write SF1NEW_r8.json.
ROUND8_QUERIES = [
    "events_stream_dedup_evict_replay",
    "events_stream_interval_join_left_replay",
    "events_stream_interval_join_full_replay",
    "events_stream_sessions_replay",
    "events_stream_dedup_replay",
    "events_stream_interval_join_replay",
    "docs_corpus_ingest_replay",
    "docs_curation_waterfall",
]

#: Round-9 changed/new: the six replay gates whose shared memory-sink
#: detach became a scratch-parquet re-read, plus the three new round-9
#: gates — the direct rightOuter interval join, the stream-static
#: broadcast-dim join, and the streaming decontamination anti-join.
ROUND9_QUERIES = [
    "events_stream_interval_join_left_replay",
    "events_stream_interval_join_full_replay",
    "events_stream_interval_join_right_replay",
    "events_stream_dedup_replay",
    "events_stream_interval_join_replay",
    "events_stream_dedup_evict_replay",
    "events_stream_sessions_replay",
    "events_stream_static_join_replay",
    "docs_stream_decontam_replay",
]

#: Round-10 refresh (round-9 verdict task 4): not new registrations —
#: the 10 most expensive HEADLINE queries by BENCH_DETAIL_r9, so the
#: scaling claims for the queries that actually cost something stay
#: current.  Three of them (pq/rrf/ivfpq) also changed code in r10
#: (the one-term-array-join ADC restructure).  Run with ``--round10``
#: to time exactly these and write SF1NEW_r10.json.
ROUND10_QUERIES = [
    "docs_curation_waterfall",
    "embedding_rrf_topk",
    "docs_leakage_free_split",
    "docs_dedup_clusters",
    "embedding_ivfpq_topk",
    "docs_winnow_fingerprints",
    "docs_minhash_lsh",
    "events_value_bootstrap_ci",
    "docs_cdc_chunks",
    "embedding_pq_topk",
]

#: Round-11 refresh: again not new registrations — the 10 most
#: expensive HEADLINE queries by BENCH_DETAIL_r10, so the sf1 scaling
#: evidence tracks whatever actually costs something.  The only
#: changed-code query this round (docs_stream_decontam_replay) is a
#: footer-guard change with no plan effect and keeps its r9 sf1 row.
#: Run with ``--round11`` to time exactly these and write
#: SF1NEW_r11.json.
ROUND11_QUERIES = [
    "docs_curation_waterfall",
    "docs_bpe_fertility",
    "docs_leakage_free_split",
    "docs_minhash_lsh",
    "docs_dedup_clusters",
    "docs_winnow_fingerprints",
    "embedding_ivfpq_topk",
    "docs_cdc_chunks",
    "embedding_rrf_topk",
    "brand_copurchase_communities",
]

#: Round-12 refresh: the 10 most expensive HEADLINE queries by
#: BENCH_DETAIL_r11 (the standing pattern) PLUS this round's one
#: changed-code query — docs_corpus_ingest_replay, whose new
#: shuffle-partition pin (8, measured 0.873x at sf0.01 and 0.89x at
#: sf0.1 with non-overlapping fresh-JVM arms, BENCH_ISOLATED_r12.json)
#: is a capacity decision that must be shown honest at sf1 too.  Run
#: with ``--round12`` to time exactly these and write SF1NEW_r12.json.
ROUND12_QUERIES = [
    "docs_curation_waterfall",
    "docs_dedup_clusters",
    "docs_leakage_free_split",
    "docs_winnow_fingerprints",
    "brand_copurchase_communities",
    "embedding_ivfpq_topk",
    "events_value_bootstrap_ci",
    "docs_minhash_lsh",
    "docs_cdc_chunks",
    "embedding_rrf_topk",
    "docs_corpus_ingest_replay",
]

#: Round-13 ladder: the round-12 top set (continuity of the series)
#: with the round's changed-code replay fixtures — the sp-pin cap
#: (min(8, session), round-12 advice #4) touched stream_replay's
#: shared ``_run_to_memory`` and corpus_replay, so the dominant
#: interval-join fixture and the corpus ingest replay are re-laddered
#: to show the cap stays honest at sf1 (where the session's 32 > 8
#: means behavior is identical to round 12's pin).  Run with
#: ``--round13`` to time exactly these and write SF1NEW_r13.json.
ROUND13_QUERIES = [
    "docs_curation_waterfall",
    "docs_dedup_clusters",
    "docs_leakage_free_split",
    "docs_minhash_lsh",
    "embedding_ivfpq_topk",
    "events_value_bootstrap_ci",
    "embedding_rrf_topk",
    "docs_corpus_ingest_replay",
    "events_stream_interval_join_replay",
    "docs_stream_decontam_replay",
]

# Round 14: no query code changed semantically (the replay pin skip is
# a no-op under every numeric session conf) — re-time the round-13 set
# so the sf1 ladder stays fresh and the two touched replay files get a
# fresh decade measurement on identical fixtures.
ROUND14_QUERIES = list(ROUND13_QUERIES)

#: Round 15: the queries whose execution changed this round — the LPA
#: local/distributed hybrid (its 2M-edge threshold must keep choosing
#: correctly as the baskets grow), the semdedup GEMM kernel (at sf1
#: the ~20k-embedding corpus makes cells larger than _GEMM_BLOCK, so
#: the multi-block path runs on real data), the erasure-audit key
#: fan-outs (must no-op or stay cheap on the larger twin), and the
#: shared ANN training fetch.
ROUND15_QUERIES = [
    "brand_copurchase_communities",
    "embedding_semantic_dedup",
    "user_erasure_audit",
    "embedding_ivfpq_topk",
    "embedding_rrf_topk",
]

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["view", "click", "purchase", "signup", "error"]


def generate_relational(out_dir: str, scale: int = 1) -> float:
    """10x-sf0.1 synthetic relational twin (seeded, numpy-vectorized).

    ``scale`` multiplies every fact/dimension row count (1 = the sf1
    twin; 10 = the sf10 twin used by tools/sf10_scale_check.py).  The
    event span and per-customer order density stay fixed so per-key
    work scales with the data, not with the recipe.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.time()
    rng = np.random.default_rng(77)
    os.makedirs(out_dir, exist_ok=True)

    n_cust, n_supp, n_part = 150_000 * scale, 10_000 * scale, 200_000 * scale
    n_orders, n_li_per = 1_500_000 * scale, 4
    n_events, n_users, span_days = 1_000_000 * scale, 15_000 * scale, 30

    def w(name, table):
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"REGION{i}" for i in range(5)],
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    w("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"part name {i}" for i in range(n_part)],
        "p_brand": pa.array([f"Brand#{(i % 25) + 11}" for i in
                             rng.integers(0, 25, n_part)]),
        "p_type": pa.array([f"TYPE {i}" for i in rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))

    base = np.datetime64("1995-01-01", "us")
    odate = base + (
        rng.integers(0, 2400, n_orders) * np.int64(86_400_000_000)
    ).astype("timedelta64[us]")
    w("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[
            rng.integers(0, 3, n_orders)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[
            rng.integers(0, 5, n_orders)]),
    }))

    n_li = n_orders * n_li_per
    li_ok = np.repeat(np.arange(n_orders), n_li_per)
    shipd = odate[li_ok] + (
        rng.integers(1, 121, n_li) * np.int64(86_400_000_000)
    ).astype("timedelta64[us]")
    w("lineitem", pa.table({
        "l_orderkey": pa.array(li_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(np.tile(np.arange(1, n_li_per + 1), n_orders),
                                 pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[
            rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(shipd, pa.timestamp("us")),
    }))

    ebase = np.datetime64("2024-01-01", "us")
    ets = ebase + rng.integers(
        0, span_days * 86_400_000_000, n_events
    ).astype("timedelta64[us]")
    w("events", pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_events)]),
        "value": np.round(np.abs(rng.normal(40, 35, n_events)), 2),
        "props": pa.array([f'{{"k": {int(k)}}}' for k in
                           rng.integers(0, 100, n_events)]),
    }))
    return time.time() - t0


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--round6",
        action="store_true",
        help="time ROUND6_QUERIES and write SF1NEW_r6.json",
    )
    ap.add_argument(
        "--round7",
        action="store_true",
        help="time ROUND7_QUERIES and write SF1NEW_r7.json",
    )
    ap.add_argument(
        "--round8",
        action="store_true",
        help="time ROUND8_QUERIES and write SF1NEW_r8.json",
    )
    ap.add_argument(
        "--round9",
        action="store_true",
        help="time ROUND9_QUERIES and write SF1NEW_r9.json",
    )
    ap.add_argument(
        "--round10",
        action="store_true",
        help="time ROUND10_QUERIES and write SF1NEW_r10.json",
    )
    ap.add_argument(
        "--round11",
        action="store_true",
        help="time ROUND11_QUERIES and write SF1NEW_r11.json",
    )
    ap.add_argument(
        "--round12",
        action="store_true",
        help="time ROUND12_QUERIES and write SF1NEW_r12.json",
    )
    ap.add_argument(
        "--round13",
        action="store_true",
        help="time ROUND13_QUERIES and write SF1NEW_r13.json",
    )
    ap.add_argument(
        "--round14",
        action="store_true",
        help="time ROUND14_QUERIES and write SF1NEW_r14.json",
    )
    ap.add_argument(
        "--round15",
        action="store_true",
        help="time ROUND15_QUERIES and write SF1NEW_r15.json",
    )
    args = ap.parse_args()
    if args.round15:
        names, out_name = ROUND15_QUERIES, "SF1NEW_r15.json"
    elif args.round14:
        names, out_name = ROUND14_QUERIES, "SF1NEW_r14.json"
    elif args.round13:
        names, out_name = ROUND13_QUERIES, "SF1NEW_r13.json"
    elif args.round12:
        names, out_name = ROUND12_QUERIES, "SF1NEW_r12.json"
    elif args.round11:
        names, out_name = ROUND11_QUERIES, "SF1NEW_r11.json"
    elif args.round10:
        names, out_name = ROUND10_QUERIES, "SF1NEW_r10.json"
    elif args.round9:
        names, out_name = ROUND9_QUERIES, "SF1NEW_r9.json"
    elif args.round8:
        names, out_name = ROUND8_QUERIES, "SF1NEW_r8.json"
    elif args.round7:
        names, out_name = ROUND7_QUERIES, "SF1NEW_r7.json"
    elif args.round6:
        names, out_name = ROUND6_QUERIES, "SF1NEW_r6.json"
    else:
        names, out_name = NEW_QUERIES, "SF1NEW.json"

    from sf1_neardup_check import generate as generate_docs

    from bigdata_covid19_real_time_spark.plans import QUERIES
    from bigdata_covid19_real_time_spark.session import get_spark

    gen_sec = 0.0
    if not os.path.exists(os.path.join(SF1_DIR, "events.parquet")):
        gen_sec = generate_relational(SF1_DIR)
    if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
        t0 = time.time()
        generate_docs(SF1_DIR)
        gen_sec += time.time() - t0

    spark = get_spark(
        app_name="sf1-extended",
        master="local[" + os.environ.get("SPARK_GRAFT_CPUS", "32") + "]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        extra_conf={
            "spark.cleaner.periodicGC.interval": "60s",
            # see sf1_timing.py: small single-file corpora read as few
            # splits at the default 128 MB and serialize the cores
            "spark.sql.files.maxPartitionBytes": "4m",
        },
    )

    def timed(name: str, sf_dir: str) -> float:
        QUERIES[name](spark, WARM_DIR).collect()  # warm the plan shape
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        return round(best, 3)

    report: dict = {
        "dir": SF1_DIR,
        "generator_sec": round(gen_sec, 1),
        "method": "warmed session, warm-up at sf0.001, min-of-2 per SF",
        "caveat": (
            "sf1 relational tables are a seeded synthetic 10x twin "
            "(distributions approximate; 310-word doc vocab per "
            "sf1_neardup_check) — ratios certify scaling shape, and the "
            "~2s fixed job overhead pulls honest linear ratios below 10. "
            "generator_sec 0.0 means the twin was REUSED from an "
            "earlier round's generation (the generator is seeded, so "
            "the data is identical), not regenerated for free"
        ),
        "queries": {},
    }
    for name in names:
        t01 = timed(name, SF01_DIR)
        t1 = timed(name, SF1_DIR)
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        report["queries"][name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": ratio,
        }
        print(f"{name}: sf0.1 {t01}s -> sf1 {t1}s (x{ratio})", flush=True)

    out = os.path.join(REPO, out_name)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
