#!/usr/bin/env python3
"""sf0.1 -> sf1 timing audit for the most expensive headline queries
(round-4 verdict task 6).

SF1CHECK.json certifies CORRECTNESS/recall of the near-dup + ANN
families at sf1; this tool closes the remaining decade of the
SCALING claim by timing the top-5 most expensive headline queries
(per BENCH_DETAIL_r4.json) at both sf0.1 (driver parquet) and sf1
(the same 10x corpus sf1_neardup_check.py generates), with bench.py's
exact methodology: warmed session, per-query warm-up at sf0.001,
min-of-2, noop sink, cache cleared between queries.

Caveat recorded in the output: the sf1 corpus uses a 310-word
vocabulary vs the driver's 31 (see sf1_neardup_check.py's rationale —
at 50k docs the tiny vocab makes every 3-shingle collide and the EXACT
oracles go quadratic), so the ratio conflates 10x rows with the wider
(and more realistic) vocab.  Shingle/band cardinalities scale UP with
vocab, so this direction never hides a scale problem — a super-linear
plan would show a ratio far above 10 regardless.

Writes SF1TIMING.json at the repo root; run with the repo on
PYTHONPATH:  python tools/sf1_timing.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SF1_DIR = os.environ.get("SF1_DIR", "/tmp/sf1_neardup")
SF01_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"

#: Top-5 most expensive headline queries in BENCH_DETAIL_r4.json, plus
#: (r5 extension) the next tier of documents/embeddings-table heavies
#: and the new global span dedup — every query whose tables exist in
#: the sf1 corpus (events-table queries are excluded: the generator
#: only produces documents + embeddings).
TOP5 = [
    "docs_bpe_vocab",
    "docs_dedup_clusters",
    "docs_leakage_free_split",
    "embedding_rrf_topk",
    "docs_minhash_lsh",
    "embedding_ivfpq_topk",
    "docs_winnow_fingerprints",
    "docs_repeated_span_removal",
    "docs_cdc_chunks",
    "docs_global_span_dedup",
]


def main() -> int:
    from sf1_neardup_check import generate

    from bigdata_covid19_real_time_spark.plans import QUERIES
    from bigdata_covid19_real_time_spark.session import get_spark

    if not os.path.isdir(SF1_DIR) or not os.path.exists(
        os.path.join(SF1_DIR, "documents.parquet")
    ):
        generate(SF1_DIR)

    spark = get_spark(
        app_name="sf1-timing",
        master="local[" + os.environ.get("SPARK_GRAFT_CPUS", "32") + "]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        extra_conf={
            "spark.cleaner.periodicGC.interval": "60s",
            # the sf1 corpus is ONE ~15 MB parquet file: at the default
            # 128 MB maxPartitionBytes it reads as 2 splits and every
            # compute-heavy narrow map serializes 32 cores down to 2
            # (measured: winnow 33.6 s on 2 splits vs 6.9 s on 32).
            # 1 MB splits + the generator's 2k-row row groups restore
            # scan parallelism — the exact files.maxPartitionBytes
            # sizing lesson SCALE.md documents for real deployments.
            "spark.sql.files.maxPartitionBytes": "1m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_query(name: str, at_dir: str) -> float:
        QUERIES[name](spark, WARM_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        spark.catalog.clearCache()

        def timed_once() -> float:
            t0 = time.perf_counter()
            QUERIES[name](spark, at_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            elapsed = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
            return elapsed

        return min(timed_once(), timed_once())

    out: dict[str, dict] = {}
    for name in TOP5:
        small = run_query(name, SF01_DIR)
        large = run_query(name, SF1_DIR)
        out[name] = {
            "sf0.1_sec": small,
            "sf1_sec": large,
            "ratio_at_10x_rows": round(large / small, 2) if small else None,
        }
        print(f"{name}: sf0.1 {small}s -> sf1 {large}s "
              f"({out[name]['ratio_at_10x_rows']}x)", flush=True)

    payload = {
        "what": "sf0.1 -> sf1 wall-clock for the top-5 most expensive "
                "headline queries (BENCH_DETAIL_r4.json ranking)",
        "methodology": "bench.py parity: warmed session, per-query "
                       "sf0.001 warm-up, min-of-2, noop sink, cache "
                       "cleared per query; local[32], 24g driver",
        "sf1_corpus": "tools/sf1_neardup_check.py generator "
                      "(50k docs / 20k embeddings, 310-word vocab — "
                      "see module docstring caveat)",
        "rows_factor": 10,
        "queries": out,
    }
    with open(os.path.join(REPO, "SF1TIMING.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"sf1_timing": {n: v["ratio_at_10x_rows"]
                                     for n, v in out.items()}}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
