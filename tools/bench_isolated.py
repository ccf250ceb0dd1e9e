#!/usr/bin/env python3
"""Fresh-process-per-query A/B harness (round-3 verdict task 2).

Round 3's headline loop showed a ~1.5x average slowdown on queries at
registry position <50 with UNCHANGED plans — consistent with harness
contamination (125 queries + the scale section in one long-lived JVM)
but not proven.  This tool settles it: each query runs in its OWN
process (fresh JVM, same session conf as bench.py, same sf0.001 warm-up
and min-of-2 methodology), so no cross-query JVM state can inflate the
timing.  Output: BENCH_ISOLATED_r{N}.json with the isolated timing next
to the r2/r3 in-loop numbers per query.

    python tools/bench_isolated.py                 # default suspect set
    python tools/bench_isolated.py --queries a b c
    python tools/bench_isolated.py --one NAME      # (internal) child mode
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: The round-3 regression cluster (verdict "What's wrong #1") plus
#: docs_minhash_lsh (task 3's ≤3.8 s target).  r2/r3 values are the
#: IN-LOOP timings from BENCH_r02.json's tail / BENCH_DETAIL_r3.json.
SUSPECTS: dict[str, dict[str, float | None]] = {
    "embedding_label_centroids": {"r2": 0.49, "r3": 1.50},
    "embedding_rrf_topk": {"r2": 3.806, "r3": 5.33},
    "docs_leakage_free_split": {"r2": 4.875, "r3": 6.086},
    "embedding_semantic_dedup": {"r2": 3.03, "r3": 4.037},
    "embedding_pq_topk": {"r2": 2.659, "r3": 3.486},
    "docs_duplicate_spans": {"r2": 1.201, "r3": 1.683},
    "docs_source_topk_sample": {"r2": 0.152, "r3": 0.358},
    "docs_length_deciles": {"r2": 0.223, "r3": 0.451},
    "docs_minhash_lsh": {"r2": 4.40, "r3": 4.692},
}

WARM_DIR = "/root/testdata/sf0.001"


def run_one(name: str, sf_dir: str) -> None:
    """Child mode: identical methodology to bench.py's run_query but in
    a virgin JVM — session warm-up, per-query sf0.001 warm, min of 2."""
    from bigdata_covid19_real_time_spark.plans import QUERIES
    from bigdata_covid19_real_time_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"bench-isolated-{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        extra_conf={"spark.cleaner.periodicGC.interval": "60s"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    if os.path.isdir(WARM_DIR):
        QUERIES[name](spark, WARM_DIR).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()

    def timed() -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        sec = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return sec

    first = timed()
    best = min(first, timed())
    print(json.dumps({"query": name, "isolated_sec": best}))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", help="child mode: run one query and print JSON")
    ap.add_argument("--queries", nargs="*", default=sorted(SUSPECTS))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_ISOLATED_r4.json"))
    args = ap.parse_args()

    if args.one:
        run_one(args.one, args.sf_dir)
        return 0

    results: dict[str, dict] = {}
    for name in args.queries:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name,
                 "--sf-dir", args.sf_dir],
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=600,
            )
        except subprocess.TimeoutExpired:
            # one hung query must not abort the sweep and lose every
            # completed measurement + the output JSON
            results[name] = {"error": "timeout after 600s"}
            print(f"{name}: TIMEOUT", flush=True)
            continue
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")),
            None,
        )
        if proc.returncode != 0 or line is None:
            results[name] = {"error": (proc.stderr or proc.stdout)[-400:]}
            print(f"{name}: FAILED", flush=True)
            continue
        sec = json.loads(line)["isolated_sec"]
        ref = SUSPECTS.get(name, {})
        rec = {"isolated_sec": sec, **ref}
        if ref.get("r2"):
            rec["isolated_vs_r2"] = round(sec / ref["r2"], 2)
        if ref.get("r3"):
            rec["isolated_vs_r3_loop"] = round(sec / ref["r3"], 2)
        results[name] = rec
        print(f"{name}: isolated {sec}s (r2 {ref.get('r2')}, r3-loop {ref.get('r3')})", flush=True)

    with_refs = [r for r in results.values() if "isolated_vs_r2" in r]
    summary = {
        "method": (
            "one fresh JVM per query, bench.py session conf, sf0.001 "
            "warm-up, min of 2 timed runs at sf0.1"
        ),
        "sf_dir": args.sf_dir,
        "mean_isolated_vs_r2": round(
            sum(r["isolated_vs_r2"] for r in with_refs) / len(with_refs), 3
        )
        if with_refs
        else None,
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
