#!/usr/bin/env python3
"""Interleaved two-sample A/B for query optimizations (round-14).

Runs each query N times ALTERNATING between two repo checkouts (the
baseline worktree and the working tree), each sample in its own fresh
JVM with bench.py's exact methodology (session conf, sf0.001 warm-up,
min-of-2 NOT applied — every sample is one timed run so the two arms
see identical treatment and host drift hits both arms alike).  This is
the repo's r7 adjudication standard: a candidate ships only if the arms
separate (no overlap / clear mean gap), not on a single-run delta.

    python tools/ab_isolated.py --queries q1 q2 --samples 3 \
        --a /root/repo_baseline --b /root/repo --out /tmp/ab.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
repo = sys.argv[1]; name = sys.argv[2]; sf_dir = sys.argv[3]
sys.path.insert(0, repo)
from bigdata_covid19_real_time_spark.plans import QUERIES
from bigdata_covid19_real_time_spark.session import get_spark
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(app_name="ab-" + name, master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
                  extra_conf={"spark.cleaner.periodicGC.interval": "60s"})
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.read.parquet(f"{sf_dir}/region.parquet").count()
WARM = "/root/testdata/sf0.001"
if os.path.isdir(WARM):
    QUERIES[name](spark, WARM).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
t0 = time.perf_counter()
QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
sec = round(time.perf_counter() - t0, 3)
print(json.dumps({"sec": sec}))
spark.stop()
"""


def one(repo: str, name: str, sf_dir: str) -> float | None:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, repo, name, sf_dir],
        capture_output=True, text=True, timeout=900, cwd=repo,
    )
    line = next((ln for ln in reversed(proc.stdout.splitlines())
                 if ln.startswith("{")), None)
    if proc.returncode != 0 or line is None:
        print(f"  FAIL rc={proc.returncode}: {(proc.stderr or '')[-300:]}",
              flush=True)
        return None
    return json.loads(line)["sec"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--a", default="/root/repo_baseline")
    ap.add_argument("--b", default=os.path.dirname(HERE))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--out")
    args = ap.parse_args()

    results: dict[str, dict] = {}
    for name in args.queries:
        a_runs, b_runs = [], []
        for i in range(args.samples):
            # alternate arm order per sample so slow drift cancels
            order = [("a", args.a, a_runs), ("b", args.b, b_runs)]
            if i % 2:
                order.reverse()
            for tag, repo, sink in order:
                sec = one(repo, name, args.sf_dir)
                print(f"{name} [{tag}] sample {i}: {sec}", flush=True)
                if sec is not None:
                    sink.append(sec)
        rec = {"a": a_runs, "b": b_runs}
        if a_runs and b_runs:
            rec["a_mean"] = round(statistics.mean(a_runs), 3)
            rec["b_mean"] = round(statistics.mean(b_runs), 3)
            rec["ratio_b_over_a"] = round(rec["b_mean"] / rec["a_mean"], 3)
            rec["overlap"] = not (max(b_runs) < min(a_runs)
                                  or max(a_runs) < min(b_runs))
        results[name] = rec
        print(f"== {name}: A {rec.get('a_mean')} vs B {rec.get('b_mean')} "
              f"ratio {rec.get('ratio_b_over_a')} overlap={rec.get('overlap')}",
              flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
