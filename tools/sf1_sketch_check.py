#!/usr/bin/env python3
"""Sketch-contract certification at sf1-equivalent volume (~1M rows,
10x the bench SF) — the scale decade above what the driver gate and
SELFCHECK exercise.

SF1CHECK.json certifies the near-dup + ANN families at sf1;
this tool does the same for the three certified sketches:

- **GK quantiles** (``percentile_approx``, accuracy=100): documented
  floor/ceil rank contract per quantile, groups of ~200k values (2000x
  the summary size — deep in the compressing regime).
- **HLL++ distinct** (``approx_count_distinct``, rsd=0.04): 3*rsd
  bound at ~180k distinct keys per group (~300x the sparse-exact
  threshold).
- **approx_top_k frequent items** (M=256 tracked slots): published
  DataSketches epsilon ``3.5*N/M``, no false positives above the N/32
  threshold, no false negatives among true heavies, at ~750k distinct
  keys (~3000x the slot budget — constant purging).

Data is deterministic (seeded, no wall-clock): a Zipf-ish skewed key
space and a heavy-tailed value distribution, built IN Spark (no driver
materialization of the 1M rows).  Writes SF1SKETCH.json at the repo
root:  python tools/sf1_sketch_check.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = 1_000_000
N_GROUPS = 5
QUANTILE_ACC = 100
PS = [0.25, 0.5, 0.75, 0.9, 0.99]
HLL_RSD = 0.04
TOPK_M = 256


def main() -> int:
    from pyspark.sql import functions as F

    from bigdata_covid19_real_time_spark import get_spark
    from bigdata_covid19_real_time_spark.plans.sketch_bounds import (
        gk_rank_contract_ok,
        hll_within_bound,
    )

    spark = get_spark(
        app_name="sf1-sketch-check",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        driver_memory="8g",
    )
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {"n_rows": N_ROWS, "checks": {}}

    # Deterministic synthetic stream: group g = i % N_GROUPS; value is
    # heavy-tailed via an inverse-power transform of a hashed uniform;
    # key space: 25% of rows hit 4 hot keys, 75% are unique cold keys.
    base = (
        spark.range(N_ROWS)
        .withColumn("g", (F.col("id") % N_GROUPS).cast("int"))
        .withColumn(
            "u",
            (F.abs(F.xxhash64(F.col("id"))) % 1_000_003)
            / F.lit(1_000_003.0),
        )
        .withColumn("value", F.pow(F.col("u") + 1e-6, F.lit(-0.5)))
        .withColumn(
            "k",
            F.when(
                F.col("id") % 4 == 0,
                F.concat(
                    F.lit("hot_"),
                    ((F.col("id") / 4).cast("long") % 4).cast("string"),
                ),
            ).otherwise(F.concat(F.lit("cold_"), F.col("id").cast("string"))),
        )
        .persist()
    )
    base.count()

    # --- GK quantiles -------------------------------------------------
    t0 = time.time()
    eps = 1.0 / QUANTILE_ACC
    ps_arr = F.array(*[F.lit(p) for p in PS])
    sk = (
        base.groupBy("g")
        .agg(F.percentile_approx("value", PS, QUANTILE_ACC).alias("qs"))
        .select("g", F.posexplode("qs").alias("pos", "q"))
        .withColumn("p", F.element_at(ps_arr, F.col("pos") + 1))
    )
    stats = (
        base.join(F.broadcast(sk), "g")
        .groupBy("g", "p", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("q")).cast("long")).alias("lt"),
            F.sum((F.col("value") <= F.col("q")).cast("long")).alias("le"),
        )
        .select(
            "g", "p", "n",
            # the SAME contract predicate the gate query emits
            gk_rank_contract_ok(
                F.col("p"), F.col("n"), F.col("lt"), F.col("le"), eps
            ).alias("ok"),
            # observed rank error (for the record, beyond the boolean)
            F.greatest(
                F.col("lt") / F.col("n") - F.col("p"),
                F.col("p") - F.col("le") / F.col("n"),
                F.lit(0.0),
            ).alias("rank_err"),
        )
        .collect()
    )
    worst = max(r["rank_err"] for r in stats)
    out["checks"]["gk_quantiles"] = {
        "n_contract_rows": len(stats),
        "all_within_bound": all(r["ok"] for r in stats),
        "worst_rank_err": round(worst, 6),
        "eps_bound": eps,
        "group_n": stats[0]["n"],
        "sec": round(time.time() - t0, 2),
    }

    # --- HLL++ distinct ----------------------------------------------
    t0 = time.time()
    hll = (
        base.withColumn("ud", F.concat_ws(":", "g", (F.col("id") % 900_001)))
        .groupBy("g")
        .agg(
            F.approx_count_distinct("ud", HLL_RSD).alias("a"),
            F.countDistinct("ud").alias("e"),
        )
        # the SAME bound predicate the gate query emits
        .withColumn("ok", hll_within_bound(F.col("a"), F.col("e"), HLL_RSD))
        .collect()
    )
    worst_rel = max(abs(r["a"] - r["e"]) / r["e"] for r in hll)
    out["checks"]["hll_distinct"] = {
        "groups": len(hll),
        "min_exact_cardinality": min(r["e"] for r in hll),
        "all_within_3rsd": all(r["ok"] for r in hll),
        "worst_rel_err": round(worst_rel, 6),
        "bound_3rsd": 3 * HLL_RSD,
        "sec": round(time.time() - t0, 2),
    }

    # --- approx_top_k purging regime ---------------------------------
    t0 = time.time()
    hh = (
        base.agg(F.expr(f"approx_top_k(k, 10, {TOPK_M})").alias("hh"))
        .select(F.explode("hh").alias("e"))
        .select(F.col("e.item").alias("k"), F.col("e.count").alias("est"))
    )
    exact = base.groupBy("k").agg(F.count(F.lit(1)).alias("ex"))
    tot = base.count()
    eps_n = math.ceil(3.5 * tot / TOPK_M)
    joined = (
        hh.join(exact, "k")
        .select("k", "est", "ex")
        .collect()
    )
    heavies = [r for r in joined if r["est"] * 32 >= tot]
    n_distinct = base.select("k").distinct().count()
    out["checks"]["approx_top_k"] = {
        "distinct_keys": n_distinct,
        "tracked_slots": TOPK_M,
        "returned": len(joined),
        "above_threshold_returned": len(heavies),
        "no_false_positives": all(r["k"].startswith("hot_") for r in heavies),
        "no_false_negatives": len(heavies) == 4,
        "all_within_eps": all(
            abs(r["est"] - r["ex"]) <= eps_n for r in joined
        ),
        "worst_abs_err": max(abs(r["est"] - r["ex"]) for r in joined),
        "eps_bound": eps_n,
        "sec": round(time.time() - t0, 2),
    }

    base.unpersist()
    ok = all(
        c.get("all_within_bound", True)
        and c.get("all_within_3rsd", True)
        and c.get("no_false_positives", True)
        and c.get("no_false_negatives", True)
        and c.get("all_within_eps", True)
        for c in out["checks"].values()
    )
    out["all_green"] = ok
    path = os.path.join(REPO, "SF1SKETCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: all_green={ok}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
