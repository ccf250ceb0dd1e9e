#!/usr/bin/env python3
"""Second decade of the scaling ladder: sf1 -> sf10 (100x the sf0.1
bench corpus) for the heaviest documents/embeddings plans.

SF1NEW/SF1TIMING certify one decade (sf0.1 -> sf1, 10x rows).  One
decade leaves the quadratic question technically open: a plan with an
O(n^2) term whose constant is small can hide inside a single 10x step
(10x rows -> 100x pair work can still land under the "ratio <= 10"
bar when fixed overhead dominates the small side).  A SECOND decade
closes it — a hidden quadratic term that costs r at sf1 costs ~100r at
sf10, so any banding/bucketing/cap failure in the near-dup family or
cell-pruning failure in the ANN family becomes unmissable.

Twin recipe: the same seeded generators as sf1_neardup_check (planted
near-dup regimes, 310-token vocab, unit-Gaussian embeddings with
planted high-cosine pairs), counts x10 (500k docs / ~200k vectors),
numpy-vectorized so generation stays in seconds.  Same splittability
discipline (small row groups + maxPartitionBytes sized below file
size).  Only documents/embeddings-reading queries run — the relational
tables are not staged at this scale.

    python tools/sf10_scale_check.py          # writes SF10CHECK.json
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from sf1_neardup_check import BASE_WORDS, DIM, LANGS  # noqa: E402

SF10_DIR = os.environ.get("SF10_DIR", "/tmp/sf10_scale")
SF1_DIR = os.environ.get("SF1X_DIR", "/tmp/sf1_extended")
WARM_DIR = "/root/testdata/sf0.001"

#: x10 the sf1 twin's counts (which are x10 the sf0.1 corpus)
N_BASE, N_NEAR, N_EXACT = 465_000, 25_000, 10_000
N_VEC, N_VEC_NEAR = 198_000, 2_000

#: documents/embeddings-only heavies: the near-dup family (the
#: banding/cap claims), the span/chunking family (linear-in-bytes
#: claims), and the composed ANN retrievers (cell-pruning claims).
#: embedding_semantic_dedup is timed separately (below) at the
#: SCALE-MATCHED cell count — its registered query pins n_clusters=16
#: for oracle replicability at gate SFs, and a FIXED k is quadratic in
#: corpus size (within-cell pairs ~ (n/k)^2 * k; measured: 16 cells at
#: 200k vectors ran >100 min before being aborted).  SemDeDup's own
#: design scales k with n; the separate timing holds n/k constant
#: across the two decades, which is the claim the operator makes.
QUERY_NAMES = [
    "docs_minhash_lsh",
    "docs_dedup_clusters",
    "docs_leakage_free_split",
    "docs_curation_waterfall",
    "docs_winnow_fingerprints",
    "docs_cdc_chunks",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "embedding_rrf_topk",
]

#: vectors-per-cell held constant across decades (SemDeDup regime):
#: ~200/cell -> k=100 at the sf1 twin's 20k vectors, k=1000 at 200k.
SEMDEDUP_ROWS_PER_CELL = 200

SF10_REL_DIR = os.environ.get("SF10_REL_DIR", "/tmp/sf10_scale_rel")

#: --relational: the heaviest events/orders/lineitem plans by
#: BENCH_DETAIL_r10, one per family — resampling statistics, graph
#: (communities, pagerank, triangles), HLL sketch union, item-item CF,
#: governance audit, point-in-time join.  15M orders / 60M lineitem /
#: 10M events at the sf10 twin (generate_relational scale=10).
REL_QUERY_NAMES = [
    "events_value_bootstrap_ci",
    "brand_copurchase_communities",
    "purchase_graph_pagerank",
    "user_erasure_audit",
    "events_audience_overlap_hll",
    "brand_item_cf_similarity",
    "supplier_triangles",
    "lineitem_pit_priority_mix",
]


def generate(out_dir: str) -> float:
    """Seeded x100-sf0.1 documents + embeddings twin (vectorized)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.time()
    rng = random.Random(4200)
    nrng = np.random.default_rng(4200)
    vocab = np.array([f"{w}{d}" for w in BASE_WORDS for d in range(10)])

    # base texts: one flat draw of token indices, sliced by per-doc
    # lengths (pure-Python rng.choice at 25M draws costs minutes;
    # this is seconds)
    lengths = nrng.integers(10, 101, N_BASE)
    flat = vocab[nrng.integers(0, len(vocab), int(lengths.sum()))]
    bounds = np.concatenate([[0], np.cumsum(lengths)])
    texts: list[str] = [
        " ".join(flat[bounds[i] : bounds[i + 1]]) for i in range(N_BASE)
    ]
    for _ in range(N_NEAR):  # the sf1 twin's two planted regimes
        base = texts[rng.randrange(N_BASE)].split()
        frac = (
            rng.uniform(0.005, 0.02)
            if rng.random() < 0.8
            else rng.uniform(0.03, 0.08)
        )
        k = max(1, round(len(base) * frac))
        for i in rng.sample(range(len(base)), k):
            base[i] = str(vocab[rng.randrange(len(vocab))])
        texts.append(" ".join(base))
    for _ in range(N_EXACT):
        texts.append(texts[rng.randrange(N_BASE)])
    rng.shuffle(texts)

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
                "lang": [rng.choice(LANGS) for _ in texts],
                "source": [f"src{rng.randrange(20)}" for _ in texts],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
        row_group_size=8000,  # splittable: ~60 row groups
    )

    V = nrng.standard_normal((N_VEC, DIM))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    idx = nrng.choice(N_VEC, N_VEC_NEAR, replace=False)
    P = V[idx] + 0.05 * nrng.standard_normal((N_VEC_NEAR, DIM))
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    allv = np.vstack([V, P]).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(allv)), pa.int64()),
                "embedding": pa.array(list(allv), pa.list_(pa.float32())),
                "label": pa.array(
                    [int(x) for x in nrng.integers(0, 10, len(allv))],
                    pa.int32(),
                ),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
        row_group_size=8000,
    )
    return time.time() - t0


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--relational",
        action="store_true",
        help=(
            "time REL_QUERY_NAMES on a scale=10 relational twin and "
            "merge a 'relational' section into SF10CHECK.json"
        ),
    )
    args = ap.parse_args()

    gen_sec = 0.0
    if args.relational:
        if not os.path.exists(os.path.join(SF10_REL_DIR, "events.parquet")):
            from sf1_extended_check import generate_relational

            gen_sec = generate_relational(SF10_REL_DIR, scale=10)
            print(f"generated {SF10_REL_DIR} in {gen_sec:.1f}s", flush=True)
        if not os.path.exists(os.path.join(SF1_DIR, "events.parquet")):
            raise SystemExit(
                f"sf1 twin missing at {SF1_DIR} — run sf1_extended_check"
            )
    else:
        if not os.path.exists(os.path.join(SF10_DIR, "documents.parquet")):
            gen_sec = generate(SF10_DIR)
            print(f"generated {SF10_DIR} in {gen_sec:.1f}s", flush=True)
        if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
            raise SystemExit(
                f"sf1 twin missing at {SF1_DIR} — run sf1_extended_check"
            )

    from bigdata_covid19_real_time_spark.plans import QUERIES
    from bigdata_covid19_real_time_spark.session import get_spark

    spark = get_spark(
        app_name="sf10-scale",
        master="local[" + os.environ.get("SPARK_GRAFT_CPUS", "32") + "]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        extra_conf={
            "spark.cleaner.periodicGC.interval": "60s",
            # splittability: both twins are single files per table
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

    out = os.path.join(REPO, "SF10CHECK.json")

    if args.relational:
        report = (
            json.load(open(out)) if os.path.exists(out) else {}
        )
        rel: dict = {
            "dir": SF10_REL_DIR,
            "generator_sec": round(gen_sec, 1),
            "rows": {
                "orders": 15_000_000,
                "lineitem": 60_000_000,
                "events": 10_000_000,
            },
            "queries": {},
        }
        report["relational"] = rel
        for name in REL_QUERY_NAMES:
            s1 = timed(name, SF1_DIR)
            s10 = timed(name, SF10_REL_DIR)
            rel["queries"][name] = {
                "sf1_sec": s1,
                "sf10_sec": s10,
                "ratio": round(s10 / s1, 2) if s1 > 0 else None,
            }
            print(f"{name}: sf1 {s1}s -> sf10 {s10}s "
                  f"(x{rel['queries'][name]['ratio']})", flush=True)
            with open(out, "w") as fh:
                json.dump(report, fh, indent=1)
                fh.write("\n")
        print(f"wrote {out} (relational section)")
        spark.stop()
        return 0

    report = {
        "dir": SF10_DIR,
        "generator_sec": round(gen_sec, 1),
        "rows": {"documents": N_BASE + N_NEAR + N_EXACT,
                 "embeddings": N_VEC + N_VEC_NEAR},
        "method": (
            "warmed session, warm-up at sf0.001, min-of-2 per SF; "
            "sf1 twin (10x sf0.1) vs sf10 twin (100x sf0.1) — the "
            "second decade of the scaling ladder"
        ),
        "caveat": (
            "generator_sec 0.0 means the seeded twin was REUSED from an "
            "earlier run, not regenerated for free. Ratios certify "
            "SCALING SHAPE at 10x rows per decade: a hidden quadratic "
            "term costs ~100x across this step; honest linear work "
            "reads ~10 once fixed overhead stops dominating"
        ),
        "queries": {},
    }

    def flush_report() -> None:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)
            fh.write("\n")

    for name in QUERY_NAMES:
        s1 = timed(name, SF1_DIR)
        s10 = timed(name, SF10_DIR)
        report["queries"][name] = {
            "sf1_sec": s1,
            "sf10_sec": s10,
            "ratio": round(s10 / s1, 2) if s1 > 0 else None,
        }
        print(f"{name}: sf1 {s1}s -> sf10 {s10}s "
              f"(x{report['queries'][name]['ratio']})", flush=True)
        flush_report()  # a long tail query cannot lose earlier rows

    # semdedup at the scale-matched cell count (constant rows/cell)
    from pyspark.sql import functions as F  # noqa: N812

    from bigdata_covid19_real_time_spark.operators.ivf import train_centroids
    from bigdata_covid19_real_time_spark.operators.semdedup import (
        semantic_dedup_flags,
    )

    def semdedup_timed(sf_dir: str) -> tuple[float, int]:
        from bigdata_covid19_real_time_spark.sources.batch import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        k = max(16, n // SEMDEDUP_ROWS_PER_CELL)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            cents = train_centroids(emb, n_clusters=k, n_iters=3)
            semantic_dedup_flags(emb, cents, threshold=0.28).agg(
                F.sum(F.col("keep").cast("int"))
            ).collect()
            best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        return round(best, 3), k

    s1, k1 = semdedup_timed(SF1_DIR)
    s10, k10 = semdedup_timed(SF10_DIR)
    report["semdedup_scale_matched"] = {
        "rows_per_cell": SEMDEDUP_ROWS_PER_CELL,
        "sf1_sec": s1,
        "sf1_k": k1,
        "sf10_sec": s10,
        "sf10_k": k10,
        "ratio": round(s10 / s1, 2) if s1 > 0 else None,
        "note": (
            "operator timed at SemDeDup's own regime (k grows with n, "
            "rows/cell constant) including k-means training; the "
            "registered query's fixed n_clusters=16 is an oracle-"
            "replicability configuration for gate SFs and is QUADRATIC "
            "at corpus scale — measured >100 min at 200k vectors "
            "before abort. Fixed k does not scale; scale k with n."
        ),
    }
    print(f"semdedup scale-matched: sf1 {s1}s (k={k1}) -> "
          f"sf10 {s10}s (k={k10})", flush=True)
    flush_report()
    print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
