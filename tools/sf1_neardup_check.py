#!/usr/bin/env python3
"""sf1-scale spot-check of the near-dup family (SCALE.md claim audit).

Generates a 10x-sf0.1 corpus (50k documents, 20k embeddings — the sf1
shape for the two tables the near-dup family reads), runs the registered
near-dup queries against it, and verifies each against an independent
oracle:

- ``docs_minhash_lsh`` / ``docs_ngram_jaccard`` / ``docs_dedup_clusters``:
  the registered DuckDB oracles VERBATIM (views re-pointed at the sf1
  parquet).
- ``docs_simhash_neardup``: the registered all-pairs oracle is O(n^2 * 64)
  — infeasible at 50k docs — so the oracle here replicates the same
  md5 bit-vote fingerprints and applies 16-bit-band candidate
  generation (pigeonhole-exact for Hamming <= 3, engine-independent
  theorem) before the Hamming check: same result set, bounded cost.
- ``embedding_semantic_dedup`` / ``embedding_lsh_topk``: numpy
  brute-force replications (exact cosine; the k-means quantizer is the
  repo's own deterministic trainer, shared by both sides by design).

Corpus shape mirrors the driver's generator (word-salad docs 10-100
tokens, 5 langs, 20 sources; planted near-dups at Jaccard ~0.85 plus
exact dups; unit-Gaussian embeddings with planted high-cosine
perturbations) with ONE deliberate change: a 310-word vocabulary
instead of 31.  At 50k docs the 31-word vocab makes every 3-shingle
collide across ~90 unrelated docs and the EXACT-baseline oracles
themselves (not the LSH path) go quadratic; the wider vocab keeps the
planted-pair structure while background collisions stay rare — which is
also the realistic regime for a real corpus.

Writes SF1CHECK.json next to this script's repo root; run with the repo
on PYTHONPATH:  python tools/sf1_neardup_check.py
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

OUT_DIR = os.environ.get("SF1_DIR", "/tmp/sf1_neardup")
N_BASE, N_NEAR, N_EXACT = 46_500, 2_500, 1_000
N_VEC, DIM, N_VEC_NEAR = 19_800, 64, 200

BASE_WORDS = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join vector customer the a of"
).split()
LANGS = ["en", "en", "en", "en", "de", "es", "fr", "zh"]


def generate(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(420)
    vocab = [f"{w}{d}" for w in BASE_WORDS for d in range(10)]

    texts: list[str] = []
    for _ in range(N_BASE):
        n = rng.randint(10, 100)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    for _ in range(N_NEAR):  # planted near-dups, two regimes:
        base = rng.choice(texts[:N_BASE]).split()
        # 80%: the driver corpus' regime (~0.9 Jaccard, 1-2% edits) —
        # the population SCALE.md's "expected misses << 1 at sf1" claim
        # is about; 20%: near-threshold pairs (J ~0.6-0.85) where the
        # banding curve P(detect) = 1-(1-J^8)^16 is well below 1 — these
        # exercise the miss-band analysis, not the exact-match gate
        frac = rng.uniform(0.005, 0.02) if rng.random() < 0.8 else rng.uniform(
            0.03, 0.08
        )
        k = max(1, round(len(base) * frac))
        for i in rng.sample(range(len(base)), k):
            base[i] = rng.choice(vocab)
        texts.append(" ".join(base))
    for _ in range(N_EXACT):  # exact dups
        texts.append(rng.choice(texts[:N_BASE]))
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
        # small row groups make the single test file SPLITTABLE: Spark
        # assigns row groups to byte-range splits, so a compute-heavy
        # narrow map over this corpus can use every core once
        # maxPartitionBytes is sized below the file size (the
        # sf1_timing.py session does this).  A one-row-group 15 MB file
        # reads as ~2 splits and serializes 32 cores down to 2 — the
        # measured 5x slowdown documented in SCALE.md's sf1 section.
        row_group_size=2000,
    )

    nrng = np.random.default_rng(420)
    V = nrng.standard_normal((N_VEC, DIM))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    # planted high-cosine near-dup vectors (cos ~0.995)
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
        row_group_size=1000,
    )


SIMHASH_BANDED_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h2
  FROM toks
),
votes AS (
  SELECT doc_id, u.j AS j,
         SUM(CASE WHEN ((CASE WHEN u.j < 32 THEN h1 ELSE h2 END) >> (u.j % 32)) & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM hashed, unnest(range(0, 64)) AS u(j)
  GROUP BY 1, 2
),
chunks AS (
  SELECT doc_id, CAST(j // 16 AS INTEGER) AS band,
         CAST(SUM(CASE WHEN v > 0 THEN 1 << (j % 16) ELSE 0 END) AS BIGINT) AS chunk
  FROM votes GROUP BY 1, 2
),
fp AS (
  SELECT doc_id,
         MAX(CASE WHEN band = 0 THEN chunk END) AS c0,
         MAX(CASE WHEN band = 1 THEN chunk END) AS c1,
         MAX(CASE WHEN band = 2 THEN chunk END) AS c2,
         MAX(CASE WHEN band = 3 THEN chunk END) AS c3
  FROM chunks GROUP BY 1
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(fa.c0, fb.c0)) + bit_count(xor(fa.c1, fb.c1)) +
            bit_count(xor(fa.c2, fb.c2)) + bit_count(xor(fa.c3, fb.c3))
            AS INTEGER) AS hamming
FROM cands JOIN fp fa ON fa.doc_id = doc_a JOIN fp fb ON fb.doc_id = doc_b
WHERE bit_count(xor(fa.c0, fb.c0)) + bit_count(xor(fa.c1, fb.c1)) +
      bit_count(xor(fa.c2, fb.c2)) + bit_count(xor(fa.c3, fb.c3)) <= 3
"""


def normalize(rows, columns):
    import math

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else f"{v:.10g}")
            else:
                vals.append("NULL" if v is None else str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from bigdata_covid19_real_time_spark.session import get_spark

    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(OUT_DIR, "documents.parquet")):
        generate(OUT_DIR)
    gen_sec = round(time.perf_counter() - t0, 1)

    spark = get_spark(
        app_name="sf1check",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        extra_conf={"spark.cleaner.periodicGC.interval": "60s"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = entry.queries(), entry.oracle_sql()

    duck = duckdb.connect()
    for t in ("documents", "embeddings"):
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{OUT_DIR}/{t}.parquet')"
        )

    report: dict = {"generator_sec": gen_sec, "dir": OUT_DIR, "checks": {}}

    def spark_run(name: str):
        t = time.perf_counter()
        sdf = queries[name](spark, OUT_DIR)
        cols = sdf.columns
        rows = [tuple(r) for r in sdf.collect()]
        sec = round(time.perf_counter() - t, 2)
        spark.catalog.clearCache()
        return cols, rows, sec

    def record(name: str, cols, rows, sec, ocols, orows, osec):
        ok = (
            sorted(cols) == sorted(ocols)
            and len(rows) == len(orows)
            and normalize(rows, cols) == normalize(orows, ocols)
        )
        report["checks"][name] = {
            "match": ok,
            "spark_rows": len(rows),
            "oracle_rows": len(orows),
            "spark_sec": sec,
            "oracle_sec": osec,
        }
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"({len(rows)} vs {len(orows)} rows, spark {sec}s, oracle {osec}s)",
              flush=True)

    # 1: exact n-gram Jaccard — registered oracle verbatim, strict gate
    cols, rows, sec = spark_run("docs_ngram_jaccard")
    t = time.perf_counter()
    res = duck.execute(oracles["docs_ngram_jaccard"])
    record("docs_ngram_jaccard", cols, rows, sec,
           [d[0] for d in res.description], res.fetchall(),
           round(time.perf_counter() - t, 2))

    # 2: MinHash-LSH — banding-aware gate.  LSH-vs-exact equality only
    # holds when every true pair's detection probability
    # p(J) = 1-(1-J^8)^16 is ~1; this corpus deliberately plants a
    # near-threshold population where p(J) < 1, so the correct contract
    # is: (a) found SUBSET-OF exact with matching jaccards (exact
    # verification removes every false positive), (b) zero misses in
    # the high-J regime SCALE.md's claim covers (J >= 0.9), (c) total
    # misses consistent with the banding expectation.
    cols, rows, sec = spark_run("docs_minhash_lsh")
    t = time.perf_counter()
    exact = {
        (r[0], r[1]): r[2]
        for r in duck.execute(
            oracles["docs_ngram_jaccard"]
        ).fetchall()  # doc_a, doc_b, intersection, n_a, n_b, jaccard
    }
    # ngram oracle yields (a,b,inter,n_a,n_b,j): re-key to jaccard
    exact = {
        (r[0], r[1]): r[5]
        for r in duck.execute(oracles["docs_ngram_jaccard"]).fetchall()
    }
    found = {(r[cols.index("doc_a")], r[cols.index("doc_b")]):
             r[cols.index("jaccard")] for r in rows}
    false_pos = {k: v for k, v in found.items() if k not in exact}
    value_diffs = {
        k: (found[k], exact[k])
        for k in found
        if k in exact and abs(found[k] - exact[k]) > 1e-9
    }
    missed = {k: exact[k] for k in exact if k not in found}
    p = lambda j: 1.0 - (1.0 - j**8) ** 16  # noqa: E731
    expected_misses = sum(1.0 - p(j) for j in exact.values())
    high_j_misses = {k: j for k, j in missed.items() if j >= 0.9}
    ok = (
        not false_pos
        and not value_diffs
        and not high_j_misses
        and len(missed) <= expected_misses + 5 * max(expected_misses, 1) ** 0.5
    )
    report["checks"]["docs_minhash_lsh"] = {
        "match": ok,
        "mode": "banding-aware",
        "spark_rows": len(found),
        "oracle_rows": len(exact),
        "false_positives": len(false_pos),
        "jaccard_value_diffs": len(value_diffs),
        "missed_pairs": len(missed),
        "expected_misses_from_banding": round(expected_misses, 1),
        "missed_with_jaccard_ge_090": len(high_j_misses),
        "min_missed_jaccard": round(min(missed.values()), 4) if missed else None,
        "max_missed_jaccard": round(max(missed.values()), 4) if missed else None,
        "spark_sec": sec,
        "oracle_sec": round(time.perf_counter() - t, 2),
    }
    print(f"docs_minhash_lsh: {'OK' if ok else 'MISMATCH'} "
          f"({len(found)}/{len(exact)} pairs, {len(missed)} missed "
          f"[expected ~{expected_misses:.0f} from banding], "
          f"{len(high_j_misses)} missed at J>=0.9, {len(false_pos)} false pos, "
          f"spark {sec}s)", flush=True)

    # 3: connected components — gate the DISTRIBUTED CC algorithm
    # exactly by feeding Spark's own LSH pair set into the DuckDB
    # recursive closure (decouples CC correctness from LSH recall)
    cols, rows, sec = spark_run("docs_dedup_clusters")
    t = time.perf_counter()
    duck.execute("CREATE OR REPLACE TABLE spark_pairs (doc_a BIGINT, doc_b BIGINT)")
    duck.executemany("INSERT INTO spark_pairs VALUES (?, ?)", list(found))
    res = duck.execute("""
        WITH RECURSIVE edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM spark_pairs
          UNION SELECT doc_b, doc_a FROM spark_pairs
        ),
        walk(node, comp) AS (
          SELECT src, src FROM (SELECT DISTINCT src FROM edges)
          UNION
          SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
        ),
        labels AS (SELECT node AS doc_id, MIN(comp) AS cluster_id
                   FROM walk GROUP BY node),
        csize AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                  FROM labels GROUP BY cluster_id)
        SELECT l.doc_id, l.cluster_id, c.cluster_size,
               l.doc_id = l.cluster_id AS is_canonical
        FROM labels l JOIN csize c USING (cluster_id)
    """)
    record("docs_dedup_clusters(spark-edge closure)", cols, rows, sec,
           [d[0] for d in res.description], res.fetchall(),
           round(time.perf_counter() - t, 2))

    # 4: simhash with the banded (pigeonhole-exact) oracle
    cols, rows, sec = spark_run("docs_simhash_neardup")
    t = time.perf_counter()
    res = duck.execute(SIMHASH_BANDED_ORACLE)
    record("docs_simhash_neardup", cols, rows, sec,
           [d[0] for d in res.description], res.fetchall(),
           round(time.perf_counter() - t, 2))

    # 5: semantic dedup vs numpy replication (same deterministic trainer)
    from bigdata_covid19_real_time_spark.operators.ivf import train_centroids
    from bigdata_covid19_real_time_spark.sources.batch import load_table

    cols, rows, sec = spark_run("embedding_semantic_dedup")
    t = time.perf_counter()
    emb = load_table(spark, OUT_DIR, "embeddings")
    C = np.array(train_centroids(emb, n_clusters=16, n_iters=3))
    ids, V = zip(*sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb.select("vec_id", "embedding").collect()
    ))
    V = np.vstack(V)
    # assignment replicates _cluster_expr: argmax of dot(v,c) - |c|^2/2,
    # ties toward the lower centroid id (np.argmax returns the first max)
    s = V @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
    cell = s.argmax(axis=1)
    norms = np.linalg.norm(V, axis=1)
    keep = np.ones(len(ids), dtype=bool)
    for c in range(C.shape[0]):
        members = np.where(cell == c)[0]
        Vc, nc = V[members], norms[members]
        S = Vc @ Vc.T
        denom = np.outer(nc, nc)
        with np.errstate(divide="ignore", invalid="ignore"):
            S = np.where(denom > 0, S / denom, 0.0)
        S = np.round(S + 1e-9, 6)  # the engines' shared threshold rounding
        for j in range(1, len(members)):
            if (S[:j, j] >= 0.28).any():
                keep[members[j]] = False  # lower-id near neighbor exists
    orows = [(int(ids[i]), int(cell[i]), bool(keep[i])) for i in range(len(ids))]
    record("embedding_semantic_dedup", cols, rows, sec,
           ["vec_id", "cluster", "keep"], orows,
           round(time.perf_counter() - t, 2))

    # 6: LSH ANN vs numpy exact brute force
    cols, rows, sec = spark_run("embedding_lsh_topk")
    t = time.perf_counter()
    Q = V[:10]
    S = (Q @ V.T) / np.outer(norms[:10], norms)
    orows = []
    for qi in range(10):
        s = S[qi].copy()
        s[qi] = -np.inf  # exclude self
        order = sorted(range(len(s)), key=lambda j: (-s[j], j))[:5]
        orows += [
            (int(ids[qi]), int(ids[j]), r + 1, float(np.round(s[j] + 1e-9, 6)))
            for r, j in enumerate(order)
        ]
    record("embedding_lsh_topk", cols, rows, sec,
           ["query_id", "neighbor_id", "rank", "cosine"], orows,
           round(time.perf_counter() - t, 2))

    # 7-9: ANN retrieval family recall@5 at sf1 vs numpy brute force
    # (round-3 verdict task 4).  Gates are each operator's DOCUMENTED
    # contract: IVF >= 0.6 (test_ivf_recall_against_exact's bound for
    # probing a minority of lists; here nprobe=6/16), SQ8 >= 0.8
    # (test_small_rerank_high_recall's bound for rerank_factor=4), PQ
    # report-only (test_pq_recovers_planted_clusters documents that
    # 4x16 codes on an UNSTRUCTURED gaussian corpus — exactly this one
    # — are legitimately near-chance; PQ's correctness contract is the
    # full replication oracle, green at sf0.01/sf0.1, plus the
    # clustered-data recall test).  Returned cosines are additionally
    # value-checked against numpy for IVF/SQ8 (exact-scoring paths).
    S_all = (V[:10] @ V.T) / np.outer(norms[:10], norms)

    def exact_top5(qi: int, exclude_self: bool) -> list[int]:
        s = S_all[qi].copy()
        if exclude_self:
            s[qi] = -np.inf
        return [int(ids[j]) for j in sorted(range(len(s)), key=lambda j: (-s[j], j))[:5]]

    def ann_recall(name: str, gate: float | None, check_cosine: bool) -> None:
        cols, rows, sec = spark_run(name)
        qcol, ncol = cols.index("query_id"), cols.index("neighbor_id")
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r[qcol], []).append(r)
        includes_self = any(r[ncol] == q for q, rs in by_q.items() for r in rs)
        hits = total = 0
        cosine_diffs = 0
        for q, rs in by_q.items():
            truth = set(exact_top5(int(q), exclude_self=not includes_self))
            got = {int(r[ncol]) for r in rs}
            hits += len(got & truth)
            total += len(truth)
            if check_cosine:
                ccol = cols.index("cosine")
                for r in rs:
                    true_cos = float(
                        np.round(S_all[int(q), int(r[ncol])] + 1e-9, 6)
                    )
                    if abs(float(r[ccol]) - true_cos) > 1e-6:
                        cosine_diffs += 1
        recall = round(hits / total, 3) if total else None
        ok = (gate is None or (recall is not None and recall >= gate)) and (
            cosine_diffs == 0
        )
        report["checks"][name] = {
            "match": ok,
            "mode": "recall@5 vs numpy brute force",
            "recall_at_5": recall,
            "gate": gate,
            "gate_basis": {
                "embedding_ivf_topk": "test_ivf_recall_against_exact (minority-of-lists bound)",
                "embedding_sq8_topk": "test_small_rerank_high_recall (rerank_factor=4 bound)",
                "embedding_pq_topk": "report-only: 4x16 codes on an unstructured gaussian corpus are documented near-chance (test_pq_recovers_planted_clusters); correctness gated by the replication oracle",
            }[name],
            "n_queries": len(by_q),
            "spark_rows": len(rows),
            "cosine_value_diffs": cosine_diffs if check_cosine else None,
            "spark_sec": sec,
        }
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} (recall@5 {recall}, "
            f"gate {gate}, cosine diffs {cosine_diffs if check_cosine else 'n/a'}, "
            f"spark {sec}s)",
            flush=True,
        )

    ann_recall("embedding_ivf_topk", gate=0.6, check_cosine=True)
    ann_recall("embedding_sq8_topk", gate=0.8, check_cosine=True)
    ann_recall("embedding_pq_topk", gate=None, check_cosine=False)

    # 10: PQ recall ON ITS CONTRACT REGIME at sf1 scale — a 20k-vector
    # CLUSTERED corpus (the data PQ exists for; the gaussian corpus
    # above is its documented near-chance regime).  64 prototypes with
    # small perturbations, queries drawn from distinct prototypes; the
    # gate mirrors test_pq_recovers_planted_clusters (recall >= 0.8)
    # at 300x that test's corpus size.  IVF-PQ (the composed operator)
    # is checked on the same corpus with the same gate.
    t = time.perf_counter()
    from pyspark.sql import Row

    from bigdata_covid19_real_time_spark.operators.ivf import train_centroids as _tc
    from bigdata_covid19_real_time_spark.operators.ivfpq import ivfpq_topk
    from bigdata_covid19_real_time_spark.operators.pq import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    dim, n_proto, n_cl = 64, 64, 20_000
    crng = np.random.default_rng(77)
    protos = crng.standard_normal((n_proto, dim))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    assign_p = crng.integers(0, n_proto, n_cl)
    CV = protos[assign_p] + 0.05 * crng.standard_normal((n_cl, dim))
    CV /= np.linalg.norm(CV, axis=1, keepdims=True)
    cemb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in CV[i]]) for i in range(n_cl)]
    ).repartition(32).persist()
    books = train_pq_codebooks(cemb, m=4, k=16, n_iters=2)
    codes = pq_encode(cemb, books)
    from pyspark.sql import functions as SF

    cqueries = cemb.filter(SF.col("vec_id") < 10)
    norms_c = np.linalg.norm(CV, axis=1)
    S_c = (CV[:10] @ CV.T) / np.outer(norms_c[:10], norms_c)

    # Metric note: on this corpus every cluster holds ~312 vectors whose
    # 4x16 PQ codes are IDENTICAL (the 0.05 perturbation is below the
    # quantizer's resolution), so ADC scores tie across the whole
    # cluster and identity-recall@5 is ill-posed — any 5 of ~312 tied
    # candidates is an equally correct ADC answer (chance level 5/312
    # ~= 0.016, which is exactly what identity recall measures here).
    # The standard ANN metric under ties is epsilon-quality-recall
    # (ann-benchmarks' distance-ratio variant): a returned neighbor
    # counts if its TRUE cosine is within eps of the query's 5th-best
    # true cosine.  eps=0.05 cleanly separates same-prototype neighbors
    # (cosine ~0.998) from cross-prototype ones (|cosine| <~ 0.4 for
    # random 64-dim prototypes).  Identity recall stays in the report.
    EPS = 0.05

    def clustered_recall(result_rows, cols) -> tuple[float, float]:
        qcol, ncol = cols.index("query_id"), cols.index("neighbor_id")
        by_q: dict[int, set] = {}
        for r in result_rows:
            by_q.setdefault(int(r[qcol]), set()).add(int(r[ncol]))
        id_hits = q_hits = total = 0
        for q, got in by_q.items():
            s = S_c[q].copy()
            s[q] = -np.inf
            order = sorted(range(n_cl), key=lambda j: (-s[j], j))
            truth = set(order[:5])
            kth_best = s[order[4]]
            id_hits += len(got & truth)
            q_hits += sum(1 for j in got if s[j] >= kth_best - EPS)
            total += 5
        if not total:
            return 0.0, 0.0
        return round(id_hits / total, 3), round(q_hits / total, 3)

    # PQ-ALONE ranks by ADC only and is REPORT-ONLY here: a numpy
    # replication of the deterministic trainer (validated — it
    # reproduces the Spark 4x16 figure exactly) sweeps k in {16, 64,
    # 256} and iters in {2..10}: quality@5 plateaus at 0.68-0.72 for
    # k<=64 and 0.92-0.94 at k=256 — the 4-subspace ADC resolution
    # bound, not a trainer or implementation defect.  This is the
    # architectural reason FAISS pairs IVFPQ with a rerank: the
    # composed operator below, with the SAME 4x16 codes, restores
    # quality@5 = 1.0 and carries the gate.
    pq_res = pq_topk(codes, cqueries, books, k_top=5)
    pq_id, pq_q = clustered_recall(
        [tuple(r) for r in pq_res.collect()], pq_res.columns
    )
    cents = _tc(cemb, n_clusters=16, n_iters=3)
    ivfpq_res = ivfpq_topk(cemb, cqueries, cents, books, k=5, nprobe=6, rerank_factor=4)
    ivfpq_id, ivfpq_q = clustered_recall(
        [tuple(r) for r in ivfpq_res.collect()], ivfpq_res.columns
    )
    spark.catalog.clearCache()
    sec = round(time.perf_counter() - t, 2)
    for name, id_rec, q_rec, gate, cfg in (
        ("pq_clustered_recall", pq_id, pq_q, None,
         "4x16 codebooks, ADC-only ranking — report-only: the validated "
         "numpy trainer replication sweeps k in {16,64,256} x iters "
         "{2..10} and quality@5 plateaus at 0.68-0.72 (k<=64) / "
         "0.92-0.94 (k=256), the 4-subspace ADC resolution bound; "
         "rerank-bearing retrievers (SQ8, IVF, IVF-PQ) carry the gates"),
        ("ivfpq_clustered_recall", ivfpq_id, ivfpq_q, 0.95,
         "4x16 codebooks + nprobe=6/16 cells + rerank_factor=4 "
         "full-precision rerank (the SAME codes PQ-alone degrades on; "
         "the rerank stage restores quality — the architectural claim)"),
    ):
        ok = True if gate is None else q_rec >= gate
        report["checks"][name] = {
            "match": ok,
            "mode": "eps-quality recall@5 vs numpy brute force, "
                    "20k-vector clustered corpus",
            "config": cfg,
            "quality_recall_at_5": q_rec,
            "identity_recall_at_5": id_rec,
            "eps": EPS,
            "gate": gate,
            "gate_basis": "returned neighbors within eps of the true 5th-best "
                          "cosine; identity recall is ill-posed under "
                          "whole-cluster ADC code ties (~312-way, chance 0.016)",
            "spark_sec": sec,
        }
        print(f"{name}: {'OK' if ok else 'MISMATCH'} (quality@5 {q_rec}, "
              f"identity@5 {id_rec}, gate {gate})", flush=True)

    out = os.path.join(REPO, "SF1CHECK.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    fails = sum(not c["match"] for c in report["checks"].values())
    print(f"wrote {out}: {fails} mismatches / {len(report['checks'])} checks")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
