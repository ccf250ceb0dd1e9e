"""The end-to-end curation waterfall: one query that runs a document
corpus through the full training-data curation pipeline — quality
filter, exact dedup, near-dup cluster resolution, eval-holdout
exclusion, benchmark decontamination — and reports the per-stage
survivor table (docs, tokens, fraction) that corpus-curation runs
publish before anyone trains on the output.

Every stage composes an operator that is individually oracle-certified
(`quality_filter`, `docs_exact_dedup`'s min-id-per-content policy,
`minhash_lsh_pairs` + `dedup_clusters`, `contamination_report`); this
query certifies the COMPOSITION: each stage filters the previous
stage's survivors, so a disagreement anywhere in the chain shifts
every downstream count.

Scale notes (100 TB): the corpus rides exactly ONE shuffle — the
doc_id join that attaches the per-doc verdicts to build the persisted
flags frame all stages share.  Exact-content grouping runs on a
NARROW ``(md5, doc_id, keep)`` projection (~40-byte shuffle rows; a
second pruned column scan is disk-local, an all-to-all shuffle of
the text is not).  The near-dup and decontam stages run the certified
banded/broadcast machinery on the shrinking survivor sets; the
eliminated-id sets re-enter as plain id joins with NO broadcast
hints — near-dup losers can be a third of a web corpus, so AQE
decides (broadcast when small, 8-byte sort-merge when not).  The
final report is ONE aggregation producing six rows — no per-stage
rescans of the corpus.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.components import dedup_clusters
from bigdata_covid19_real_time_spark.operators.decontam import (
    contamination_report,
)
from bigdata_covid19_real_time_spark.operators.minhash import minhash_lsh_pairs
from bigdata_covid19_real_time_spark.operators.quality import quality_filter
from bigdata_covid19_real_time_spark.plans.extensions import (
    _QUALITY_FLAGGED_CTES,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Jaccard threshold for the near-dup stage — the same 0.6 the
#: certified `docs_dedup_clusters` gate uses.
NEARDUP_THRESHOLD = 0.6

#: A training doc sharing >= this fraction of its 5-gram set with the
#: eval holdout is dropped.  The synthetic corpus' contamination is
#: bimodal (injected cross-source near-dups sit far above 0.2, clean
#: docs at ~0), so the gate is insensitive to the exact cut.
CONTAMINATION_MAX = 0.2

_STAGES = [
    "total",
    "quality_filter",
    "exact_dedup",
    "near_dedup",
    "holdout_removed",
    "decontaminated",
]

# The oracle replays the whole pipeline as one chained-CTE program:
# survivor CTEs are MATERIALIZED because each is referenced twice
# (stage stats + the next stage) and DuckDB inlines CTEs per reference
# (exponential expansion otherwise).  The near-dup stage recomputes
# TRUE 3-shingle Jaccard >= 0.6 pairs + recursive-CTE connected
# components among stage-2 survivors — the exact semantics the LSH
# path approximates with certified-complete recall at gate SFs.
_WATERFALL_ORACLE = f"""
    WITH RECURSIVE {_QUALITY_FLAGGED_CTES},
    s1 AS MATERIALIZED (
      SELECT d.doc_id, d.source, d.text
      FROM documents d JOIN flagged f USING (doc_id)
      WHERE len(f.r) = 0
    ),
    ex AS (SELECT MIN(doc_id) AS doc_id FROM s1 GROUP BY text),
    s2 AS MATERIALIZED (SELECT s1.* FROM s1 JOIN ex USING (doc_id)),
    toks2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM s2),
    sh2 AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] AS shingle
      FROM toks2, unnest(range(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS da, y.doc_id AS db, COUNT(*) AS i
      FROM sh2 x JOIN sh2 y USING (shingle)
      WHERE x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT da, db
      FROM inter
      JOIN sizes sa ON sa.doc_id = da
      JOIN sizes sb ON sb.doc_id = db
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {NEARDUP_THRESHOLD}
    ),
    edges AS (SELECT da AS src, db AS dst FROM pairs
              UNION SELECT db, da FROM pairs),
    walk(node, comp) AS (
      SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
    ),
    labels AS (SELECT node AS doc_id, MIN(comp) AS cluster_id
               FROM walk GROUP BY node),
    noncanon AS (SELECT doc_id FROM labels WHERE doc_id != cluster_id),
    s3 AS MATERIALIZED (
      SELECT * FROM s2
      WHERE doc_id NOT IN (SELECT doc_id FROM noncanon)
    ),
    s4 AS MATERIALIZED (SELECT * FROM s3 WHERE source != 'src0'),
    tokse AS (SELECT string_split(text, ' ') AS t
              FROM documents WHERE source = 'src0'),
    she AS (
      SELECT DISTINCT t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] || ' '
             || t[u.i+3] || ' ' || t[u.i+4] AS shingle
      FROM tokse, unnest(range(1, len(t) - 3)) AS u(i)
      WHERE len(t) >= 5
    ),
    toks4 AS (SELECT doc_id, string_split(text, ' ') AS t FROM s4),
    sh4 AS (
      SELECT DISTINCT doc_id,
             t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] || ' '
             || t[u.i+3] || ' ' || t[u.i+4] AS shingle
      FROM toks4, unnest(range(1, len(t) - 3)) AS u(i)
      WHERE len(t) >= 5
    ),
    n4 AS (SELECT doc_id, COUNT(*) AS n_set FROM sh4 GROUP BY doc_id),
    hits AS (SELECT s.doc_id, COUNT(*) AS hit
             FROM sh4 s JOIN she USING (shingle) GROUP BY s.doc_id),
    contaminated AS (
      SELECT n4.doc_id FROM n4 LEFT JOIN hits USING (doc_id)
      WHERE COALESCE(hit, 0) * 1.0 / n_set >= {CONTAMINATION_MAX}
    ),
    s5 AS MATERIALIZED (
      SELECT * FROM s4
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    tot AS (SELECT COUNT(*) AS t FROM documents),
    stats AS (
      SELECT 0 AS stage_idx, 'total' AS stage, COUNT(*) AS n,
             SUM(len(string_split(text, ' '))) AS tok FROM documents
      UNION ALL SELECT 1, 'quality_filter', COUNT(*),
             SUM(len(string_split(text, ' '))) FROM s1
      UNION ALL SELECT 2, 'exact_dedup', COUNT(*),
             SUM(len(string_split(text, ' '))) FROM s2
      UNION ALL SELECT 3, 'near_dedup', COUNT(*),
             SUM(len(string_split(text, ' '))) FROM s3
      UNION ALL SELECT 4, 'holdout_removed', COUNT(*),
             SUM(len(string_split(text, ' '))) FROM s4
      UNION ALL SELECT 5, 'decontaminated', COUNT(*),
             SUM(len(string_split(text, ' '))) FROM s5
    )
    SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
           CAST(n AS BIGINT) AS n_docs, CAST(tok AS BIGINT) AS n_tokens,
           ROUND(n * 1.0 / t + 1e-9, 6) AS frac_docs
    FROM stats, tot
"""


@query("docs_curation_waterfall", oracle=_WATERFALL_ORACLE)
def docs_curation_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation-pipeline waterfall — six stage rows of
    ``(stage_idx, stage, n_docs, n_tokens, frac_docs)``.

    Stage semantics (each applied to the previous stage's survivors):

    1. ``quality_filter`` — the certified five-rule keep/drop.
    2. ``exact_dedup`` — keep the min doc_id per exact content group.
    3. ``near_dedup``  — MinHash-LSH pairs at Jaccard >= 0.6, exact
       verified, connected components, keep the min-id canonical per
       cluster (``docs_dedup_clusters`` policy).
    4. ``holdout_removed`` — the eval holdout source (``src0``) leaves
       the training corpus.
    5. ``decontaminated`` — drop survivors sharing >= 20% of their
       5-gram set with the holdout (``contamination_report``).

    Physical shape: one persisted flags frame (quality verdict +
    exact-loser flag derived from a narrow md5-fingerprint pipeline)
    feeds every stage; per-doc elimination id sets re-enter as plain
    doc_id joins (AQE broadcasts them at these SFs); the six report
    rows come from ONE conditional aggregation, materialized eagerly
    (bounded at 12 values by construction) so the persisted flags
    frame is unpersisted before this function returns, and returned as
    a JVM-literal plan.  Cache lifecycle: flags is function-owned and
    released; the composed operators' internal persists are
    CacheManager-deduped by plan equality, so repeated invocations
    reuse rather than accumulate them (no-growth test), with final
    cleanup on the looping caller per those operators' documented
    contract.

    Subset composition is sound for the LSH stage: MinHash signatures
    and band collisions are per-document (seeded identically), so
    running on the filtered survivor set finds exactly the certified
    all-docs pairs restricted to survivors (bucket caps only ever
    relax on a subset).

    Oracle-contract caveat (shared with `docs_dedup_clusters` /
    `docs_minhash_lsh`, certified under the same contract): the oracle
    computes EXACT Jaccard >= 0.6 while the Spark side generates
    candidates with banded LSH (B=16, R=8; S-curve knee ~0.71), so a
    corpus whose near-dup pairs sit in the ~[0.6, 0.75) boundary band
    would be probabilistically under-paired on the Spark side only.
    The gate corpora are bimodal (injected near-dups at J ~= 0.8-1.0,
    everything else far below threshold), which is what makes the
    exact-recall equivalence hold at every gate SF.

    Plan-audit note: the STATIC plan repeats the quality-verdict
    subtree (both the fingerprint pipeline and the flags frame join
    ``kept``) and prints the hint-free id joins as sort-merge, so the
    static exchange count reads high; at runtime AQE ReuseExchange
    dedups the identical verdict subplan and broadcast-converts the
    small id joins — measured fresh-JVM: this narrow-fingerprint form
    runs ~8% FASTER than the window variant it replaced while keeping
    text off the content shuffle.
    """
    # Round-14 note: a scale-adaptive fan-out of this scan was tried and
    # REVERTED — the waterfall references `docs` from several broadcast
    # build sides (kept, gmin, exact_losers, the eval holdout), and each
    # build-side plan re-ran the repartition shuffle, turning one cheap
    # single-task scan per subtree into a 32-task exchange per subtree
    # (interleaved A/B: 2.3-3.6x SLOWER).  The one-shuffle flags design
    # below is the right shape; the composed LSH/decontam operators'
    # fan-outs stay no-ops here via fan_out_scan's scan-shaped guard.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    kept = quality_filter(docs).select("doc_id", "keep")
    # exact-dedup losers from a NARROW fingerprint projection: the
    # (md5, doc_id, keep) pipeline shuffles ~40-byte rows, so document
    # text never rides the content-grouping shuffle (a second pruned
    # column scan is disk-local; an all-to-all shuffle of the same
    # bytes is not — the repo-wide "documents never ride a shuffle"
    # rule, SCALE.md)
    fp = docs.select("doc_id", F.md5("text").alias("fp")).join(kept, "doc_id")
    gmin = (
        fp.filter(F.col("keep"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("min_kept_id"))
    )
    exact_losers = (
        fp.join(gmin, "fp")
        .filter(F.col("keep") & (F.col("doc_id") != F.col("min_kept_id")))
        .select("doc_id")
        .withColumn("exact_loser", F.lit(True))
    )
    flags = (
        # LEFT join + keep=false default: quality_filter emits no row
        # for docs whose token array is empty/NULL (its explode paths
        # drop them), but the report's 'total' row must count EVERY
        # corpus row exactly like the oracle's unconditional COUNT(*)
        # — such docs are quality-eliminated, never invisible
        docs.join(kept, "doc_id", "left")
        .withColumn("keep", F.coalesce("keep", F.lit(False)))
        .join(exact_losers, "doc_id", "left")
        .withColumn("tok", F.size(F.split("text", " ")))
        # persisted: the near-dup stage, the decontam stage, and the
        # final report all read this frame with different downstream
        # shapes (shingle explodes vs one agg) — no exchange to reuse.
        # This verdict join is the ONE shuffle the corpus rides.
        .persist()
    )
    s2 = flags.filter(
        F.col("keep") & ~F.coalesce("exact_loser", F.lit(False))
    )

    # No broadcast hints on the eliminated-id sets: near-dup losers can
    # be a third of a web-scale corpus, so a forced broadcast is the
    # 100 TB hazard — AQE broadcasts them when they are actually small
    # (they are, at every gate SF) and sort-merges on the 8-byte id
    # against the persisted flags frame otherwise.
    noncanon = (
        dedup_clusters(minhash_lsh_pairs(s2, threshold=NEARDUP_THRESHOLD))
        .filter(~F.col("is_canonical"))
        .select("doc_id")
        .withColumn("near_dup", F.lit(True))
    )
    s4 = s2.join(noncanon.select("doc_id"), "doc_id", "left_anti").filter(
        F.col("source") != "src0"
    )

    contaminated = (
        contamination_report(
            s4, docs.filter(F.col("source") == "src0"), n=5
        )
        .filter(F.col("contamination_frac") >= CONTAMINATION_MAX)
        .select("doc_id")
        .withColumn("contam", F.lit(True))
    )

    elim = (
        flags.join(noncanon, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .withColumn(
            "elim",
            F.when(~F.col("keep"), F.lit(1))
            .when(F.coalesce("exact_loser", F.lit(False)), F.lit(2))
            .when(F.coalesce("near_dup", F.lit(False)), F.lit(3))
            .when(F.col("source") == "src0", F.lit(4))
            .when(F.coalesce("contam", F.lit(False)), F.lit(5))
            .otherwise(F.lit(6)),
        )
    )
    agg = elim.agg(
        *[
            F.sum((F.col("elim") > k).cast("long")).alias(f"n{k}")
            for k in range(6)
        ],
        *[
            F.sum(F.when(F.col("elim") > k, F.col("tok")).otherwise(0)).alias(
                f"t{k}"
            )
            for k in range(6)
        ],
    )
    # Materialize the single 12-column stage-count row NOW so the
    # persisted flags frame can be released before returning: the
    # report is 6 rows by construction, and a lazy return would leave
    # `flags` cached for the caller to leak (round-6 review).  The
    # result re-enters as a JVM-literal plan (explode-over-struct-array
    # — never createDataFrame, which re-ships pickled rows per action)
    # with frac_docs computed by the same stable_round expression the
    # oracle mirrors.
    # Release flags through the DataFrame API (CacheManager-aware —
    # unpersisting the underlying RDDs directly would leave a stale
    # CacheManager entry that a later plan-equal invocation reuses over
    # destroyed blocks; observed as Spark's UnsafeInMemorySorter NPE on
    # back-to-back runs), and release it on the ERROR path too: if the
    # eager collect throws (executor loss, scratch-table read fault),
    # an unguarded flow would leak the persisted frame into the shared
    # session for its lifetime — the exact leak class the eager
    # rewrite was built to close.  The frames the composed
    # LSH/CC/decontam operators persist internally are deliberately
    # NOT swept here: CacheManager dedups them by plan equality, so
    # repeated same-args invocations REUSE rather than accumulate them
    # (pinned by the no-growth test), and their documented contract
    # already assigns cleanup to looping callers (bench/selfcheck
    # clearCache between queries).
    try:
        [counts] = agg.collect()
    finally:
        flags.unpersist(True)
    # empty corpus: the conditional SUMs come back NULL, but the
    # report's doc counts are true zeros (the oracle's COUNT(*) says
    # 0); token sums stay NULL on both engines (SUM over nothing)
    n_vals = {k: counts[f"n{k}"] if counts[f"n{k}"] is not None else 0
              for k in range(6)}
    tot = F.lit(n_vals[0]).cast("long")
    report = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("stage_idx"),
                        F.lit(_STAGES[k]).alias("stage"),
                        F.lit(n_vals[k]).cast("long").alias("n_docs"),
                        F.lit(counts[f"t{k}"]).cast("long").alias("n_tokens"),
                    )
                    for k in range(6)
                ]
            )
        ).alias("s")
    )
    return report.select(
        "s.stage_idx",
        "s.stage",
        "s.n_docs",
        "s.n_tokens",
        # tot = 0 on an empty corpus: ANSI division would raise and the
        # oracle's n/0 is NULL — guard to match (r7 empty sweep)
        stable_round(
            F.when(tot > 0, F.col("s.n_docs") * F.lit(1.0) / tot), 6
        ).alias("frac_docs"),
    )
