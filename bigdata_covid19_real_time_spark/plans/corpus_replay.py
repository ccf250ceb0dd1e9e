"""Driver gate for the streaming incremental corpus builder.

``streaming/corpus.py:CorpusIngest`` is the engine's continuous
training-corpus pipeline — quality gate, exact within-batch and
against-corpus dedup, and the incremental MinHash-LSH near-dup screen
whose persistent ``bands`` index makes near-dedup O(batch), not
O(corpus), per epoch.  Through round 5 it was test-gated only (no
(spark, sf_dir) query shape), the last such family after the
state-store replays landed.

``docs_corpus_ingest_replay`` closes it the same way
``plans/state_replay.py`` closed the stateful family: the documents
table splits into two deterministic epochs (``doc_id % 2``) and each
epoch runs through the REAL ``CorpusIngest.process_batch`` — the exact
``foreachBatch`` entry point of the streaming pipeline, writing real
epoch-partitioned accepted/rejected/bands tables into a scratch
directory with the idempotent sink — then the accumulated audit tables
are read back as the per-document verdict.  A green driver row
therefore certifies the cross-epoch semantics end to end: history
fingerprints exclude the current epoch, the persistent band index
accumulates only accepted docs, and the rejection audit accounts for
every input row exactly once.

The oracle unrolls the four epochs as chained CTEs over fragments
individually certified by sibling queries: the quality gate
(`docs_quality_filter` / `docs_corpus_ingest_verdict` CTEs), the
normalized-text fingerprint stand-in for xxhash64 (equal hash iff
equal normalized text), and DISTINCT hashed 3-gram shingle Jaccard
(`docs_incremental_dedup` / `docs_ngram_jaccard`).  The LSH screen is
oracled by its exact-Jaccard equivalence, the same certified argument
the registered LSH queries use: candidates are exact-verified, and
with ``bands=32`` (rows-per-band 4) the per-pair miss probability at
the corpus's planted similarity ~0.9 is (1 - 0.9^4)^32 ~= 1.5e-15 —
recall 1 to machine precision at every test SF — while the corpus has
no pairs in the (0.6, 0.85) band-curve gray zone (bimodal by
construction: planted ~0.9, background < 0.1; `docs_ngram_jaccard`'s
exact oracle pins that).

Scale: identical shapes to the streaming deployment — the gate is
narrow, exact dedup shuffles 8-byte fingerprints, the band join ships
16-byte rows against the persistent index, and exact verification
touches |candidates|, never |corpus|.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query
from bigdata_covid19_real_time_spark.sources.batch import load_table

#: Replay epochs (doc_id % N_EPOCHS) and the near-dup screen config.
#: bands=32 over 128 permutations -> 4 rows/band: the recall-certain
#: regime for the planted ~0.9 similarity (see module docstring).
#: Two epochs exercise every incremental mechanism exactly once
#: (within-batch gates, history fingerprints, persistent band index,
#: cross-epoch near-dup, epoch exclusion) at half the fixed per-epoch
#: pipeline cost of more epochs — the replay is a certification
#: harness, and its cost is ~all fixed job overhead, not data.
N_EPOCHS = 2
NEAR_THRESHOLD = 0.6
LSH_BANDS = 32

#: Shared SQL fragments: quality keepers + normalized fingerprint +
#: DISTINCT 3-gram shingles, each the certified form from sibling
#: oracles (extensions._QUALITY_FLAGGED_CTES etc.).
_BASE_CTES = f"""toks AS MATERIALIZED (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
    uc AS MATERIALIZED (
      SELECT doc_id, t[u.i] AS g, COUNT(*) AS c
      FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
      GROUP BY 1, 2
    ),
    um AS MATERIALIZED (
      SELECT doc_id, SUM(c) AS tok_total, COUNT(*) AS tok_distinct,
             MAX(c) AS tok_top
      FROM uc GROUP BY 1
    ),
    bc AS MATERIALIZED (
      SELECT doc_id, t[u.i] || ' ' || t[u.i+1] AS g, COUNT(*) AS c
      FROM toks, unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
      GROUP BY 1, 2
    ),
    bm AS MATERIALIZED (SELECT doc_id, SUM(c) AS bg_total, MAX(c) AS bg_top FROM bc GROUP BY 1),
    sig AS MATERIALIZED (
      SELECT um.doc_id,
             tok_total AS token_count,
             tok_distinct * 1.0 / tok_total AS ttr,
             tok_top * 1.0 / tok_total AS top_token_frac,
             CASE WHEN COALESCE(bg_total, 0) > 0
                  THEN bg_top * 1.0 / bg_total ELSE 0.0 END AS top_bigram_frac,
             length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) * 1.0
               / length(d.text) AS alpha_ratio
      FROM um
      LEFT JOIN bm USING (doc_id)
      JOIN toks d ON d.doc_id = um.doc_id
    ),
    flagged AS MATERIALIZED (
      SELECT *,
             list_filter([
               CASE WHEN alpha_ratio < 0.5 THEN 'low_alpha' END,
               CASE WHEN ttr < 0.35 THEN 'low_ttr' END,
               CASE WHEN top_bigram_frac > 0.07 THEN 'repetitive_bigrams' END,
               CASE WHEN token_count < 25 THEN 'too_few_tokens' END,
               CASE WHEN token_count > 100000 THEN 'too_many_tokens' END
             ], x -> x IS NOT NULL) AS r
      FROM sig
    ),
    v AS MATERIALIZED (
      SELECT doc_id, len(r) = 0 AS keep,
             COALESCE(array_to_string(r, ','), '') AS reasons
      FROM flagged
    ),
    keepers AS MATERIALIZED (
      SELECT d.doc_id, d.doc_id % {N_EPOCHS} AS ep,
             lower(regexp_replace(trim(d.text), '\\s+', ' ', 'g')) AS fp
      FROM documents d JOIN v USING (doc_id) WHERE v.keep
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT k.doc_id, t.t[u.i] || ' ' || t.t[u.i+1] || ' ' || t.t[u.i+2] AS s
      FROM keepers k JOIN toks t USING (doc_id), unnest(range(1, len(t.t) - 1)) AS u(i)
      WHERE len(t.t) >= 3
    ),
    sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    near AS MATERIALIZED (
      -- every J >= 0.6 pair among quality keepers, BOTH directions
      SELECT i.a, i.b FROM (
        SELECT sa.doc_id AS a, sb.doc_id AS b, COUNT(*) AS i,
               za.n AS na, zb.n AS nb
        FROM sh sa JOIN sh sb USING (s)
        JOIN sz za ON za.doc_id = sa.doc_id
        JOIN sz zb ON zb.doc_id = sb.doc_id
        WHERE sa.doc_id <> sb.doc_id
        GROUP BY 1, 2, za.n, zb.n
      ) i
      WHERE i.i * 1.0 / (i.na + i.nb - i.i) >= 0.6
    )"""


def _epoch_ctes(e: int) -> str:
    """The per-epoch decision cascade, chained on accepted_{e-1}:
    exact in-batch (min-id per fingerprint) -> exact vs corpus
    (fingerprint in accepted history) -> near in-batch (smaller
    verified partner alive in this batch) -> near vs corpus (verified
    partner in accepted history)."""
    prev = f"accepted_{e - 1}"
    hist_fp = (
        f"SELECT fp FROM {prev}"
        if e > 0
        else "SELECT NULL AS fp WHERE FALSE"
    )
    hist_ids = (
        f"SELECT doc_id FROM {prev}"
        if e > 0
        else "SELECT NULL AS doc_id WHERE FALSE"
    )
    return f""",
    b1_{e} AS MATERIALIZED (
      SELECT k.doc_id, k.fp,
             k.doc_id = MIN(k.doc_id) OVER (PARTITION BY k.fp) AS canon
      FROM keepers k WHERE k.ep = {e}
    ),
    b2_{e} AS MATERIALIZED (
      SELECT doc_id, fp,
             fp NOT IN ({hist_fp}) AS fresh
      FROM b1_{e} WHERE canon
    ),
    b3_{e} AS MATERIALIZED (
      SELECT s.doc_id, s.fp,
             NOT EXISTS (
               SELECT 1 FROM near n
               JOIN b2_{e} p ON p.doc_id = n.a AND p.fresh
               WHERE n.b = s.doc_id AND n.a < s.doc_id
             ) AS no_batch_near
      FROM b2_{e} s WHERE s.fresh
    ),
    b4_{e} AS MATERIALIZED (
      SELECT s.doc_id, s.fp,
             NOT EXISTS (
               SELECT 1 FROM near n
               WHERE n.b = s.doc_id AND n.a IN ({hist_ids})
             ) AS no_corpus_near
      FROM b3_{e} s WHERE s.no_batch_near
    ),
    accepted_{e} AS MATERIALIZED (
      {"SELECT doc_id, fp FROM " + prev + " UNION ALL " if e > 0 else ""}
      SELECT doc_id, fp FROM b4_{e} WHERE no_corpus_near
    )"""


def _verdict_select(e: int) -> str:
    return f"""
    SELECT doc_id, CAST({e} AS BIGINT) AS epoch, 'rejected' AS status,
           'quality:' || v.reasons AS reason
    FROM v JOIN documents USING (doc_id)
    WHERE NOT v.keep AND doc_id % {N_EPOCHS} = {e}
    UNION ALL
    -- NULL-text docs never enter toks/v (string_split(NULL) unnests to
    -- nothing) but CorpusIngest.process_batch audits them as
    -- 'unparseable' rejects — mirror that branch so every wire row is
    -- accounted for on both sides
    SELECT doc_id, {e}, 'rejected', 'unparseable'
    FROM documents WHERE text IS NULL AND doc_id % {N_EPOCHS} = {e}
    UNION ALL
    SELECT doc_id, {e}, 'rejected', 'duplicate_in_batch'
    FROM b1_{e} WHERE NOT canon
    UNION ALL
    SELECT doc_id, {e}, 'rejected', 'duplicate_of_corpus'
    FROM b2_{e} WHERE NOT fresh
    UNION ALL
    SELECT doc_id, {e}, 'rejected', 'near_duplicate_in_batch'
    FROM b3_{e} WHERE NOT no_batch_near
    UNION ALL
    SELECT doc_id, {e}, 'rejected', 'near_duplicate_of_corpus'
    FROM b4_{e} WHERE NOT no_corpus_near
    UNION ALL
    SELECT doc_id, {e}, 'accepted', ''
    FROM b4_{e} WHERE no_corpus_near"""


_ORACLE = (
    "WITH "
    + _BASE_CTES
    + "".join(_epoch_ctes(e) for e in range(N_EPOCHS))
    + "\n"
    + "\n    UNION ALL".join(_verdict_select(e) for e in range(N_EPOCHS))
)


@query("docs_corpus_ingest_replay", oracle=_ORACLE)
def docs_corpus_ingest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``N_EPOCHS``-epoch (two-epoch) replay of the streaming corpus
    builder (module docstring): each ``doc_id % N_EPOCHS`` slice runs
    through the real
    ``CorpusIngest.process_batch`` with the near-dup screen on, against
    real epoch-partitioned scratch tables; the verdict frame read back
    from the accepted/rejected audit is the result — one row per
    document, ``(doc_id, epoch, status, reason)``."""
    from bigdata_covid19_real_time_spark.plans.lakehouse_twins import (
        _scratch_dir,
    )
    from bigdata_covid19_real_time_spark.streaming.corpus import CorpusIngest

    base = _scratch_dir("corpus_replay_")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "text",
        "lang",
        "source",
    )
    ingest = CorpusIngest(
        base, near_dup_threshold=NEAR_THRESHOLD, bands=LSH_BANDS
    )
    # Replay-harness capacity pin (SCALE.md lesson 8, same pattern as
    # plans/stream_replay.py): each epoch chains ~10 shuffle stages
    # (quality grams, fingerprint window, history joins, LSH bands)
    # over a per-epoch slice of a gate-SF corpus, so per-task overhead
    # dominates at the session's 32 partitions.  Pinning 8 measured
    # 0.873x under the r7 two-sample fresh-JVM interleaved standard
    # with non-overlapping arms (BENCH_ISOLATED_r12.json).  The pin is
    # a CAP, never a raise (round-12 advice #4): min(8, session) keeps
    # PARTCHECK's low-parallelism sweep exercising this loop at ITS
    # partition count instead of silently re-widening to 8, while the
    # driver gate (stock 200) and bench (32) still run the adjudicated
    # 8.  The production path (CorpusIngest.run / foreachBatch)
    # inherits the session conf — partition count there is the
    # deployment's capacity decision, not this harness's.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # A non-numeric session value (e.g. "auto" on AQE-managed
    # deployments) is left COMPLETELY untouched — no pin, no restore:
    # pinning 8 there could be a RAISE, contradicting the cap-only
    # contract (round-13 advice #2).
    pinned = str(prev_sp).isdigit()
    if pinned:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(8, int(prev_sp)))
        )
    try:
        for e in range(N_EPOCHS):
            batch = docs.filter(
                F.col("doc_id").cast("long") % N_EPOCHS == e
            )
            ingest.process_batch(batch, e)
    finally:
        if pinned:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)

    import glob as _glob

    def _audit(table: str, status: str, reason_col) -> DataFrame:
        # an EMPTY corpus writes no files at all (the idempotent sink's
        # dynamic partition overwrite emits nothing) — the verdict for
        # zero wire rows is zero rows, not a schema-inference error
        if not _glob.glob(f"{base}/{table}/epoch=*"):
            return spark.createDataFrame(
                [], "doc_id long, epoch long, status string, reason string"
            )
        return spark.read.parquet(f"{base}/{table}").select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("epoch").cast("long").alias("epoch"),
            F.lit(status).alias("status"),
            reason_col.alias("reason"),
        )

    return _audit("accepted", "accepted", F.lit("")).unionByName(
        _audit("rejected", "rejected", F.col("reason"))
    )
