"""Streaming corpus builder: quality gate + batch/corpus dedup +
idempotent epoch partitions + checkpoint restart."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.streaming.corpus import CorpusIngest

GOOD = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
    "akron bolton casper delphi erie fresno galway hobart ithaca juneau"
)
GOOD2 = GOOD.replace("alpha", "anchor").replace("sigma", "summit")


def _doc(doc_id, text, lang="en", source="s1"):
    return json.dumps(
        {"doc_id": str(doc_id), "text": text, "lang": lang, "source": source}
    )


def _write_batch(path, lines):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines) + "\n")


def test_corpus_ingest_end_to_end(spark, tmp_path):
    inp = tmp_path / "in"
    base = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two good docs, one in-batch exact dup, one too-short doc
    _write_batch(
        inp / "b1.jsonl",
        [
            _doc(1, GOOD),
            _doc(2, GOOD2),
            _doc(3, GOOD),  # same text as doc 1 -> duplicate_in_batch
            _doc(4, "tiny doc"),  # quality reject
        ],
    )
    # batch 2: dup of an accepted doc, plus one genuinely new doc
    _write_batch(
        inp / "b2.jsonl",
        [
            _doc(5, GOOD),  # duplicate_of_corpus (doc 1 accepted in epoch 0)
            _doc(6, GOOD2.replace("beta", "border")),
        ],
    )

    ingest = CorpusIngest(base)
    q = ingest.run(spark, str(inp), ckpt, available_now=True)
    q.awaitTermination(120)

    accepted = spark.read.parquet(f"{base}/accepted")
    rejected = spark.read.parquet(f"{base}/rejected")
    acc = {r.doc_id: r for r in accepted.collect()}
    rej = {r.doc_id: r.reason for r in rejected.collect()}

    assert set(acc) == {1, 2, 6}
    assert rej[3] == "duplicate_in_batch"
    assert rej[5] == "duplicate_of_corpus"
    assert rej[4].startswith("quality:") and "too_few_tokens" in rej[4]
    # one file per trigger -> docs 1/2 in epoch 0, doc 6 in epoch 1
    assert acc[1].epoch == 0 and acc[6].epoch == 1
    # fingerprint column is the 8-byte dedup key, present and non-null
    assert accepted.filter(F.col("fingerprint").isNull()).count() == 0

    # restart from the same checkpoint with a third batch: corpus dedup
    # must see epochs 0-1 history
    _write_batch(inp / "b3.jsonl", [_doc(7, GOOD2), _doc(8, GOOD2 + " appendix")])
    q2 = ingest.run(spark, str(inp), ckpt, available_now=True)
    q2.awaitTermination(120)

    acc2 = {r.doc_id for r in spark.read.parquet(f"{base}/accepted").collect()}
    rej2 = {r.doc_id: r.reason for r in spark.read.parquet(f"{base}/rejected").collect()}
    assert acc2 == {1, 2, 6, 8}
    assert rej2[7] == "duplicate_of_corpus"


def test_corpus_ingest_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-running an epoch's batch through process_batch overwrites only
    that epoch's partition — no duplicate accepted rows."""
    base = str(tmp_path / "corpus")
    ingest = CorpusIngest(base)
    batch = spark.createDataFrame(
        [("1", GOOD, "en", "s1"), ("2", GOOD2, "en", "s1")],
        ["doc_id", "text", "lang", "source"],
    )
    ingest.process_batch(batch, 0)
    ingest.process_batch(batch, 0)  # replay after simulated crash
    accepted = spark.read.parquet(f"{base}/accepted")
    assert accepted.count() == 2
    assert {r.doc_id for r in accepted.collect()} == {1, 2}


def test_compact_epoch_table_shrinks_files_preserves_rows(spark, tmp_path):
    from bigdata_covid19_real_time_spark.sinks.maintenance import (
        compact_epoch_table,
    )
    from bigdata_covid19_real_time_spark.sinks.registry import IdempotentParquetSink

    base = str(tmp_path / "t")
    sink = IdempotentParquetSink(base)
    # 3 epochs x multi-partition writes -> many small files
    for epoch in range(3):
        df = spark.range(epoch * 100, (epoch + 1) * 100).repartition(4).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        )
        sink.write(df, epoch, "tbl")
    table = f"{base}/tbl"
    before = spark.read.parquet(table)
    before_rows = sorted(r.id for r in before.collect())

    stats = compact_epoch_table(spark, table, files_per_epoch=1, sort_by=["k"])
    assert stats["files_before"] > stats["files_after"]
    assert stats["files_after"] <= 3  # one file per epoch partition
    after = spark.read.parquet(table)
    assert sorted(r.id for r in after.collect()) == before_rows
    # epoch partitioning survives (partition pruning still applies)
    assert {r.epoch for r in after.select("epoch").distinct().collect()} == {0, 1, 2}
    # rollback copy kept for crash recovery
    import os
    assert os.path.isdir(f"{base}/tbl.pre-compact")


def test_snapshot_isolation_hides_in_flight_epoch(spark, tmp_path):
    """Readers through read_corpus_snapshot see only pointer-published
    epochs: a half-written (or merely unpublished) epoch partition is
    invisible until its pointer swap, and a crash between data write
    and publish leaves the previous snapshot intact."""
    import os

    from bigdata_covid19_real_time_spark.streaming.corpus import (
        CorpusIngest,
        published_epoch,
        read_corpus_snapshot,
    )

    base = str(tmp_path / "corpus")
    ing = CorpusIngest(base, min_tokens=5, max_top_bigram_frac=1.0)
    docs = spark.createDataFrame(
        [("1", "the quick brown fox jumps over the lazy dog again and again today", "en", "web")],
        "doc_id STRING, text STRING, lang STRING, source STRING",
    )
    ing.process_batch(docs, 0)
    assert published_epoch(base) == 0
    assert read_corpus_snapshot(spark, base).count() == 1

    # simulate a crash AFTER data write, BEFORE publish: write epoch=1
    # data directly without moving the pointer
    docs2 = spark.createDataFrame(
        [("2", "an entirely different sentence with plenty of ordinary words in it", "en", "web")],
        "doc_id STRING, text STRING, lang STRING, source STRING",
    )
    from bigdata_covid19_real_time_spark.operators.text import fingerprint
    fingerprint(docs2.withColumn("doc_id", F.col("doc_id").cast("long"))).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "accepted", "epoch=1"))

    # raw table sees 2 rows; the snapshot still sees 1
    assert spark.read.parquet(os.path.join(base, "accepted")).count() == 2
    assert read_corpus_snapshot(spark, base).count() == 1

    # replaying the epoch through the builder publishes it
    ing.process_batch(docs2, 1)
    assert published_epoch(base) == 1
    assert read_corpus_snapshot(spark, base).count() == 2


DISTINCT = (
    "quartz marble granite basalt slate obsidian pumice shale gneiss "
    "schist limestone dolomite flint chert jasper agate onyx topaz "
    "garnet beryl zircon spinel rutile mica feldspar quartzite gypsum "
    "halite calcite pyrite galena sphalerite magnetite hematite bauxite"
)
DISTINCT2 = (
    "willow cedar spruce aspen birch maple alder hazel rowan juniper "
    "larch hemlock poplar sycamore chestnut walnut hickory elm beech "
    "linden hornbeam yew fir pine oak acacia baobab sequoia cypress "
    "mangrove eucalyptus teak mahogany ebony balsa cork"
)


def test_near_dup_mode_screens_batch_and_corpus(spark, tmp_path):
    """Near-dup mode: within-batch LSH+verify drops the larger id of a
    verified pair, the persistent bands index routes corpus-side
    candidates to the exact verification, and fresh docs pass."""
    inp = tmp_path / "in"
    base = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    near1 = GOOD.replace("omicron", "orbital")  # ~0.9 Jaccard vs GOOD
    near2 = GOOD.replace("galway", "geneva")

    _write_batch(
        inp / "b1.jsonl",
        [
            _doc(1, GOOD),
            _doc(2, DISTINCT),
            _doc(3, near1),  # near-dup of doc 1, same batch
        ],
    )
    _write_batch(
        inp / "b2.jsonl",
        [
            _doc(4, near2),      # near-dup of corpus doc 1 (epoch 0)
            _doc(5, DISTINCT2),  # genuinely fresh
        ],
    )

    ingest = CorpusIngest(base, near_dup_threshold=0.6)
    q = ingest.run(spark, str(inp), ckpt, available_now=True)
    q.awaitTermination(120)

    accepted = spark.read.parquet(f"{base}/accepted")
    acc = {r.doc_id: r.epoch for r in accepted.collect()}
    rej = {
        r.doc_id: r.reason
        for r in spark.read.parquet(f"{base}/rejected").collect()
    }
    assert set(acc) == {1, 2, 5}
    assert rej[3] == "near_duplicate_in_batch"
    assert rej[4] == "near_duplicate_of_corpus"

    # the bands index holds exactly the accepted docs, epoch-aligned
    bands = spark.read.parquet(f"{base}/bands")
    by_doc = {
        r["doc_id"]: r["epoch"]
        for r in bands.select("doc_id", "epoch").distinct().collect()
    }
    assert by_doc == acc
    assert bands.filter(F.col("band_hash").isNull()).count() == 0

    # exact-duplicate gate still runs first: replaying a new batch with
    # an exact copy rejects with the exact reason, not the near one
    _write_batch(inp / "b3.jsonl", [_doc(6, DISTINCT)])
    q2 = ingest.run(spark, str(inp), ckpt, available_now=True)
    q2.awaitTermination(120)
    rej3 = {
        r.doc_id: r.reason
        for r in spark.read.parquet(f"{base}/rejected").collect()
    }
    assert rej3[6] == "duplicate_of_corpus"


def test_duplicate_ids_and_unparseable_rows_audited(spark, tmp_path):
    """Code-review regressions: (1) an at-least-once producer repeating
    a doc_id within one batch must yield ONE accepted row, not a fanned-
    out duplicate set; (2) uncastable ids / NULL text reach the
    rejection audit instead of vanishing."""
    inp = tmp_path / "in"
    base = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        inp / "b1.jsonl",
        [
            _doc(1, GOOD),
            _doc(1, GOOD),              # exact wire duplicate (same id)
            _doc("not-a-number", GOOD2),  # uncastable id
            json.dumps({"doc_id": "9", "text": None,
                        "lang": "en", "source": "s1"}),  # NULL text
        ],
    )
    ingest = CorpusIngest(base)
    q = ingest.run(spark, str(inp), ckpt, available_now=True)
    q.awaitTermination(120)

    accepted = spark.read.parquet(f"{base}/accepted")
    assert accepted.filter(F.col("doc_id") == 1).count() == 1
    rejected = spark.read.parquet(f"{base}/rejected")
    unparseable = rejected.filter(F.col("reason") == "unparseable")
    # both bad wire rows audited; the uncastable id records NULL doc_id
    assert unparseable.count() == 2
    assert unparseable.filter(F.col("doc_id").isNull()).count() == 1


def test_near_dup_epoch_releases_only_its_own_caches(spark, tmp_path):
    """Cache lifecycle (r4 ADVICE): near-dup epochs must unpersist the
    LSH/Jaccard internals they created — and ONLY those.  A cache owned
    by another workload sharing the SparkSession survives the epoch
    (the old session-global ``catalog.clearCache()`` evicted it)."""
    inp = tmp_path / "in"
    _write_batch(inp / "b1.jsonl", [_doc(1, GOOD), _doc(2, DISTINCT)])

    # delta-based: earlier tests in the shared session may legitimately
    # leave their own caches behind — only NEW ids matter here
    before = {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    foreign = spark.createDataFrame([(1,)], "x int").persist()
    foreign.count()
    assert foreign.is_cached

    ingest = CorpusIngest(
        str(tmp_path / "corpus"), near_dup_threshold=0.6
    )
    q = ingest.run(spark, str(inp), str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    surviving = {int(i) for i in jmap.keySet().toArray()}
    # the foreign cache survived the epoch, and the epoch's internal
    # LSH/Jaccard caches are gone: exactly one NEW persisted RDD remains
    # (the foreign frame's), nothing from the ingest
    assert foreign.is_cached
    assert len(surviving - before) == 1
    foreign.unpersist()


def test_epoch_writes_do_not_reexecute_pipeline(spark, tmp_path):
    """Regression guard for the round-6 cost fix: one epoch's three
    sink writes must consume ONE materialization of the pipeline, not
    re-execute it per write.  Writing the accepted/bands paths
    invalidates every cache whose plan reads them (recacheByPath —
    both output frames read them via the history + band-index joins),
    so with a plain persist each write after the first re-executed the
    whole epoch pipeline (measured ~3x, 323 vs ~85 jobs/epoch).  The
    fix (localCheckpoint survivors — lineage truncated, immune to
    path invalidation — and write the no-reader rejected table first)
    keeps the per-epoch job count bounded; the generous ceiling below
    sits ~2x above the fixed cost and far below the regressed one."""
    base, inp, ckpt = (
        str(tmp_path / "out"),
        tmp_path / "in",
        str(tmp_path / "ckpt"),
    )
    _write_batch(inp / "b1.jsonl", [_doc(1, GOOD), _doc(2, DISTINCT)])
    _write_batch(inp / "b2.jsonl", [_doc(3, GOOD2), _doc(4, DISTINCT2)])
    ingest = CorpusIngest(base, near_dup_threshold=0.6)
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup(None) or [])
    q = ingest.run(spark, str(inp), ckpt, available_now=True)
    q.awaitTermination(120)
    jobs = len(st.getJobIdsForGroup(None) or []) - before
    # 2 epochs; fixed cost ~85 jobs/epoch, regressed cost ~325/epoch
    assert jobs < 400, f"epoch pipeline re-execution suspected: {jobs} jobs"
    assert {r.doc_id for r in spark.read.parquet(f"{base}/accepted").collect()} == {
        1,
        2,
        3,
        4,
    }


def test_replay_oracle_parity_with_null_text(spark):
    """NULL-text docs are audited as 'unparseable' rejects by
    process_batch; the replay oracle mirrors that branch (round-7
    advice fix).  One NULL-text doc lands in each epoch parity class
    alongside clean keepers — Spark result and DuckDB oracle must
    agree row-for-row."""
    import os
    import tempfile

    import duckdb

    from bigdata_covid19_real_time_spark.plans import ORACLES, QUERIES

    name = "docs_corpus_ingest_replay"
    d = tempfile.mkdtemp()
    rows = [
        (1, GOOD, "en", "s1"),
        (2, None, "en", "s1"),   # epoch 0 unparseable
        (3, None, "en", "s2"),   # epoch 1 unparseable
        (4, GOOD2, "en", "s2"),
        (5, "xx yy", "en", "s1"),  # quality reject (too_few_tokens)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))

    got = sorted(tuple(r) for r in QUERIES[name](spark, d).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet', '*.parquet')}')"
    )
    want = sorted(tuple(r) for r in con.execute(ORACLES[name]).fetchall())
    con.close()
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[2][1:] == (0, "rejected", "unparseable")
    assert by_id[3][1:] == (1, "rejected", "unparseable")
    # doc 4 (epoch 0) is accepted first; doc 1 arrives in epoch 1 and
    # hits the cross-epoch near-dup screen against it
    assert by_id[4][2] == "accepted"
    assert by_id[1][1:] == (1, "rejected", "near_duplicate_of_corpus")
