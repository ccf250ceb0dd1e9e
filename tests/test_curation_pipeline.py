"""The end-to-end curation waterfall: a hand-built corpus where every
stage eliminates exactly one known document, checked stage-by-stage
against hand-computed counts AND the registered DuckDB oracle, plus
monotonicity invariants on the real corpus."""

from __future__ import annotations

import os
import tempfile

import duckdb
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans import ORACLES, QUERIES

_Q = "docs_curation_waterfall"


def _words(group: str, n: int) -> list[str]:
    """n distinct pure-letter tokens private to ``group``."""
    return [
        f"{group}{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(n)
    ]


def _fixture_docs():
    """One doc per elimination stage:

    * doc 1 — clean unique doc: survives everything
    * doc 2 — two tokens: quality-filtered (too_few_tokens)
    * docs 3/4 — exact duplicates: 4 retired at exact-dedup (min id wins)
    * docs 5/6 — near-dups (one appended token, 3-gram J = 28/29):
      6 retired at near-dedup
    * doc 7 — the eval holdout source (src0): leaves at holdout stage
    * doc 8 — shares a 12-token prefix with doc 7 (5-gram contamination
      8/26 = 0.31 >= 0.2, but 3-gram J = 10/46 = 0.22 < 0.6 so it is
      NOT a near-dup): dropped at decontamination
    * doc 9 — NULL text: quality_filter emits no row for it (empty
      token array), but it must still appear in 'total' and count as
      quality-eliminated, exactly like the oracle's COUNT(*)
    * doc 10 — empty-string text: one empty token on both engines
      (split semantics agree), quality-eliminated (too_few_tokens)
    """
    a, c, e, w, v = (
        _words("a", 30), _words("c", 30), _words("e", 30),
        _words("w", 30), _words("v", 18),
    )
    dup = " ".join(c)
    near = " ".join(e)
    return [
        (1, " ".join(a), "s1"),
        (2, "xx yy", "s1"),
        (3, dup, "s1"),
        (4, dup, "s2"),
        (5, near, "s1"),
        (6, near + " zzx", "s2"),
        (7, " ".join(w), "src0"),
        (8, " ".join(w[:12] + v), "s3"),
        (9, None, "s1"),
        (10, "", "s1"),
    ]


def _run_fixture(spark, tmpdir: str):
    spark.createDataFrame(
        _fixture_docs(), "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(os.path.join(tmpdir, "documents.parquet"))
    return QUERIES[_Q](spark, tmpdir)


def test_waterfall_known_stage_eliminations(spark):
    d = tempfile.mkdtemp()
    rows = {
        r["stage"]: r for r in _run_fixture(spark, d).collect()
    }
    # tokens: 30+2+30+30+30+31+30+30 + NULL(skipped) + 1 = 214,
    # then quality removes docs 2/9/10 (-2, -NULL, -1), then -30
    # (exact), -31 (near), -30 (holdout), -30 (decontam)
    expect = {
        "total": (0, 10, 214),
        "quality_filter": (1, 7, 211),
        "exact_dedup": (2, 6, 181),
        "near_dedup": (3, 5, 150),
        "holdout_removed": (4, 4, 120),
        "decontaminated": (5, 3, 90),
    }
    assert set(rows) == set(expect)
    for stage, (idx, n, tok) in expect.items():
        r = rows[stage]
        assert r["stage_idx"] == idx, stage
        assert r["n_docs"] == n, (stage, r["n_docs"], n)
        assert r["n_tokens"] == tok, (stage, r["n_tokens"], tok)
        assert abs(r["frac_docs"] - round(n / 10 + 1e-9, 6)) < 1e-12


def test_waterfall_oracle_parity_on_fixture(spark):
    """The chained-CTE oracle replays the same pipeline on the fixture
    (the registered sweep checks parity on the real corpus; this pins
    it on a corpus where every stage actually fires)."""
    d = tempfile.mkdtemp()
    got = sorted(
        tuple(r) for r in _run_fixture(spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet', '*.parquet')}')"
    )
    want = sorted(tuple(r) for r in con.execute(ORACLES[_Q]).fetchall())
    con.close()
    assert got == want


def test_waterfall_all_clean_corpus_passes_through(spark):
    """Three clean unique docs: no stage fires (empty exact-dup group
    surplus, empty near-dup pair set, empty contamination set) — the
    empty-broadcast paths must emit the full-survival report, not
    crash or drop rows."""
    d = tempfile.mkdtemp()
    rows = [
        (1, " ".join(_words("a", 30)), "s1"),
        (2, " ".join(_words("c", 30)), "s2"),
        (3, " ".join(_words("e", 30)), "s3"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["stage"]: r for r in QUERIES[_Q](spark, d).collect()}
    assert all(got[s]["n_docs"] == 3 for s in got)
    assert all(got[s]["n_tokens"] == 90 for s in got)
    assert all(abs(got[s]["frac_docs"] - 1.0) < 1e-12 for s in got)


def test_waterfall_monotone_on_real_corpus(spark):
    rows = sorted(
        QUERIES[_Q](spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "total", "quality_filter", "exact_dedup", "near_dedup",
        "holdout_removed", "decontaminated",
    ]
    assert rows[0]["frac_docs"] == 1.0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_docs"] <= prev["n_docs"]
        assert cur["n_tokens"] <= prev["n_tokens"]
    assert rows[-1]["n_docs"] > 0  # the pipeline keeps a corpus
    # quality actually fires at every SF (vacuous-gate guard)
    assert rows[1]["n_docs"] < rows[0]["n_docs"]


def test_waterfall_cache_footprint_does_not_grow(spark):
    """Cache lifecycle (round-6 review): the function-owned flags
    persist is released before the query returns, and the composed
    operators' internal persists are CacheManager-deduped by plan
    equality — so REPEATED invocations add ZERO net new cached RDDs
    after the first.  (Sweeping the inner frames via raw RDD unpersist
    instead leaves stale CacheManager entries that a later plan-equal
    run reuses over destroyed blocks — Spark's UnsafeInMemorySorter
    NPE; hence the dedup-not-sweep design.)  Delta-based: the suite
    shares one session, so only growth counts."""
    d = tempfile.mkdtemp()
    jsc = spark.sparkContext._jsc.sc()
    df = _run_fixture(spark, d)  # writes the fixture once, runs once
    assert len(df.collect()) == 6
    after_first = jsc.getPersistentRDDs().size()
    # Repeated invocations on the SAME dir (no rewrite: a path write
    # would recacheByPath-churn plan-equal entries).  The defect under
    # test is PER-INVOCATION growth (a leak adds >= 1 entry per run),
    # so the bound is amortized over three runs with a one-entry
    # slack: in a long shared session the ContextCleaner / catalog
    # FileIndex churn can REPLACE one plan-equal entry (the superseded
    # entry lingers until its frame is GC'd — a one-time +1 observed
    # rarely under full-suite churn, never growing further), while a
    # true leak would blow through +3 here.
    for _ in range(3):
        df = QUERIES[_Q](spark, d)
        assert len(df.collect()) == 6
        assert jsc.getPersistentRDDs().size() <= after_first + 1
    # The +1 slack distinguishes churn from a leak by EVENTUAL
    # COLLECTION (round-9 review): a superseded plan-equal entry is
    # unreferenced once the frames die, so dropping the frame refs and
    # forcing GC lets the ContextCleaner reap it back to the baseline;
    # a genuine one-time leak (an operator holding its persist) stays
    # referenced and the count stays elevated — visible here instead
    # of hiding in the slack.
    if jsc.getPersistentRDDs().size() > after_first:
        import gc
        import time as _time

        del df
        start = jsc.getPersistentRDDs().size()
        deadline = _time.time() + 60
        while (
            jsc.getPersistentRDDs().size() > after_first
            and _time.time() < deadline
        ):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            _time.sleep(0.5)
        # Verdict (round-11 advice #1): the in-loop bound already
        # guarantees start <= after_first + 1, so an elevated final
        # can never be STRICTLY below start — a "did it decrease"
        # check here is unreachable, and distinguishing a one-time
        # held reference from ContextCleaner lag is not decidable
        # within a bounded deadline on a loaded shared session.  The
        # defect under test (PER-INVOCATION growth) is pinned by the
        # in-loop +1 bound over three runs; here we only assert the
        # single lingering entry never exceeds the churn slack, and
        # treat baseline-or-one as clean-or-lag.
        assert jsc.getPersistentRDDs().size() <= after_first + 1, (
            "persistent-RDD count grew past the one-entry churn "
            f"slack (baseline {after_first}, start {start}) — a held "
            "persist reference, not ContextCleaner churn"
        )
