"""Hand-built-fixture tests for the evaluation/provenance batch
(hard negatives, language-ID confusion, shard manifest)."""

from __future__ import annotations

import os
import tempfile

from bigdata_covid19_real_time_spark.plans.evaluation import MANIFEST_SHARDS


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


def test_hard_negatives_excludes_same_label(spark):
    """Query (id 0, label 0): the nearest SAME-label vector (id 20,
    identical direction) must be excluded; the mined negatives are the
    other-label vectors ordered by cosine."""
    vecs = [
        (0, [1.0, 0.0], 0),
        (20, [2.0, 0.0], 0),    # same label, cosine 1.0 — excluded
        (21, [1.0, 0.1], 1),    # other label, cosine ~0.995
        (22, [0.5, 0.5], 1),    # other label, cosine ~0.707
        (23, [0.0, 1.0], 2),    # other label, cosine 0
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "embeddings", vecs,
           "vec_id long, embedding array<float>, label int")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = sorted(
        QUERIES["embedding_hard_negatives"](spark, d).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    )
    q0 = [r for r in got if r["query_id"] == 0]
    assert [r["neighbor_id"] for r in q0] == [21, 22, 23]
    assert all(r["n_label"] != 0 for r in q0)
    assert q0[0]["cosine"] > q0[1]["cosine"] > q0[2]["cosine"]


def test_langid_confusion_diagonal_and_shares(spark):
    """Two docs of pure-English stopwords labeled 'en' and one labeled
    'de': the scorer guesses 'en' for all three, so the matrix has
    (en,en) share 1.0 and (de,en) share 1.0."""
    rows = [
        (1, "the of and to", "en", "s", 14),
        (2, "the a is that", "en", "s", 14),
        (3, "the of and is", "de", "s", 14),
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    got = {(r["lang"], r["lang_guess"]): r for r in
           QUERIES["docs_langid_confusion"](spark, d).collect()}
    assert got[("en", "en")]["n"] == 2
    assert got[("en", "en")]["share_of_actual"] == 1.0
    assert got[("de", "en")]["share_of_actual"] == 1.0


def test_shard_manifest_detects_corruption(spark):
    """The manifest over a corpus and over a 1-char-corrupted copy
    must differ in exactly the corrupted doc's shard checksum, with
    counts unchanged."""
    rows = [(i, f"document body {i}", "en", "s", 15) for i in range(40)]
    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    _write(spark, d1, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    corrupted = [(i, t + ("!" if i == 7 else ""), g, s, n)
                 for (i, t, g, s, n) in rows]
    _write(spark, d2, "documents", corrupted,
           "doc_id long, text string, lang string, source string, n_chars long")
    from bigdata_covid19_real_time_spark.plans import QUERIES

    m1 = {r["shard"]: r for r in
          QUERIES["docs_shard_manifest"](spark, d1).collect()}
    m2 = {r["shard"]: r for r in
          QUERIES["docs_shard_manifest"](spark, d2).collect()}
    assert set(m1) == set(m2) and len(m1) <= MANIFEST_SHARDS
    diff = [s for s in m1 if m1[s]["content_xor"] != m2[s]["content_xor"]]
    assert len(diff) == 1  # exactly doc 7's shard flips
    assert all(m1[s]["n_docs"] == m2[s]["n_docs"] for s in m1)
