"""Chunking geometry and the composed quality filter."""

from __future__ import annotations

import pytest

from bigdata_covid19_real_time_spark.operators.chunking import chunk_documents
from bigdata_covid19_real_time_spark.operators.quality import quality_filter


def _doc(n: int) -> str:
    # distinct, fully-alphabetic tokens (digits would trip the
    # quality filter's alpha-ratio rule)
    return " ".join(
        "t" + chr(97 + i % 26) + chr(97 + (i // 26) % 26) for i in range(n)
    )


def test_chunk_geometry_coverage_and_overlap(spark):
    df = spark.createDataFrame([(1, _doc(100))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=32, overlap=8).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 24: starts 1, 25, 49, 73 (<= 100 - 8 = 92); last covers 73..100
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert [r.chunk_n_tokens for r in rows] == [32, 32, 32, 28]
    toks = [r.chunk_text.split(" ") for r in rows]
    # consecutive chunks share exactly `overlap` tokens
    assert toks[0][-8:] == toks[1][:8]
    # full coverage, in order
    merged = toks[0] + [t for c in toks[1:] for t in c[8:]]
    assert merged == _doc(100).split(" ")


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, _doc(10)), (2, _doc(32))], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_n_tokens == 10
    # exactly chunk-sized doc: one chunk, no degenerate tail window
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_n_tokens == 32


def test_chunk_invalid_params_raise(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=16, overlap=16)


def test_quality_filter_reasons(spark):
    df = spark.createDataFrame(
        [
            (1, _doc(50)),               # distinct tokens: keeps
            (2, _doc(5)),                # too few tokens
            (3, " ".join(["x"] * 60)),   # low ttr + repetitive bigrams
            (4, " ".join(["12 34"] * 30)),  # numeric: low alpha (+ repetition)
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality_filter(df).collect()}
    assert out[1].keep and out[1].reasons == ""
    # tiny doc also trips the bigram rule (4 bigrams -> top frac 0.25)
    assert not out[2].keep
    assert "too_few_tokens" in out[2].reasons.split(",")
    assert not out[3].keep
    assert set(out[3].reasons.split(",")) == {"low_ttr", "repetitive_bigrams"}
    assert "low_alpha" in out[4].reasons.split(",")
    # reasons are sorted rule names — deterministic for the gate
    for r in out.values():
        parts = r.reasons.split(",") if r.reasons else []
        assert parts == sorted(parts)


class TestCdcChunks:
    def test_chunks_tile_the_document(self, spark):
        from bigdata_covid19_real_time_spark.operators.chunking import cdc_chunks
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog " * 20)],
            "doc_id long, text string",
        )
        rows = sorted(
            cdc_chunks(docs).collect(), key=lambda r: r["chunk_index"]
        )
        # contiguous tiling: starts chain and lengths sum to the doc
        pos = 1
        for r in rows:
            assert r["chunk_start"] == pos
            pos += r["chunk_len"]
        assert pos - 1 == len(docs.collect()[0]["text"])

    def test_insertion_shifts_only_local_chunks(self, spark):
        from bigdata_covid19_real_time_spark.operators.chunking import cdc_chunks

        base = "the quick brown fox jumps over the lazy dog " * 30
        edited = base[:500] + "INSERTED TEXT HERE " + base[500:]
        docs = spark.createDataFrame(
            [(1, base), (2, edited)], "doc_id long, text string"
        )
        out = cdc_chunks(docs).collect()
        h1 = {r["chunk_hash"] for r in out if r["doc_id"] == 1}
        h2 = {r["chunk_hash"] for r in out if r["doc_id"] == 2}
        # most chunks survive the edit unchanged (content-defined
        # boundaries localize the damage); fixed-size chunking would
        # invalidate every chunk after the insertion point
        shared = len(h1 & h2) / len(h1)
        assert shared >= 0.5, f"edit invalidated too many chunks: {shared}"
