"""Multimodal audio-plumbing query: the Arrow-batched audio decode pass
(operators/multimodal.py:decode_audio_meta) certified row-for-row by a
SQL replication of the deterministic fake kernel's arithmetic — same
contract shape as ``docs_media_meta`` for the image path.

Imported after lakehouse_twins by plans/__init__ so every pre-existing
query keeps its registration position (bench.py's frozen order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.plans.registry import query
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "docs_audio_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
           'fake' AS container,
           CAST(octet_length(encode(text)) % 44100 + 8000 AS INTEGER) AS sample_rate,
           CAST(octet_length(encode(text)) % 2 + 1 AS INTEGER) AS n_channels,
           16 AS bits_per_sample,
           CAST(octet_length(encode(text)) AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def docs_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality plumbing end-to-end: text -> binary payload ->
    Arrow-batched mapInPandas decode -> typed audio metadata.  The
    kernel is pinned to the deterministic fake (the payloads are UTF-8
    stand-ins, not RIFF/FLAC containers) and the oracle replicates its
    byte arithmetic; the REAL WAV/FLAC header parsers behind the same
    ``mapInPandas`` contract are exercised on genuine container bytes by
    tests/test_neardup.py (stdlib-wave-written WAV, spec-built FLAC)."""
    from bigdata_covid19_real_time_spark.operators.multimodal import (
        decode_audio_meta,
        text_as_binary,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = decode_audio_meta(text_as_binary(docs), kernel="fake")
    return out.select(
        "doc_id",
        "size_bytes",
        "container",
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_channels").cast("int").alias("n_channels"),
        F.col("bits_per_sample").cast("int").alias("bits_per_sample"),
        "duration_ms",
    )
