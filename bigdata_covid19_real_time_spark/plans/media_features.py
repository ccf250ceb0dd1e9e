"""Multimodal feature-extraction and resize-planning queries
(operators/multimodal.py:extract_image_features / resize_plan) — the
remaining brief items after decode (images: vendored header parsers;
audio: WAV/FLAC) and video frame sampling.

Kernel discipline matches ``docs_media_meta``/``docs_audio_meta``: the
corpus payloads are UTF-8 text stand-ins, so the queries pin the
clearly-marked deterministic fake kernels whose arithmetic the DuckDB
oracle replicates byte-for-byte; the real kernels (PIL strip features)
are import-gated and unit-tested separately.

Imported last by plans/__init__ (append-only registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.multimodal import (
    decode_image_meta,
    extract_image_features,
    resize_plan,
    text_as_binary,
)
from bigdata_covid19_real_time_spark.plans.registry import query, stable_round
from bigdata_covid19_real_time_spark.sources.batch import load_table


@query(
    "docs_media_features",
    # the fake kernel hashes payload + ":i"; the payload is utf8(text),
    # so md5(text || ':' || i) over VARCHAR hashes the identical bytes
    oracle="""
    SELECT doc_id, CAST(u.i AS INTEGER) AS pos,
           ROUND(('0x' || substr(md5(text || ':' || CAST(u.i AS VARCHAR)), 1, 8))::BIGINT
                 / 4294967296.0 + 1e-9, 6) AS feature
    FROM documents, unnest(range(0, 4)) AS u(i)
    WHERE text IS NOT NULL
    """,
)
def docs_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction end-to-end: payload -> Arrow-batched
    ``mapInPandas`` kernel -> long-form ``(doc_id, pos, feature)`` rows
    (JVM-joinable, oracle-comparable as scalar doubles).  The fake
    kernel's md5 arithmetic is replicated exactly by the oracle,
    certifying the batch plumbing row-for-row."""
    docs = load_table(spark, sf_dir, "documents")
    out = extract_image_features(text_as_binary(docs), dim=4, kernel="fake")
    return out.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        stable_round("feature", 6).alias("feature"),
    )


@query(
    "docs_thumbnail_plan",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             octet_length(encode(text)) % 1920 + 1 AS w,
             octet_length(encode(text)) % 1080 + 1 AS h
      FROM documents WHERE text IS NOT NULL
    ), scaled AS (
      SELECT doc_id, w, h,
             LEAST(256.0 / w, 256.0 / h, 1.0) AS scale
      FROM meta
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(GREATEST(1, FLOOR(w * scale + 1e-9)) AS INTEGER) AS target_w,
           CAST(GREATEST(1, FLOOR(h * scale + 1e-9)) AS INTEGER) AS target_h,
           ROUND(scale + 1e-9, 6) AS scale
    FROM scaled
    """,
)
def docs_thumbnail_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over decoded metadata
    (operators/multimodal.py:resize_plan): decode dims (pinned fake
    kernel — the oracle replicates its byte arithmetic), then the pure
    JVM fit-into-256x256 projection.  No pixels touched; the plan is a
    narrow codegen stage auditable before any pixel work."""
    docs = load_table(spark, sf_dir, "documents")
    meta = decode_image_meta(text_as_binary(docs), kernel="fake")
    out = resize_plan(meta, max_w=256, max_h=256)
    return out.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("target_w").cast("int").alias("target_w"),
        F.col("target_h").cast("int").alias("target_h"),
        stable_round("scale", 6).alias("scale"),
    )
