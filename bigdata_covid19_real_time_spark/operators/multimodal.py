"""Multimodal (binary) column plumbing for training-data pipelines.

Images/audio/video ride through the engine as opaque ``binary`` columns
plus a typed metadata struct — the pattern a 100 TB multimodal corpus
needs: Spark moves/filters/joins the bytes without interpreting them,
and per-modality decode/feature kernels run as Arrow-batched
``mapInPandas`` stages at the edges.

Decode kernels are feature-gated (``select_decode_kernel``): when PIL is
importable the real header-parse decoder runs; in this container (no
image libraries) the clearly-marked deterministic fake takes over, so
the Spark-side plumbing — schema contract, batch shape,
partition-parallelism, null handling — is real and tested end-to-end
either way, and deploying next to a real imaging lib changes nothing.

Scale notes:
- binary payloads inflate shuffle cost ~payload-size; filter and project
  *before* any shuffle, and prefer carrying a content hash + pointer
  (path/offset) over the bytes themselves once payloads exceed ~1 MB;
- ``mapInPandas`` streams Arrow record batches — bound batch memory with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
  large;
- frame sampling / resizing policies are per-row metadata, so they run
  inside the same single pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed metadata carried alongside every binary payload.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),  # png|wav|mp4|...
        StructField("size_bytes", LongType()),
        StructField("content_hash", LongType()),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("size_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
    ]
)


def attach_media_column(
    df: DataFrame,
    payload_col: str,
    media_type: str,
    fmt: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Wrap a binary payload column with the typed metadata struct.

    ``size_bytes``/``content_hash`` are computed JVM-side (``length`` /
    ``xxhash64`` work on binary) — no Python in this pass.
    """
    payload = F.col(payload_col)
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(payload).cast("long").alias("size_bytes"),
            F.xxhash64(payload).alias("content_hash"),
        ).alias("media_meta"),
    )


def text_as_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """UTF-8-encode a text column into a binary payload — the test stand-in
    for real media bytes (the corpus has no binary table)."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))


try:  # feature gate: real decoder when the imaging lib exists
    from PIL import Image as _PILImage  # noqa: N814

    _HAS_PIL = True
except ImportError:  # the test container ships no image libs
    _PILImage = None
    _HAS_PIL = False


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE image decoder (stub — no image libs in this
    container).  Derives (width, height, channels) from payload length so
    tests are reproducible."""
    n = len(payload)
    return (n % 1920 + 1, n % 1080 + 1, 3)


def _pil_decode(payload: bytes) -> tuple[int, int, int]:
    """Real decoder: PIL header parse (no full pixel decode for size)."""
    import io

    with _PILImage.open(io.BytesIO(payload)) as img:
        return (img.width, img.height, len(img.getbands()))


def select_decode_kernel(kernel: str = "auto"):
    """Pick the decode kernel: ``auto`` uses PIL when importable and
    falls back to the deterministic fake; ``pil``/``fake`` force one
    (``pil`` raises where the lib is absent rather than silently faking).
    """
    if kernel == "auto":
        return _pil_decode if _HAS_PIL else _fake_decode
    if kernel == "pil":
        if not _HAS_PIL:
            raise ImportError(
                "decode kernel 'pil' requested but PIL is not installed; "
                "use kernel='auto' to fall back to the deterministic fake"
            )
        return _pil_decode
    if kernel == "fake":
        return _fake_decode
    raise ValueError(f"unknown decode kernel {kernel!r}: use auto|pil|fake")


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", kernel: str = "auto"
) -> DataFrame:
    """Arrow-batched decode pass: (id, payload) -> image metadata rows.

    The ``mapInPandas`` shape is the real contract: one Python worker per
    partition, Arrow record batches in/out, NULL payloads dropped, output
    schema fixed.  The kernel is selected by ``select_decode_kernel`` —
    PIL when present, the clearly-marked deterministic fake otherwise.
    """
    schema = IMAGE_META_SCHEMA
    decode_one = select_decode_kernel(kernel)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]
            if pdf.empty:
                continue
            decoded = [decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "size_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(decode, schema)


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 30,
    frames_col: str = "n_frames",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (JVM-side sequence+explode — the actual frame extraction would join
    this plan against the decode kernel).  Demonstrates the
    metadata-driven fan-out pattern without touching pixels."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(frames_col) - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    )
