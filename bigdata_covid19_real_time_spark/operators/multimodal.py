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
    DoubleType,
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
    for real media bytes (the corpus has no binary table).

    Round-14 note: a scan fan-out here was tried and REVERTED — the
    deterministic fake decode kernels are too cheap to amortize the
    extra exchange (interleaved A/B: 2.1x slower on
    docs_media_features).  With real image decoders the calculus flips;
    apply fan_out_scan at the call site in that deployment."""
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


#: PNG color type -> sample channels (spec: PNG 1.2 §4.1.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: JPEG SOF markers carrying frame dimensions (every C0-CF except the
#: non-frame C4/C8/CC: DHT, JPG extension, DAC)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _header_decode(payload: bytes) -> tuple[int, int, int]:
    """Vendored pure-Python header parse — REAL dimensions, no image lib.

    Reads (width, height, channels) straight from the container bytes:
    PNG IHDR, JPEG SOFn frame header, GIF logical screen descriptor.
    Raises ValueError for anything else (use the ``auto`` kernel for a
    deterministic-fake fallback on unknown payloads).
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # 8-byte signature, 4-byte chunk length, b"IHDR", then
        # width(4 BE) height(4 BE) bitdepth(1) colortype(1)
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("truncated or non-IHDR-first PNG")
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        channels = _PNG_CHANNELS.get(payload[25])
        if channels is None:
            raise ValueError(f"bad PNG color type {payload[25]}")
        return (width, height, channels)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError("JPEG marker desync")
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF:
                # segment: len(2) precision(1) height(2) width(2) ncomp(1)
                if i + 9 >= len(payload):
                    raise ValueError("truncated JPEG SOF")
                height = int.from_bytes(payload[i + 5 : i + 7], "big")
                width = int.from_bytes(payload[i + 7 : i + 9], "big")
                return (width, height, payload[i + 9])
            i += 2 + seg_len
        raise ValueError("no SOF frame header in JPEG")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF")
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        return (width, height, 3)
    raise ValueError("unrecognized image container (not PNG/JPEG/GIF)")


def _auto_decode(payload: bytes) -> tuple[int, int, int]:
    """Default in-sandbox kernel: real header parse for recognized
    containers, the clearly-marked deterministic fake for anything else
    (tests feed UTF-8 text as payload stand-ins)."""
    try:
        return _header_decode(payload)
    except ValueError:
        return _fake_decode(payload)


def select_decode_kernel(kernel: str = "auto"):
    """Pick the decode kernel.

    - ``auto``: PIL when importable; else the vendored header parser
      with deterministic-fake fallback for unrecognized payloads.
    - ``headers``: the vendored PNG/JPEG/GIF header parser, strict
      (raises on unrecognized bytes) — real dimensions, no image lib.
    - ``pil``/``fake``: force one (``pil`` raises where the lib is
      absent rather than silently faking).
    """
    if kernel == "auto":
        return _pil_decode if _HAS_PIL else _auto_decode
    if kernel == "headers":
        return _header_decode
    if kernel == "pil":
        if not _HAS_PIL:
            raise ImportError(
                "decode kernel 'pil' requested but PIL is not installed; "
                "use kernel='auto' to fall back to the header parser"
            )
        return _pil_decode
    if kernel == "fake":
        return _fake_decode
    raise ValueError(
        f"unknown decode kernel {kernel!r}: use auto|headers|pil|fake"
    )


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


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("size_bytes", LongType()),
        StructField("container", StringType()),  # wav|flac|fake
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

#: (container, sample_rate, n_channels, bits_per_sample, duration_ms)
_AudioMeta = tuple


def _wav_header_decode(payload: bytes) -> _AudioMeta:
    """Vendored pure-Python WAV (RIFF) header parse — REAL audio
    metadata, no audio lib.  Walks the chunk list: ``fmt `` carries
    channels / sample rate / bit depth; ``data``'s byte size over the
    byte rate gives duration.  Raises ValueError on non-WAV bytes.
    (RIFF spec: chunks are 2-byte-aligned, sizes little-endian.)
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        csize = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = {
                "n_channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "byte_rate": int.from_bytes(body[8:12], "little"),
                "bits_per_sample": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data_size = csize
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV without fmt chunk")
    duration_ms = (
        round(data_size * 1000 / fmt["byte_rate"])
        if data_size is not None and fmt["byte_rate"] > 0
        else None
    )
    return (
        "wav",
        fmt["sample_rate"],
        fmt["n_channels"],
        fmt["bits_per_sample"],
        duration_ms,
    )


def _flac_header_decode(payload: bytes) -> _AudioMeta:
    """Vendored FLAC STREAMINFO parse (spec: the first metadata block
    after ``fLaC`` MUST be STREAMINFO).  Bit layout after the min/max
    block/frame sizes: sample rate (20 bits), channels-1 (3),
    bits-per-sample-1 (5), total samples (36)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC container")
    if len(payload) < 8 + 34:
        raise ValueError("truncated FLAC header")
    block_type = payload[4] & 0x7F
    if block_type != 0:
        raise ValueError("first FLAC metadata block is not STREAMINFO")
    info = payload[8 : 8 + 34]
    # bytes 10..17 hold the packed rate/channels/bps/total-samples field
    packed = int.from_bytes(info[10:18], "big")
    sample_rate = packed >> 44
    n_channels = ((packed >> 41) & 0x7) + 1
    bits_per_sample = ((packed >> 36) & 0x1F) + 1
    total_samples = packed & ((1 << 36) - 1)
    duration_ms = (
        round(total_samples * 1000 / sample_rate) if sample_rate > 0 else None
    )
    return ("flac", sample_rate, n_channels, bits_per_sample, duration_ms)


def _fake_audio_decode(payload: bytes) -> _AudioMeta:
    """DETERMINISTIC FAKE audio decoder (stub — for payloads that are
    not real audio containers, e.g. the text stand-ins in tests).
    Derives every field from payload length so oracles can replicate
    the arithmetic in SQL."""
    n = len(payload)
    return ("fake", n % 44100 + 8000, n % 2 + 1, 16, n)


def _auto_audio_decode(payload: bytes) -> _AudioMeta:
    """Real WAV/FLAC header parse for recognized containers, the
    clearly-marked deterministic fake for anything else."""
    for parser in (_wav_header_decode, _flac_header_decode):
        try:
            return parser(payload)
        except ValueError:
            continue
    return _fake_audio_decode(payload)


def select_audio_kernel(kernel: str = "auto"):
    """``auto``: vendored WAV/FLAC header parse with fake fallback;
    ``headers``: strict (raises on unrecognized bytes); ``fake``."""
    if kernel == "auto":
        return _auto_audio_decode
    if kernel == "headers":

        def strict(payload: bytes) -> _AudioMeta:
            for parser in (_wav_header_decode, _flac_header_decode):
                try:
                    return parser(payload)
                except ValueError:
                    continue
            raise ValueError("unrecognized audio container (not WAV/FLAC)")

        return strict
    if kernel == "fake":
        return _fake_audio_decode
    raise ValueError(f"unknown audio kernel {kernel!r}: use auto|headers|fake")


def decode_audio_meta(
    df: DataFrame, id_col: str = "doc_id", kernel: str = "auto"
) -> DataFrame:
    """Arrow-batched audio decode pass: (id, payload) -> audio metadata.
    Same ``mapInPandas`` contract as :func:`decode_image_meta` — one
    Python worker per partition, Arrow batches, NULL payloads dropped,
    fixed output schema."""
    decode_one = select_audio_kernel(kernel)

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
                    "container": [d[0] for d in decoded],
                    "sample_rate": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "bits_per_sample": [d[3] for d in decoded],
                    "duration_ms": [d[4] for d in decoded],
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(
        decode, AUDIO_META_SCHEMA
    )


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


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pos", IntegerType()),
        StructField("feature", DoubleType()),
    ]
)


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """DETERMINISTIC FAKE feature extractor (stub — no image libs in
    this container).  Feature i is the first 32 bits of
    ``md5(payload + b":i")`` scaled to [0, 1) — reproducible, payload-
    sensitive, and exactly replicable in SQL (DuckDB ``md5`` over the
    same concatenated blob)."""
    import hashlib

    return [
        int(hashlib.md5(payload + f":{i}".encode()).hexdigest()[:8], 16)
        / 4294967296.0
        for i in range(dim)
    ]


def _pil_features(payload: bytes, dim: int) -> list[float]:
    """Real feature kernel where PIL exists: grayscale, resize to a
    ``dim``-pixel strip, intensities scaled to [0, 1]."""
    import io

    with _PILImage.open(io.BytesIO(payload)) as img:
        strip = img.convert("L").resize((dim, 1))
        return [p / 255.0 for p in strip.getdata()]


def select_feature_kernel(kernel: str = "auto"):
    """``auto``: PIL strip-intensity features when importable, else the
    clearly-marked deterministic fake; ``pil``/``fake`` force one."""
    if kernel == "auto":
        return _pil_features if _HAS_PIL else _fake_features
    if kernel == "pil":
        if not _HAS_PIL:
            raise ImportError(
                "feature kernel 'pil' requested but PIL is not installed"
            )
        return _pil_features
    if kernel == "fake":
        return _fake_features
    raise ValueError(f"unknown feature kernel {kernel!r}: use auto|pil|fake")


def extract_image_features(
    df: DataFrame, dim: int = 8, id_col: str = "doc_id", kernel: str = "auto"
) -> DataFrame:
    """Arrow-batched feature extraction: (id, payload) -> ``dim`` rows
    ``(doc_id, pos, feature)`` per document.

    Same contract shape as ``decode_image_meta``: one Python worker per
    partition, Arrow record batches in/out, NULL payloads dropped, fixed
    output schema.  Emitting long-form rows (not an array column) keeps
    the features joinable/aggregable JVM-side and oracle-comparable as
    scalar doubles.
    """
    extract_one = select_feature_kernel(kernel)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]
            if pdf.empty:
                continue
            ids, poss, vals = [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                for pos, v in enumerate(extract_one(p, dim)):
                    ids.append(i)
                    poss.append(pos)
                    vals.append(v)
            yield pd.DataFrame({"doc_id": ids, "pos": poss, "feature": vals})

    return df.select(F.col(id_col), "payload").mapInPandas(extract, FEATURE_SCHEMA)


def resize_plan(
    df: DataFrame,
    max_w: int,
    max_h: int,
    w_col: str = "width",
    h_col: str = "height",
) -> DataFrame:
    """Aspect-preserving thumbnail *plan*: target dimensions fitting each
    image into a ``max_w x max_h`` box without upscaling.

    Pure JVM arithmetic over decoded metadata — no pixels touched, no
    Python.  The actual resampling would map this plan over the payloads
    with a kernel (PIL where present); at 100 TB the plan/execute split
    matters because the plan is a narrow codegen projection that can be
    filtered/joined/audited before any expensive pixel work runs.
    ``floor(x + 1e-9)`` guards exact-ratio boundaries against float
    representation (cross-engine-stable, same discipline as
    ``stable_round``).
    """
    w = F.col(w_col).cast("double")
    h = F.col(h_col).cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    return df.withColumns(
        {
            "scale": scale,
            "target_w": F.greatest(
                F.lit(1), F.floor(w * scale + F.lit(1e-9)).cast("int")
            ),
            "target_h": F.greatest(
                F.lit(1), F.floor(h * scale + F.lit(1e-9)).cast("int")
            ),
        }
    )
