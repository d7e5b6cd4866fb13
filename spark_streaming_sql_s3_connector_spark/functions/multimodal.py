"""Multimodal (binary) column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
transforms, partitioning — is real and tested; the codec step is stubbed
(this container has no image/audio libraries): ``decode_image_meta`` uses a
deterministic fake decoder keyed on the byte content, and the real-codec
entry points raise NotImplementedError behind an import-try so dropping in
Pillow/torchaudio later only replaces the inner function.

Scale notes: mapInPandas streams Arrow batches through one Python worker
per core — decode cost parallelizes with the data, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds worker memory for
fat binary rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from spark_streaming_sql_s3_connector_spark.partitioning import spread_for_compute
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Pack a column into binary — stand-in for reading real media bytes."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake codec: derives dimensions from byte length —
    replace with PIL.Image.open when the codec libs exist."""
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1, 3, "fake")


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode binary payloads to image metadata via mapInPandas (Arrow
    batches in/out). Output = input columns minus payload, plus IMAGE_META
    fields."""
    passthrough = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(passthrough + list(IMAGE_META_SCHEMA.fields))
    pass_names = [f.name for f in passthrough]

    # spread small inputs so decode parallelizes (real corpora arrive
    # many-partitioned; a single-file sample would pin decode to one core)
    df = spread_for_compute(df)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(b)) for b in pdf[payload_col]]
            out = pdf[pass_names].copy()
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["channels"] = [d[2] for d in decoded]
            out["format"] = [d[3] for d in decoded]
            out["n_bytes"] = [len(bytes(b)) for b in pdf[payload_col]]
            yield out

    return df.mapInPandas(decode, schema=out_schema)


def resize_images(df: DataFrame, payload_col: str = "payload", size: tuple[int, int] = (224, 224)) -> DataFrame:
    """Real resize requires a codec library — stubbed per the build plan."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image resize requires Pillow, which is not installed in this "
            "environment; the Arrow/mapInPandas plumbing is exercised via "
            "decode_image_meta"
        ) from None
    raise NotImplementedError("real codec path not implemented yet")


AUDIO_META_SCHEMA = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode_audio(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake audio codec (byte-length keyed) — replace with
    soundfile/torchaudio when codec libs exist. (sample_rate, n_samples,
    duration_ms)."""
    n = len(payload)
    sr = 8000 * (1 + n % 3)
    n_samples = n * 2
    return (sr, n_samples, n_samples * 1000 // sr)


def decode_audio_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Audio metadata over binary payloads: same Arrow/mapInPandas shape as
    decode_image_meta — the real-codec swap point is the inner function."""
    passthrough = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(passthrough + list(AUDIO_META_SCHEMA.fields))
    pass_names = [f.name for f in passthrough]

    df = spread_for_compute(df)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode_audio(bytes(b)) for b in pdf[payload_col]]
            out = pdf[pass_names].copy()
            out["sample_rate"] = [d[0] for d in decoded]
            out["n_samples"] = [d[1] for d in decoded]
            out["duration_ms"] = [d[2] for d in decoded]
            out["n_bytes"] = [len(bytes(b)) for b in pdf[payload_col]]
            yield out

    return df.mapInPandas(decode, schema=out_schema)


MEDIA_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def decode_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Image + audio metadata in ONE mapInPandas pass over the payload.

    At corpus scale this is the shape you want when a pipeline needs both
    modalities' stats: the payload bytes are decoded once per row, with no
    second UDF pass and no doc_id join shuffle — versus
    ``decode_image_meta(df).join(decode_audio_meta(df), id)`` which scans
    and ships the binary column twice and shuffles the results together.
    """
    passthrough = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(passthrough + list(MEDIA_META_SCHEMA.fields))
    pass_names = [f.name for f in passthrough]

    df = spread_for_compute(df)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf[payload_col]]
            img = [_fake_decode(p) for p in payloads]
            aud = [_fake_decode_audio(p) for p in payloads]
            out = pdf[pass_names].copy()
            out["width"] = [d[0] for d in img]
            out["height"] = [d[1] for d in img]
            out["n_bytes"] = [len(p) for p in payloads]
            out["sample_rate"] = [d[0] for d in aud]
            out["n_samples"] = [d[1] for d in aud]
            out["duration_ms"] = [d[2] for d in aud]
            yield out

    return df.mapInPandas(decode, schema=out_schema)


# video frame sampling: payload treated as fixed-size frame chunks by the
# fake codec; the real codec (av/ffmpeg keyframe iteration) replaces
# _fake_iter_frames only — row fan-out, schema, and batching are real
_FAKE_FRAME_BYTES = 64

FRAME_SCHEMA = StructType(
    [
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame_n_bytes", IntegerType()),
    ]
)


def _fake_iter_frames(payload: bytes, every_n: int):
    """Deterministic fake frame iterator: fixed 64-byte 'frames', sampled
    every ``every_n``-th. Yields (frame_idx, byte_offset, frame_len)."""
    n = len(payload)
    n_frames = (n + _FAKE_FRAME_BYTES - 1) // _FAKE_FRAME_BYTES
    for idx in range(0, n_frames, every_n):
        off = idx * _FAKE_FRAME_BYTES
        yield (idx, off, min(_FAKE_FRAME_BYTES, n - off))


def sample_frames(
    df: DataFrame, payload_col: str = "payload", every_n: int = 30
) -> DataFrame:
    """Sample every ``every_n``-th frame from video payloads: one output
    row per sampled frame (row fan-out inside mapInPandas — Arrow batches
    in and out, no explode of a materialized frame array, so a 2-hour
    video never holds all frames in memory at once).

    The codec step is the deterministic fake above; dropping in a real
    codec (av/ffmpeg) replaces ``_fake_iter_frames`` with packet
    iteration and adds a frame-bytes column — the Spark plumbing
    (schema, partitioning, batch shape) is unchanged."""
    try:
        import av  # noqa: F401  # real codec path, absent in this container
    except ImportError:
        pass
    passthrough = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(passthrough + list(FRAME_SCHEMA.fields))
    pass_names = [f.name for f in passthrough]

    df = spread_for_compute(df)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = bytes(rec[payload_col])
                for idx, off, ln in _fake_iter_frames(payload, every_n):
                    out_row = {k: rec[k] for k in pass_names}
                    out_row["frame_idx"] = idx
                    out_row["frame_offset"] = off
                    out_row["frame_n_bytes"] = ln
                    rows.append(out_row)
            yield pd.DataFrame(rows, columns=pass_names + ["frame_idx", "frame_offset", "frame_n_bytes"])

    return df.mapInPandas(sample, schema=out_schema)
