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
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)

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


def sample_frames(df: DataFrame, payload_col: str = "payload", every_n: int = 30) -> DataFrame:
    """Video frame sampling — stub (no video codec in this container)."""
    raise NotImplementedError(
        "video frame sampling requires a codec library (e.g. av/ffmpeg), "
        "not installed in this environment"
    )
