"""Small-file bin-packing in the connector's partition planning: many
tiny files must coalesce into few partitions (Spark's openCost /
maxPartitionBytes recipe applied to the Python-source path), while big
files keep one task each and remote/un-stat-able paths fall back to
one-file-per-task."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_streaming_sql_s3_connector_spark.sources.datasource import (
    _OPEN_COST_BYTES,
    _pack_file_slices,
)


def test_pack_small_files_coalesces(tmp_path):
    files = []
    for i in range(100):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(b"x" * 1000)  # 1 KB each, padded to openCost
        files.append((str(p), i))
    bins = _pack_file_slices(files, 128 * 1024 * 1024)
    assert bins is not None
    # every file lands exactly once
    out = sorted(f for b in bins for f in b)
    assert out == sorted(files)
    # coalesced: far fewer partitions than files, but still parallel
    assert 1 < len(bins) < 100


def test_pack_respects_max_bytes(tmp_path):
    # two files that each exceed half the cap can't share a bin
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * (6 * 1024 * 1024))
    files = [(str(big), 0), (str(big), 1), (str(big), 2)]
    bins = _pack_file_slices(files, 8 * 1024 * 1024)
    assert bins is not None and len(bins) == 3


def test_pack_unstatable_returns_none(tmp_path):
    p = tmp_path / "real.bin"
    p.write_bytes(b"x")
    bins = _pack_file_slices([(str(p), 0), ("s3://bucket/missing", 1)], 1 << 27)
    assert bins is None


def test_streaming_many_small_files_few_partitions(spark, tmp_path):
    """End-to-end: 64 tiny files through the streaming source produce
    far fewer than 64 tasks and exactly the right rows."""
    import time

    from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    register(spark)
    data = tmp_path / "data"
    data.mkdir()
    qdir = str(tmp_path / "q")
    q = LocalFileQueueClient(f"local://{qdir}")
    for i in range(64):
        p = str(data / f"p{i}.parquet")
        pq.write_table(pa.table({"id": pa.array([i], type=pa.int64())}), p)
        q.send_file_event(p, int(time.time() * 1000))
    stream = (
        spark.readStream.format("s3-connector")
        .schema("id BIGINT")
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{qdir}")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .option("spark.s3conn.maxFilesPerTrigger", "-1")
        .option("spark.s3conn.metadataPath", str(tmp_path / "meta"))
        .load()
    )
    query = (
        stream.writeStream.format("memory")
        .queryName("binpack_sink")
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        got = sorted(r.id for r in spark.sql("SELECT id FROM binpack_sink").collect())
        assert got == list(range(64))
        # (task-count assertion lives in test_streaming_planner_packs —
        # progress events don't expose partition counts)
    finally:
        query.stop()


def test_batch_reader_packs_small_files(tmp_path):
    from spark_streaming_sql_s3_connector_spark.sources.datasource import (
        S3ConnectorBatchReader,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    # enough files that bytesPerCore (total/cores) exceeds one padded
    # file and coalescing beats per-file tasks even on a wide machine
    paths = []
    for i in range(128):
        p = str(tmp_path / f"b{i}.parquet")
        pq.write_table(pa.table({"id": pa.array([i], type=pa.int64())}), p)
        paths.append(p)
    reader = S3ConnectorBatchReader(
        StructType([StructField("id", LongType())]),
        {
            "spark.s3conn.fileFormat": "parquet",
            "spark.s3conn.queueUrl": "unused",
            "spark.s3conn.queueType": "local",
            "paths": ",".join(paths),
        },
    )
    parts = reader.partitions()
    assert 1 <= len(parts) < 128
    all_files = sorted(f[0] for part in parts for f in part.files)
    assert all_files == sorted(paths)
    # rows survive the packed read
    n = sum(1 for part in parts for rb in reader.read(part) for _ in range(rb.num_rows))
    assert n == 128


def test_streaming_planner_packs(tmp_path):
    """Planner-level check: the streaming reader's partitions() output
    for 64 queued tiny files is bin-packed."""
    import time

    from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
    from spark_streaming_sql_s3_connector_spark.sources.datasource import (
        S3ConnectorStreamReader,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    data = tmp_path / "d"
    data.mkdir()
    qdir = str(tmp_path / "q")
    q = LocalFileQueueClient(f"local://{qdir}")
    for i in range(64):
        p = str(data / f"s{i}.parquet")
        pq.write_table(pa.table({"id": pa.array([i], type=pa.int64())}), p)
        q.send_file_event(p, int(time.time() * 1000))
    reader = S3ConnectorStreamReader(
        StructType([StructField("id", LongType())]),
        {
            "spark.s3conn.fileFormat": "parquet",
            "spark.s3conn.queueUrl": f"local://{qdir}",
            "spark.s3conn.queueType": "local",
            "spark.s3conn.queueFetchWaitTimeoutSeconds": "1",
            "spark.s3conn.maxFilesPerTrigger": "-1",
            "spark.s3conn.metadataPath": str(tmp_path / "meta"),
        },
    )
    try:
        start = reader.initialOffset()
        end = reader.latestOffset()
        parts = reader.partitions(start, end)
        n_files = sum(len(p.files) for p in parts)
        assert n_files == 64
        assert len(parts) < 64  # packed
    finally:
        reader.stop()
