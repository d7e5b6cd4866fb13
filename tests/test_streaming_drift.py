"""Streaming drift monitor (streaming/drift.py).

Laws: merged incremental counts == batch counts over the union
(through the connector, incl. duplicate redelivery and replay);
read_drift == the batch categorical_drift on materialized frames
(shared arithmetic — identity up to count equality); compaction
preserves both.
"""

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.drift import categorical_drift
from spark_streaming_sql_s3_connector_spark.streaming.drift import (
    compact_drift_counts,
    read_category_counts,
    read_drift,
    streaming_category_counts,
)

SCHEMA = "doc_id bigint, lang string"


def _chunk(i, n=50):
    return [
        (i * 1000 + j, None if j % 9 == 0 else f"l{(i * 2 + j) % 6}")
        for j in range(n)
    ]


def _write_files(spark, tmp_path, chunks):
    files = []
    for i, rows in enumerate(chunks):
        p = str(tmp_path / f"in_{i}.parquet")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(p)
        files.append(glob.glob(p + "/part-*.parquet")[0])
    return files


def _reader(spark, tmp_path, files, meta_dir="meta"):
    from spark_streaming_sql_s3_connector_spark.queueing.local import (
        LocalFileQueueClient,
    )
    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    register(spark)
    queue = LocalFileQueueClient(f"local://{tmp_path}/queue")
    for p in files:
        queue.send_file_event(p, int(time.time() * 1000))
    return (
        spark.readStream.format("s3-connector")
        .schema(SCHEMA)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{tmp_path}/queue")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .option("spark.s3conn.metadataPath", str(tmp_path / meta_dir))
        .option("spark.s3conn.maxFilesPerTrigger", "1")
    ), queue


def test_incremental_counts_and_drift_match_batch(spark, tmp_path):
    chunks = [_chunk(0), _chunk(1), _chunk(2)]
    files = _write_files(spark, tmp_path, chunks)
    reader, queue = _reader(spark, tmp_path, files)
    sink = str(tmp_path / "counts")
    q = streaming_category_counts(
        reader.load(), sink, str(tmp_path / "ckpt"), "lang"
    )
    try:
        q.processAllAvailable()
        queue.send_file_event(files[0], int(time.time() * 1000))  # dup
        q.processAllAvailable()
    finally:
        q.stop()
    union = spark.createDataFrame([r for c in chunks for r in c], SCHEMA)
    live = {
        r["bucket"]: r["n"] for r in read_category_counts(spark, sink).collect()
    }
    batch = {
        r["bucket"]: r["n"]
        for r in union.groupBy(
            F.coalesce(F.col("lang"), F.lit("\x20NULL")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert live == batch
    # drift vs a baseline == the batch operator on materialized frames
    baseline_rows = _chunk(7)
    baseline = spark.createDataFrame(baseline_rows, SCHEMA)
    bcounts = baseline.groupBy(
        F.coalesce(F.col("lang"), F.lit("\x20NULL")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    live_drift = sorted(
        tuple(r) for r in read_drift(spark, sink, bcounts).collect()
    )
    batch_drift = sorted(
        tuple(r) for r in categorical_drift(baseline, union, "lang").collect()
    )
    assert live_drift == batch_drift


def test_replay_and_compaction_preserve_counts(spark, tmp_path):
    chunks = [_chunk(0), _chunk(1)]
    files = _write_files(spark, tmp_path, chunks)
    sink = str(tmp_path / "counts")
    reader, _ = _reader(spark, tmp_path, files)
    q = streaming_category_counts(reader.load(), sink, str(tmp_path / "c1"), "lang")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    before = sorted(tuple(r) for r in read_category_counts(spark, sink).collect())
    # replay batch 0+1 (fresh checkpoint + admission meta, same sink)
    import shutil

    shutil.rmtree(str(tmp_path / "queue"))
    reader2, _ = _reader(spark, tmp_path, files, meta_dir="meta2")
    q2 = streaming_category_counts(reader2.load(), sink, str(tmp_path / "c2"), "lang")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    after_replay = sorted(
        tuple(r) for r in read_category_counts(spark, sink).collect()
    )
    assert before == after_replay
    # compaction
    ptr = compact_drift_counts(spark, sink)
    assert ptr == 1
    after_compact = sorted(
        tuple(r) for r in read_category_counts(spark, sink).collect()
    )
    assert before == after_compact
    assert glob.glob(os.path.join(sink, "_deltas", "batch=*")) == []
    assert compact_drift_counts(spark, sink) is None
    with pytest.raises(FileNotFoundError):
        read_category_counts(spark, str(tmp_path / "nope"))


# ------------------------------------------------- embedding modality (r9)

EMB_SCHEMA = "vec_id bigint, embedding array<double>"


def _emb_chunk(i, n=30, d=5):
    import random

    rng = random.Random(100 + i)
    return [
        (i * 1000 + j, [rng.gauss(0.1 * i, 1.0) for _ in range(d)])
        for j in range(n)
    ]


def test_streaming_embedding_moments_match_batch(spark, tmp_path):
    """Incremental per-dim moments over connector-admitted batches
    (with a duplicate redelivery) equal the batch moments over the
    union — exact decimal identity — and the drift READ against a
    baseline equals the batch embedding_drift on materialized frames.
    Compaction preserves both."""
    from spark_streaming_sql_s3_connector_spark.operators.drift import (
        embedding_drift,
        embedding_moments,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.drift import (
        compact_embedding_moments,
        read_embedding_drift,
        read_embedding_moments,
        streaming_embedding_moments,
    )

    chunks = [_emb_chunk(i) for i in range(3)]
    files = []
    for i, rows in enumerate(chunks):
        p = str(tmp_path / f"emb_{i}.parquet")
        spark.createDataFrame(rows, EMB_SCHEMA).coalesce(1).write.parquet(p)
        files.append(glob.glob(p + "/part-*.parquet")[0])
    reader, queue = _reader(spark, tmp_path, files, meta_dir="emb_meta")
    sink = str(tmp_path / "emb_state")
    # _reader fixed SCHEMA; override with the embedding one
    stream = reader.schema(EMB_SCHEMA).load()
    q = streaming_embedding_moments(
        stream, sink, str(tmp_path / "emb_ckpt"), "embedding"
    )
    try:
        q.processAllAvailable()
        queue.send_file_event(files[0], int(time.time() * 1000))  # dup
        q.processAllAvailable()
    finally:
        q.stop()
    union = spark.createDataFrame(
        [r for c in chunks for r in c], EMB_SCHEMA
    )
    want = {
        r.dim: (r.n, r.s, r.ss)
        for r in embedding_moments(union, "embedding").collect()
    }
    got = {
        r.dim: (r.n, r.s, r.ss)
        for r in read_embedding_moments(spark, sink).collect()
    }
    assert got == want  # exact decimal identity, redelivery ignored
    baseline_rows = _emb_chunk(9)
    baseline = spark.createDataFrame(baseline_rows, EMB_SCHEMA)
    want_drift = [
        tuple(r)
        for r in embedding_drift(baseline, union, "embedding").collect()
    ]
    got_drift = [
        tuple(r)
        for r in read_embedding_drift(
            spark, sink, embedding_moments(baseline, "embedding")
        ).collect()
    ]
    assert got_drift == want_drift
    assert compact_embedding_moments(spark, sink) is not None
    assert {
        r.dim: (r.n, r.s, r.ss)
        for r in read_embedding_moments(spark, sink).collect()
    } == want
    assert compact_embedding_moments(spark, sink) is None  # nothing left
