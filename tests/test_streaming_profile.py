"""Streaming incremental profile (streaming/profile.py).

Core law: after any sequence of triggers / restarts / replays /
compactions, read_profile == the batch profiler over the union of
admitted rows on every exact field (n_rows, n_null, min_value,
max_value), with n_distinct an HLL estimate of the exact count.
"""

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.profile import profile_table
from spark_streaming_sql_s3_connector_spark.streaming.profile import (
    compact_profile,
    read_profile,
    streaming_profile,
)

SCHEMA = "doc_id bigint, lang string, score double"


def _chunk(i, n=40):
    # deterministic rows; some NULLs in both profiled columns
    return [
        (
            i * 1000 + j,
            None if j % 7 == 0 else f"lang{(i + j) % 5}",
            None if j % 11 == 0 else float(i * 10 + (j % 13)) / 4,
        )
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


def _assert_matches_batch(spark, sink, union_rows, rel=0.15):
    live = {r["col_name"]: r for r in read_profile(spark, sink).collect()}
    batch = {
        r["col_name"]: r
        for r in profile_table(
            spark.createDataFrame(union_rows, SCHEMA)
        ).collect()
    }
    assert set(live) == set(batch)
    for c, b in batch.items():
        l = live[c]
        for f_ in ("n_rows", "n_null", "min_value", "max_value"):
            assert l[f_] == b[f_], (c, f_, l[f_], b[f_])
        # HLL estimate vs exact
        assert abs(l["n_distinct"] - b["n_distinct"]) <= max(
            2, rel * b["n_distinct"]
        ), (c, l["n_distinct"], b["n_distinct"])


def test_incremental_matches_batch_through_connector(spark, tmp_path):
    chunks = [_chunk(0), _chunk(1), _chunk(2)]
    files = _write_files(spark, tmp_path, chunks)
    reader, queue = _reader(spark, tmp_path, files)
    sink = str(tmp_path / "prof")
    q = streaming_profile(reader.load(), sink, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        # duplicate event redelivery: profile must not move
        queue.send_file_event(files[0], int(time.time() * 1000))
        q.processAllAvailable()
    finally:
        q.stop()
    union = [r for c in chunks for r in c]
    _assert_matches_batch(spark, sink, union)


def test_compaction_preserves_profile_and_bounds_files(spark, tmp_path):
    chunks = [_chunk(i) for i in range(4)]
    files = _write_files(spark, tmp_path, chunks)
    reader, _ = _reader(spark, tmp_path, files)
    sink = str(tmp_path / "prof")
    q = streaming_profile(reader.load(), sink, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    before = sorted(
        tuple(r) for r in read_profile(spark, sink).collect()
    )
    assert len(glob.glob(os.path.join(sink, "_deltas", "batch=*"))) == 4
    ptr = compact_profile(spark, sink)
    assert ptr == 3
    after = sorted(tuple(r) for r in read_profile(spark, sink).collect())
    assert before == after
    assert glob.glob(os.path.join(sink, "_deltas", "batch=*")) == []
    # idempotent: nothing left to fold
    assert compact_profile(spark, sink) is None
    union = [r for c in chunks for r in c]
    _assert_matches_batch(spark, sink, union)


def test_replay_converges(spark, tmp_path):
    chunks = [_chunk(0)]
    files = _write_files(spark, tmp_path, chunks)
    sink = str(tmp_path / "prof")
    reader, _ = _reader(spark, tmp_path, files)
    q = streaming_profile(reader.load(), sink, str(tmp_path / "ckpt1"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted(tuple(r) for r in read_profile(spark, sink).collect())
    # replay batch 0 (fresh checkpoint + fresh admission metadata, same
    # sink): the delta dir overwrites itself — profile unchanged
    import shutil

    shutil.rmtree(str(tmp_path / "queue"))
    reader2, _ = _reader(spark, tmp_path, files, meta_dir="meta2")
    q2 = streaming_profile(reader2.load(), sink, str(tmp_path / "ckpt2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    second = sorted(tuple(r) for r in read_profile(spark, sink).collect())
    assert first == second
    _assert_matches_batch(spark, sink, chunks[0])


def test_column_subset_and_missing_state(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_profile(spark, str(tmp_path / "nope"))
    chunks = [_chunk(0)]
    files = _write_files(spark, tmp_path, chunks)
    reader, _ = _reader(spark, tmp_path, files)
    sink = str(tmp_path / "prof")
    q = streaming_profile(
        reader.load(), sink, str(tmp_path / "ckpt"), columns=["lang"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = read_profile(spark, sink).collect()
    assert [r["col_name"] for r in rows] == ["lang"]
    assert rows[0]["n_rows"] == 40
