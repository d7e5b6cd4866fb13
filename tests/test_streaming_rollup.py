"""Continuous aggregate (streaming/rollup.py): incremental correctness
vs a batch groundtruth, replay idempotence, compaction equivalence, and
crash-ordering safety of the version pointer."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_sql_s3_connector_spark.streaming import rollup as R

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, data_dir, name, rows):
    # the file stream source watches a flat directory — land each batch
    # as a single file, not a nested dataset dir
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(data_dir, f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def _rows(base_min, n, etype="click"):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return [
        (t0 + dt.timedelta(minutes=base_min + i), etype, float(i)) for i in range(n)
    ]


def _run_stream(spark, data_dir, sink, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(data_dir)
    q = R.continuous_aggregate(
        stream,
        sink,
        ckpt,
        bucket_width_seconds=3600,
        trigger_available_now=False,
    )
    q.processAllAvailable()
    q.stop()


def _groundtruth(spark, data_dir):
    df = spark.read.schema(SCHEMA).parquet(data_dir)
    return {
        (r["bucket"], r["event_type"]): (r["cnt"], r["total"], r["vmin"], r["vmax"])
        for r in df.withColumn("bucket", R.time_bucket(F.col("ts"), 3600))
        .groupBy("bucket", "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }


def _materialized(spark, sink):
    return {
        (r["bucket"], r["event_type"]): (r["cnt"], r["total"], r["vmin"], r["vmax"])
        for r in R.read_rollup(spark, sink).collect()
    }


def test_incremental_matches_batch_groundtruth(spark, tmp_path):
    data, sink, ckpt = (str(tmp_path / d) for d in ("data", "sink", "ckpt"))
    os.makedirs(data)
    _write_batch(spark, data, "b0", _rows(0, 90, "click") + _rows(30, 40, "view"))
    _run_stream(spark, data, sink, ckpt)
    # second increment: same buckets touched again + a brand-new bucket
    _write_batch(spark, data, "b1", _rows(45, 90, "click") + _rows(200, 10, "view"))
    _run_stream(spark, data, sink, ckpt)

    assert _materialized(spark, sink) == _groundtruth(spark, data)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    data, sink, ckpt = (str(tmp_path / d) for d in ("data", "sink", "ckpt"))
    os.makedirs(data)
    _write_batch(spark, data, "b0", _rows(0, 60))
    _run_stream(spark, data, sink, ckpt)
    before = _materialized(spark, sink)

    # simulate the crash-replay: rerun batch 0's processing directly — the
    # delta dir for that batch id is overwritten, not appended
    batch_df = spark.read.schema(SCHEMA).parquet(os.path.join(data, "b0.parquet"))
    delta = (
        batch_df.withColumn("bucket", R.time_bucket(F.col("ts"), 3600))
        .groupBy("bucket", "event_type")
        .agg(*[fn(F.col("value")).alias(name) for name, fn in R._PARTIALS])
    )
    delta.write.mode("overwrite").parquet(R._delta_dir(sink, 0))

    assert _materialized(spark, sink) == before


def test_compaction_preserves_results_and_gcs_deltas(spark, tmp_path):
    data, sink, ckpt = (str(tmp_path / d) for d in ("data", "sink", "ckpt"))
    os.makedirs(data)
    _write_batch(spark, data, "b0", _rows(0, 50, "click"))
    _run_stream(spark, data, sink, ckpt)
    _write_batch(spark, data, "b1", _rows(10, 50, "view"))
    _run_stream(spark, data, sink, ckpt)

    before = _materialized(spark, sink)
    v = R.compact_rollup(spark, sink)
    assert v is not None
    assert _materialized(spark, sink) == before
    assert R._delta_ids(sink) == []  # folded deltas collected

    # post-compaction increments keep merging correctly
    _write_batch(spark, data, "b2", _rows(20, 30, "click"))
    _run_stream(spark, data, sink, ckpt)
    assert _materialized(spark, sink) == _groundtruth(spark, data)

    # folding the new delta, then idempotent when nothing is pending
    assert R.compact_rollup(spark, sink) == 2
    assert R.compact_rollup(spark, sink) is None
    assert _materialized(spark, sink) == _groundtruth(spark, data)


def test_unflipped_pointer_leaves_readers_on_old_state(spark, tmp_path):
    """Crash between base write and pointer flip must be invisible."""
    data, sink, ckpt = (str(tmp_path / d) for d in ("data", "sink", "ckpt"))
    os.makedirs(data)
    _write_batch(spark, data, "b0", _rows(0, 40))
    _run_stream(spark, data, sink, ckpt)
    before = _materialized(spark, sink)

    # write a new base version WITHOUT flipping the pointer (the crash
    # window) — readers must not see it
    frames = R._live_frames(spark, sink)
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    R._merge(df, ["event_type"]).write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(sink, "base", "v=99")
    )
    assert _materialized(spark, sink) == before


def test_time_bucket_is_exact(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1, 10, 59, 59, 999999),), (dt.datetime(2024, 3, 1, 11, 0, 0, 0),)],
        T.StructType([T.StructField("ts", T.TimestampType())]),
    )
    got = [r[0] for r in df.select(R.time_bucket(F.col("ts"), 3600)).collect()]
    assert got == [dt.datetime(2024, 3, 1, 10, 0), dt.datetime(2024, 3, 1, 11, 0)]


def test_distinct_sketch_merges_across_increments_and_compaction(spark, tmp_path):
    """HLL partials: approx-distinct per bucket must equal the exact
    distinct (small cardinalities are exact in the sketch) and survive
    delta folds."""
    import datetime as dt

    data, sink, ckpt = (str(tmp_path / d) for d in ("data", "sink", "ckpt"))
    os.makedirs(data)
    t0 = dt.datetime(2024, 1, 1)
    users = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("user_id", T.LongType()),
        ]
    )

    def batch(n0, n1):
        rows = [
            (t0 + dt.timedelta(minutes=i % 50), "click", 1.0, i) for i in range(n0, n1)
        ]
        import glob
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp()
        spark.createDataFrame(rows, users).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(data, f"b{n0}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    def run():
        stream = spark.readStream.schema(users).parquet(data)
        q = R.continuous_aggregate(
            stream, sink, ckpt, bucket_width_seconds=3600, distinct_col="user_id"
        )
        q.processAllAvailable()
        q.stop()

    batch(0, 60)
    run()
    batch(30, 100)  # users 30..59 repeat — distinct must not double-count
    run()
    got = R.read_rollup(spark, sink).collect()
    assert len(got) == 1
    assert got[0]["approx_distinct"] == 100
    assert got[0]["cnt"] == 130

    R.compact_rollup(spark, sink)
    got2 = R.read_rollup(spark, sink).collect()
    assert got2[0]["approx_distinct"] == 100
