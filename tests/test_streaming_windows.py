"""Watermarked windows + custom stateful sessionization over the
connector stream source."""

import os
import time

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.plans.io import load_table
from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
from spark_streaming_sql_s3_connector_spark.sources.datasource import register
from spark_streaming_sql_s3_connector_spark.streaming.windows import (
    sessionize,
    tumbling_counts,
)


@pytest.fixture()
def events_files(spark, tmp_path, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "evfiles")
    ev.repartition(4).write.parquet(out)
    return ev, sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )


def test_tumbling_window_watermark_stream(spark, tmp_path, events_files):
    register(spark)
    ev, files = events_files
    q = LocalFileQueueClient(f"local://{tmp_path}/queue")
    for f in files:
        q.send_file_event(f, int(time.time() * 1000))
    stream = (
        spark.readStream.format("s3-connector")
        .schema(ev.schema)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{tmp_path}/queue")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .option("spark.s3conn.metadataPath", str(tmp_path / "meta"))
        .load()
    )
    agg = tumbling_counts(stream)
    query = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = spark.sql(
            "SELECT window_start, event_type, cnt FROM win_counts"
        ).collect()
        # append mode only emits windows the watermark has passed; assert
        # whatever was emitted matches the batch ground truth
        truth = {
            (r.window_start, r.event_type): r.cnt
            for r in tumbling_counts(ev).collect()
        }
        assert len(truth) > 0
        for r in got:
            assert truth[(r.window_start, r.event_type)] == r.cnt
    finally:
        query.stop()


def test_sessionize_stateful_stream(spark, tmp_path, events_files):
    register(spark)
    ev, files = events_files
    q = LocalFileQueueClient(f"local://{tmp_path}/queue")
    for f in files:  # one batch: each user's full history in one invocation
        q.send_file_event(f, int(time.time() * 1000))
    stream = (
        spark.readStream.format("s3-connector")
        .schema(ev.schema)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{tmp_path}/queue")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .option("spark.s3conn.metadataPath", str(tmp_path / "meta"))
        .load()
    )
    gap_min = 30
    sessions = sessionize(stream, gap_minutes=gap_min)
    query = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = {
            (r.user_id, r.session_start, r.session_end): r.n_events
            for r in spark.sql("SELECT * FROM sessions").collect()
        }
        # ground truth: python sessionization; in-batch-gap sessions (all
        # but each user's final, still-open session) emit in the batch
        import collections

        by_user = collections.defaultdict(list)
        all_ts = []
        for r in ev.select("user_id", "ts", "value").collect():
            by_user[r.user_id].append(r.ts)
            all_ts.append(r.ts)
        expected = {}
        gap = gap_min * 60
        # the event-time watermark after the data batch: max ts − 2h delay;
        # a user's final session emits via timeout once watermark passes
        # session_end + gap
        import datetime

        wm = max(all_ts) - datetime.timedelta(hours=2)
        for uid, tss in by_user.items():
            tss.sort()
            start = prev = tss[0]
            n = 1
            for t in tss[1:]:
                if (t - prev).total_seconds() > gap:
                    expected[(uid, start, prev)] = n
                    start, n = t, 0
                prev = t
                n += 1
            if prev + datetime.timedelta(seconds=gap) < wm:
                expected[(uid, start, prev)] = n  # closed by timeout
        assert len(expected) > 0
        assert got == expected
    finally:
        query.stop()
