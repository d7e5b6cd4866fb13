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


def test_late_file_beyond_watermark_is_dropped(spark, tmp_path):
    """The watermark LAW through the connector: a file whose event times
    fall entirely behind the advanced watermark contributes NOTHING —
    emitted windows keep their on-time counts and no new (stale) window
    appears. This is the bounded-state contract every 100 TB streaming
    agg relies on (state eviction is only sound if late arrivals are
    provably excluded)."""
    import datetime as dt

    register(spark)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def _mk(rows):
        return spark.createDataFrame(
            [
                (i, base + dt.timedelta(minutes=m), 1, et, 1.0, "{}")
                for i, (m, et) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    # on-time file: 3 rows in hour 0, then rows far ahead (hour 30) that
    # push the watermark (max_ts - 2h = hour 28) way past hour 0's end
    ontime = _mk([(0, "click"), (10, "click"), (20, "view"),
                  (30 * 60, "click"), (30 * 60 + 5, "view")])
    # late file: hour-0 rows arriving AFTER the watermark advanced
    late = _mk([(5, "click"), (15, "click"), (25, "view"), (35, "click")])
    d1 = str(tmp_path / "f1"); d2 = str(tmp_path / "f2")
    ontime.coalesce(1).write.parquet(d1)
    late.coalesce(1).write.parquet(d2)

    q = LocalFileQueueClient(f"local://{tmp_path}/queue")

    def _send(d):
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                q.send_file_event(os.path.join(d, f), int(time.time() * 1000))

    stream = (
        spark.readStream.format("s3-connector")
        .schema(ontime.schema)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{tmp_path}/queue")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .option("spark.s3conn.maxFilesPerTrigger", "1")
        .option("spark.s3conn.metadataPath", str(tmp_path / "meta"))
        .load()
    )
    query = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("late_law")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _send(d1)
        query.processAllAvailable()
        # one more on-time micro-batch so the watermark (set by file 1)
        # is applied and hour-0 windows EMIT before the late file lands
        before = {
            (r.window_start, r.event_type): r.cnt
            for r in spark.sql("SELECT * FROM late_law").collect()
        }
        h0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        assert before.get((h0, "click")) == 2
        assert before.get((h0, "view")) == 1
        _send(d2)
        query.processAllAvailable()
        after = {
            (r.window_start, r.event_type): r.cnt
            for r in spark.sql("SELECT * FROM late_law").collect()
        }
        # the late file's 4 hour-0 rows changed NOTHING: no re-emit, no
        # count update, no stale window resurrection
        assert after == before
    finally:
        query.stop()
