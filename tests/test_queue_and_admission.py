"""Queue parsing fixtures (port of AsyncSqsClientSuite message cases) and
the admission-controller exactly-once flow against the local file queue."""

import json
import os

import pytest

from spark_streaming_sql_s3_connector_spark.models import FileMetadata
from spark_streaming_sql_s3_connector_spark.options import S3ConnectorSourceOptions
from spark_streaming_sql_s3_connector_spark.queueing.events import (
    S3EventNotCreated,
    S3EventParseError,
    make_s3_event_body,
    parse_s3_event,
)
from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
from spark_streaming_sql_s3_connector_spark.sources.admission import (
    AdmissionController,
    ReprocessDryRunComplete,
    ReprocessLockExistsError,
)

# exact fixture shape from the reference (AsyncSqsClientSuite.scala:50-63)
OBJECT_CREATED_BODY = json.dumps(
    {
        "Records": [
            {
                "eventVersion": "2.1",
                "eventSource": "aws:s3",
                "awsRegion": "us-east-2",
                "eventTime": "2023-02-14T22:53:31.748Z",
                "eventName": "ObjectCreated:Put",
                "s3": {
                    "s3SchemaVersion": "1.0",
                    "bucket": {"name": "testbucket"},
                    "object": {
                        "key": "valPartition%3Dpart1678486410_0/part-00000-created.csv",
                        "size": 16,
                    },
                },
            }
        ]
    }
)

OBJECT_REMOVED_BODY = OBJECT_CREATED_BODY.replace("ObjectCreated:Put", "ObjectRemoved:Delete")
BAD_BODY = '{"Records":"bad message"}'


def test_parse_object_created():
    meta = parse_s3_event(OBJECT_CREATED_BODY, message_id="rh1")
    assert meta.file_path == "s3a://testbucket/valPartition=part1678486410_0/part-00000-created.csv"
    assert meta.timestamp_ms == 1676415211748
    assert meta.message_id == "rh1"


def test_parse_object_removed_discarded():
    with pytest.raises(S3EventNotCreated):
        parse_s3_event(OBJECT_REMOVED_BODY)


def test_parse_bad_message():
    with pytest.raises(S3EventParseError):
        parse_s3_event(BAD_BODY)


def test_roundtrip_local_event_body():
    body = make_s3_event_body("/tmp/data/f1.csv", 1676415211748)
    meta = parse_s3_event(body)
    assert meta.file_path.endswith("/tmp/data/f1.csv")
    assert meta.timestamp_ms == 1676415211748


def opts(tmp_path, **over):
    base = {
        "spark.s3conn.fileFormat": "csv",
        "spark.s3conn.queueUrl": f"local://{tmp_path}/queue",
        "spark.s3conn.queueType": "local",
        "spark.s3conn.queueFetchWaitTimeoutSeconds": "1",
    }
    base.update(over)
    return S3ConnectorSourceOptions.parse(base)


def test_local_queue_fetch_and_delete(tmp_path):
    q = LocalFileQueueClient(f"local://{tmp_path}/queue")
    q.send_file_event("/data/f1.csv", 1000)
    q.send_file_event("/data/f2.csv", 2000)
    q.send_body(OBJECT_REMOVED_BODY)  # discarded
    q.send_body(BAD_BODY)  # parse failure → deleted
    seen = []

    def consumer(meta: FileMetadata) -> bool:
        seen.append(meta.file_path)
        return True

    n = q.fetch(consumer, wait_timeout_seconds=2, max_files=None)
    assert n == 2
    assert len(seen) == 2
    assert q.metrics.discarded_messages == 1
    assert q.metrics.parse_failed_messages == 1
    # consumed messages are still in-flight (ack is the controller's job)
    assert q.approximate_number_of_messages() == 2


def test_admission_exactly_once(tmp_path):
    o = opts(tmp_path)
    ac = AdmissionController(o, str(tmp_path / "meta"))
    q: LocalFileQueueClient = ac.queue_client
    q.send_file_event("/data/f1.csv", 1000)
    q.send_file_event("/data/f2.csv", 2000)

    off = ac.fetch_max_offset()
    assert off == 0
    files = ac.get_batch_files(-1, 0)
    assert sorted(e.path for e in files) == [
        "file:///data/f1.csv",
        "file:///data/f2.csv",
    ]
    # acked after durable logging
    assert q.approximate_number_of_messages() == 0

    # re-deliver the same events → must be screened out (exactly-once)
    q.send_file_event("/data/f1.csv", 1000)
    q.send_file_event("/data/f2.csv", 2000)
    off2 = ac.fetch_max_offset()
    assert off2 == 0  # no new batch
    assert q.approximate_number_of_messages() == 0  # duplicates deleted

    # a genuinely new file still flows
    q.send_file_event("/data/f3.csv", 3000)
    off3 = ac.fetch_max_offset()
    assert off3 == 1
    assert [e.path for e in ac.get_batch_files(0, 1)] == ["file:///data/f3.csv"]
    ac.close()


def test_admission_max_files_per_trigger(tmp_path):
    o = opts(tmp_path, **{"spark.s3conn.maxFilesPerTrigger": "2"})
    ac = AdmissionController(o, str(tmp_path / "meta"))
    q = ac.queue_client
    for i in range(5):
        q.send_file_event(f"/data/f{i}.csv", 1000 + i)
    offsets = []
    for _ in range(4):
        offsets.append(ac.fetch_max_offset())
    # 5 files at ≤2/trigger → batches 0,1,2 then no-op
    assert offsets == [0, 1, 2, 2]
    assert len(ac.get_batch_files(-1, 2)) == 5
    ac.close()


def test_admission_glob_filter(tmp_path):
    o = opts(tmp_path, **{"spark.s3conn.pathGlobFilter": "*.csv"})
    ac = AdmissionController(o, str(tmp_path / "meta"))
    q = ac.queue_client
    q.send_file_event("/data/keep.csv", 1000)
    q.send_file_event("/data/skip.json", 1000)
    off = ac.fetch_max_offset()
    assert off == 0
    files = ac.get_batch_files(-1, 0)
    assert [e.path for e in files] == ["file:///data/keep.csv"]
    ac.close()


def test_admission_restart_recovers_offset_and_dedup(tmp_path):
    o = opts(tmp_path)
    meta_dir = str(tmp_path / "meta")
    ac = AdmissionController(o, meta_dir)
    ac.queue_client.send_file_event("/data/f1.csv", 1000)
    assert ac.fetch_max_offset() == 0
    ac.close()

    ac2 = AdmissionController(opts(tmp_path), meta_dir)
    assert ac2.current_offset == 0
    # duplicate event after restart still screened by the persisted log
    ac2.queue_client.send_file_event("/data/f1.csv", 1000)
    assert ac2.fetch_max_offset() == 0
    ac2.close()


def test_reprocess_dry_run_and_lock(tmp_path):
    meta_dir = str(tmp_path / "meta")
    ac = AdmissionController(opts(tmp_path), meta_dir)
    ac.queue_client.send_file_event("/data/f1.csv", 1000)
    ac.queue_client.send_file_event("/data/f2.csv", 2000)
    ac.fetch_max_offset()
    ac.close()

    re_opts = {
        "spark.s3conn.reprocessStartBatchId": "0",
        "spark.s3conn.reprocessEndBatchId": "0",
    }
    with pytest.raises(ReprocessDryRunComplete, match="2 files"):
        AdmissionController(opts(tmp_path, **re_opts), meta_dir)

    # in-action: replays files as a NEW batch id
    ac2 = AdmissionController(
        opts(tmp_path, **{**re_opts, "spark.s3conn.reprocessDryRun": "false"}), meta_dir
    )
    off = ac2.fetch_max_offset()
    assert off == 1
    assert sorted(e.path for e in ac2.get_batch_files(0, 1)) == [
        "file:///data/f1.csv",
        "file:///data/f2.csv",
    ]
    ac2.close()

    # lock file blocks a second reprocess run
    with pytest.raises(ReprocessLockExistsError):
        AdmissionController(
            opts(tmp_path, **{**re_opts, "spark.s3conn.reprocessDryRun": "false"}), meta_dir
        )


def test_visibility_redelivery(tmp_path):
    q = LocalFileQueueClient(f"local://{tmp_path}/q", visibility_timeout_seconds=0)
    q.send_file_event("/data/f1.csv", 1000)
    claimed = q._receive(10)
    assert len(claimed) == 1
    # visibility 0 ⇒ immediately redeliverable
    claimed2 = q._receive(10)
    assert len(claimed2) == 1


def test_async_prefetch_across_triggers(tmp_path):
    """A fetch slower than the trigger budget keeps running in the
    background; the slow file is reaped by a LATER trigger (the
    reference's asyncFetch contract, S3ConnectorSource.scala:197-199)."""
    import threading
    import time as _time

    from spark_streaming_sql_s3_connector_spark.queueing.base import QueueClient

    class SlowQueue(QueueClient):
        def __init__(self):
            super().__init__()
            self.started = threading.Event()

        def fetch(self, consumer, wait_timeout_seconds, max_files):
            self.started.set()
            _time.sleep(1.0)  # slower than the 0.2 s trigger budget
            consumer(FileMetadata("/data/slow.csv", 1000, None))
            return 1

        def delete_messages(self, receipt_handles):
            return len(receipt_handles)

        def set_message_visibility(self, receipt_handle, visibility_timeout_seconds):
            pass

        def close(self):
            pass

    o = S3ConnectorSourceOptions.parse(
        {
            "spark.s3conn.queueUrl": "stub://q",
            "spark.s3conn.queueType": "local",
            "spark.s3conn.fileFormat": "csv",
            "spark.s3conn.queueFetchWaitTimeoutSeconds": "1",
        }
    )
    # shrink the trigger budget below the fetch duration
    object.__setattr__(o, "queue_fetch_wait_timeout_seconds", 0.2)
    ac = AdmissionController(o, str(tmp_path / "meta"), queue_client=SlowQueue())
    try:
        t0 = _time.time()
        off1 = ac.fetch_max_offset()
        assert _time.time() - t0 < 0.9  # returned before the fetch finished
        assert off1 == -1  # nothing admitted yet
        ac.queue_client.started.wait(2)
        _time.sleep(1.2)  # let the background fetch admit the file
        off2 = ac.fetch_max_offset()
        assert off2 == 0
        assert [e.path for e in ac.get_batch_files(-1, 0)] == ["/data/slow.csv"]
    finally:
        ac.close()


def test_concurrent_duplicate_delivery_admits_once(tmp_path):
    """SURVEY §7.4 hard-part #1: N threads delivering the SAME file
    concurrently — exactly one admission wins the cache CAS; losers are
    retried (visibility), never deleted; the file is logged exactly once."""
    import threading

    o = opts(tmp_path)
    ac = AdmissionController(o, str(tmp_path / "meta"))
    results = []
    barrier = threading.Barrier(8)

    def deliver():
        barrier.wait()
        meta = FileMetadata("/data/hot.csv", 1000, None)
        results.append(ac.consumer(meta))

    threads = [threading.Thread(target=deliver) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(results) == 1  # exactly one True
    off = ac.fetch_max_offset()
    assert off == 0
    entries = ac.get_batch_files(-1, 0)
    assert len(entries) == 1
    # redelivery after logging is screened by the log (not the cache)
    ac.file_cache.purge()
    assert ac.consumer(FileMetadata("/data/hot.csv", 1000, None)) is False
    ac.close()
