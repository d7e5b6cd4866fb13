"""Stateful fake-SQS suite: the reference's batch-delete matrix and
visibility scenarios (AsyncSqsClientSuite.scala:742, 442-464) run against
an in-process SQS with REAL queue semantics — a message store with
per-receive receipt handles and visibility deadlines on a logical clock —
so retry slides, redelivery, and interleaved fetch/delete/visibility
calls exercise actual state transitions, not mock call recordings.
"""

from __future__ import annotations

import itertools
import json

import pytest

from spark_streaming_sql_s3_connector_spark.queueing.sqs import (
    MAX_SQS_BATCH_SIZE,
    SqsQueueClient,
)


def created_body(key: str) -> str:
    return json.dumps(
        {
            "Records": [
                {
                    "eventTime": "2023-02-14T22:53:31.748Z",
                    "eventName": "ObjectCreated:Put",
                    "s3": {"bucket": {"name": "b"}, "object": {"key": key, "size": 1}},
                }
            ]
        }
    )


class StatefulFakeSqs:
    """boto3-sqs double with real queue semantics:

    - a message is VISIBLE when ``clock >= visible_at`` and not deleted;
    - every receive issues a FRESH receipt handle and hides the message
      for ``VisibilityTimeout`` (so stale handles exist, like real SQS);
    - delete/change_message_visibility accept only the CURRENT handle;
    - time only moves via ``advance()`` — tests control redelivery
      deterministically instead of sleeping.

    ``fail_batch_delete_keys`` programs delete_message_batch failures by
    object key (the reference matrix's knob); ``fail_single_delete``
    makes the per-entry fallback fail too.
    """

    def __init__(self, bodies, fail_batch_delete_keys=(), fail_single_delete=False):
        self.clock = 0.0
        self._seq = itertools.count()
        self.msgs = {}
        for body in bodies:
            mid = f"m{next(self._seq)}"
            self.msgs[mid] = {
                "id": mid,
                "body": body,
                "visible_at": 0.0,
                "handle": None,
                "receives": 0,
                "deleted": False,
            }
        self.fail_batch_delete_keys = set(fail_batch_delete_keys)
        self.fail_single_delete = fail_single_delete

    # -- test controls / inspection --

    def advance(self, dt: float) -> None:
        self.clock += dt

    def live(self) -> list[dict]:
        return [m for m in self.msgs.values() if not m["deleted"]]

    def in_flight(self) -> list[dict]:
        return [m for m in self.live() if m["visible_at"] > self.clock]

    def visible(self) -> list[dict]:
        return [m for m in self.live() if m["visible_at"] <= self.clock]

    def _by_handle(self, handle: str):
        for m in self.live():
            if m["handle"] == handle:
                return m
        return None

    def _key_of(self, m) -> str:
        try:
            return json.loads(m["body"])["Records"][0]["s3"]["object"]["key"]
        except Exception:
            return ""

    # -- the boto3 surface the client calls --

    def receive_message(self, QueueUrl, MaxNumberOfMessages=10, WaitTimeSeconds=0, VisibilityTimeout=60):
        out = []
        for m in self.visible():
            if len(out) >= MaxNumberOfMessages:
                break
            m["receives"] += 1
            m["handle"] = f"{m['id']}-h{m['receives']}"
            m["visible_at"] = self.clock + VisibilityTimeout
            out.append(
                {"MessageId": m["id"], "ReceiptHandle": m["handle"], "Body": m["body"]}
            )
        return {"Messages": out}

    def delete_message_batch(self, QueueUrl, Entries):
        assert len(Entries) <= MAX_SQS_BATCH_SIZE, "slide exceeded the SQS cap"
        ok, failed = [], []
        for e in Entries:
            m = self._by_handle(e["ReceiptHandle"])
            if m is None:
                failed.append({"Id": e["Id"]})  # stale/unknown handle
            elif self._key_of(m) in self.fail_batch_delete_keys:
                failed.append({"Id": e["Id"]})  # programmed transient failure
            else:
                m["deleted"] = True
                ok.append({"Id": e["Id"]})
        return {"Successful": ok, "Failed": failed}

    def delete_message(self, QueueUrl, ReceiptHandle):
        if self.fail_single_delete:
            raise RuntimeError("single delete failed")
        m = self._by_handle(ReceiptHandle)
        if m is None:
            raise RuntimeError("ReceiptHandleIsInvalid")
        m["deleted"] = True

    def change_message_visibility(self, QueueUrl, ReceiptHandle, VisibilityTimeout):
        m = self._by_handle(ReceiptHandle)
        if m is None:
            raise RuntimeError("ReceiptHandleIsInvalid")
        m["visible_at"] = self.clock + VisibilityTimeout


def _client(fake, **kw):
    kw.setdefault("visibility_timeout_seconds", 60)
    return SqsQueueClient(
        "q", "us-east-1", long_poll_wait_seconds=0, sqs_client=fake, **kw
    )


def test_receive_hides_then_redelivers_with_fresh_handle():
    fake = StatefulFakeSqs([created_body("a.csv")])
    c = _client(fake)
    seen = []
    # consumer refuses (cache-race path): client visibility-retries
    c.fetch(
        lambda meta: seen.append(meta.message_id)
        or c.set_message_visibility(meta.message_id, 30) is not None,
        wait_timeout_seconds=1,
        max_files=None,
    )
    assert len(seen) == 1 and fake.in_flight()  # hidden, not deleted
    # before the visibility deadline: nothing to receive
    fake.advance(10)
    assert fake.visible() == []
    # past it: redelivered with a NEW receipt handle
    fake.advance(30)
    n = c.fetch(
        lambda meta: seen.append(meta.message_id) or True,
        wait_timeout_seconds=1,
        max_files=None,
    )
    assert n == 1
    assert len(seen) == 2 and seen[1] != seen[0], "redelivery must re-handle"
    # ack with the CURRENT handle actually removes it from the store
    assert c.delete_messages([seen[1]]) == 1
    assert fake.live() == []
    c.close()


def test_stale_handle_delete_falls_back_and_fails_observably():
    fake = StatefulFakeSqs([created_body("a.csv")])
    c = _client(fake)
    got = []
    c.fetch(lambda meta: got.append(meta.message_id) or True, 1, None)
    old_handle = got[0]
    fake.advance(61)  # visibility lapses
    c.fetch(lambda meta: got.append(meta.message_id) or True, 1, None)
    # deleting with the STALE handle: batch fails, single retry raises →
    # failure metric; message survives
    assert c.delete_messages([old_handle]) == 0
    assert c.metrics.delete_failed_messages == 1
    assert len(fake.live()) == 1
    # the fresh handle works
    assert c.delete_messages([got[1]]) == 1
    assert fake.live() == []
    c.close()


# the reference's table-driven partial-failure matrix
# (AsyncSqsClientSuite.scala:742) over REAL store state: after the call,
# messages must actually be gone (or not) from the queue
@pytest.mark.parametrize(
    "n_msgs,fail_keys,fail_single,expect_deleted,expect_failed_metric",
    [
        (25, (), False, 25, 0),  # three slides of <=10, all succeed
        (10, ("k3.csv", "k7.csv"), False, 10, 0),  # retried singly, succeed
        (10, ("k3.csv",), True, 9, 1),  # single retry also fails
        (0, (), False, 0, 0),  # empty ack is a no-op
    ],
)
def test_batch_delete_matrix_stateful(
    n_msgs, fail_keys, fail_single, expect_deleted, expect_failed_metric
):
    fake = StatefulFakeSqs(
        [created_body(f"k{i}.csv") for i in range(n_msgs)],
        fail_batch_delete_keys=fail_keys,
        fail_single_delete=fail_single,
    )
    c = _client(fake)
    handles = []
    c.fetch(lambda meta: handles.append(meta.message_id) or True, 2, None)
    assert len(handles) == n_msgs
    deleted = c.delete_messages(handles)
    assert deleted == expect_deleted
    assert c.metrics.delete_failed_messages == expect_failed_metric
    assert len(fake.live()) == n_msgs - expect_deleted
    c.close()


def test_interleaved_fetch_delete_visibility():
    """The drain in one trigger interleaves with acks and retries from
    the admission side: fetch 12, ack 5 mid-stream, extend 2, let the
    rest lapse — the next trigger must see exactly the unacked,
    unextended ones plus (later) the extended pair."""
    fake = StatefulFakeSqs([created_body(f"f{i:02d}.csv") for i in range(12)])
    c = _client(fake)
    handles = []
    c.fetch(lambda meta: handles.append(meta.message_id) or True, 2, None)
    assert len(handles) == 12 and len(fake.in_flight()) == 12
    acked, extended, lapsing = handles[:5], handles[5:7], handles[7:]
    assert c.delete_messages(acked) == 5
    for h in extended:
        c.set_message_visibility(h, 300)
    fake.advance(61)  # default visibility lapses; extensions hold
    second = []
    c.fetch(lambda meta: second.append(meta.message_id) or True, 2, None)
    assert len(second) == len(lapsing), "only the lapsed 5 redeliver"
    assert c.delete_messages(second) == 5
    fake.advance(300)  # now the extended pair lapses too
    third = []
    c.fetch(lambda meta: third.append(meta.message_id) or True, 2, None)
    assert len(third) == 2
    assert c.delete_messages(third) == 2
    assert fake.live() == []
    c.close()


def test_admission_controller_over_stateful_sqs(tmp_path):
    """End-to-end exactly-once over the stateful fake: duplicates
    delivered twice must be screened AND their messages actually deleted
    from the store (the mock suite only asserted the delete CALLS)."""
    from spark_streaming_sql_s3_connector_spark.options import (
        S3ConnectorSourceOptions,
    )
    from spark_streaming_sql_s3_connector_spark.sources.admission import (
        AdmissionController,
    )

    fake = StatefulFakeSqs(
        [created_body("data/a.csv"), created_body("data/b.csv")]
    )
    o = S3ConnectorSourceOptions.parse(
        {
            "spark.s3conn.fileFormat": "csv",
            "spark.s3conn.queueUrl": "https://sqs.us-east-1.amazonaws.com/1/q",
            "spark.s3conn.queueType": "sqs",
            "spark.s3conn.queueRegion": "us-east-1",
            "spark.s3conn.queueFetchWaitTimeoutSeconds": "1",
        }
    )
    qc = _client(fake)
    ac = AdmissionController(o, str(tmp_path / "meta"), queue_client=qc)
    assert ac.fetch_max_offset() == 0
    assert sorted(e.path for e in ac.get_batch_files(-1, 0)) == [
        "s3a://b/data/a.csv",
        "s3a://b/data/b.csv",
    ]
    assert fake.live() == [], "ack must remove the batch's messages"
    # duplicate events arrive (S3 at-least-once): screened and deleted
    for m in [created_body("data/a.csv"), created_body("data/b.csv")]:
        mid = f"m{next(fake._seq)}"
        fake.msgs[mid] = {
            "id": mid,
            "body": m,
            "visible_at": fake.clock,
            "handle": None,
            "receives": 0,
            "deleted": False,
        }
    assert ac.fetch_max_offset() == 0  # no new batch
    assert fake.live() == [], "duplicates deleted, not retried forever"
    ac.close()
