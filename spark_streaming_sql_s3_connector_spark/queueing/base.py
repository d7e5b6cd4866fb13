"""Queue-client protocol + metrics.

Abstracts the reference's AsyncSqsClient trait (AsyncSqsClientImpl.scala)
into a pluggable protocol so tests run against a local file-backed queue
and production runs against SQS. Counter names mirror the reference's
AsyncClientMetrics (AsyncSqsClientMetricsImpl.scala:25-77).
"""

from __future__ import annotations

import threading
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Callable, Optional

from spark_streaming_sql_s3_connector_spark.models import FileMetadata

# consumer callback: called for each parsed FileMetadata; returns True if
# the message is consumed (deletable), False if it should stay visible.
ConsumerCallback = Callable[[FileMetadata], bool]


@dataclass
class QueueMessage:
    message_id: str
    receipt_handle: str
    body: str


@dataclass
class QueueClientMetrics:
    """Subset of the reference's 14 SQS counters that are meaningful for
    any queue implementation (AsyncClientMetrics.scala:22-38)."""

    fetch_messages: int = 0
    parse_failed_messages: int = 0
    discarded_messages: int = 0
    consumed_messages: int = 0
    deleted_messages: int = 0
    delete_failed_messages: int = 0
    visibility_changed_messages: int = 0
    fetch_rounds: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False, compare=False)

    def incr(self, name: str, n: int = 1) -> None:
        with self._lock:
            setattr(self, name, getattr(self, name) + n)

    def as_dict(self) -> dict[str, int]:
        return {
            k: getattr(self, k)
            for k in (
                "fetch_messages",
                "parse_failed_messages",
                "discarded_messages",
                "consumed_messages",
                "deleted_messages",
                "delete_failed_messages",
                "visibility_changed_messages",
                "fetch_rounds",
            )
        }


class QueueClient(ABC):
    """Driver-side queue consumer. Implementations must be thread-safe."""

    def __init__(self) -> None:
        self.metrics = QueueClientMetrics()

    @abstractmethod
    def fetch(self, consumer: ConsumerCallback, wait_timeout_seconds: float, max_files: Optional[int]) -> int:
        """Drain the queue, calling ``consumer`` per valid new file, until
        empty / timeout / max_files consumed. Returns number consumed.
        (reference asyncFetch, AsyncSqsClientImpl.scala:61-155 — the
        reference runs this async with up to 200 concurrent receives; the
        Python impls use a thread pool bounded by sqs.maxConcurrency.)"""

    @abstractmethod
    def delete_messages(self, receipt_handles: list[str]) -> int:
        """Ack/delete; batches of 10 with per-entry fallback in the SQS impl
        (AsyncSqsClientImpl.scala:238-319). Returns count deleted."""

    @abstractmethod
    def set_message_visibility(self, receipt_handle: str, visibility_timeout_seconds: int) -> None:
        """Make a message redeliverable later (AsyncSqsClientImpl.scala:442-464)."""

    def close(self) -> None:  # pragma: no cover - trivial default
        pass
