"""Observability: streaming-query listener + queue metrics surfacing.

The reference exposes 14 SQS counters and RocksDB histograms
(AsyncClientMetrics.scala:22-38, RocksDB.scala:334-381) and logs them at
commit/stop (S3ConnectorSource.scala:248-252). Here the queue counters
live on QueueClient.metrics (queueing/base.py); this module adds the
Spark-side listener that collects per-batch progress (rows, duration,
sources) so a pipeline can assert ingest health in tests and ops.
"""

from __future__ import annotations

import json
import threading
from typing import Any, Optional

try:
    from pyspark.sql.streaming.listener import StreamingQueryListener
except ImportError:  # pragma: no cover - pyspark < 3.4
    StreamingQueryListener = object  # type: ignore


class ConnectorQueryListener(StreamingQueryListener):
    """Collects micro-batch progress for connector-backed queries."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.progress: list[dict[str, Any]] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    # StreamingQueryListener API
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = {
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
        }
        with self._lock:
            self.progress.append(row)

    def onQueryIdle(self, event) -> None:  # noqa: D102 - optional callback
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append(str(event.id))

    # convenience
    def total_rows(self, query_id: Optional[str] = None) -> int:
        with self._lock:
            return sum(
                p["numInputRows"]
                for p in self.progress
                if query_id is None or p["id"] == query_id
            )

    def summary_json(self) -> str:
        with self._lock:
            return json.dumps(
                {
                    "batches": len(self.progress),
                    "rows": sum(p["numInputRows"] for p in self.progress),
                }
            )
