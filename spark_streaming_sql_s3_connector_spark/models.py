"""Metadata-plane records.

Mirrors the reference's model types (S3ConnectorModel.scala:23-34 and the
FileEntry imported from Spark at S3ConnectorSource.scala:35) as plain
Python dataclasses with JSON codecs — SURVEY.md §1.2.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Optional


@dataclass(frozen=True)
class FileMetadata:
    """A discovered file (reference S3ConnectorModel.scala:32-34).

    ``message_id`` is the queue receipt handle (None for replayed files).
    """

    file_path: str
    timestamp_ms: int
    message_id: Optional[str] = None


@dataclass
class QueueMessageDesc:
    """File-cache entry value (reference S3ConnectorModel.scala:23-25)."""

    timestamp_ms: int
    is_processed: bool
    message_id: Optional[str] = None


@dataclass(frozen=True)
class FileEntry:
    """Persisted metadata-log record (Spark's FileStreamSource.FileEntry,
    used by the reference at S3ConnectorSource.scala:207-210)."""

    path: str
    timestamp: int
    batch_id: int

    def to_dict(self) -> dict[str, Any]:
        return {"path": self.path, "timestamp": self.timestamp, "batchId": self.batch_id}

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "FileEntry":
        return cls(path=d["path"], timestamp=int(d["timestamp"]), batch_id=int(d["batchId"]))


@dataclass(frozen=True)
class FileStreamSourceOffset:
    """Single monotonically increasing batch id offset
    (reference S3ConnectorSource.scala:160-161,241)."""

    log_offset: int

    def json(self) -> str:
        return json.dumps({"logOffset": self.log_offset})

    @classmethod
    def from_json(cls, s: str) -> "FileStreamSourceOffset":
        return cls(log_offset=int(json.loads(s)["logOffset"]))
