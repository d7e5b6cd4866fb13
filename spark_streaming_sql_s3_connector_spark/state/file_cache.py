"""Driver-side dedup cache of discovered-but-unprocessed files.

Same semantics as the reference's S3ConnectorFileCache
(S3ConnectorFileCache.scala:37-160): thread-safe path→desc map,
add-if-absent CAS, purge horizon ``latestTimestamp - maxFileAgeMs``,
batch cut of first-N unprocessed entries (optionally sorted by timestamp).

Scale note: this tracks *pending* files only (purge() evicts processed and
aged entries on every commit), so memory stays O(in-flight files), not
O(all files ever seen) — the long-term seen-file set lives in the metadata
log. At 100 TB (~10^6-10^7 files) the pending window is bounded by
maxFilesPerTrigger × a few triggers, comfortably driver-sized.
"""

from __future__ import annotations

import threading
from enum import Enum
from typing import Optional

from spark_streaming_sql_s3_connector_spark.models import FileMetadata, QueueMessageDesc


class FileCacheNewFileResult(Enum):
    """reference FileCacheNewFileResults (S3ConnectorFileCache.scala:164-167)."""

    OK = "Ok"
    EXIST_IN_CACHE_NOT_PROCESSED = "ExistInCacheNotProcessed"
    EXIST_IN_CACHE_PROCESSED = "ExistInCacheProcessed"


class FileCache:
    def __init__(self, max_file_age_ms: int):
        if max_file_age_ms < 0:
            raise ValueError("maxFileAgeMs must be >= 0")
        self._max_file_age_ms = max_file_age_ms
        self._lock = threading.RLock()
        self._file_map: dict[str, QueueMessageDesc] = {}
        self._last_purge_timestamp = 0
        self._latest_timestamp = 0

    @property
    def last_purge_timestamp(self) -> int:
        return self._last_purge_timestamp

    @property
    def latest_timestamp(self) -> int:
        return self._latest_timestamp

    def _bump_latest(self, ts: int) -> None:
        if ts > self._latest_timestamp:
            self._latest_timestamp = ts

    def add(self, path: str, desc: QueueMessageDesc) -> None:
        with self._lock:
            self._file_map[path] = desc
            self._bump_latest(desc.timestamp_ms)

    def add_if_absent(self, path: str, desc: QueueMessageDesc) -> QueueMessageDesc:
        """Insert unless present; returns the entry that ended up in the map
        (the pre-existing one on a lost race — S3ConnectorFileCache.scala:73-78)."""
        with self._lock:
            ret = self._file_map.setdefault(path, desc)
            self._bump_latest(desc.timestamp_ms)
            return ret

    def is_new_file(self, path: str) -> FileCacheNewFileResult:
        with self._lock:
            desc = self._file_map.get(path)
        if desc is None:
            return FileCacheNewFileResult.OK
        if desc.is_processed:
            return FileCacheNewFileResult.EXIST_IN_CACHE_PROCESSED
        return FileCacheNewFileResult.EXIST_IN_CACHE_NOT_PROCESSED

    def get_unprocessed_files(
        self, max_files_per_trigger: Optional[int], should_sort_files: bool = False
    ) -> list[FileMetadata]:
        """Batch cut: unprocessed, not older than the purge horizon, first N
        (S3ConnectorFileCache.scala:92-139). Sorting is off by default,
        matching the reference."""
        with self._lock:
            items = [
                FileMetadata(path, desc.timestamp_ms, desc.message_id)
                for path, desc in self._file_map.items()
                if not desc.is_processed and desc.timestamp_ms >= self._last_purge_timestamp
            ]
        if should_sort_files:
            items.sort(key=lambda f: f.timestamp_ms)
        if max_files_per_trigger is not None:
            items = items[:max_files_per_trigger]
        return items

    def purge(self) -> int:
        """Advance purge horizon to latest - maxFileAge; evict aged *or
        processed* entries (S3ConnectorFileCache.scala:142-154)."""
        with self._lock:
            horizon = self._latest_timestamp - self._max_file_age_ms
            if horizon > self._last_purge_timestamp:
                self._last_purge_timestamp = horizon
            to_remove = [
                p
                for p, desc in self._file_map.items()
                if desc.timestamp_ms < self._last_purge_timestamp or desc.is_processed
            ]
            for p in to_remove:
                del self._file_map[p]
            return len(to_remove)

    def mark_processed(self, path: str) -> None:
        with self._lock:
            desc = self._file_map.get(path)
            if desc is not None:
                self._file_map[path] = QueueMessageDesc(desc.timestamp_ms, True, desc.message_id)

    @property
    def size(self) -> int:
        with self._lock:
            return len(self._file_map)
