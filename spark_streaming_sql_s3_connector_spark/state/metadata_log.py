"""Exactly-once metadata log: batchId → [FileEntry], plus a seen-files index.

Replaces the reference's ~1,600-LoC RocksDB state store
(RocksDBS3SourceLog.scala + org.apache.spark.sql.streaming.connector.s3.*)
with the HDFSMetadataLog pattern Spark's own FileStreamSource uses, per
SURVEY.md §7.1: one JSON file per batch under ``<dir>/batches/``, written
atomically (tmp + rename, exclusive create detects duplicate batch ids),
plus a periodically compacted ``seen`` snapshot so startup doesn't replay
the whole history.

Behavioral parity with RocksDBS3SourceLog:
- ``add`` returns False on duplicate batchId (scala:191-255);
- ``get_range`` raises on holes (scala:345-360);
- ``is_new_file`` re-admits files whose logged ts < purge horizon (scala:295-314);
- bounded GC: ≤ MAX_BATCH_TO_REMOVE_PER_ADD batches cleaned per add, a batch
  is only removed when batch ts AND max file ts are below the horizon
  (scala:416-460, 489).

The log's file ops go through ``state.log_fs.LogFileSystem``, so the log
dir may live on a local disk OR any ``pyarrow.fs`` store (``s3://``,
``hdfs://``) — the analog of the reference checkpointing RocksDB state to
DFS (RocksDBFileManager.scala:157-312): a driver relaunch on a new node
recovers admission state from the object store.
"""

from __future__ import annotations

import json
import time
import threading
import zlib
from typing import Callable, Optional

from spark_streaming_sql_s3_connector_spark.models import FileEntry
from spark_streaming_sql_s3_connector_spark.state.log_fs import (
    LogFileSystem,
    filesystem_for,
)

MAX_BATCH_TO_REMOVE_PER_ADD = 20
COMPACT_EVERY_N_ADDS = 25
VERSION = 1
# The seen-files index is hash-sharded by path so compaction rewrites only
# the shards that changed since the last snapshot — the JSON-log analog of
# RocksDB's incremental checkpointing (RocksDBFileManager.scala:157-312
# reuses unchanged SSTs by (name, size); here an untouched shard file is
# simply not rewritten). At 10^7 tracked files a monolithic snapshot is an
# O(n) driver rewrite every 25 adds; with 64 shards a steady-state add
# touches O(batch_size) shards and compaction cost is proportional to churn.
N_SEEN_SHARDS = 64


class MetadataLogHoleError(RuntimeError):
    """Missing batch inside a requested range (RocksDBS3SourceLog.scala:352-356)."""


class JsonMetadataLog:
    def __init__(
        self,
        log_dir: str,
        purge_timestamp_provider: Optional[Callable[[], int]] = None,
        fs: Optional[LogFileSystem] = None,
    ):
        """``log_dir`` may be a local path, ``file://…``, or any
        ``pyarrow.fs`` URI (``s3://…``, ``hdfs://…``) — the reference's
        DFS-checkpoint contract (RocksDBFileManager.scala:157-312,
        metadataPath init S3ConnectorSource.scala:53-59). Pass ``fs``
        explicitly to inject a filesystem (tests use the pyarrow mock
        FS as the object-store stand-in)."""
        if fs is not None:
            self._fs: LogFileSystem = fs
            self._dir = log_dir
        else:
            self._fs, self._dir = filesystem_for(log_dir)
        j = self._fs.join
        self._batches_dir = j(self._dir, "batches")
        # legacy (pre-sharding) monolithic snapshot — read if present,
        # migrated to shards at the next compaction, then removed
        self._legacy_snapshot_path = j(self._dir, "seen-snapshot.json")
        self._shards_dir = j(self._dir, "seen-shards")
        self._fs.mkdirs(self._batches_dir)
        self._fs.mkdirs(self._shards_dir)
        self._purge_ts = purge_timestamp_provider or (lambda: 0)
        self._lock = threading.RLock()
        # add/commit latency distributions (reference: RocksDB.scala:334-381
        # records get/put/commit histograms; here the JSON log records its
        # own write-path timing)
        from spark_streaming_sql_s3_connector_spark.queueing.base import LatencyHistogram

        self.histograms = {
            "add_ms": LatencyHistogram(),
            "compact_ms": LatencyHistogram(),
        }
        # path -> timestamp for every tracked file, PARTITIONED BY SHARD so
        # dirty-shard serialization touches only those shards' entries
        # (a flat dict would make every compaction an O(total-files) scan)
        self._seen_shards: list[dict[str, int]] = [{} for _ in range(N_SEEN_SHARDS)]
        # shards whose on-disk snapshot no longer matches memory
        self._dirty_shards: set[int] = set()
        # batchId -> batch timestamp (for bounded GC without re-reading files)
        self._batch_ts: dict[int, int] = {}
        self._adds_since_compact = 0
        self._recover()

    # ---------- recovery ----------

    def _batch_path(self, batch_id: int) -> str:
        return self._fs.join(self._batches_dir, f"{batch_id}.json")

    def _shard_of(self, path: str) -> int:
        # crc32, NOT builtin hash(): stable across processes/restarts
        # (PYTHONHASHSEED randomizes str hash between runs)
        return zlib.crc32(path.encode("utf-8")) % N_SEEN_SHARDS

    def _shard_path(self, shard: int) -> str:
        return self._fs.join(self._shards_dir, f"seen-{shard:02d}.json")

    def _seen_get(self, path: str) -> Optional[int]:
        return self._seen_shards[self._shard_of(path)].get(path)

    def _seen_put(self, path: str, ts: int) -> None:
        s = self._shard_of(path)
        shard = self._seen_shards[s]
        cur = shard.get(path)
        new = max(ts, cur) if cur is not None else ts
        if cur != new:
            shard[path] = new
            self._dirty_shards.add(s)

    def _seen_pop(self, path: str) -> None:
        s = self._shard_of(path)
        if self._seen_shards[s].pop(path, None) is not None:
            self._dirty_shards.add(s)

    def _recover(self) -> None:
        if self._fs.exists(self._legacy_snapshot_path):
            snap = json.loads(self._fs.read_text(self._legacy_snapshot_path))
            for k, v in snap.get("seen", {}).items():
                self._seen_put(k, int(v))
        for name in self._fs.listdir(self._shards_dir):
            if not (name.startswith("seen-") and name.endswith(".json")):
                continue
            snap = json.loads(
                self._fs.read_text(self._fs.join(self._shards_dir, name))
            )
            # direct load, no dirty-marking: these entries match disk by
            # definition (unless a legacy value above already superseded
            # one — that shard is then already marked dirty)
            for k, v in snap.get("seen", {}).items():
                ts = int(v)
                shard = self._seen_shards[self._shard_of(k)]
                cur = shard.get(k)
                if cur is None or ts > cur:
                    shard[k] = ts
        for name in self._fs.listdir(self._batches_dir):
            if not name.endswith(".json"):
                continue
            try:
                batch_id = int(name[: -len(".json")])
            except ValueError:
                continue
            doc = self._read_batch_doc(batch_id)
            if doc is None:
                continue
            self._batch_ts[batch_id] = doc["timestamp"]
            for e in doc["entries"]:
                self._seen_put(e["path"], int(e["timestamp"]))

    def _read_batch_doc(self, batch_id: int) -> Optional[dict]:
        try:
            return json.loads(self._fs.read_text(self._batch_path(batch_id)))
        except FileNotFoundError:
            return None

    # ---------- write path ----------

    def add(
        self,
        batch_id: int,
        file_entries: list[FileEntry],
        timestamp: Optional[int] = None,
    ) -> bool:
        """Atomically persist a batch. False if batchId already stored."""
        if batch_id < 0:
            raise ValueError("batchId must not less than 0")
        for e in file_entries:
            if e.batch_id != batch_id:
                raise ValueError(f"{e} batchId doesn't equal to {batch_id}")
        from spark_streaming_sql_s3_connector_spark.queueing.base import timed

        with timed(self.histograms["add_ms"]), self._lock:
            # Clean before add so the latest batch is never removed
            self._clean_log(self._purge_ts())
            target = self._batch_path(batch_id)
            if self._fs.exists(target):
                return False
            ts = timestamp if timestamp is not None else int(time.time() * 1000)
            doc = {
                "v": VERSION,
                "batchId": batch_id,
                "timestamp": ts,
                "entries": [e.to_dict() for e in file_entries],
            }
            # exclusive create: POSIX uses tmp+fsync+link (fails if the
            # target appeared concurrently); object stores check-then-put
            # under this lock (single-writer checkpoint contract)
            if not self._fs.write_atomic(target, json.dumps(doc), overwrite=False):
                return False
            self._batch_ts[batch_id] = ts
            for e in file_entries:
                self._seen_put(e.path, e.timestamp)
            self._adds_since_compact += 1
            if self._adds_since_compact >= COMPACT_EVERY_N_ADDS:
                self._write_snapshot()
                self._adds_since_compact = 0
            return True

    def _write_snapshot(self) -> None:
        """Rewrite ONLY the shards whose entries changed since the last
        snapshot (each shard file written atomically via tmp + rename).
        Unchanged shards are not touched — compaction cost follows churn,
        not total tracked-file count."""
        if not self._dirty_shards:
            return
        from spark_streaming_sql_s3_connector_spark.queueing.base import timed

        with timed(self.histograms["compact_ms"]):
            self._write_dirty_shards()

    def _write_dirty_shards(self) -> None:
        # O(entries-in-dirty-shards), NOT O(total tracked files): the seen
        # index is stored pre-partitioned by shard
        horizon = self._purge_ts()
        for s in self._dirty_shards:
            seen = self._seen_shards[s]
            if horizon > 0:
                # age the shard while it is being serialized anyway
                # (r13, reference log-clean analog
                # RocksDBS3SourceLog.scala:416-460): entries below the
                # purge horizon are exactly the set `is_new_file`
                # already re-admits, so dropping them changes NO
                # admission verdict — it just stops the snapshot
                # growing with total-files-ever-admitted instead of the
                # active window. Cold shards age at their next churn;
                # a shard that never churns stopped growing by
                # definition, so the bound still holds.
                expired = [p for p, ts in seen.items() if ts < horizon]
                for p in expired:
                    del seen[p]
            self._fs.write_atomic(
                self._shard_path(s),
                json.dumps({"v": VERSION, "seen": seen}),
                overwrite=True,
            )
        self._dirty_shards.clear()
        # legacy monolithic snapshot fully superseded once shards persist
        # everything it contributed (its entries were marked dirty at
        # recovery, so they are on disk in shard form by now)
        self._fs.delete(self._legacy_snapshot_path)

    def _clean_log(self, last_purge_timestamp: int) -> int:
        """Bounded GC (RocksDBS3SourceLog.scala:416-460): remove at most
        MAX_BATCH_TO_REMOVE_PER_ADD batches whose batch timestamp AND max
        file timestamp are both below the horizon."""
        removed = 0
        for batch_id in sorted(self._batch_ts):
            if removed >= MAX_BATCH_TO_REMOVE_PER_ADD:
                break
            if self._batch_ts[batch_id] >= last_purge_timestamp:
                continue
            doc = self._read_batch_doc(batch_id)
            if doc is None:
                self._batch_ts.pop(batch_id, None)
                continue
            max_file_ts = max((int(e["timestamp"]) for e in doc["entries"]), default=0)
            if max_file_ts < last_purge_timestamp:
                self._fs.delete(self._batch_path(batch_id))
                self._batch_ts.pop(batch_id, None)
                for e in doc["entries"]:
                    # drop from seen index only if not re-logged with a newer ts
                    if (self._seen_get(e["path"]) or 0) <= int(e["timestamp"]):
                        self._seen_pop(e["path"])
                removed += 1
        return removed

    # ---------- read path ----------

    def get(self, batch_id: int) -> Optional[list[FileEntry]]:
        doc = self._read_batch_doc(batch_id)
        if doc is None:
            return None
        return [FileEntry.from_dict(d) for d in doc["entries"]]

    def get_range(self, start_batch_id: int, end_batch_id: int) -> list[FileEntry]:
        """Entries of [start, end]; raises MetadataLogHoleError on a missing
        batch (RocksDBS3SourceLog.scala:345-360)."""
        out: list[FileEntry] = []
        for bid in range(start_batch_id, end_batch_id + 1):
            entries = self.get(bid)
            if entries is None:
                raise MetadataLogHoleError(
                    f"batch {bid} doesn't exist in range [{start_batch_id}, {end_batch_id}]"
                )
            out.extend(entries)
        return out

    def get_latest_batch_id(self) -> Optional[int]:
        with self._lock:
            return max(self._batch_ts) if self._batch_ts else None

    def get_latest(self) -> Optional[tuple[int, list[FileEntry]]]:
        bid = self.get_latest_batch_id()
        if bid is None:
            return None
        entries = self.get(bid)
        return (bid, entries if entries is not None else [])

    def get_file(self, path: str) -> Optional[int]:
        with self._lock:
            return self._seen_get(path)

    def is_new_file(self, path: str, last_purge_timestamp: int) -> bool:
        """New if never logged, or logged with ts older than the purge
        horizon (expired → re-admittable; RocksDBS3SourceLog.scala:295-314)."""
        ts = self.get_file(path)
        if ts is None:
            return True
        return ts < last_purge_timestamp

    def close(self) -> None:
        with self._lock:
            self._write_snapshot()
