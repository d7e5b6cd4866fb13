"""Micro-batch orchestrator — the JVM-native read path.

The Python Data Source (sources/datasource.py) reads files in Python
workers via Arrow. That is the clean ``format("s3-connector")`` surface,
but at 100 TB the fastest scan is Spark's own vectorized JVM readers. This
orchestrator is the hybrid from SURVEY.md §7.1: the same admission
controller cuts batches, and each batch is read with stock
``spark.read.format(fmt).load(paths)`` — exactly how the reference's
getBatch delegates to DataSource.resolveRelation
(S3ConnectorSource.scala:170-181) — then handed to a user callback
(foreachBatch style).

Guarantees match the stream source: a batch is durably logged before its
queue messages are acked; the processed-offset file is written only after
the user callback returns, so a crash between log-append and callback
replays the batch (at-least-once into the callback, exactly-once file
admission; idempotent sinks give end-to-end exactly-once — the same
contract Spark's foreachBatch has).
"""

from __future__ import annotations

import json
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from spark_streaming_sql_s3_connector_spark.options import S3ConnectorSourceOptions
from spark_streaming_sql_s3_connector_spark.sources.admission import AdmissionController


class MicroBatchOrchestrator:
    def __init__(
        self,
        spark: SparkSession,
        options: dict | S3ConnectorSourceOptions,
        metadata_path: str,
        queue_client=None,
    ):
        self.spark = spark
        self.options = (
            options
            if isinstance(options, S3ConnectorSourceOptions)
            else S3ConnectorSourceOptions.parse(options)
        )
        self.controller = AdmissionController(self.options, metadata_path, queue_client)
        # processed-offset marker goes through the same FS layer as the
        # metadata log, so the orchestrator checkpoint is DFS-capable too
        self._meta_fs = self.controller.meta_fs
        self._processed_path = self._meta_fs.join(
            self.controller.meta_root, "processed-offset.json"
        )
        self._last_processed = self._read_processed()

    def _read_processed(self) -> int:
        try:
            return int(
                json.loads(self._meta_fs.read_text(self._processed_path))["logOffset"]
            )
        except (FileNotFoundError, ValueError, KeyError):
            return -1

    def _write_processed(self, offset: int) -> None:
        self._meta_fs.write_atomic(
            self._processed_path, json.dumps({"logOffset": offset}), overwrite=True
        )

    def run_once(
        self,
        schema,
        process: Callable[[DataFrame, int], None],
    ) -> Optional[int]:
        """One trigger: admit files, read the batch JVM-side, hand it to
        ``process(df, batch_id)``. Returns the batch id, or None if no new
        data. Replays any logged-but-unprocessed batch first (crash
        recovery)."""
        opts = self.options
        # crash recovery: logged batches beyond the processed offset rerun
        end = self.controller.current_offset
        if end > self._last_processed:
            batch_id = self._last_processed + 1
        else:
            new_end = self.controller.fetch_max_offset()
            if new_end <= self._last_processed:
                return None
            batch_id = self._last_processed + 1
        entries = self.controller.get_batch_files(batch_id - 1, batch_id)
        paths = [e.path for e in entries]
        base_opts = {}
        if opts.base_path:
            base_opts["basePath"] = opts.base_path
        df = (
            self.spark.read.format(opts.file_format)
            .schema(schema)
            .options(**opts.reader_options, **base_opts)
            .load(paths)
            if paths
            else self.spark.createDataFrame([], schema)
        )
        process(df, batch_id)
        self._write_processed(batch_id)
        self.controller.commit(batch_id)
        self._last_processed = batch_id
        return batch_id

    def run_available(self, schema, process: Callable[[DataFrame, int], None]) -> int:
        """Drain: run triggers until no new data (Trigger.AvailableNow
        analog). Returns number of batches processed."""
        n = 0
        while self.run_once(schema, process) is not None:
            n += 1
        return n

    def run_forever(
        self,
        schema,
        process: Callable[[DataFrame, int], None],
        trigger_interval_s: float = 15.0,
        max_triggers: Optional[int] = None,
    ) -> None:
        """ProcessingTime-trigger loop (reference DataConsumer.scala:78
        cadence). Bounded by max_triggers for tests."""
        fired = 0
        while max_triggers is None or fired < max_triggers:
            t0 = time.monotonic()
            self.run_once(schema, process)
            fired += 1
            sleep = trigger_interval_s - (time.monotonic() - t0)
            if sleep > 0 and (max_triggers is None or fired < max_triggers):
                time.sleep(sleep)

    def close(self) -> None:
        self.controller.close()
