"""Streaming record-level transforms over the connector source.

The connector's exactly-once guarantee is per FILE (admission dedup,
SURVEY.md §2.A A5/A6/A12); these transforms add the record-level layer a
real ingest pipeline needs on top:

- ``dedup_records_stream`` — drop duplicate records across micro-batches
  within a watermark horizon (Spark keyed state; state size is bounded by
  the watermark, mirroring the reference's maxFileAge-bounded file cache
  at the record level);
- ``stream_static_enrich`` — enrich a stream against a static dimension
  table with an explicit broadcast (no shuffle of the stream, no state:
  each micro-batch plans a broadcast-hash join).

Both return streaming DataFrames and compose with the windows/session
operators in ``streaming.windows``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_records_stream(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Record-level exactly-once within an event-time horizon.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and evicts
    key state once the watermark passes — unbounded streams hold only
    O(keys-per-horizon) state per partition. Use the record's natural id
    (event_id) as the key; re-delivered or re-processed files (replay,
    A13) then dedupe at the row level too."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def stream_static_enrich(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Stream-static join with the dimension side broadcast.

    The static side re-resolves per micro-batch (Spark semantics), so a
    slowly-changing dimension picks up updates without restarts; the
    explicit broadcast keeps the stream un-shuffled at any cluster size."""
    return stream_df.join(F.broadcast(dim_df), on, how)
