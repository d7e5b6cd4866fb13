"""Regression: TIMESTAMP_NTZ inputs (round-3 breakage).

The driver's parquet fixtures changed from TIMESTAMP(NANOS) to plain
``timestamp[us]`` (no timezone), which Spark 4 materializes as
TIMESTAMP_NTZ — a type every event-time consumer (withWatermark, window,
cast-to-double arithmetic) rejects. These tests write parquet in BOTH
physical spellings and pin that:

- ``load_table`` normalizes to TIMESTAMP regardless of the file's physical
  timestamp encoding (schema-driven, not table-name-driven);
- ``sessionize_batch`` works even on a raw NTZ DataFrame (unix_micros
  arithmetic, no double cast).
"""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_streaming_sql_s3_connector_spark.plans.io import load_table
from spark_streaming_sql_s3_connector_spark.streaming.windows import (
    sessionize_batch,
    tumbling_counts,
)

_TS = [
    datetime.datetime(2024, 1, 1, 10, 0, 0),
    datetime.datetime(2024, 1, 1, 10, 10, 0),
    datetime.datetime(2024, 1, 1, 12, 0, 0),  # > 30 min gap -> new session
    datetime.datetime(2024, 1, 2, 9, 0, 0),
]


def _write_events(path: str, unit: str) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "c"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_any_physical_timestamp(spark, tmp_path, unit):
    _write_events(str(tmp_path / "events.parquet"), unit)
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # session TZ is UTC: wall-clock values are preserved exactly
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == _TS


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_event_time_ops_work_from_real_parquet(spark, tmp_path, unit):
    _write_events(str(tmp_path / "events.parquet"), unit)
    df = load_table(spark, str(tmp_path), "events")
    # withWatermark is the call that rejected NTZ (EVENT_TIME_IS_NOT_ON_
    # TIMESTAMP_TYPE); on a batch df it's a no-op but still type-checks
    counts = {(r.window_start, r.event_type): r.cnt for r in tumbling_counts(df).collect()}
    assert counts[(datetime.datetime(2024, 1, 1, 10, 0, 0), "a")] == 1
    sessions = sessionize_batch(df).collect()
    assert [(r.user_id, r.n_events) for r in sessions] == [(7, 2), (7, 1), (8, 1)]


def test_sessionize_batch_on_raw_ntz_dataframe(spark):
    """Even WITHOUT load_table normalization, sessionize_batch must not
    throw on TIMESTAMP_NTZ (round 3's red CORRECTNESS row was a
    cast-NTZ-to-double AnalysisException)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("value", DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(7, t, 1.0) for t in _TS[:3]] + [(8, _TS[3], 1.0)], schema
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = sessionize_batch(df).collect()
    assert [(r.user_id, r.n_events) for r in out] == [(7, 2), (7, 1), (8, 1)]


def test_footer_probe_cache_invalidates_on_rewrite(spark, tmp_path):
    """The nanos-column probe is memoized per (path, mtime, size): a
    table regenerated in-process with a DIFFERENT timestamp encoding
    must re-probe, not apply stale normalization (ADVICE r4)."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_streaming_sql_s3_connector_spark.plans.io import load_table

    p = str(tmp_path / "events.parquet")
    ts = pd.to_datetime(["2024-01-01 00:00:01", "2024-01-01 00:00:02"])

    # version 1: nanos encoding
    t1 = pa.table({"ts": pa.array(ts, type=pa.timestamp("ns")), "v": [1, 2]})
    pq.write_table(t1, p)
    df1 = load_table(spark, str(tmp_path), "events")
    assert dict(df1.dtypes)["ts"] == "timestamp"
    assert df1.count() == 2

    # version 2: same path, micros-NTZ encoding and different rows
    t2 = pa.table(
        {"ts": pa.array(list(ts) + [pd.Timestamp("2024-01-01 00:00:03")],
                        type=pa.timestamp("us")), "v": [1, 2, 3]}
    )
    pq.write_table(t2, p)
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    df2 = load_table(spark, str(tmp_path), "events")
    assert dict(df2.dtypes)["ts"] == "timestamp"
    assert df2.count() == 3
    # values must be the real wall-clock instants, not misscaled nanos
    got = sorted(r.ts.second for r in df2.select("ts").collect())
    assert got == [1, 2, 3]
