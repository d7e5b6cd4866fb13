"""Event-time streaming analytics over the connector source.

The reference inherits these from Spark without exercising them
(SURVEY.md §2.B note); the rebuild exposes them natively:

- ``tumbling_counts`` / ``sliding_counts`` — watermarked windowed
  aggregation (state evicted by the watermark, the streaming analog of the
  connector's maxFileAge purge horizon);
- ``sessionize`` — custom stateful operator via applyInPandasWithState:
  per-key session windows with inactivity gap, Arrow-batched state
  round-trips.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time windows with a watermark: late data beyond the
    watermark is dropped and window state is evicted — bounded state at any
    stream length."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "cnt",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("window_start"), key_col, "cnt")
    )


def sessionize_batch(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch twin of ``sessionize``: gap-based session ids via lag + running
    sum window functions — one shuffle on the user key, no Python. Output
    timestamps as epoch micros (stable integer comparison across engines)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    # unix_micros arithmetic, not cast("double"): exact integers (no float
    # rounding at 16-digit epoch values). The cast("timestamp") makes NTZ
    # inputs legal too (unix_micros and cast-to-double both reject NTZ;
    # casting TIMESTAMP->TIMESTAMP is a no-op, NTZ converts via session TZ).
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    flagged = df.withColumn(
        "_new_sess",
        F.when(
            ts_us - F.lag(ts_us).over(w) > gap_us,
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "_sid", F.sum("_new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(user_col, "_sid")
        .agg(
            F.unix_micros(F.min(ts_col).cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.max(ts_col).cast("timestamp")).alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .select(user_col, "session_start_us", "session_end_us", "n_events")
        .orderBy(user_col, "session_start_us")
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows with an inactivity gap via applyInPandasWithState —
    the custom-stateful-operator path for semantics Spark's built-in
    windows can't express. Sessions closed by an in-batch gap emit
    immediately; open sessions emit when the event-time watermark passes
    ``last_event + gap`` (EventTimeTimeout keeps the query quiescent when
    no data flows, unlike a processing-time timeout)."""
    gap_ms = gap_minutes * 60_000

    def fn(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        start_us, last_us, n, total = (None, None, 0, 0.0)
        if state.exists:
            start_us, last_us, n, total = state.get
        closed = []
        # concat BEFORE sorting: the iterator delivers multiple Arrow
        # chunks per key and only a global sort gives correct gaps
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(ts_col)
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                us = int(pd.Timestamp(ts).value // 1_000)
                if start_us is None:
                    start_us, last_us, n, total = us, us, 1, float(val)
                elif us - last_us > gap_ms * 1000:
                    closed.append((start_us, last_us, n, total))
                    start_us, last_us, n, total = us, us, 1, float(val)
                else:
                    last_us = max(last_us, us)
                    n += 1
                    total += float(val)
        if start_us is None:
            return  # no data and no prior state for this key
        state.update((start_us, last_us, n, total))
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                    "n_events": [c for _, _, c, _ in closed],
                    "total_value": [t for _, _, _, t in closed],
                }
            )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
