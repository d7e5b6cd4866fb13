"""Approximate sketches for corpus-scale profiling.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are full-shuffle
operations; the sketch forms are single-pass, mergeable, fixed-memory:

- ``approx_distinct`` — HyperLogLog++ (`approx_count_distinct`), ~rsd
  relative error in O(1/rsd²) bytes per group;
- ``approx_quantiles`` — Greenwald-Khanna (`percentile_approx`) with an
  accuracy knob, exact rank error bound;
- ``frequent_items`` — count-based heavy hitters over a column.

All are Spark built-ins (JVM partial aggregation, mergeable state) —
this module just gives them pipeline-shaped signatures and documents the
error envelopes the tests assert."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05, out: str = "approx_distinct"):
    """HLL++ distinct count; standard error ≈ rsd·true."""
    return df.agg(F.approx_count_distinct(col, rsd=rsd).alias(out))


def approx_quantiles(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna quantile sketch: rank error ≤ 1/accuracy of n."""
    return df.agg(
        F.percentile_approx(col, list(probs), accuracy).alias("quantiles")
    ).select(
        *[F.col("quantiles")[i].alias(f"q{int(p * 100)}") for i, p in enumerate(probs)]
    )


def frequent_items(df: DataFrame, col: str, min_count: int = 2) -> DataFrame:
    """Heavy hitters: exact counts via partial agg, thresholded — the
    shuffle carries one row per distinct value, so cap use to columns
    with bounded cardinality (or sample first)."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), col)
    )
