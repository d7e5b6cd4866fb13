"""Compressibility quality signal (functions/text.compressed_size /
compression_ratio).

Pins: exact zlib parity, NULL/empty conventions, the two-tail ordering
law (templated repetition < natural prose < high-entropy noise), the
Arrow-batched (not row-wise) plan, and level validation."""

import zlib

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import (
    compressed_size,
    compression_ratio,
)

NATURAL = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and thinks about dinner plans for tomorrow"
)
REPETITIVE = "buy now click here " * 12
NOISE = "9f8a7b3c1d2e4f5a6b7c8d9e0f1a2b3c4d5e6f708192a3b4c5d6e7f8091a2b3c"


def _df(spark):
    rows = [(1, NATURAL), (2, REPETITIVE), (3, NOISE), (4, ""), (5, None)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_zlib_parity(spark):
    got = {
        r["doc_id"]: r["c"]
        for r in _df(spark)
        .select("doc_id", compressed_size(F.col("text")).alias("c"))
        .collect()
    }
    for i, t in [(1, NATURAL), (2, REPETITIVE), (3, NOISE), (4, "")]:
        assert got[i] == len(zlib.compress(t.encode("utf-8"), 6))
    assert got[5] is None


def test_ratio_conventions_and_tail_ordering(spark):
    got = {
        r["doc_id"]: r["r"]
        for r in _df(spark)
        .select("doc_id", compression_ratio(F.col("text")).alias("r"))
        .collect()
    }
    assert got[4] == 1.0  # empty → 1.0 by convention
    assert got[5] is None
    # templated repetition compresses best, noise worst
    assert got[2] < got[1] < got[3]
    assert got[1] == pytest.approx(
        len(zlib.compress(NATURAL.encode(), 6)) / len(NATURAL.encode())
    )


def test_arrow_batched_not_rowwise(spark):
    plan = (
        _df(spark)
        .select(compression_ratio(F.col("text")).alias("r"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_level_validation(spark):
    with pytest.raises(ValueError):
        compressed_size(F.col("text"), level=0)
    with pytest.raises(ValueError):
        compression_ratio(F.col("text"), level=10)
