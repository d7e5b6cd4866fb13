"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``spark_streaming_sql_s3_connector_spark.plans``:
``queries.py`` (SURVEY.md §2.B relational surface) and
``pipeline_queries.py`` (training-data pipeline operators: dedup,
similarity search, text analysis, multimodal plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# One BLAS thread per process (r14, guide §1.2 per-task work): Spark
# already runs one task per core, so a threaded OpenBLAS inside each
# Python worker (and the driver-side quantizer fits) oversubscribes and
# pays thread-pool handoff on every small gemm — measured 10-20x on the
# (n×4)@(4×256) PQ-assignment matmuls (20 ms threaded vs 1 ms single).
# setdefault: an operator explicitly tuned by the deployment keeps its
# setting. Must run before numpy first loads; workers inherit the env
# in local mode (clusters: spark.executorEnv.OPENBLAS_NUM_THREADS=1).
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def _registry():
    from spark_streaming_sql_s3_connector_spark.plans.pipeline_queries import PIPELINE_QUERIES
    from spark_streaming_sql_s3_connector_spark.plans.queries import RELATIONAL_QUERIES
    from spark_streaming_sql_s3_connector_spark.plans.queries_ext import (
        RELATIONAL_QUERIES_EXT,
        RELATIONAL_QUERIES_EXT_PAST_CAP,
    )

    merged = {}
    merged.update(RELATIONAL_QUERIES)
    merged.update(RELATIONAL_QUERIES_EXT)
    merged.update(PIPELINE_QUERIES)
    merged.update(RELATIONAL_QUERIES_EXT_PAST_CAP)
    return merged


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the corpus-curation
    pipeline (quality gate → exact dedup → per-(lang, source) stats)."""
    from spark_streaming_sql_s3_connector_spark.plans.pipeline_queries import PIPELINE_QUERIES

    return PIPELINE_QUERIES["corpus_curation"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: spec.oracle_sql
        for name, spec in _registry().items()
        if spec.oracle_sql is not None
    }
