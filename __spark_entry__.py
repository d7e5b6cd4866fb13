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
