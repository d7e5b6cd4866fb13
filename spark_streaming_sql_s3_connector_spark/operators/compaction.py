"""Small-file compaction — the maintenance operator every streaming
ingest needs at scale.

A queue-driven source admits files as they land, so a 100 TB corpus
ingested at high trigger cadence ends up as millions of KB-sized parquet
files: each scan task then pays open/footer/seek per file, the driver
pays listing + footer memory, and pushdown loses its leverage (one row
group per tiny file). Compaction rewrites a dataset directory into
right-sized files, optionally range-clustered on a filter column so
parquet min/max footer stats prune row groups downstream.

Shapes, in Spark terms:

- unsorted: ``repartition(n)`` — round-robin, uniform output sizes, one
  shuffle of the data being compacted (unavoidable: merging files IS a
  repartition);
- clustered: ``repartitionByRange(n, key).sortWithinPartitions(key)`` —
  same single shuffle, plus in-memory sort per output file; downstream
  scans with a predicate on ``key`` then skip whole files/row groups via
  footer stats (the poor man's Z-order, exact for one dimension).

Sizing comes from the *actual input bytes* (driver-side file listing —
the same listing any maintenance job performs), divided by
``target_file_bytes``. Output parquet is smaller than input for tiny
files (footer amortization), larger after re-encoding — the target is a
budget, not a contract.
"""

from __future__ import annotations

import math
import os
from typing import Optional
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def dataset_file_sizes(df: DataFrame) -> list[tuple[str, int]]:
    """(path, bytes) for every input file backing ``df`` (local paths;
    on a cluster DFS the equivalent is the FileSystem listing Spark
    already holds in its file index)."""
    out = []
    for uri in df.inputFiles():
        p = urlparse(uri)
        path = p.path if p.scheme in ("file", "") else None
        if path and os.path.exists(path):
            out.append((path, os.path.getsize(path)))
    return out


def plan_compaction(
    df: DataFrame, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Compute the compaction plan without executing it: input file
    count/bytes and the output file count ``ceil(bytes / target)``."""
    sizes = dataset_file_sizes(df)
    total = sum(b for _, b in sizes)
    n_out = max(1, math.ceil(total / target_file_bytes))
    return {
        "n_input_files": len(sizes),
        "input_bytes": total,
        "target_file_bytes": target_file_bytes,
        "n_output_files": n_out,
    }


def compact_dataset(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    cluster_by: Optional[str] = None,
    zorder_by: Optional[list[str]] = None,
    mode: str = "overwrite",
) -> dict:
    """Rewrite the dataset at ``src`` into ``dst`` with ~target-sized
    files; returns the executed plan (input/output file counts + bytes).

    ``cluster_by`` range-partitions and sorts the rewrite on that column
    so downstream predicates on it prune via parquet footer stats.
    ``zorder_by`` (mutually exclusive) Morton-clusters on SEVERAL columns
    so predicates on any of them prune — see ``operators/zorder.py``."""
    if cluster_by is not None and zorder_by is not None:
        raise ValueError("choose cluster_by or zorder_by, not both")
    df = spark.read.format(fmt).load(src)
    plan = plan_compaction(df, target_file_bytes)
    n = plan["n_output_files"]
    if zorder_by is not None:
        from spark_streaming_sql_s3_connector_spark.operators.zorder import zorder_dataframe

        shaped = zorder_dataframe(df, zorder_by, n)
    elif cluster_by is not None:
        shaped = df.repartitionByRange(n, cluster_by).sortWithinPartitions(cluster_by)
    else:
        shaped = df.repartition(n)
    shaped.write.format(fmt).mode(mode).save(dst)
    return plan
