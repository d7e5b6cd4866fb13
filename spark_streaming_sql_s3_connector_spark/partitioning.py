"""Partition-spreading policy for compute-heavy operators.

Several operators (MinHash/SimHash signatures, n-gram shingling, media
decode) run expensive Arrow-UDF work per row. A small input — one parquet
file → one scan partition — would pin that work to a single core, so they
repartition up to the session's default parallelism first.

The decision deliberately avoids ``df.rdd.getNumPartitions()``: touching
``.rdd`` converts the whole subtree to an RDD (analysis + physical
planning) just to read a count, once per operator call. Instead we gate on
``df.inputFiles()`` (analysis-only file listing):

- many files (>= target): the scan is already parallel — leave it alone.
  At cluster scale (100 TB → hundreds of thousands of files) this is the
  branch taken, and no extra shuffle is introduced.
- few files (< target): round-robin repartition. A single huge file also
  lands here even though maxPartitionBytes would split it, making the
  repartition redundant-but-harmless (same partition count, one extra
  shuffle) — acceptable vs. paying a planning pass on every call.
- no file provenance (in-memory frames, streaming sources): left as-is;
  local relations already parallelize to defaultParallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if files and len(files) < target:
        return df.repartition(target)
    return df
