"""Small-file compaction: row preservation, file-count sizing, and
range clustering (disjoint per-file key ranges for footer pruning)."""

import glob
import os

from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.compaction import (
    compact_dataset,
    plan_compaction,
)


def _parquet_files(d):
    return [p for p in glob.glob(os.path.join(d, "*.parquet")) if os.path.getsize(p) > 0]


def test_compact_merges_small_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    # 40 tiny files of 50 rows each
    df = spark.range(2000).withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    df.repartition(40).write.parquet(src)
    assert len(_parquet_files(src)) == 40

    total = sum(os.path.getsize(p) for p in _parquet_files(src))
    plan = compact_dataset(spark, src, dst, target_file_bytes=total // 2 + 1)
    assert plan["n_input_files"] == 40
    assert plan["n_output_files"] == 2
    assert len(_parquet_files(dst)) == 2
    # rows preserved exactly
    before = {r.id for r in spark.read.parquet(src).select("id").collect()}
    after = {r.id for r in spark.read.parquet(dst).select("id").collect()}
    assert before == after


def test_compact_cluster_by_gives_disjoint_ranges(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(3000).withColumn("k", (F.col("id") * 37 % 3000).cast("long"))
    df.repartition(30).write.parquet(src)

    total = sum(os.path.getsize(p) for p in _parquet_files(src))
    compact_dataset(spark, src, dst, target_file_bytes=total // 4 + 1, cluster_by="k")
    files = _parquet_files(dst)
    assert len(files) == 4
    # per-file key ranges must be pairwise disjoint (range clustering) —
    # that is exactly what lets footer min/max stats prune whole files
    ranges = []
    for p in files:
        rows = spark.read.parquet(p).agg(F.min("k"), F.max("k")).head()
        ranges.append((rows[0], rows[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # and every file is internally sorted on k
    for p in files:
        ks = [r.k for r in spark.read.parquet(p).select("k").collect()]
        assert ks == sorted(ks)


def test_plan_compaction_reports_without_writing(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(100).write.parquet(src)
    plan = plan_compaction(spark.read.parquet(src))
    assert plan["n_output_files"] == 1
    assert plan["input_bytes"] > 0
