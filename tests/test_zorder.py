"""Z-order clustering: per-file locality evidence (the property that
makes footer-stats skipping work) + error envelopes."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.zorder import (
    zorder_code,
    zorder_dataframe,
)

N_FILES = 16


@pytest.fixture(scope="module")
def grid(spark):
    # 64x64 uniform grid: the worst case for single-column clustering
    # (sorting by a leaves b's span = full range in every file)
    return spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )


def _spans(df, col):
    """Per-shuffle-partition (min,max) span of ``col``, as fractions of
    the global span — exactly what parquet footer min/max would hold for
    each output file."""
    stats = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    glob_lo = min(r["lo"] for r in stats)
    glob_hi = max(r["hi"] for r in stats)
    width = float(glob_hi - glob_lo) or 1.0
    return [(r["hi"] - r["lo"]) / width for r in stats]


def test_zorder_bounds_both_dimensions(spark, grid):
    shaped = zorder_dataframe(grid, ["a", "b"], N_FILES)
    span_a = _spans(shaped, "a")
    span_b = _spans(shaped, "b")
    # 16 files over a 2-D z-curve → each file covers ~1/4 of each axis;
    # allow slack for approxQuantile fuzz and range-partition edges
    assert sum(span_a) / len(span_a) < 0.5
    assert sum(span_b) / len(span_b) < 0.5

    # single-column clustering bounds a but leaves b unbounded — z-order
    # must beat it on the OTHER column
    single = grid.repartitionByRange(N_FILES, "a").sortWithinPartitions("a")
    span_b_single = _spans(single, "b")
    assert sum(span_b_single) / len(span_b_single) > 0.9


def test_zorder_equality_clustering_on_strings(spark):
    # strings fold through xxhash64: range locality is gone but equal
    # values land in few files → equality predicates still prune
    df = spark.range(4096).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("key"),
        F.col("id").alias("payload"),
    )
    shaped = zorder_dataframe(df, ["key"], N_FILES)
    placement = (
        shaped.withColumn("_pid", F.spark_partition_id())
        .groupBy("key")
        .agg(F.countDistinct("_pid").alias("n_files"))
        .collect()
    )
    avg_files = sum(r["n_files"] for r in placement) / len(placement)
    assert avg_files <= 2.0  # each key value concentrated, not smeared


def test_zorder_nulls_cluster_together(spark):
    rows = [Row(a=None if i % 7 == 0 else i, payload=i) for i in range(700)]
    df = spark.createDataFrame(rows)
    shaped = zorder_dataframe(df, ["a"], 8)
    null_files = (
        shaped.withColumn("_pid", F.spark_partition_id())
        .where(F.col("a").isNull())
        .select("_pid")
        .distinct()
        .count()
    )
    assert null_files <= 2


def test_zorder_code_is_deterministic_bigint(spark, grid):
    out = grid.select(zorder_code(grid, ["a", "b"]).alias("z"))
    assert dict(out.dtypes)["z"] == "bigint"
    a = sorted(r["z"] for r in out.collect())
    b = sorted(r["z"] for r in out.collect())
    assert a == b


def test_zorder_rejects_bad_inputs(spark, grid):
    with pytest.raises(ValueError, match="63-bit"):
        zorder_code(grid, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_code(grid, [])
    arr_df = grid.select(F.array("a").alias("arr"))
    with pytest.raises(ValueError, match="unsupported"):
        zorder_code(arr_df, ["arr"])


def test_compact_dataset_zorder_roundtrip(spark, tmp_path):
    from spark_streaming_sql_s3_connector_spark.operators.compaction import compact_dataset

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(5000).select(
        (F.col("id") % 100).alias("a"), (F.col("id") % 37).alias("b"), "id"
    )
    df.repartition(40).write.parquet(src)  # many small files
    plan = compact_dataset(
        spark, src, dst, target_file_bytes=1 << 20, zorder_by=["a", "b"]
    )
    assert plan["n_input_files"] == 40
    back = spark.read.parquet(dst)
    assert back.count() == 5000
    assert back.agg(F.sum("id")).collect()[0][0] == 5000 * 4999 // 2
    with pytest.raises(ValueError, match="not both"):
        compact_dataset(spark, src, dst, cluster_by="a", zorder_by=["b"])
