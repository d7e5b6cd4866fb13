"""Plan-quality regression tests: the optimizations that matter at 100 TB
must be visible in the physical plan — predicate pushdown reaching the
parquet scan, column pruning, broadcast joins for dims, no Python in the
relational path."""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def formatted_plan(spark, name):
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushed_to_scan(spark):
    plan = formatted_plan(spark, "b5_filter")
    assert "GreaterThan(l_quantity,25.0)" in plan
    # column pruning: only the filtered column is read
    assert "ReadSchema: struct<l_quantity:double>" in plan


def test_tpch_q1_prunes_columns(spark):
    plan = formatted_plan(spark, "tpch_q1")
    assert "LessThanOrEqual(l_shipdate" in plan  # pushed filter
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # 7 of 11 lineitem columns; never the unused keys
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_dim_join_broadcasts(spark):
    plan = formatted_plan(spark, "b7_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_single_fact_scan(spark):
    plan = formatted_plan(spark, "tpch_q5ish")
    # every dim broadcast; the fact table never shuffles before the joins
    # (formatted explain prints each node in tree + detail sections)
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_partial_aggregation_present(spark):
    # map-side combine: partial + final HashAggregate around one Exchange —
    # the property that keeps a 100 TB groupBy's shuffle proportional to
    # group count, not row count
    plan = formatted_plan(spark, "b6_agg")
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") >= 1


def test_text_ops_stay_jvm_side(spark):
    # text ops compile to expressions, not Python UDF evaluation
    for q in ["text_stats_docs", "text_fingerprint_docs", "lang_id_docs"]:
        plan = formatted_plan(spark, q)
        assert "BatchEvalPython" not in plan, q
        assert "ArrowEvalPython" not in plan, q


def test_streaming_source_prunes_nothing_extra(spark):
    # the Python data source scan reports its stable schema (no surprise
    # full-table reads through the connector batch reader)
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    register(spark)
    schema = StructType([StructField("a", StringType()), StructField("b", IntegerType())])
    df = (
        spark.read.format("s3-connector")
        .schema(schema)
        .option("spark.s3conn.fileFormat", "csv")
        .option("spark.s3conn.queueUrl", "unused")
        .option("spark.s3conn.queueType", "local")
        .option("paths", "")
        .load()
    )
    assert df.schema == schema
