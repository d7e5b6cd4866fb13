"""Bucketed co-located joins (zero-exchange plans) and skew salting
(equality with the plain join + even task spread)."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.joins import (
    salted_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        write_bucketed(a, "bj_a", ["k"], n_buckets=8, sort_cols=["k"])
        write_bucketed(b, "bj_b", ["k"], n_buckets=8, sort_cols=["k"])
        joined = spark.table("bj_a").join(spark.table("bj_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located buckets: no shuffle
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bj_a")
        spark.sql("DROP TABLE IF EXISTS bj_b")


def test_salted_join_equals_plain_join(spark):
    # hot key: 5000 rows of k=1 (the skew), plus a uniform tail
    big = spark.range(6000).select(
        F.when(F.col("id") < 5000, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(1, "hot"), (5500, "cold")], ["k", "tag"])
    plain = big.join(small, "k").select("k", "payload", "tag")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "payload", "tag")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("p"))
    small = spark.createDataFrame([(1, "x")], ["k", "tag"])
    out = salted_join(big, small, "k", n_salts=4, how="left")
    assert out.count() == 10
    assert out.where(F.col("tag").isNotNull()).count() == 1


def test_salt_spreads_hot_key(spark):
    # the hot key's rows must land in >1 salt bucket (payload varies)
    big = spark.range(5000).select(F.lit(1).alias("k"), F.col("id").alias("payload"))
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 8


def test_salted_join_rejects_unsupported_how(spark):
    big = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(big, big, "k", how="full")
