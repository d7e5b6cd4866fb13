"""Deterministic sampling laws: reproducibility under repartitioning,
split complement/stability, and fraction accuracy."""

from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
    with_split,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_sample_is_stable_under_repartition(spark):
    df = _ids(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(df.repartition(17), "doc_id", 0.2).collect()
    }
    assert a == b
    # approximate fraction (hash uniformity): 20% ± 4pp on 2000 ids
    assert abs(len(a) / 2000 - 0.2) < 0.04


def test_salt_rotates_sample(spark):
    df = _ids(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2, salt="x").collect()}
    b = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2, salt="y").collect()}
    assert a != b
    # rotated samples are near-independent: overlap ≈ 4% of ids
    assert len(a & b) < 0.08 * 2000


def test_split_is_a_partition_of_input(spark):
    df = _ids(spark)
    train, test = train_test_split(df, "doc_id", test_fraction=0.25)
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert tr | te == set(range(2000))
    assert tr & te == set()
    assert abs(len(te) / 2000 - 0.25) < 0.04


def test_split_labels_stable(spark):
    df = _ids(spark)
    l1 = {(r.doc_id, r.split) for r in with_split(df, "doc_id", 0.25).collect()}
    l2 = {
        (r.doc_id, r.split)
        for r in with_split(df.repartition(5), "doc_id", 0.25).collect()
    }
    assert l1 == l2


def test_fraction_bounds(spark):
    df = _ids(spark, 10)
    assert deterministic_sample(df, "doc_id", 0.0).count() == 0
    assert deterministic_sample(df, "doc_id", 1.0).count() == 10
    import pytest

    with pytest.raises(ValueError):
        deterministic_sample(df, "doc_id", 1.5)
