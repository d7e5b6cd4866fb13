"""The r14 per-bucket blocked-gram rerank (`_bucket_gram_pairs`) must
emit exactly the pair set of the former id-explode → dedup → per-pair
vector-join rerank (`bucket_pairs` + `exact_rerank_pairs`), for both
bucketed generators (LSH tables, IVF cells), including the
max_bucket_size skew guard and blocked-gemm tiling."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.dedup import bucket_pairs
from spark_streaming_sql_s3_connector_spark.operators.similarity import (
    _bucket_gram_pairs,
    _hyperplanes,
    _ivf_multi_assign_udf,
    _lsh_sigs_udf,
    exact_rerank_pairs,
    ivf_centroids,
    ivf_near_dup_pairs,
    lsh_bucket_pairs,
)


def _clustered_df(spark, n=240, dim=16, n_centers=5, seed=31):
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 3) for _ in range(dim)] for _ in range(n_centers)]
    rows = [
        (i, [c + rng.gauss(0, 0.7) for c in centers[i % n_centers]])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _reference_pairs(df, base, key_cols, threshold, max_bucket_size=None):
    """The pre-r14 shape: id-only bucket pairs → dedup → vector-join
    rerank."""
    cand = (
        bucket_pairs(
            base, key_cols, F.struct(F.col("_id")), max_bucket_size=max_bucket_size
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return exact_rerank_pairs(df, cand, "embedding", "vec_id", threshold)


@pytest.mark.parametrize("threshold", [0.5, 0.9])
def test_ivf_gram_pairs_match_join_rerank(spark, threshold):
    df = _clustered_df(spark)
    C = ivf_centroids(df, "embedding", n_centroids=8, seed=7)
    assign = _ivf_multi_assign_udf(C, 3)
    base = df.select(
        F.col("vec_id").alias("_id"), assign(F.col("embedding")).alias("_bkts")
    ).select("_id", F.explode("_bkts").alias("bucket"))
    want = {
        (r.id_a, r.id_b): r.cosine
        for r in _reference_pairs(df, base, ["bucket"], threshold).collect()
    }
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in ivf_near_dup_pairs(
            df, "embedding", "vec_id", threshold,
            n_centroids=8, n_assign=3, seed=7,
        ).collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_ivf_gram_pairs_respect_bucket_cap(spark):
    df = _clustered_df(spark)
    C = ivf_centroids(df, "embedding", n_centroids=4, seed=7)
    assign = _ivf_multi_assign_udf(C, 2)
    base = df.select(
        F.col("vec_id").alias("_id"), assign(F.col("embedding")).alias("_bkts")
    ).select("_id", F.explode("_bkts").alias("bucket"))
    cap = 60  # drops some cells on this data
    want = {
        (r.id_a, r.id_b)
        for r in _reference_pairs(
            df, base, ["bucket"], 0.5, max_bucket_size=cap
        ).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in ivf_near_dup_pairs(
            df, "embedding", "vec_id", 0.5,
            n_centroids=4, n_assign=2, seed=7, max_bucket_size=cap,
        ).collect()
    }
    assert got == want
    uncapped = {
        (r.id_a, r.id_b)
        for r in ivf_near_dup_pairs(
            df, "embedding", "vec_id", 0.5, n_centroids=4, n_assign=2, seed=7
        ).collect()
    }
    assert got < uncapped  # the cap really dropped cells


def test_lsh_gram_pairs_match_join_rerank(spark):
    df = _clustered_df(spark, n=200, dim=16, seed=5)
    threshold, dim = 0.9, 16
    n_planes, n_tables = 8, 6
    planes = [_hyperplanes(dim, n_planes, 42 + 1000 * t) for t in range(n_tables)]
    sig_udf = _lsh_sigs_udf(planes)
    base = df.select(
        F.col("vec_id").alias("_id"), sig_udf(F.col("embedding")).alias("_sigs")
    ).select("_id", F.posexplode_outer("_sigs").alias("table_idx", "sig"))
    want = {
        (r.id_a, r.id_b)
        for r in _reference_pairs(df, base, ["table_idx", "sig"], threshold).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in lsh_bucket_pairs(
            df, "embedding", "vec_id", threshold, dim=dim
        ).collect()
    }
    assert got == want
    assert got  # clustered data at 0.9 must surface something


def test_gram_blocking_tiles_match_unblocked(spark):
    # block smaller than the bucket: the tiled gemms must reproduce the
    # one-shot gram's pairs exactly
    df = _clustered_df(spark, n=150, dim=8, n_centers=2, seed=3)
    base = df.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("_vec"),
        F.lit(0).alias("bucket"),
    )
    a = {
        (r.id_a, r.id_b): r.cosine
        for r in _bucket_gram_pairs(
            base, ["bucket"], "_vec", "_id", 0.6, block=32
        ).collect()
    }
    b = {
        (r.id_a, r.id_b): r.cosine
        for r in _bucket_gram_pairs(
            base, ["bucket"], "_vec", "_id", 0.6, block=4096
        ).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
