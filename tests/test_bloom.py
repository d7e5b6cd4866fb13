"""Bloom-filter historical-dedup laws.

- No false negatives: every history key must test positive (guaranteed
  by construction; a miss means the probe and build disagree on hashing).
- False-positive rate on a disjoint key set stays near the configured
  fpp (loose 3x envelope — it's a random variable).
- Two-phase exact mode returns byte-identical rows to a plain anti-join.
- NULL keys are never duplicates (anti-join semantics).
- Approximate mode never keeps a true duplicate and loses at most ~fpp
  of the genuinely-new rows.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.bloom import (
    bloom_params,
    build_bloom,
    dedup_against_history,
    might_contain_column,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc text number {i} with payload {i * 7919 % 1000}") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bloom_params_sizing():
    m, k = bloom_params(10_000, 0.01)
    # textbook optimum ~9.59 bits/key (95.9k), rounded UP to a power of
    # two for mask arithmetic -> 2^17; k tracks the realized density
    assert m == 131072
    assert m & (m - 1) == 0
    assert 6 <= k <= 10
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives(spark, docs):
    bloom = build_bloom(docs, "text", expected_items=2000, fpp=0.01)
    hits = docs.withColumn("_mc", might_contain_column(docs, "text", bloom))
    assert hits.where(~F.col("_mc")).count() == 0


def test_false_positive_rate(spark, docs):
    bloom = build_bloom(docs, "text", expected_items=2000, fpp=0.01)
    other = spark.createDataFrame(
        [(i, f"disjoint probe {i} key {i * 104729 % 997}") for i in range(10_000)],
        "doc_id bigint, text string",
    )
    fp = other.withColumn("_mc", might_contain_column(other, "text", bloom)) \
        .where(F.col("_mc")).count()
    assert fp / 10_000 < 0.03  # 3x the 1% target


def test_exact_mode_equals_anti_join(spark, docs):
    history = docs.where(F.col("doc_id") % 3 == 0)
    got = dedup_against_history(docs, history, on="text", expected_items=1000)
    want = docs.join(history.select("text").distinct(), on="text", how="left_anti")
    assert got.count() == want.count() == docs.count() - history.count()
    sym_diff = got.select("doc_id").exceptAll(want.select("doc_id")).count() \
        + want.select("doc_id").exceptAll(got.select("doc_id")).count()
    assert sym_diff == 0


def test_null_keys_kept(spark):
    corpus = spark.createDataFrame(
        [(1, "shared"), (2, None), (3, "only-new")], "doc_id bigint, text string"
    )
    history = spark.createDataFrame(
        [(10, "shared"), (11, None)], "doc_id bigint, text string"
    )
    kept = dedup_against_history(corpus, history, on="text", expected_items=10)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]


def test_approximate_mode_bounds(spark, docs):
    history = docs.where(F.col("doc_id") % 4 == 0)
    approx = dedup_against_history(
        docs, history, on="text", expected_items=1000, fpp=0.01, exact=False
    )
    kept_ids = {r.doc_id for r in approx.select("doc_id").collect()}
    dup_ids = {r.doc_id for r in history.select("doc_id").collect()}
    assert not (kept_ids & dup_ids)  # no true duplicate survives
    n_new = docs.count() - len(dup_ids)
    assert len(kept_ids) >= n_new * 0.95  # loses at most ~fpp of new rows


def test_oversized_bound_still_exact(spark, docs):
    # callers pass an upper bound; a 10x oversize must not change results
    history = docs.where(F.col("doc_id") % 5 == 0)
    got = dedup_against_history(docs, history, on="text", expected_items=20_000)
    assert got.count() == docs.count() - history.count()


def test_bitmap_probe_roundtrip_numpy():
    # pure-numpy bitmap law: setting then probing the same (h1, h2) hits
    from spark_streaming_sql_s3_connector_spark.operators.bloom import BloomFilter

    m, k = bloom_params(100, 0.01)
    mask = np.int64(m - 1)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    rng = np.random.RandomState(7)
    h1 = rng.randint(-(2**62), 2**62, 100).astype(np.int64)
    h2 = rng.randint(-(2**62), 2**62, 100).astype(np.int64)
    a, b = h1 & mask, h2 & mask
    for i in range(k):
        idx = (a + np.int64(i) * b) & mask
        np.bitwise_or.at(
            bits, idx >> np.int64(3),
            (np.uint8(1) << (idx & np.int64(7)).astype(np.uint8)),
        )
    bf = BloomFilter(m, k, 0, bits)
    assert bf.might_contain_np(h1, h2).all()
