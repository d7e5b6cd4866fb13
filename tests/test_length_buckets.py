"""Length-bucketed padded-batch assignment
(operators/packing.length_bucket_batches + batch_padding_stats).

Pins: bucket math (width and explicit-boundary modes), the batch-size
law, determinism, that a batch never mixes buckets or shards, slot
uniqueness, padding accounting, and the width-1 zero-padding limit law
(every batch homogeneous in length ⇒ no padding)."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.packing import (
    batch_padding_stats,
    length_bucket_batches,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # 200 docs with word counts 1..40 cycling, ids 0..199
    rows = [(i, " ".join(["w"] * (1 + i % 40))) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _assign(corpus, **kw):
    kw.setdefault("batch_size", 8)
    kw.setdefault("bucket_width", 10)
    kw.setdefault("shards", 2)
    return length_bucket_batches(corpus, "doc_id", text_col="text", **kw)


def test_bucket_math_width_mode(spark, corpus):
    got = _assign(corpus).collect()
    assert got
    for r in got:
        assert r["bucket_id"] == r["n_tokens"] // 10
        assert 0 <= r["shard"] < 2
        assert 0 <= r["seq_in_batch"] < 8


def test_bucket_math_boundary_mode(spark, corpus):
    got = _assign(corpus, bucket_width=None, boundaries=[5, 20, 35]).collect()
    for r in got:
        assert r["bucket_id"] == sum(1 for b in (5, 20, 35) if b <= r["n_tokens"])


def test_batches_never_mix_buckets_or_shards_and_sizes(spark, corpus):
    asg = _assign(corpus)
    per_batch = (
        asg.groupBy("bucket_id", "shard", "batch_seq")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("seq_in_batch").alias("slots"),
            F.max("batch_seq").alias("_"),
        )
        .collect()
    )
    assert per_batch
    # slot uniqueness + size bound
    for r in per_batch:
        assert 1 <= r["n"] <= 8
        assert r["slots"] == r["n"]
    # within each (bucket, shard) only the LAST batch may be short
    by_group = {}
    for r in per_batch:
        by_group.setdefault((r["bucket_id"], r["shard"]), []).append(
            (r["batch_seq"], r["n"])
        )
    for seqs in by_group.values():
        seqs.sort()
        for bseq, n in seqs[:-1]:
            assert n == 8
        # batch_seq values are consecutive from 0
        assert [s for s, _ in seqs] == list(range(len(seqs)))


def test_deterministic_across_runs(spark, corpus):
    a = sorted(map(tuple, _assign(corpus).collect()))
    b = sorted(map(tuple, _assign(corpus).collect()))
    assert a == b


def test_padding_stats_law(spark, corpus):
    asg = _assign(corpus).cache()
    stats = {
        (r["bucket_id"], r["shard"], r["batch_seq"]): r.asDict()
        for r in batch_padding_stats(asg).collect()
    }
    rows = [r.asDict() for r in asg.collect()]
    by_batch = {}
    for r in rows:
        by_batch.setdefault((r["bucket_id"], r["shard"], r["batch_seq"]), []).append(
            r["n_tokens"]
        )
    assert set(stats) == set(by_batch)
    for k, lens in by_batch.items():
        s = stats[k]
        assert s["n_seqs"] == len(lens)
        assert s["batch_len"] == max(lens)
        assert s["pad_tokens"] == len(lens) * max(lens) - sum(lens)
        assert s["pad_tokens"] >= 0
    asg.unpersist()


def test_width_one_means_zero_padding(spark, corpus):
    asg = _assign(corpus, bucket_width=1)
    assert (
        batch_padding_stats(asg).where(F.col("pad_tokens") != 0).count() == 0
    )


def test_validation(spark, corpus):
    for kw in (
        dict(batch_size=0),
        dict(shards=0),
        dict(shards=10001),
        dict(bucket_width=0),
        dict(bucket_width=None, boundaries=[]),
        dict(bucket_width=None, boundaries=[20, 5]),
    ):
        with pytest.raises(ValueError):
            _assign(corpus, **kw)
    with pytest.raises(ValueError):
        length_bucket_batches(corpus, "doc_id")  # neither text nor token col
