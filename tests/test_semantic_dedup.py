"""Index-backed semantic dedup (operators/ann_index.py
dedup_against_ann_index / streaming_semantic_dedup).

Laws: (1) exact copies of indexed vectors are flagged with their source
as the best match and novel far-away vectors are not; (2) the batch
horizon filter screens a replayed batch only against strictly-earlier
batches; (3) the streaming composition is replay-convergent and
cross-batch effective (batch N+1 dedups against batch N's survivors);
(4) the driver-bound guard trips instead of collecting unbounded input.
"""

import glob
import random
import time

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
    append_to_ann_index,
    build_ann_index,
    dedup_against_ann_index,
    read_semantic_dedup_output,
    streaming_semantic_dedup,
)

DIM = 16


def _rand(ids, seed):
    # iid gaussian vectors: any draw is encodable by quantizers trained
    # on any other draw (same per-dim marginals), exact copies score
    # ADC ~1 after fine-grained PQ, and two independent draws land at
    # cosine ~0 +- 1/sqrt(DIM) — so a 0.8 threshold separates "copy of
    # something indexed" from "novel" with wide margin
    rng = random.Random(seed)
    return [(i, [rng.gauss(0, 1) for _ in range(DIM)]) for i in ids]


@pytest.fixture()
def built(spark, tmp_path):
    rows = _rand(range(300), seed=5)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    idx = str(tmp_path / "idx")
    # m=16 -> per-dim scalar quantization at 32 levels: reconstruction
    # cosine > 0.99, so exact copies clear any sane threshold
    meta = build_ann_index(
        df, "embedding", "vec_id", idx,
        n_centroids=8, m_subspaces=16, pq_centroids=32, seed=3,
    )
    return rows, idx, meta


def test_flags_copies_not_novel(spark, built):
    rows, idx, meta = built
    copies = [(1000 + i, vec) for i, vec in [(r[0], r[1]) for r in rows[:20]]]
    novel = _rand(range(2000, 2010), seed=77)
    batch = spark.createDataFrame(copies + novel, ["vec_id", "embedding"])
    hits = dedup_against_ann_index(batch, idx, threshold=0.8, n_probe=8)
    got = {r["vec_id"]: r["match_id"] for r in hits.collect()}
    # every copy flagged; the best match IS its source (independent
    # gaussian draws sit near cosine 0, so nothing else comes close)
    assert set(got) == {1000 + r[0] for r in rows[:20]}
    for qid, mid in got.items():
        assert mid == qid - 1000
    # scores are ~self-similarity of the PQ reconstruction
    assert all(r["adc_score"] > 0.8 for r in hits.collect())


def test_threshold_monotone_and_empty_batch(spark, built):
    rows, idx, meta = built
    copies = [(1000 + r[0], r[1]) for r in rows[:10]]
    batch = spark.createDataFrame(copies, ["vec_id", "embedding"])
    lo = dedup_against_ann_index(batch, idx, threshold=0.5, n_probe=8).count()
    hi = dedup_against_ann_index(batch, idx, threshold=0.999, n_probe=8).count()
    assert hi <= lo
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert dedup_against_ann_index(empty, idx, threshold=0.8).count() == 0
    with pytest.raises(ValueError, match="threshold"):
        dedup_against_ann_index(batch, idx, threshold=0.0)


def test_driver_bound_guard(spark, built):
    rows, idx, meta = built
    batch = spark.createDataFrame(
        [(9000 + i, rows[0][1]) for i in range(30)], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="max_batch_rows"):
        dedup_against_ann_index(batch, idx, threshold=0.8, max_batch_rows=10)


def test_batch_horizon_excludes_later_appends(spark, built):
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_batch,
    )

    rows, idx, meta = built
    # appended batch 7: fresh SAME-DISTRIBUTION vectors (the stored
    # quantizers must be able to encode them) under ids >= 5000
    extra = [(5000 + i, r[1]) for i, r in enumerate(_rand(range(40), seed=9))]
    append_to_ann_index(
        spark.createDataFrame(extra, ["vec_id", "embedding"]), idx, batch_id=7
    )
    q = [("probe", rows[0][1])]
    # with k covering the whole probed population: appended ids are
    # retrievable without a horizon...
    ids_all = {
        r["neighbor_id"]
        for r in ann_index_topk_batch(spark, idx, q, k=400, n_probe=8).collect()
    }
    assert any(i >= 5000 for i in ids_all)
    # ...and invisible to a trigger replaying batch <= 7
    ids_hzn = {
        r["neighbor_id"]
        for r in ann_index_topk_batch(
            spark, idx, q, k=400, n_probe=8, upto_batch=7
        ).collect()
    }
    assert not any(i >= 5000 for i in ids_hzn)
    assert ids_hzn  # the base corpus still serves


def _stream_reader(spark, tmp_path, files, meta_dir="meta"):
    from spark_streaming_sql_s3_connector_spark.queueing.local import (
        LocalFileQueueClient,
    )
    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    register(spark)
    queue = LocalFileQueueClient(f"local://{tmp_path}/queue")
    for p in files:
        queue.send_file_event(p, int(time.time() * 1000))
    reader = (
        spark.readStream.format("s3-connector")
        .schema("vec_id bigint, embedding array<double>")
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{tmp_path}/queue")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .option("spark.s3conn.metadataPath", str(tmp_path / meta_dir))
        .option("spark.s3conn.maxFilesPerTrigger", "1")
    )
    return reader, queue


def _write_chunk(spark, tmp_path, name, chunk):
    p = str(tmp_path / name)
    spark.createDataFrame(chunk, ["vec_id", "embedding"]).coalesce(1).write.parquet(p)
    return glob.glob(p + "/part-*.parquet")[0]


def test_streaming_semantic_dedup_cross_batch_and_replay(spark, tmp_path, built):
    rows, idx, meta = built
    # batch A: 10 novel vectors; batch B: copies of A's vectors (cross-
    # batch dups) + 5 fresh novels + 3 copies of the BOOTSTRAP corpus
    novelA = [(5000 + i, v) for i, v in _rand(range(10), seed=21)]
    freshB = [(6000 + i, v) for i, v in _rand(range(5), seed=22)]
    copiesA = [(7000 + i, vec) for i, (_, vec) in enumerate(novelA)]
    copies_boot = [(8000 + r[0], r[1]) for r in rows[:3]]
    fileA = _write_chunk(spark, tmp_path, "a.parquet", novelA)
    fileB = _write_chunk(
        spark, tmp_path, "b.parquet", copiesA + freshB + copies_boot
    )
    reader, queue = _stream_reader(spark, tmp_path, [fileA, fileB])
    out = str(tmp_path / "out")
    q = streaming_semantic_dedup(
        reader.load(), idx, str(tmp_path / "ckpt"), out,
        threshold=0.8, n_probe=8,
    )
    try:
        q.processAllAvailable()
        n_first = read_semantic_dedup_output(spark, out).count()
        # duplicate event re-delivery: the connector dedups the FILE, and
        # the out dirs are batch-keyed — totals must not move
        queue.send_file_event(fileA, int(time.time() * 1000))
        q.processAllAvailable()
        n_second = read_semantic_dedup_output(spark, out).count()
    finally:
        q.stop()
    survivors = {
        r["vec_id"] for r in read_semantic_dedup_output(spark, out).collect()
    }
    # batch A all novel -> all survive; batch B: copies of A and of the
    # bootstrap corpus are screened out, fresh novels survive
    assert {r[0] for r in novelA} <= survivors
    assert {r[0] for r in freshB} <= survivors
    assert not ({r[0] for r in copiesA} & survivors)
    assert not ({r[0] for r in copies_boot} & survivors)
    assert n_first == n_second == len(novelA) + len(freshB)


def test_streaming_replay_of_indexed_batch_converges(spark, tmp_path, built):
    """Crash-replay shape: batch 0's survivors are already in the index
    when batch 0 re-runs (fresh checkpoint, same out/index dirs). The
    horizon + same-batch screens must reproduce the original verdicts
    exactly — survivors unchanged, no self-flagging."""
    rows, idx, meta = built
    novel = [(5000 + i, v) for i, v in _rand(range(12), seed=31)]
    f = _write_chunk(spark, tmp_path, "n.parquet", novel)
    out = str(tmp_path / "out")
    reader, _ = _stream_reader(spark, tmp_path, [f])
    q = streaming_semantic_dedup(
        reader.load(), idx, str(tmp_path / "ckpt1"), out, threshold=0.8, n_probe=8
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = {r["vec_id"] for r in read_semantic_dedup_output(spark, out).collect()}
    # simulate the foreachBatch replay: fresh checkpoint AND fresh
    # connector metadata (so admission re-admits the file as batch 0),
    # same out/index dirs -> batch 0 re-executes against an index that
    # now CONTAINS batch 0's survivors
    import shutil

    shutil.rmtree(str(tmp_path / "queue"))
    reader2, _ = _stream_reader(spark, tmp_path, [f], meta_dir="meta2")
    q2 = streaming_semantic_dedup(
        reader2.load(), idx, str(tmp_path / "ckpt2"), out, threshold=0.8, n_probe=8
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    second = {r["vec_id"] for r in read_semantic_dedup_output(spark, out).collect()}
    assert first == second == {r[0] for r in novel}


def test_registered_semantic_dedup_key_self_checks_true(spark):
    import __spark_entry__ as em

    df = em.queries()["ann_semantic_dedup"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and all(r["all_copies_flagged"] for r in rows)
    assert all(r["adc_score"] >= 0.85 for r in rows)


def test_range_search_consistent_with_topk(spark, built):
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_range,
        ann_index_topk,
    )

    rows, idx, meta = built
    qv = rows[0][1]
    top = ann_index_topk(spark, idx, qv, k=10, n_probe=8).collect()
    thr = 0.5
    rng = {
        r["neighbor_id"]: r["adc_score"]
        for r in ann_index_range(spark, idx, qv, threshold=thr, n_probe=8).collect()
    }
    # law: every top-k hit at/above the threshold is in the range result
    # with the identical ADC score
    for r in top:
        if r["adc_score"] >= thr:
            assert rng[r["neighbor_id"]] == r["adc_score"]
    # self-retrieval: the query IS an indexed vector -> its own id
    # clears a high threshold
    high = ann_index_range(spark, idx, qv, threshold=0.9, n_probe=8).collect()
    assert rows[0][0] in {r["neighbor_id"] for r in high}
    # all results respect the threshold
    assert all(v >= thr for v in rng.values())
    with pytest.raises(ValueError, match="threshold"):
        ann_index_range(spark, idx, qv, threshold=2.0)


def test_range_search_unbounded_beyond_k(spark, built):
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_range,
        append_to_ann_index,
    )

    rows, idx, meta = built
    # plant a 30-member duplicate cluster of rows[0]: top-k at k=10
    # truncates it, range search must return ALL of it
    clones = [(9000 + i, rows[0][1]) for i in range(30)]
    append_to_ann_index(
        spark.createDataFrame(clones, ["vec_id", "embedding"]), idx, batch_id=3
    )
    got = {
        r["neighbor_id"]
        for r in ann_index_range(spark, idx, rows[0][1], 0.9, n_probe=8).collect()
    }
    assert {c[0] for c in clones} <= got
    assert len(got) >= 31  # the 30 clones + the original at least
