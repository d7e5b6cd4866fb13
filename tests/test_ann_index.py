"""Persisted ANN index lifecycle (operators/ann_index.py).

The serving-shape laws: (1) a persisted index serves EXACTLY what the
in-memory ivf_pq_topk computes from the same artifacts; (2) the serving
scan physically reads only the probed buckets' files (partition pruning
observed, not assumed); (3) recall vs brute clears the same floor as
the train-per-call paths; (4) a crashed build never looks complete.
"""

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
    ann_index_topk,
    build_ann_index,
    corpus_path,
    index_exists,
    load_index_meta,
)
from spark_streaming_sql_s3_connector_spark.operators.similarity import (
    brute_force_topk,
    ivf_pq_topk,
)


def _vectors(n=400, dim=16, seed=11):
    rng = random.Random(seed)
    # clustered corpus: ANN recall floors are meaningless on pure noise
    centers = [[rng.gauss(0, 4) for _ in range(dim)] for _ in range(6)]
    return [
        (
            i,
            [c + rng.gauss(0, 0.8) for c in centers[i % 6]],
        )
        for i in range(n)
    ]


@pytest.fixture()
def built(spark, tmp_path):
    rows = _vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    idx = str(tmp_path / "ann_idx")
    meta = build_ann_index(
        df, "embedding", "vec_id", idx,
        n_centroids=8, m_subspaces=4, pq_centroids=32, seed=3,
    )
    return rows, df, idx, meta


def test_persisted_serve_equals_in_memory(spark, built):
    rows, df, idx, meta = built
    q = rows[21][1]
    served = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    in_mem = ivf_pq_topk(
        df, "embedding", "vec_id", q, k=5,
        centroids=meta["centroids"], codebooks=meta["codebooks"], n_probe=5,
    ).collect()
    assert [(r.neighbor_id, r.adc_score) for r in served] == [
        (r.neighbor_id, r.adc_score) for r in in_mem
    ]


def test_serving_scan_prunes_to_probed_partitions(spark, built):
    rows, df, idx, meta = built
    q = rows[21][1]
    n_probe = 3
    # which files does the pruned scan ACTUALLY touch?
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        _probe_buckets,
    )

    probes = set(_probe_buckets(meta["centroids"], q, n_probe))
    assert len(probes) == n_probe
    corpus = spark.read.parquet(corpus_path(idx)).where(
        F.col("ivf_bucket").isin([int(p) for p in probes])
    )
    touched = {
        r.f for r in corpus.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert touched, "pruned scan read nothing"
    for f in touched:
        bucket = int(f.split("ivf_bucket=")[1].split("/")[0])
        assert bucket in probes, f
    # and the filter IS a partition filter in the plan (pruning happens
    # at planning, not as a post-scan filter)
    plan = corpus._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_bucket" in plan.split("PartitionFilters", 1)[1][:200]
    # fewer files than the full index
    all_files = {
        r.f
        for r in spark.read.parquet(corpus_path(idx))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert len(touched) < len(all_files)


def test_recall_floor_from_persisted_index(spark, built):
    """Floor set at 0.2 (measured 0.3-0.6 across query ids): within a
    tight cluster every member's ADC score is near-identical, so WHICH
    cluster members fill the top-10 is quantization luck — the floor
    guards against a broken lookup path (recall ~0), not PQ's inherent
    intra-cluster resolution."""
    rows, df, idx, meta = built
    for qid in (21, 100):
        q = rows[qid][1]
        exact = {
            r.neighbor_id
            for r in brute_force_topk(df, "embedding", "vec_id", q, k=10).collect()
        }
        served = {
            r.neighbor_id
            for r in ann_index_topk(spark, idx, q, k=10, n_probe=5).collect()
        }
        assert len(exact & served) / 10 >= 0.2, qid


def test_incomplete_build_never_looks_complete(spark, tmp_path):
    idx = str(tmp_path / "idx")
    assert not index_exists(idx)
    # a crashed build: corpus parquet present, meta absent
    rows = _vectors(n=50)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    df.write.parquet(corpus_path(idx))
    assert not index_exists(idx)
    with pytest.raises(FileNotFoundError):
        load_index_meta(idx)
    # wrong format version fails loudly, not silently
    os.makedirs(idx, exist_ok=True)
    with open(os.path.join(idx, "quantizers.json"), "w") as f:
        json.dump({"format_version": 999}, f)
    with pytest.raises(ValueError, match="format_version"):
        load_index_meta(idx)


def test_rebuild_overwrites_cleanly(spark, built):
    rows, df, idx, meta = built
    # rebuilding with different geometry replaces the index wholesale
    meta2 = build_ann_index(
        df, "embedding", "vec_id", idx,
        n_centroids=4, m_subspaces=2, pq_centroids=16, seed=5,
    )
    assert load_index_meta(idx)["n_centroids"] == 4
    q = rows[3][1]
    got = ann_index_topk(spark, idx, q, k=3, n_probe=2).collect()
    assert len(got) == 3


def test_append_equals_full_encode_and_replay_converges(spark, tmp_path):
    """Grow-without-retrain laws: build on the first half, append the
    second half in two batches (stored quantizers, encode-only) —
    serving equals the in-memory ivf_pq_topk over the UNION with the
    same artifacts; REPLAYING a batch (foreachBatch retry) changes
    nothing (overwrite-by-batch-dir, not blind append)."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        append_to_ann_index,
    )

    rows = _vectors()
    first = [r for r in rows if r[0] < 200]
    b1 = [r for r in rows if 200 <= r[0] < 300]
    b2 = [r for r in rows if r[0] >= 300]
    df1 = spark.createDataFrame(first, ["vec_id", "embedding"])
    idx = str(tmp_path / "idx")
    meta = build_ann_index(
        df1, "embedding", "vec_id", idx,
        n_centroids=8, m_subspaces=4, pq_centroids=32, seed=3,
    )
    append_to_ann_index(spark.createDataFrame(b1, ["vec_id", "embedding"]), idx, batch_id=0)
    append_to_ann_index(spark.createDataFrame(b2, ["vec_id", "embedding"]), idx, batch_id=1)
    union = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = rows[250][1]
    served = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    in_mem = ivf_pq_topk(
        union, "embedding", "vec_id", q, k=5,
        centroids=meta["centroids"], codebooks=meta["codebooks"], n_probe=5,
    ).collect()
    assert [(r.neighbor_id, r.adc_score) for r in served] == [
        (r.neighbor_id, r.adc_score) for r in in_mem
    ]
    # replay batch 1: identical serve (and identical corpus row count)
    n_before = spark.read.parquet(corpus_path(idx)).count()
    append_to_ann_index(spark.createDataFrame(b2, ["vec_id", "embedding"]), idx, batch_id=1)
    assert spark.read.parquet(corpus_path(idx)).count() == n_before
    replayed = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    assert [(r.neighbor_id, r.adc_score) for r in replayed] == [
        (r.neighbor_id, r.adc_score) for r in served
    ]
    # the reserved build label is rejected
    with pytest.raises(ValueError, match="reserved"):
        append_to_ann_index(union, idx, batch_id="base")


def test_append_rejects_legacy_flat_layout(spark, tmp_path):
    """A v1 (flat, no batch level) index still SERVES but must refuse
    appends — mixed partition depths would corrupt discovery."""
    import json as _json
    import os as _os

    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        append_to_ann_index,
    )

    rows = _vectors(n=100)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    idx = str(tmp_path / "idx")
    meta = build_ann_index(
        df, "embedding", "vec_id", idx,
        n_centroids=4, m_subspaces=4, pq_centroids=16, seed=3,
    )
    # forge the legacy layout: flatten batch=base into the corpus root
    # and mark the meta as v1
    legacy = str(tmp_path / "legacy")
    _os.makedirs(legacy)
    _os.rename(corpus_path(idx) + "/batch=base", legacy + "/corpus")
    _os.rmdir(corpus_path(idx))
    _os.rename(legacy + "/corpus", corpus_path(idx))
    m = dict(meta)
    m["format_version"] = 1
    with open(_os.path.join(idx, "quantizers.json"), "w") as f:
        _json.dump(m, f)
    # serving still works on the flat layout
    q = rows[10][1]
    assert len(ann_index_topk(spark, idx, q, k=3, n_probe=2).collect()) == 3
    with pytest.raises(ValueError, match="format_version"):
        append_to_ann_index(df, idx)


def test_pq_recall_survives_held_out_training(spark, sf_dir):
    """Codebooks trained on HALF the real embeddings corpus must still
    rank the other half well (guards against codebook-overfit
    regressions as testdata evolves): the gate's floor (5/10, same
    geometry as similarity_recall_profile — m=16 on the d=64 vectors)
    must clear when the queried half never contributed a training
    vector."""
    from spark_streaming_sql_s3_connector_spark.operators.similarity import (
        pq_topk,
        pq_train,
    )
    from spark_streaming_sql_s3_connector_spark.plans.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.where(F.col("vec_id") % 2 == 0)
    held = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") != 1))
    books = pq_train(train, "embedding", m_subspaces=16, n_centroids=256, seed=42)
    q = [
        float(x)
        for x in emb.where(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    ]
    exact = {
        r.neighbor_id
        for r in brute_force_topk(held, "embedding", "vec_id", q, k=10).collect()
    }
    approx = {
        r.neighbor_id
        for r in pq_topk(held, "embedding", "vec_id", q, k=10, codebooks=books).collect()
    }
    assert len(exact & approx) / 10 >= 0.5


def test_streaming_ann_index_through_connector(spark, tmp_path):
    """The index-maintenance composition: bootstrap-build on half the
    corpus, stream the other half through format("s3-connector") as
    parquet files into streaming_ann_index, and serving equals the
    in-memory ivf_pq_topk over the union with the bootstrap artifacts —
    including after a duplicate event re-delivery (connector
    exactly-once) on top of the append replay law."""
    import time

    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        streaming_ann_index,
    )
    from spark_streaming_sql_s3_connector_spark.queueing.local import (
        LocalFileQueueClient,
    )
    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    register(spark)
    rows = _vectors()
    first = [r for r in rows if r[0] < 200]
    rest = [r for r in rows if r[0] >= 200]
    idx = str(tmp_path / "idx")
    meta = build_ann_index(
        spark.createDataFrame(first, ["vec_id", "embedding"]),
        "embedding", "vec_id", idx,
        n_centroids=8, m_subspaces=4, pq_centroids=32, seed=3,
    )
    # two parquet files of new vectors
    files = []
    for i, chunk in enumerate((rest[:100], rest[100:])):
        p = str(tmp_path / f"vecs_{i}.parquet")
        spark.createDataFrame(chunk, ["vec_id", "embedding"]).coalesce(1).write.parquet(p + ".dir")
        import glob as _glob

        part = _glob.glob(p + ".dir/part-*.parquet")[0]
        files.append(part)
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
        .option("spark.s3conn.metadataPath", str(tmp_path / "meta"))
        .option("spark.s3conn.maxFilesPerTrigger", "1")
    )
    q = streaming_ann_index(reader.load(), idx, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        queue.send_file_event(files[0], int(time.time() * 1000))  # dup event
        q.processAllAvailable()
    finally:
        q.stop()
    union = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qv = rows[250][1]
    served = ann_index_topk(spark, idx, qv, k=5, n_probe=5).collect()
    in_mem = ivf_pq_topk(
        union, "embedding", "vec_id", qv, k=5,
        centroids=meta["centroids"], codebooks=meta["codebooks"], n_probe=5,
    ).collect()
    assert [(r.neighbor_id, r.adc_score) for r in served] == [
        (r.neighbor_id, r.adc_score) for r in in_mem
    ]


def test_meta_lifecycle_on_mock_object_store(monkeypatch):
    """The index's state-plane file ops (exists / meta read / meta write
    / wipe) run through the log-FS layer, so index_dir may be an
    object-store URI. Exercised against the in-process mock FS via the
    filesystem_for seam — Spark's parquet write is not in play here
    (separate executor processes can't see the mock), only the meta
    contract: written-last meta implies complete; wipe removes meta
    FIRST so a crashed rebuild reads as incomplete, never mixed."""
    import json as _json

    from pyarrow.fs import _MockFileSystem

    from spark_streaming_sql_s3_connector_spark.operators import ann_index as mod
    from spark_streaming_sql_s3_connector_spark.state import log_fs
    from spark_streaming_sql_s3_connector_spark.state.log_fs import (
        ArrowLogFileSystem,
    )

    mock = _MockFileSystem()
    monkeypatch.setattr(
        log_fs, "_pyarrow_from_uri", lambda p: (mock, p.split("://", 1)[1])
    )

    uri = "mock://bucket/ann_index"
    assert not mod.index_exists(uri)

    fs = ArrowLogFileSystem(mock)
    meta = {
        "format_version": 2, "vec_col": "v", "id_col": "id",
        "n_centroids": 2, "m_subspaces": 2, "pq_centroids": 4, "seed": 1,
        "centroids": [[0.0], [1.0]],
        "codebooks": [[[0.0]], [[0.0]]],
    }
    fs.mkdirs("bucket/ann_index")
    fs.write_atomic(
        "bucket/ann_index/quantizers.json", _json.dumps(meta), overwrite=True
    )
    assert mod.index_exists(uri)
    assert mod.load_index_meta(uri)["n_centroids"] == 2

    # the rebuild wipe order: meta first, then the corpus tree
    fs.mkdirs("bucket/ann_index/corpus/batch=base/ivf_bucket=0")
    fs.write_atomic(
        "bucket/ann_index/corpus/batch=base/ivf_bucket=0/part-0.parquet",
        "x", overwrite=True,
    )
    fsr, root = log_fs.filesystem_for(uri)
    fsr.delete(fsr.join(root, "quantizers.json"))
    assert not mod.index_exists(uri)
    fsr.delete_dir(fsr.join(root, "corpus"))
    assert fsr.listdir(fsr.join(root, "corpus")) == []
    # deleting a missing tree is not an error
    fsr.delete_dir(fsr.join(root, "corpus"))
