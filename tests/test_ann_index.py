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


def test_batch_topk_equals_per_query_serving(spark, built):
    """ann_index_topk_batch law: one job over the union of probed
    buckets returns, per query, EXACTLY the single-query serving path's
    scores (identical ADC arithmetic); neighbor ids agree wherever
    scores are untied (tie order between equal-coded vectors is
    quantization luck in both paths)."""
    from collections import Counter

    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_batch,
    )

    rows, df, idx, meta = built
    queries = [(rows[i][0], rows[i][1]) for i in (3, 21, 100, 250)]
    batch = ann_index_topk_batch(spark, idx, queries, k=5, n_probe=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.adc_score))
    assert set(got) == {str(q) for q, _ in queries}
    for qid, vec in queries:
        single = ann_index_topk(spark, idx, vec, k=5, n_probe=5).collect()
        b = sorted(got[str(qid)], key=lambda t: (-t[1], t[0]))
        assert len(b) == len(single) == 5
        s_scores = [r.adc_score for r in single]
        b_scores = [x[1] for x in b]
        assert all(abs(a - c) < 1e-9 for a, c in zip(b_scores, s_scores)), qid
        ties = {s for s, n in Counter(round(x, 9) for x in b_scores).items() if n > 1}
        s_ids = {r.neighbor_id for r in single}
        for nid, score in b:
            if round(score, 9) not in ties:
                assert nid in s_ids, (qid, nid)
    # DataFrame input form serves identically
    qdf = spark.createDataFrame(queries, ["query_id", "vector"])
    again = {
        (r.query_id, r.neighbor_id, round(r.adc_score, 9))
        for r in ann_index_topk_batch(spark, idx, qdf, k=5, n_probe=5).collect()
    }
    first = {
        (qid, nid, round(s, 9)) for qid, lst in got.items() for nid, s in lst
    }
    assert again == first


def _corpus_labels(idx):
    return {
        e.split("=", 1)[1]
        for e in os.listdir(corpus_path(idx))
        if e.startswith("batch=")
    }


def test_compaction_preserves_serving_and_bounds_files(spark, tmp_path):
    """compact_ann_index law: serve-after == serve-before on the union
    corpus, and the batch-dir population collapses to ONE base version
    (the small-file wall the compactor exists to remove)."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        append_to_ann_index,
        compact_ann_index,
    )

    rows = _vectors()
    chunks = [rows[:200], rows[200:260], rows[260:320], rows[320:360], rows[360:]]
    idx = str(tmp_path / "idx")
    build_ann_index(
        spark.createDataFrame(chunks[0], ["vec_id", "embedding"]),
        "embedding", "vec_id", idx,
        n_centroids=8, m_subspaces=4, pq_centroids=32, seed=3,
    )
    for b, chunk in enumerate(chunks[1:]):
        append_to_ann_index(
            spark.createDataFrame(chunk, ["vec_id", "embedding"]), idx, batch_id=b
        )
    assert _corpus_labels(idx) == {"base", "0", "1", "2", "3"}

    def _files():
        n = 0
        for dirpath, _dirs, files in os.walk(corpus_path(idx)):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    q = rows[250][1]
    before = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    files_before = _files()
    assert compact_ann_index(spark, idx) == 4
    assert _corpus_labels(idx) == {"base-4"}
    assert _files() < files_before
    after = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    assert [(r.neighbor_id, r.adc_score) for r in after] == [
        (r.neighbor_id, r.adc_score) for r in before
    ]
    # nothing left to fold: a second run is a no-op
    assert compact_ann_index(spark, idx) is None


def test_replay_of_folded_batch_converges(spark, tmp_path):
    """A foreachBatch retry of a batch that compaction already folded
    recreates a dir BELOW the fold horizon: readers filter it out
    (serving and live row count unchanged), and the next compaction run
    GCs it — the replay discipline compact_ann_index documents."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        append_to_ann_index,
        compact_ann_index,
        read_index_corpus,
    )

    rows = _vectors()
    idx = str(tmp_path / "idx")
    build_ann_index(
        spark.createDataFrame(rows[:200], ["vec_id", "embedding"]),
        "embedding", "vec_id", idx,
        n_centroids=8, m_subspaces=4, pq_centroids=32, seed=3,
    )
    b1 = spark.createDataFrame(rows[200:300], ["vec_id", "embedding"])
    append_to_ann_index(b1, idx, batch_id=0)
    append_to_ann_index(
        spark.createDataFrame(rows[300:], ["vec_id", "embedding"]), idx, batch_id=1
    )
    compact_ann_index(spark, idx)
    q = rows[250][1]
    served = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    n_live = read_index_corpus(spark, idx).count()
    # the replay: batch 0 arrives again after its fold
    append_to_ann_index(b1, idx, batch_id=0)
    assert "0" in _corpus_labels(idx)  # the stale dir exists on disk…
    assert read_index_corpus(spark, idx).count() == n_live  # …but is not live
    replayed = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    assert [(r.neighbor_id, r.adc_score) for r in replayed] == [
        (r.neighbor_id, r.adc_score) for r in served
    ]
    # next compaction pass GCs it even with nothing new to fold
    assert compact_ann_index(spark, idx) is None
    assert _corpus_labels(idx) == {"base-2"}


def test_compaction_upto_batch_and_crash_tolerance(spark, tmp_path):
    """``upto_batch`` folds only strictly-below batches; a half-written
    base version from a crashed fold (pointer never flipped) is
    invisible to serving and GC'd by the next run."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        append_to_ann_index,
        compact_ann_index,
    )

    rows = _vectors()
    idx = str(tmp_path / "idx")
    build_ann_index(
        spark.createDataFrame(rows[:200], ["vec_id", "embedding"]),
        "embedding", "vec_id", idx,
        n_centroids=8, m_subspaces=4, pq_centroids=32, seed=3,
    )
    for b, lo in enumerate(range(200, 400, 50)):
        append_to_ann_index(
            spark.createDataFrame(rows[lo : lo + 50], ["vec_id", "embedding"]),
            idx, batch_id=b,
        )
    q = rows[250][1]
    before = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    assert compact_ann_index(spark, idx, upto_batch=2) == 2
    assert _corpus_labels(idx) == {"base-2", "2", "3"}
    mid = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    assert [(r.neighbor_id, r.adc_score) for r in mid] == [
        (r.neighbor_id, r.adc_score) for r in before
    ]
    # simulate a crashed fold: a base version the pointer never named,
    # holding coded rows that MUST NOT leak into serving
    import shutil as _shutil

    _shutil.copytree(
        os.path.join(corpus_path(idx), "batch=base-2"),
        os.path.join(corpus_path(idx), "batch=base-99"),
    )
    crashed = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    assert [(r.neighbor_id, r.adc_score) for r in crashed] == [
        (r.neighbor_id, r.adc_score) for r in before
    ]
    assert compact_ann_index(spark, idx) == 4  # folds 2,3; GCs base-99
    assert _corpus_labels(idx) == {"base-4"}
    final = ann_index_topk(spark, idx, q, k=5, n_probe=5).collect()
    assert [(r.neighbor_id, r.adc_score) for r in final] == [
        (r.neighbor_id, r.adc_score) for r in before
    ]


def test_recall_floor_survives_append_drift(spark, tmp_path):
    """r7 verdict task: quantizers trained ONCE (on the build half) must
    still serve the appended half at the recall floor — guards the
    "train once, encode forever" assumption append_to_ann_index makes.
    Queries come from the APPENDED half, so every probe exercises codes
    the quantizers never saw at train time."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        append_to_ann_index,
    )

    rows = _vectors()
    first = [r for r in rows if r[0] < 200]
    rest = [r for r in rows if r[0] >= 200]
    idx = str(tmp_path / "idx")
    build_ann_index(
        spark.createDataFrame(first, ["vec_id", "embedding"]),
        "embedding", "vec_id", idx,
        n_centroids=8, m_subspaces=4, pq_centroids=32, seed=3,
    )
    append_to_ann_index(
        spark.createDataFrame(rest, ["vec_id", "embedding"]), idx, batch_id=0
    )
    union = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for qid in (250, 390):
        q = rows[qid][1]
        exact = {
            r.neighbor_id
            for r in brute_force_topk(union, "embedding", "vec_id", q, k=10).collect()
        }
        served = {
            r.neighbor_id
            for r in ann_index_topk(spark, idx, q, k=10, n_probe=5).collect()
        }
        assert len(exact & served) / 10 >= 0.2, qid


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


def test_streaming_ann_index_compacts_inline(spark, tmp_path):
    """compact_every: the maintenance hook folds committed batch dirs
    as the stream runs (upto = the in-flight batch id, so the one batch
    whose checkpoint commit is still pending never folds), and serving
    over the union stays exact."""
    import glob as _glob
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
    files = []
    for i, lo in enumerate(range(0, 200, 67)):
        chunk = rest[lo : lo + 67]
        p = str(tmp_path / f"vecs_{i}.parquet.dir")
        spark.createDataFrame(chunk, ["vec_id", "embedding"]).coalesce(1).write.parquet(p)
        files.append(_glob.glob(p + "/part-*.parquet")[0])
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
    q = streaming_ann_index(
        reader.load(), idx, str(tmp_path / "ckpt"), compact_every=2
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 3 files → batches 0,1,2; the hook fired at batch 2 with upto=2:
    # base+0+1 folded into base-2, batch 2's own dir stays live
    assert _corpus_labels(idx) == {"base-2", "2"}
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


def test_registered_batch_key_self_checks_true(spark):
    """The registered rows-only slot's self-check columns must BE true
    (the driver's gate only counts rows; this pins the booleans)."""
    from spark_streaming_sql_s3_connector_spark.plans.pipeline_queries import (
        PIPELINE_QUERIES,
    )

    df = PIPELINE_QUERIES["ann_index_batch_topk"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = df.collect()
    assert len(rows) == 80  # 8 queries × k=10
    assert all(r.recall_ge_50 and r.all_queries_served_k for r in rows)


def test_compaction_pointer_on_mock_object_store(monkeypatch):
    """The compaction pointer and batch-label listing go through the
    log-FS layer, so a compacted index can live on an object store:
    absent pointer reads as the pre-compaction default, write_atomic
    flips it, and the live-label filter derives from it."""
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
    uri = "mock://bucket/idx"
    assert mod._read_compaction_pointer(uri) == {"base": "base", "upto": 0}
    fs = ArrowLogFileSystem(mock)
    for label in ("base", "0", "1", "base-99"):
        fs.mkdirs(f"bucket/idx/corpus/batch={label}/ivf_bucket=0")
        fs.write_atomic(
            f"bucket/idx/corpus/batch={label}/ivf_bucket=0/part-0.parquet",
            "x", overwrite=True,
        )
    assert set(mod._corpus_batch_labels(uri)) == {"base", "0", "1", "base-99"}
    fs.write_atomic(
        "bucket/idx/compaction.json",
        '{"base": "base-2", "upto": 2}', overwrite=True,
    )
    ptr = mod._read_compaction_pointer(uri)
    assert ptr == {"base": "base-2", "upto": 2}


def test_filtered_serve_pre_filter_semantics(spark, built):
    rows, df, idx, meta = built
    q = rows[21][1]
    # allow only even ids — about half the corpus
    allowed = spark.createDataFrame(
        [(i,) for i, _ in rows if i % 2 == 0], ["any_name"]
    )
    got = ann_index_topk(
        spark, idx, q, k=5, n_probe=8, id_filter=allowed
    ).collect()
    # (a) every hit respects the filter; (b) full k returned (pre-filter,
    # not a post-filtered short list); (c) exactly the in-memory ranking
    # of the allowed subset — same artifacts, same ADC arithmetic
    assert len(got) == 5
    assert all(int(r.neighbor_id) % 2 == 0 for r in got)
    in_mem = ivf_pq_topk(
        df.where(F.col("vec_id") % 2 == 0), "embedding", "vec_id", q, k=5,
        centroids=meta["centroids"], codebooks=meta["codebooks"], n_probe=8,
    ).collect()
    assert [(r.neighbor_id, r.adc_score) for r in got] == [
        (r.neighbor_id, r.adc_score) for r in in_mem
    ]


def test_filtered_serve_validates_filter_shape(spark, built):
    _rows, _df, idx, _meta = built
    bad = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="one column"):
        ann_index_topk(spark, idx, [0.0] * 16, id_filter=bad)


def test_filtered_batch_serve_matches_filtered_single(spark, built):
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_batch,
    )

    rows, _df, idx, _meta = built
    allowed = spark.createDataFrame(
        [(i,) for i, _ in rows if i % 2 == 0], ["vec_id"]
    )
    queries = [("qa", rows[21][1]), ("qb", rows[140][1])]
    got = ann_index_topk_batch(
        spark, idx, queries, k=4, n_probe=8, id_filter=allowed
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.adc_score))
    for qid, vec in queries:
        single = ann_index_topk(
            spark, idx, vec, k=4, n_probe=8, id_filter=allowed
        ).collect()
        assert by_q[qid] == [(r.neighbor_id, r.adc_score) for r in single]
        assert all(int(i) % 2 == 0 for i, _ in by_q[qid])


def test_refined_serve_with_full_probe_is_brute_force(spark, built):
    """ann_index_topk_refined's exactness law: with every bucket probed
    and k*overfetch >= |corpus| the candidate set is the whole corpus,
    so the exact refine IS brute_force_topk — identical ids, cosines,
    and order. Any drift here means the refine is re-ranking on
    something other than true vectors."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_refined,
    )

    rows, df, idx, meta = built
    q = rows[7][1]
    refined = ann_index_topk_refined(
        spark, idx, df, "embedding", "vec_id", q,
        k=6, n_probe=8, overfetch=(len(rows) // 6) + 1,
    )
    brute = brute_force_topk(df, "embedding", "vec_id", q, k=6)
    assert [tuple(r) for r in refined.collect()] == [
        tuple(r) for r in brute.collect()
    ]


def test_refined_serve_beats_adc_rank_noise(spark, built):
    """The refine step's purpose: pruned ADC serving perturbs ranks via
    quantization; re-ranking the over-fetched candidates with true
    vectors must yield top-k recall vs brute at least as high as the
    raw ADC cut, and the returned cosines must be exact (match brute's
    values for shared ids)."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_refined,
    )

    rows, df, idx, meta = built
    q = rows[33][1]
    brute = {r.neighbor_id: r.cosine for r in
             brute_force_topk(df, "embedding", "vec_id", q, k=10).collect()}
    adc = {r.neighbor_id for r in
           ann_index_topk(spark, idx, q, k=10, n_probe=4).collect()}
    refined_rows = ann_index_topk_refined(
        spark, idx, df, "embedding", "vec_id", q, k=10, n_probe=4, overfetch=4
    ).collect()
    refined = {r.neighbor_id for r in refined_rows}
    assert len(refined & set(brute)) >= len(adc & set(brute))
    for r in refined_rows:
        if r.neighbor_id in brute:
            assert r.cosine == brute[r.neighbor_id]


def test_refined_serve_rejects_bad_overfetch(spark, built):
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_refined,
    )

    rows, df, idx, meta = built
    with pytest.raises(ValueError, match="overfetch"):
        ann_index_topk_refined(
            spark, idx, df, "embedding", "vec_id", rows[0][1], overfetch=0
        )


# ---------------------------------------------------------------- deletes


def _topk_ids(spark, idx, q, k=10, n_probe=8, upto=None):
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk,
    )

    return {
        r.neighbor_id
        for r in ann_index_topk(spark, idx, q, k=k, n_probe=n_probe).collect()
    }


def test_delete_excludes_ids_pre_and_post_compaction(spark, built):
    """The r8-verdict tombstone law: build → delete a subset → neither
    single-query nor batch serving ever returns a deleted id, BEFORE
    compaction (anti-join path) and AFTER it (rows physically dropped
    from the folded base, tombstone dir GC'd)."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_batch,
        compact_ann_index,
        delete_from_ann_index,
        read_index_corpus,
    )

    rows, df, idx, meta = built
    q = rows[21][1]
    victims = set(_topk_ids(spark, idx, q, k=5))  # the query's own top-5
    assert victims
    dead = spark.createDataFrame([(i,) for i in victims], ["vec_id"])
    delete_from_ann_index(dead, idx, batch_id=1)
    assert not victims & _topk_ids(spark, idx, q)
    by_batch = {
        r.query_id: r.neighbor_id
        for r in ann_index_topk_batch(
            spark, idx, [("q0", q)], k=10, n_probe=8
        ).collect()
    }
    assert not victims & set(by_batch.values())
    # corpus reader (the shared serve/maintenance path) agrees
    live = {r.id for r in read_index_corpus(spark, idx).select("id").collect()}
    assert not victims & live
    assert compact_ann_index(spark, idx) == 2
    assert not victims & _topk_ids(spark, idx, q)
    # physically gone, not just filtered: raw scan of the folded base
    raw = {
        r.id
        for r in spark.read.parquet(corpus_path(idx)).select("id").collect()
    }
    assert not victims & raw
    # tombstone dir GC'd
    assert not os.path.isdir(os.path.join(idx, "tombstones", "batch=1"))


def test_replay_of_folded_delete_converges(spark, built):
    """A foreachBatch replay rewrites a tombstone dir BELOW the fold
    horizon after compaction applied + GC'd it. The liveness filter
    (t >= horizon) must make the replayed dir invisible: serving is
    identical before and after, and the next compaction GCs it."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        compact_ann_index,
        delete_from_ann_index,
    )

    rows, df, idx, meta = built
    q = rows[21][1]
    victims = sorted(_topk_ids(spark, idx, q, k=3))
    dead = spark.createDataFrame([(i,) for i in victims], ["vec_id"])
    delete_from_ann_index(dead, idx, batch_id=1)
    compact_ann_index(spark, idx)
    before = _topk_ids(spark, idx, q)
    delete_from_ann_index(dead, idx, batch_id=1)  # replay of folded delete
    assert _topk_ids(spark, idx, q) == before
    compact_ann_index(spark, idx)  # GC pass
    assert not os.path.isdir(os.path.join(idx, "tombstones", "batch=1"))
    assert _topk_ids(spark, idx, q) == before


def test_reinsert_after_delete_serves_again(spark, built):
    """LSM delete-then-reinsert: a tombstone kills only rows appended
    BEFORE it — re-appending the id in a later batch serves again, and
    the ordering survives compaction (folded rows had their tombstones
    applied physically; the re-insert folds in untouched)."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        append_to_ann_index,
        compact_ann_index,
        delete_from_ann_index,
    )

    rows, df, idx, meta = built
    q = rows[21][1]
    victim = sorted(_topk_ids(spark, idx, q, k=1))[0]
    vrow = [r for r in rows if r[0] == victim]
    dead = spark.createDataFrame([(victim,)], ["vec_id"])
    delete_from_ann_index(dead, idx, batch_id=1)
    assert victim not in _topk_ids(spark, idx, q)
    append_to_ann_index(
        spark.createDataFrame(vrow, ["vec_id", "embedding"]), idx, batch_id=2
    )
    assert victim in _topk_ids(spark, idx, q)
    compact_ann_index(spark, idx)
    assert victim in _topk_ids(spark, idx, q)


def test_delete_rejects_non_integer_batch_and_v1(spark, built):
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        delete_from_ann_index,
    )

    rows, df, idx, meta = built
    dead = spark.createDataFrame([(1,)], ["vec_id"])
    with pytest.raises(ValueError, match="integer"):
        delete_from_ann_index(dead, idx, batch_id="oops")
    meta_v1 = dict(meta, format_version=1)
    with pytest.raises(ValueError, match="format_version"):
        delete_from_ann_index(dead, idx, batch_id=1, meta=meta_v1)


def test_semantic_dedup_never_matches_deleted_ids(spark, built):
    """dedup_against_ann_index consults the index for near-dups; a
    curation delete must stop the dead id from shadowing new arrivals
    (else a deleted doc keeps suppressing its future re-ingest)."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        dedup_against_ann_index,
        delete_from_ann_index,
    )

    rows, df, idx, meta = built
    # new batch = exact copies of two indexed vectors
    twins = [r for r in rows if r[0] in (10, 11)]
    batch = spark.createDataFrame(
        [(1000 + i, v) for i, (_, v) in enumerate(twins)],
        ["vec_id", "embedding"],
    )
    hits_before = dedup_against_ann_index(
        batch, idx, threshold=0.9, n_probe=8
    ).collect()
    shadows = {r.match_id for r in hits_before}
    assert shadows  # exact copies must match SOMETHING in their cluster
    dead = spark.createDataFrame([(i,) for i in shadows], ["vec_id"])
    delete_from_ann_index(dead, idx, batch_id=1)
    hits_after = dedup_against_ann_index(
        batch, idx, threshold=0.9, n_probe=8
    ).collect()
    # with their shadows tombstoned, no match may name a dead id — the
    # screen either finds a different live near-neighbor or none at all
    assert not shadows & {r.match_id for r in hits_after}


def test_randomized_lifecycle_serves_live_set(spark, tmp_path):
    """Lifecycle stress law: under a seeded random interleaving of
    appends, deletes, replays (of both kinds), and compactions, serving
    with every bucket probed + full-corpus refine must equal brute
    force over the LIVE set tracked by a python reference state machine
    (insert-order semantics: a delete kills ids inserted before it; a
    re-insert after a delete revives). Catches ordering bugs no single
    hand-written scenario covers."""
    import random

    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_refined,
        append_to_ann_index,
        build_ann_index,
        compact_ann_index,
        delete_from_ann_index,
    )

    rng = random.Random(1234)
    dim = 8

    def vec(i):
        r = random.Random(9000 + i)
        return [r.gauss(0, 1) for _ in range(dim)]

    base_ids = list(range(40))
    df0 = spark.createDataFrame(
        [(i, vec(i)) for i in base_ids], ["vec_id", "embedding"]
    )
    idx = str(tmp_path / "life_idx")
    build_ann_index(df0, "embedding", "vec_id", idx,
                    n_centroids=4, m_subspaces=4, pq_centroids=16, seed=7)
    # reference state machine: id -> latest op order (None for base)
    live = {i: -1 for i in base_ids}  # id -> insert order (-1 = base)
    next_id = 100
    history = []  # replayable (kind, batch_id, ids)
    for batch_id in range(1, 14):
        roll = rng.random()
        if roll < 0.45 or not history:  # append new ids
            ids = [next_id + j for j in range(rng.randint(1, 4))]
            next_id += 10
            append_to_ann_index(
                spark.createDataFrame(
                    [(i, vec(i)) for i in ids], ["vec_id", "embedding"]
                ),
                idx, batch_id=batch_id,
            )
            for i in ids:
                live[i] = batch_id
            history.append(("append", batch_id, ids))
        elif roll < 0.75:  # delete a random subset of currently-live ids
            live_now = [i for i, o in live.items() if o is not None]
            ids = rng.sample(live_now, min(len(live_now), rng.randint(1, 3)))
            delete_from_ann_index(
                spark.createDataFrame([(i,) for i in ids], ["vec_id"]),
                idx, batch_id=batch_id,
            )
            for i in ids:
                if live[i] is None or live[i] < batch_id:
                    live[i] = None  # killed (inserted strictly before)
            history.append(("delete", batch_id, ids))
        elif roll < 0.9:  # replay an arbitrary past batch verbatim
            kind, bid, ids = history[rng.randrange(len(history))]
            if kind == "append":
                append_to_ann_index(
                    spark.createDataFrame(
                        [(i, vec(i)) for i in ids], ["vec_id", "embedding"]
                    ),
                    idx, batch_id=bid,
                )
            else:
                delete_from_ann_index(
                    spark.createDataFrame([(i,) for i in ids], ["vec_id"]),
                    idx, batch_id=bid,
                )
            # replay of an already-applied batch must be a no-op on `live`
        else:
            compact_ann_index(spark, idx)
        # INVARIANT after every step: full-probe refined serve == brute
        # force over the reference live set
        live_ids = sorted(i for i, o in live.items() if o is not None)
        live_df = spark.createDataFrame(
            [(i, vec(i)) for i in live_ids], ["vec_id", "embedding"]
        )
        q = vec(live_ids[len(live_ids) // 2])
        got = ann_index_topk_refined(
            spark, idx, live_df, "embedding", "vec_id", q,
            k=5, n_probe=4, overfetch=(len(live_ids) // 5) + 1,
        ).collect()
        want = brute_force_topk(live_df, "embedding", "vec_id", q, k=5).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], (
            batch_id, history[-3:],
        )
        served_ids = {r.neighbor_id for r in got}
        dead = {i for i, o in live.items() if o is None}
        assert not served_ids & dead


def test_drift_triggered_refresh_fires_and_recovers_recall(spark, tmp_path):
    """The drift→lifecycle composition law (r10): plant a hard
    distribution shift (new vectors live far outside the build-time
    clusters), maintain the moment state, and assert (a) no drift →
    refresh_ann_index_if_drifted is a byte-exact no-op, (b) planted
    drift → the refresh fires and the rebuilt index's candidate recall
    on the drifted slice (measured through the refined serving path —
    exact cosine over captured candidates, so only capture quality
    varies) strictly beats the stale-quantizer twin and clears the
    floor the retrained codebooks restore."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk_refined,
        append_to_ann_index,
        refresh_ann_index_if_drifted,
    )
    from spark_streaming_sql_s3_connector_spark.operators.drift import (
        embedding_moments,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.drift import (
        embedding_moment_batch,
    )

    rng = random.Random(7)
    dim = 8
    old_rows = [
        (i, [rng.gauss(0, 0.5) for _ in range(dim)]) for i in range(200)
    ]
    # drifted slice: a new mode far outside every build-time cluster,
    # wide enough that PQ cells can discriminate within it
    new_rows = [
        (1000 + i, [8.0 + rng.gauss(0, 2.0) for _ in range(dim)])
        for i in range(120)
    ]
    old = spark.createDataFrame(old_rows, ["vec_id", "embedding"])
    new = spark.createDataFrame(new_rows, ["vec_id", "embedding"])
    idx = str(tmp_path / "idx")
    build_ann_index(
        old, "embedding", "vec_id", idx,
        n_centroids=6, m_subspaces=4, pq_centroids=64, seed=3,
    )
    baseline = embedding_moments(old, "embedding")
    mdir = str(tmp_path / "moments")

    # (a) no drift: live moments == baseline distribution → no-op
    embedding_moment_batch(old, 0, mdir, "embedding")
    meta_before = json.dumps(load_index_meta(idx), sort_keys=True)
    assert (
        refresh_ann_index_if_drifted(old, idx, mdir, baseline, threshold=0.5)
        is None
    )
    assert json.dumps(load_index_meta(idx), sort_keys=True) == meta_before

    # (b) planted drift: append the shifted slice (stale quantizers),
    # log its moments, measure the stale twin, then refresh
    append_to_ann_index(new, idx, batch_id=1)
    embedding_moment_batch(new, 1, mdir, "embedding")
    union = old.unionByName(new)
    q = new_rows[60][1]
    exact = {
        r.neighbor_id
        for r in brute_force_topk(union, "embedding", "vec_id", q, k=10).collect()
    }

    def _served():
        return {
            r.neighbor_id
            for r in ann_index_topk_refined(
                spark, idx, union, "embedding", "vec_id", q,
                k=10, n_probe=3, overfetch=2,
            ).collect()
        }

    stale = _served()
    shift = refresh_ann_index_if_drifted(
        union, idx, mdir, baseline, threshold=0.5
    )
    assert shift is not None and shift > 0.5  # the alarm fired
    fresh = _served()
    stale_recall = len(exact & stale) / 10
    fresh_recall = len(exact & fresh) / 10
    assert fresh_recall > stale_recall
    assert fresh_recall >= 0.7  # retrained codebooks fit the new mode


def test_refresh_forwards_explicit_zero_geometry(spark, tmp_path, monkeypatch):
    """ADVICE r10: an explicit 0 for the geometry overrides must reach
    build_ann_index's validation instead of silently falling back to
    the stored meta (truthiness vs `is not None`)."""
    import spark_streaming_sql_s3_connector_spark.operators.ann_index as AI
    from spark_streaming_sql_s3_connector_spark.streaming import drift as SD

    rows = _vectors(n=60, dim=8, seed=5)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    idx = str(tmp_path / "idx")
    build_ann_index(
        df, "embedding", "vec_id", idx,
        n_centroids=4, m_subspaces=4, pq_centroids=16, seed=3,
    )

    # force the drift alarm and capture what the rebuild would get
    monkeypatch.setattr(
        SD,
        "read_embedding_drift",
        lambda *_a, **_k: spark.createDataFrame(
            [(9.9,)], "mean_shift double"
        ),
    )
    captured = {}

    def _fake_build(df, vec_col, id_col, index_dir, **kw):
        captured.update(kw)
        return {}

    monkeypatch.setattr(AI, "build_ann_index", _fake_build)
    AI.refresh_ann_index_if_drifted(
        df, idx, str(tmp_path / "moments"), df.limit(0),
        threshold=0.5, n_centroids=0,
    )
    assert captured["n_centroids"] == 0  # NOT meta's 4
    assert captured["m_subspaces"] == 4  # unset → stored meta
    assert captured["pq_centroids"] == 16
