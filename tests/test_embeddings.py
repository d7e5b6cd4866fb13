"""Embedding utilities (operators/embeddings.py).

The registry key `embedding_stats_docs` is hash-exact vs the DuckDB
mirror in the decimal exact mode; these tests pin the math on toy data,
the agreement between the fast double mode and the exact mode, and the
plan shapes (scan-local folds, broadcast centroid join, one centroid
shuffle).
"""

import math

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.embeddings import (
    centroid_similarity,
    group_centroids,
    normalize_embeddings,
    with_l2_norm,
)


def test_l2_norm_and_normalize(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "id bigint, v array<double>",
    )
    norms = {r["id"]: r["l2_norm"] for r in with_l2_norm(df, "v").collect()}
    assert norms[1] == pytest.approx(5.0)
    assert norms[2] == 0.0
    normed = {r["id"]: r["v"] for r in normalize_embeddings(df, "v").collect()}
    assert normed[1] == pytest.approx([0.6, 0.8])
    assert normed[2] == [0.0, 0.0]  # zero vector passes through
    assert normed[3] == [1.0, 0.0]


def test_group_centroids_toy(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("a", [3.0, 2.0]), ("b", [0.0, 4.0])],
        "g string, v array<double>",
    )
    got = {r["g"]: (r["centroid"], r["n_vecs"]) for r in group_centroids(df, "v", "g").collect()}
    assert got["a"][0] == pytest.approx([2.0, 1.0]) and got["a"][1] == 2
    assert got["b"][0] == pytest.approx([0.0, 4.0]) and got["b"][1] == 1


def test_centroid_similarity_prototypicality(spark):
    # 3 near-identical vectors + 1 outlier in the same group: the
    # outlier's cosine-to-centroid is clearly the lowest
    rows = [("g", [1.0, 0.05 * i, 0.0]) for i in range(3)]
    rows.append(("g", [0.0, 0.0, 1.0]))
    df = spark.createDataFrame(rows, "g string, v array<double>").withColumn(
        "id", F.monotonically_increasing_id()
    )
    scored = centroid_similarity(df, "v", "g").collect()
    out = min(scored, key=lambda r: r["cos_to_centroid"])
    assert out["v"] == [0.0, 0.0, 1.0]
    assert out["cos_to_centroid"] < 0.5
    assert all(
        r["cos_to_centroid"] > 0.9 for r in scored if r["v"] != [0.0, 0.0, 1.0]
    )


def test_exact_mode_agrees_with_double_mode(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = with_l2_norm(emb, "embedding", exact=True).select("vec_id", "l2_norm")
    d = with_l2_norm(emb, "embedding", exact=False).select(
        "vec_id", F.col("l2_norm").alias("n2")
    )
    diff = (
        e.join(d, "vec_id")
        .select(F.max(F.abs(F.col("l2_norm") - F.col("n2"))).alias("m"))
        .collect()[0]["m"]
    )
    assert diff < 1e-4  # 6-dp quantization bound
    ce = centroid_similarity(emb, "embedding", "label", exact=True).select(
        "vec_id", "cos_to_centroid"
    )
    cd = centroid_similarity(emb, "embedding", "label", exact=False).select(
        "vec_id", F.col("cos_to_centroid").alias("c2")
    )
    cdiff = (
        ce.join(cd, "vec_id")
        .select(F.max(F.abs(F.col("cos_to_centroid") - F.col("c2"))).alias("m"))
        .collect()[0]["m"]
    )
    assert cdiff < 1e-3


def test_scoring_against_foreign_centroids(spark):
    # score corpus B against corpus A's prototypes (drift-alarm shape)
    a = spark.createDataFrame(
        [("g", [1.0, 0.0]), ("g", [1.0, 0.1])], "g string, v array<double>"
    )
    b = spark.createDataFrame([("g", [0.0, 1.0])], "g string, v array<double>")
    cents = group_centroids(a, "v", "g")
    r = centroid_similarity(b, "v", "g", centroids=cents).collect()[0]
    assert r["cos_to_centroid"] < 0.1  # B drifted off A's prototype


def test_plans_scan_local_and_broadcast(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan_norm = (
        with_l2_norm(emb, "embedding")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan_norm and "Python" not in plan_norm
    plan_sim = (
        centroid_similarity(emb, "embedding", "label")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan_sim
    assert "SortMergeJoin" not in plan_sim and "Python" not in plan_sim


# ------------------------------------------ cluster-balanced sampling ----

from spark_streaming_sql_s3_connector_spark.operators.embeddings import (  # noqa: E402
    cluster_balanced_sample,
)


def _clustered(spark, per_cluster=30, dim=8, n_clusters=4):
    """Tight synthetic clusters: axis directions + small deterministic
    jitter, so KMeans recovers them and prototypicality is meaningful."""
    rows = []
    vid = 0
    for c in range(n_clusters):
        for j in range(per_cluster):
            v = [0.05 * ((vid * 7 + d * 3) % 5 - 2) for d in range(dim)]
            v[c] = 10.0 + 0.1 * (j % 3)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_cluster_balanced_quota_and_coverage(spark):
    df = _clustered(spark)
    out = cluster_balanced_sample(
        df, "embedding", "vec_id", n_clusters=4, per_cluster_k=10
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r.cluster, []).append(r)
    assert len(per) == 4  # every planted topic covered
    for c, rows in per.items():
        assert len(rows) == 10
        assert sorted(r.rank for r in rows) == list(range(1, 11))


def test_cluster_balanced_prototypical_beats_unselected(spark):
    """Law: within each cluster, every SELECTED row's centroid cosine
    ≥ every unselected row's (the quota takes the most central)."""
    df = _clustered(spark)
    from spark_streaming_sql_s3_connector_spark.operators.similarity import (
        cosine_sim,
        ivf_assign,
        ivf_centroids,
    )
    from pyspark.sql import functions as F

    cents = ivf_centroids(df, "embedding", n_centroids=4, seed=42)
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]).cast("array<double>") for c in cents]
    )
    full = ivf_assign(df, "embedding", cents, bucket_col="cluster").select(
        "vec_id",
        "cluster",
        cosine_sim(
            F.col("embedding").cast("array<double>"),
            F.element_at(cent_arr, F.col("cluster") + 1),
        ).alias("cos"),
    ).collect()
    sel = {
        r.vec_id
        for r in cluster_balanced_sample(
            df, "embedding", "vec_id", n_clusters=4, per_cluster_k=5
        ).collect()
    }
    by_cluster = {}
    for r in full:
        by_cluster.setdefault(r.cluster, []).append(r)
    for c, rows in by_cluster.items():
        chosen = [r.cos for r in rows if r.vec_id in sel]
        skipped = [r.cos for r in rows if r.vec_id not in sel]
        if chosen and skipped:
            assert min(chosen) >= max(skipped)


def test_cluster_balanced_hash_mode_deterministic_and_rotates(spark, sf_dir):
    """With SUPPLIED centroids the selection is partitioning-invariant
    (in-function training samples partition heads, so it is only
    fixed-layout stable — the docstring's documented caveat); a new
    salt redraws the within-cluster sample."""
    from spark_streaming_sql_s3_connector_spark.operators.similarity import (
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(emb, "embedding", n_centroids=8, seed=42)
    a1 = cluster_balanced_sample(
        emb, "embedding", "vec_id", 8, 5, order="hash", salt="a", centroids=cents
    ).collect()
    a2 = cluster_balanced_sample(
        emb.repartition(11), "embedding", "vec_id", 8, 5, order="hash",
        salt="a", centroids=cents,
    ).collect()
    b = cluster_balanced_sample(
        emb, "embedding", "vec_id", 8, 5, order="hash", salt="b", centroids=cents
    ).collect()
    key = lambda rows: sorted((r.vec_id, r.cluster, r.rank) for r in rows)
    assert key(a1) == key(a2)
    assert {r.vec_id for r in a1} != {r.vec_id for r in b}


def test_cluster_balanced_validation_and_plan(spark, sf_dir):
    import pytest

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError):
        cluster_balanced_sample(emb, "embedding", "vec_id", 8, 0)
    with pytest.raises(ValueError):
        cluster_balanced_sample(emb, "embedding", "vec_id", 8, 5, order="nope")
    plan = (
        cluster_balanced_sample(emb, "embedding", "vec_id", 8, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------- scalar quantization


def test_quantize_embeddings_numpy_parity_and_error_bound(spark):
    """Quantized values match the numpy reference exactly; dequantized
    per-element error is bounded by scale/2 (the symmetric-quantizer
    guarantee the 4x storage saving is priced at)."""
    import math
    import random

    import numpy as np

    from spark_streaming_sql_s3_connector_spark.operators.embeddings import (
        quantize_embeddings,
    )

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(12)]) for i in range(40)
    ] + [(99, [0.0] * 12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.vec_id: (list(r.q_embedding), r.q_scale)
        for r in quantize_embeddings(df, "embedding", "vec_id").collect()
    }
    for i, v in rows:
        arr = np.asarray(v, dtype=np.float64)
        m = float(np.max(np.abs(arr)))
        qv, scale = got[i]
        if m == 0.0:
            assert qv == [0] * 12 and scale == 0.0
            continue
        s = m / 127.0
        want = [int(math.floor(x / s + 0.5)) for x in arr]
        assert qv == want
        assert scale == s
        assert all(abs(q) <= 127 for q in qv)
        # dequant error bound
        for q, x in zip(qv, arr):
            assert abs(q * s - x) <= s / 2 + 1e-12


def test_quantize_embeddings_preserves_cosine(spark):
    """int8 is the CANDIDATE format: cosine over dequantized vectors
    must track true cosine closely (abs err well under the quantization
    noise budget for 64-dim unit-ish vectors)."""
    import random

    import numpy as np

    from spark_streaming_sql_s3_connector_spark.operators.embeddings import (
        quantize_embeddings,
    )

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.vec_id: np.asarray(r.q_embedding, dtype=np.float64) * r.q_scale
        for r in quantize_embeddings(df, "embedding", "vec_id").collect()
    }
    orig = {i: np.asarray(v) for i, v in rows}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for a in range(0, 30, 7):
        for b in range(1, 30, 11):
            if a == b:
                continue
            assert abs(cos(got[a], got[b]) - cos(orig[a], orig[b])) < 0.01


def test_quantize_embeddings_rejects_bad_bits(spark):
    import pytest

    from spark_streaming_sql_s3_connector_spark.operators.embeddings import (
        quantize_embeddings,
    )

    df = spark.createDataFrame([(1, [0.5])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        quantize_embeddings(df, "embedding", "vec_id", bits=1)
    with pytest.raises(ValueError):
        quantize_embeddings(df, "embedding", "vec_id", bits=32)
