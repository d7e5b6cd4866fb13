"""PCA / whitening over embedding columns
(operators/embeddings.pca_fit / pca_transform).

Pins: agreement with a single-node numpy PCA (covariance path),
component orthonormality, eigenvalue ordering, the deterministic sign
convention, whitening's unit-variance law, the JVM-only hot path (no
Python eval in the transform plan), and validation errors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.embeddings import (
    PCAModel,
    pca_fit,
    pca_transform,
)

DIM = 12
N = 400


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: distinct variances per direction so eigenpairs
    # are well-separated and the numpy comparison is stable
    scales = np.linspace(5.0, 0.2, DIM)
    x = rng.normal(size=(N, DIM)) * scales + rng.normal(size=DIM)
    rows = [(i, [float(v) for v in x[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(4)
    return df, x


def test_matches_numpy_covariance_pca(spark, corpus):
    df, x = corpus
    k = 5
    model = pca_fit(df, "embedding", k)
    assert model.n == N
    mean = x.mean(axis=0)
    cov = (x.T @ x) / N - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    assert np.allclose(model.mean, mean, atol=1e-9)
    for j, idx in enumerate(order):
        assert model.eigenvalues[j] == pytest.approx(float(evals[idx]), rel=1e-9)
        v = evecs[:, idx]
        got = np.asarray(model.components[j])
        # same up to the sign convention
        assert np.allclose(got, v, atol=1e-8) or np.allclose(got, -v, atol=1e-8)
        assert got[np.abs(got).argmax()] > 0  # sign convention


def test_components_orthonormal_and_ratios_descend(spark, corpus):
    df, _ = corpus
    model = pca_fit(df, "embedding", 6)
    w = np.asarray(model.components)
    assert np.allclose(w @ w.T, np.eye(6), atol=1e-9)
    r = model.explained_variance_ratio
    assert all(a >= b for a, b in zip(r, r[1:]))
    assert 0 < sum(r) <= 1 + 1e-9
    # refit reproduces the exact same basis (deterministic fold + sign)
    model2 = pca_fit(df, "embedding", 6)
    assert model2.components == model.components


def test_transform_matches_numpy_projection(spark, corpus):
    df, x = corpus
    model = pca_fit(df, "embedding", 4)
    got = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in pca_transform(df, "embedding", model).collect()
    }
    w = np.asarray(model.components)
    want = (x - x.mean(axis=0)) @ w.T
    for i in range(N):
        assert np.allclose(got[i], want[i], atol=1e-7)


def test_whiten_gives_unit_variance(spark, corpus):
    df, _ = corpus
    model = pca_fit(df, "embedding", 4)
    pc = pca_transform(df, "embedding", model, whiten=True)
    stats = pc.select(
        *[
            F.variance(F.element_at("pc", j + 1)).alias(f"v{j}")
            for j in range(4)
        ]
    ).collect()[0]
    for j in range(4):
        # population vs sample variance differ by N/(N-1)
        assert stats[f"v{j}"] == pytest.approx(N / (N - 1), rel=1e-6)


def test_transform_plan_is_jvm_only(spark, corpus):
    df, _ = corpus
    model = pca_fit(df, "embedding", 3)
    plan = (
        pca_transform(df, "embedding", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "pythonUDF" not in plan
    # the only Exchange is the fixture's own repartition(4) — the
    # projection itself adds no shuffle
    assert plan.count("Exchange") == plan.count("RoundRobinPartitioning")


def test_model_roundtrip_and_validation(spark, corpus):
    df, _ = corpus
    model = pca_fit(df, "embedding", 2)
    again = PCAModel.from_dict(model.to_dict())
    assert again.components == model.components
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", 0)
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", DIM + 1)
    with pytest.raises(ValueError):
        pca_fit(df.where(F.lit(False)), "embedding", 2)
