"""The r14 vectorized driver-side quantizer fits must be BIT-IDENTICAL
to the sequential implementations they replaced: `_fit_pq_books`
(lockstep kmeans++ across subspaces, pre-drawn rng) and
`_fit_ivf_centroids` (incremental min-distance) feed every persisted
index and every ANN registry key, so a single flipped center index
would silently change declared query results."""

from __future__ import annotations

import numpy as np
import pytest

from spark_streaming_sql_s3_connector_spark.operators.similarity import (
    _fit_ivf_centroids,
    _fit_pq_books,
    _normalized_rows,
    _pq_lloyd,
)


def _pq_books_reference(X, m_subspaces, n_centroids, seed, sample_rows, max_iter):
    """Verbatim pre-r14 pq_train fit (sequential per-subspace kmeans++)."""
    rng = np.random.RandomState(seed)
    if len(X) > sample_rows:
        X = X[rng.choice(len(X), sample_rows, replace=False)]
    X = _normalized_rows(X)
    d = X.shape[1]
    dsub = d // m_subspaces
    k = min(n_centroids, len(X))
    books = []
    for m in range(m_subspaces):
        Xs = X[:, m * dsub : (m + 1) * dsub]
        centers = [Xs[rng.randint(len(Xs))]]
        d2 = ((Xs - centers[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            tot = d2.sum()
            if tot > 0:
                idx = int(np.searchsorted(np.cumsum(d2), rng.random_sample() * tot))
                idx = min(idx, len(Xs) - 1)
            else:
                idx = rng.randint(len(Xs))
            nxt = Xs[idx]
            centers.append(nxt)
            d2 = np.minimum(d2, ((Xs - nxt) ** 2).sum(axis=1))
        C = np.array(centers)
        for _ in range(max_iter):
            assign = (Xs @ C.T - 0.5 * (C * C).sum(axis=1)).argmax(axis=1)
            counts = np.bincount(assign, minlength=len(C)).astype(np.float64)
            sums = np.stack(
                [
                    np.bincount(assign, weights=Xs[:, j], minlength=len(C))
                    for j in range(Xs.shape[1])
                ],
                axis=1,
            )
            newC = C.copy()
            nz = counts > 0
            newC[nz] = sums[nz] / counts[nz, None]
            if np.allclose(newC, C):
                break
            C = newC
        books.append([list(map(float, c)) for c in C])
    return books


def _ivf_centroids_reference(X, n_centroids, seed, sample_rows, max_iter):
    """Verbatim pre-r14 ivf_centroids fit (full min-stack recompute)."""
    rng = np.random.RandomState(seed)
    if len(X) > sample_rows:
        X = X[rng.choice(len(X), sample_rows, replace=False)]
    centers = [X[rng.randint(len(X))]]
    for _ in range(1, min(n_centroids, len(X))):
        d2 = np.min([((X - c) ** 2).sum(axis=1) for c in centers], axis=0)
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(X[rng.choice(len(X), p=probs)])
    C = np.array(centers)
    for _ in range(max_iter):
        assign = (X @ C.T - 0.5 * (C * C).sum(axis=1)).argmax(axis=1)
        newC = np.array(
            [
                X[assign == k].mean(axis=0) if (assign == k).any() else C[k]
                for k in range(len(C))
            ]
        )
        if np.allclose(newC, C):
            break
        C = newC
    return [list(map(float, c)) for c in C]


@pytest.mark.parametrize(
    "n,dim,m,k,seed",
    [
        (500, 64, 16, 256, 42),
        (500, 64, 8, 256, 42),
        (2000, 64, 16, 256, 7),
        (300, 32, 4, 64, 13),
        (40, 16, 4, 256, 42),  # k > n: clamps to n
        (1, 16, 4, 8, 42),  # single row
    ],
)
def test_pq_fit_matches_sequential_bitwise(n, dim, m, k, seed):
    rng = np.random.RandomState(seed + 99)
    X = rng.randn(n, dim)
    got = _fit_pq_books(X.copy(), m_subspaces=m, n_centroids=k, seed=seed)
    want = _pq_books_reference(
        X.copy(), m_subspaces=m, n_centroids=k, seed=seed,
        sample_rows=100_000, max_iter=12,
    )
    assert got == want  # list-of-float equality == bitwise


def test_pq_fit_trim_path_matches_sequential_bitwise():
    rng = np.random.RandomState(0)
    X = rng.randn(700, 32)
    got = _fit_pq_books(X.copy(), m_subspaces=4, n_centroids=64, seed=5,
                        sample_rows=500)
    want = _pq_books_reference(X.copy(), m_subspaces=4, n_centroids=64, seed=5,
                               sample_rows=500, max_iter=12)
    assert got == want


def test_pq_fit_degenerate_input_falls_back_identically():
    # all rows identical: every ++ step has zero total distance, the
    # branch the lockstep path cannot replay — must defer to the
    # sequential fallback and still match it exactly
    X = np.ones((50, 16), dtype=np.float64)
    got = _fit_pq_books(X.copy(), m_subspaces=4, n_centroids=8, seed=3)
    want = _pq_books_reference(X.copy(), m_subspaces=4, n_centroids=8, seed=3,
                               sample_rows=100_000, max_iter=12)
    assert got == want


@pytest.mark.parametrize(
    "n,dim,k,seed",
    [(2000, 64, 16, 42), (4000, 64, 32, 42), (100, 8, 16, 9), (10, 8, 16, 1)],
)
def test_ivf_fit_matches_sequential_bitwise(n, dim, k, seed):
    rng = np.random.RandomState(seed + 77)
    X = rng.randn(n, dim)
    got = _fit_ivf_centroids(X.copy(), n_centroids=k, seed=seed)
    want = _ivf_centroids_reference(X.copy(), n_centroids=k, seed=seed,
                                    sample_rows=100_000, max_iter=12)
    assert got == want


def test_pq_lloyd_break_preserved():
    # a cluster-shaped input converges before max_iter; the split-out
    # _pq_lloyd must stop at the same iteration (same centers) as the
    # inline loop did — covered transitively above, plus this direct
    # sanity check that repeated calls are stable
    rng = np.random.RandomState(2)
    Xs = np.concatenate([rng.randn(50, 4) * 0.01 + off for off in (0.0, 5.0)])
    C0 = Xs[[0, 60]]
    C1 = _pq_lloyd(Xs, C0.copy(), 12)
    C2 = _pq_lloyd(Xs, C0.copy(), 12)
    assert np.array_equal(C1, C2)
