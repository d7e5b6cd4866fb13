"""Embedding-column utilities: norms, normalization, per-group
centroids, and centroid-similarity (prototypicality) scoring — the
vector-hygiene steps before ANN indexing / SemDeDup pruning.

All hot-path math is JVM array expressions (``F.aggregate`` /
``F.zip_with`` / ``F.transform``) — scan-local, no Python, no explode
of the corpus for per-vector quantities. The only shuffle anywhere is
the per-(group, dim) partial-agg for centroids, whose post-combine row
count is |groups|×dim, not corpus-sized.

Two numeric modes:

- default (``exact=False``): double arithmetic — the fast path.
- ``exact=True``: the repo's decimal FP-parity discipline, for
  cross-engine verification (the ``embedding_stats_docs`` oracle).
  Vector elements are QUANTIZED to 6-dp DECIMAL(18,6) first (a defined,
  engine-identical cast), every sum runs in exact decimals
  (order-independent ⇒ identical under any partitioning or engine),
  and only final magnitudes divide/sqrt in double before a 6-dp round.
  Products stay inside DECIMAL(38,12) — no precision-loss truncation
  (each fold step re-closes the running sum at p=38).
  Centroids in this mode are the decimal sums divided in double and
  re-rounded to 6 dp, so both engines broadcast bit-identical
  centroids.

Low cosine-to-centroid = far from the group's prototype: the outlier
half of SemDeDup-style pruning (`ivf_near_dup_pairs` handles the
duplicate half), and a cheap embedding-drift alarm when tracked per
ingest batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D6 = "decimal(18,6)"  # quantized element
_DSUM = "decimal(38,12)"  # element product / running sum (addition is closed at p=38)


def _q6(x: Column) -> Column:
    """Engine-identical 6-dp quantization: round the DOUBLE first, then
    cast — a direct float→decimal cast rounds half-way cases
    differently across engines (observed 1e-6 ssq drift flipping a
    6-dp sqrt); the rounded double is exactly representable to both
    engines' decimal converters."""
    return F.round(x.cast("double"), 6).cast(_D6)


def l2_norm(vec: Column, exact: bool = False) -> Column:
    """Euclidean norm of an array column (JVM fold)."""
    if exact:
        q = F.transform(vec, _q6)
        ssq = F.aggregate(
            q,
            F.lit(0).cast(_DSUM),
            lambda acc, x: (acc + (x * x).cast(_DSUM)).cast(_DSUM),
        )
        return F.round(F.sqrt(ssq.cast("double")), 6)
    d = F.transform(vec, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x))


def with_l2_norm(
    df: DataFrame, vec_col: str, out: str = "l2_norm", exact: bool = False
) -> DataFrame:
    return df.withColumn(out, l2_norm(F.col(vec_col), exact))


def normalize_embeddings(
    df: DataFrame, vec_col: str, out: Optional[str] = None
) -> DataFrame:
    """Unit-normalize the vector column (zero vectors pass through
    unchanged rather than dividing by zero)."""
    out = out or vec_col
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.withColumn(
        out, F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    )


def group_centroids(
    df: DataFrame, vec_col: str, group_col: str, exact: bool = False
) -> DataFrame:
    """Per-group mean vector: ``group | centroid | n_vecs``.

    posexplode → groupBy(group, dim) partial-agg (combine collapses to
    |groups|×dim rows map-side) → ordered reassembly. ``exact`` runs
    the sums in decimals and rounds each component to 6 dp — identical
    across engines/partitionings."""
    exploded = df.select(
        F.col(group_col).alias("_g"),
        F.posexplode(F.col(vec_col)).alias("_i", "_x"),
    )
    if exact:
        summed = exploded.groupBy("_g", "_i").agg(
            F.sum(_q6(F.col("_x"))).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        comp = F.round(F.col("_s").cast("double") / F.col("_n"), 6)
    else:
        summed = exploded.groupBy("_g", "_i").agg(
            F.sum(F.col("_x").cast("double")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        comp = F.col("_s") / F.col("_n")
    return (
        summed.select("_g", "_i", comp.alias("_c"), "_n")
        .groupBy(F.col("_g").alias(group_col))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_c"))),
                lambda s: s.getField("_c"),
            ).alias("centroid"),
            F.max("_n").alias("n_vecs"),
        )
    )


def centroid_similarity(
    df: DataFrame,
    vec_col: str,
    group_col: str,
    centroids: Optional[DataFrame] = None,
    out: str = "cos_to_centroid",
    exact: bool = False,
) -> DataFrame:
    """Cosine of every vector to its group's centroid (prototypicality;
    low = outlier). ``centroids`` defaults to :func:`group_centroids`
    over the same frame; pass a precomputed frame to score one corpus
    against another's prototypes. The centroid frame (|groups| rows)
    broadcast-joins; the dot/norms are scan-local array folds."""
    if centroids is None:
        centroids = group_centroids(df, vec_col, group_col, exact)
    joined = df.join(
        F.broadcast(centroids.select(group_col, "centroid")), group_col, "left"
    )
    if exact:
        qv = F.transform(F.col(vec_col), _q6)
        qc = F.transform(F.col("centroid"), _q6)
        dot = F.aggregate(
            F.zip_with(qv, qc, lambda a, b: (a * b).cast(_DSUM)),
            F.lit(0).cast(_DSUM),
            lambda acc, x: (acc + x).cast(_DSUM),
        ).cast("double")
        nv = F.sqrt(
            F.aggregate(
                qv,
                F.lit(0).cast(_DSUM),
                lambda a, x: (a + (x * x).cast(_DSUM)).cast(_DSUM),
            ).cast("double")
        )
        nc = F.sqrt(
            F.aggregate(
                qc,
                F.lit(0).cast(_DSUM),
                lambda a, x: (a + (x * x).cast(_DSUM)).cast(_DSUM),
            ).cast("double")
        )
        cos = F.round(dot / (nv * nc), 6)
    else:
        dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        dot = F.aggregate(
            F.zip_with(dv, F.col("centroid"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nv = F.sqrt(F.aggregate(dv, F.lit(0.0), lambda a, x: a + x * x))
        nc = F.sqrt(
            F.aggregate(
                F.col("centroid"), F.lit(0.0), lambda a, x: a + x * x
            )
        )
        cos = dot / (nv * nc)
    guarded = F.when((nv > 0) & (nc > 0), cos)
    return joined.withColumn(out, guarded).drop("centroid")


def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int = 16,
    per_cluster_k: int = 100,
    seed: int = 42,
    order: str = "prototypical",
    salt: str = "",
    centroids: Optional[list[list[float]]] = None,
) -> DataFrame:
    """Topic-balanced subset selection (the DCLM / cluster-quota
    recipe): KMeans-cluster the embedding space, then keep an EQUAL
    per-cluster quota so no dominant topic floods the sample — the
    diversity knob natural-proportion sampling lacks.

    ``order`` picks who fills each quota:

    - ``"prototypical"``: highest cosine to the cluster centroid first
      (SemDeDup's prototypicality) — the cleanest exemplars;
    - ``"hash"``: salted-md5 order — an unbiased random draw within the
      cluster, reproducible across engines/reruns.

    Returns ``<id_col> | cluster | rank | centroid_cos`` (rank 1..k
    inside each cluster; ties break id-ascending).

    Scale shape: quantizer trained on a bounded sample
    (:func:`~spark_streaming_sql_s3_connector_spark.operators.similarity.ivf_centroids`
    — one scan, driver-side numpy); assignment is the broadcast-
    centroid argmin expression (scan-local); the per-cluster quota is a
    rank window Spark executes as WindowGroupLimit, so each map task
    ships at most k rows per cluster. Rows-only semantics (KMeans is
    not SQL-expressible); laws live in pytest.

    Pass ``centroids`` to reuse a quantizer trained once elsewhere —
    the in-function training samples partition heads, so its centers
    (and therefore the selection) are stable for a FIXED layout but
    not across repartitions; supplied centroids make the whole
    operator partitioning-invariant.
    """
    from pyspark.sql import Window

    from spark_streaming_sql_s3_connector_spark.operators.similarity import (
        cosine_sim,
        ivf_assign,
        ivf_centroids,
    )

    if per_cluster_k < 1:
        raise ValueError("per_cluster_k must be >= 1")
    if order not in ("prototypical", "hash"):
        raise ValueError(f"order must be 'prototypical' or 'hash', got {order!r}")
    if centroids is None:
        centroids = ivf_centroids(df, vec_col, n_centroids=n_clusters, seed=seed)
    cent_arr = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c]).cast("array<double>")
            for c in centroids
        ]
    )
    assigned = ivf_assign(df, vec_col, centroids, bucket_col="cluster").select(
        F.col(id_col),
        F.col("cluster"),
        cosine_sim(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cent_arr, F.col("cluster") + 1),
        ).alias("centroid_cos"),
    )
    if order == "prototypical":
        w = Window.partitionBy("cluster").orderBy(
            F.col("centroid_cos").desc(), F.col(id_col).asc()
        )
    else:
        h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
        w = Window.partitionBy("cluster").orderBy(h.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_cluster_k)
        .select(
            F.col(id_col),
            F.col("cluster").cast("int").alias("cluster"),
            F.col("rank").cast("int").alias("rank"),
            F.col("centroid_cos"),
        )
    )


# --------------------------------------------------------------------------
# PCA / whitening — the standard embedding post-processing before ANN
# indexing (OPQ-style rotation, dimensionality reduction, whitening all
# start from the same fitted basis).


class PCAModel:
    """Fitted PCA basis: ``mean`` (dim), ``components`` (k×dim rows =
    top eigenvectors of the covariance, eigenvalue-descending),
    ``eigenvalues`` (k), ``explained_variance_ratio`` (k), ``n`` (rows
    fitted on). Plain lists — broadcastable as expression literals and
    JSON-serializable for reuse (same philosophy as `ivf_centroids`:
    train once, apply as scan-local JVM math)."""

    def __init__(self, mean, components, eigenvalues, explained_variance_ratio, n):
        self.mean = mean
        self.components = components
        self.eigenvalues = eigenvalues
        self.explained_variance_ratio = explained_variance_ratio
        self.n = n

    def to_dict(self) -> dict:
        return {
            "mean": self.mean,
            "components": self.components,
            "eigenvalues": self.eigenvalues,
            "explained_variance_ratio": self.explained_variance_ratio,
            "n": self.n,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "PCAModel":
        return cls(
            d["mean"],
            d["components"],
            d["eigenvalues"],
            d["explained_variance_ratio"],
            d["n"],
        )


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """Fit a ``k``-component PCA of the embedding column in ONE pass.

    Distributed part: every partition folds its vectors into a single
    Arrow-batched partial ``(n, Σx, ΣxxT)`` row (``mapInPandas`` over
    numpy — dim + dim² doubles per PARTITION, not per row), so the
    driver collects #partitions small rows, never vectors. Driver
    part: combine partials in partition-id order (deterministic fold
    order ⇒ bit-stable for a fixed layout), form the covariance
    ``ΣxxT/n − mean·meanT``, ``eigh`` it, take the top ``k``
    eigenpairs, and fix each component's sign so its
    largest-magnitude coordinate is positive (eigenvectors are
    sign-ambiguous; the convention makes refits reproducible).

    Like `ivf_centroids`, the fit is deterministic for a FIXED
    partition layout; across repartitions the float partial sums can
    drift in the last ulps. Pass the fitted model around (it is tiny)
    rather than refitting per stage.

    Scale: one corpus scan; driver memory is #partitions × dim²
    doubles (64-dim → 32 KB per partition row). For dim in the
    thousands, raise `spark.sql.shuffle.partitions`-independent
    partition sizes rather than this path — dim² stays driver-small
    through ~4k dims.
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")

    def _partials(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]], dtype=np.float64
            )
            yield pd.DataFrame(
                {
                    "pid": [int(pdf["_pid"].iloc[0])],
                    "n": [int(x.shape[0])],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    part = df.select(
        F.spark_partition_id().alias("_pid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInPandas(
        _partials, "pid int, n long, s array<double>, g array<double>"
    )
    rows = sorted(part.collect(), key=lambda r: r["pid"])
    if not rows:
        raise ValueError("pca_fit: empty input")
    dim = len(rows[0]["s"])
    if k > dim:
        raise ValueError(f"k={k} exceeds embedding dim={dim}")
    n = 0
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in rows:
        n += r["n"]
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(dim, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    eigs = []
    total = float(np.clip(evals, 0, None).sum()) or 1.0
    for idx in order:
        v = evecs[:, idx]
        j = int(np.abs(v).argmax())
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eigs.append(float(max(evals[idx], 0.0)))
    return PCAModel(
        mean=[float(x) for x in mean],
        components=comps,
        eigenvalues=eigs,
        explained_variance_ratio=[e / total for e in eigs],
        n=int(n),
    )


def pca_transform(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    out_col: str = "pc",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project the embedding column onto the fitted basis — scan-local
    JVM expressions only (no Python on the hot path).

    ``y_j = (x − mean)·w_j`` folds to ``x·w_j − offset_j`` with
    ``offset_j = mean·w_j`` precomputed driver-side, so each output
    coordinate is ONE literal-weighted dot product
    (``aggregate(zip_with(...))``) plus a constant subtract —
    whole-stage-codegen friendly, zero shuffle, zero UDF. With
    ``whiten=True`` each coordinate divides by ``sqrt(eigenvalue)``
    (floored at ``eps``), giving unit variance per component on the
    fitted corpus."""
    outs = []
    for j, w in enumerate(model.components):
        wlit = F.array(*[F.lit(float(x)) for x in w])
        offset = float(sum(m * x for m, x in zip(model.mean, w)))
        y = (
            F.aggregate(
                F.zip_with(
                    F.col(vec_col).cast("array<double>"),
                    wlit,
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            - F.lit(offset)
        )
        if whiten:
            y = y / F.lit(float(max(model.eigenvalues[j], eps) ** 0.5))
        outs.append(y)
    return df.withColumn(out_col, F.array(*outs))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bits: int = 8,
    out_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Per-vector symmetric scalar quantization — the storage shape for
    an embedding column at corpus scale (float32→int8 is 4× smaller on
    disk and in shuffle; ANN candidate generation tolerates it, exact
    re-ranking reads the float originals — the serving split
    ``ann_index_topk_refined`` already implements). Each vector gets
    its own scale ``max|x| / (2^(bits-1) - 1)``; elements map to
    ``floor(x / scale + 0.5)`` — floor(+0.5) instead of an engine
    round() because SQL engines disagree on banker's vs half-up
    rounding at .5 boundaries, while floor is bit-identical everywhere
    (the ``_q6`` lesson). All-zero vectors quantize to zeros with
    scale 0. Scan-local (zero shuffles); dequantization is
    ``q · scale``, with per-element error ≤ scale/2 (law-tested, plus
    numpy parity and a cosine-preservation floor)."""
    if not 2 <= bits <= 16:
        raise ValueError("bits must be in [2, 16]")
    qmax = (1 << (bits - 1)) - 1
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = (maxabs / F.lit(float(qmax))).alias("_s")
    q = F.when(
        maxabs == 0.0,
        F.transform(v, lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.floor(
                x.cast("double") / (maxabs / F.lit(float(qmax))) + F.lit(0.5)
            ).cast("int"),
        )
    )
    return df.select(
        F.col(id_col),
        q.alias(out_col),
        F.when(maxabs == 0.0, F.lit(0.0)).otherwise(
            maxabs / F.lit(float(qmax))
        ).alias(scale_col),
    )
