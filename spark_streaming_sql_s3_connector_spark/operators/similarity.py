"""Similarity search over embedding columns (``array<float>``).

- ``cosine_sim``      — pure-expression cosine (zip_with + aggregate fold,
                        double precision, deterministic left-to-right sum
                        order so results hash-match external oracles);
- ``brute_force_topk`` — exact top-k for one query vector: a single
                        column-expression pass + ORDER BY LIMIT k (Spark
                        plans TakeOrderedAndProject — no full sort);
- ``lsh_bucket_pairs`` / ``lsh_ann_topk`` — random-hyperplane LSH: sign
                        signature → equi-join on (table, signature) →
                        rerank candidates. The scale path: shuffle is an
                        equi-join on uniform hash buckets.

Hyperplanes are generated from a seeded ``random.Random`` so plans are
deterministic across runs/restarts.
"""

from __future__ import annotations

import random
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cosine_sim(a, b):
    """Cosine similarity of two array<double> columns, all JVM expressions.

    Left-to-right fold order (F.aggregate) is deterministic, so double
    results are bit-stable and comparable against DuckDB's sequential
    list_dot_product on DOUBLE[]."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, query_vec: Sequence[float], k: int = 10
) -> DataFrame:
    """Exact top-k neighbors of ``query_vec`` by cosine. One scan; Spark
    turns ORDER BY+LIMIT into TakeOrderedAndProject (per-partition top-k +
    driver merge), so no global sort even at 10^9 rows."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        df.select(
            F.col(id_col).alias("neighbor_id"),
            cosine_sim(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature: bit i = (vec · plane_i) >= 0. Returns a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, p, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def _planes_for_threshold(threshold: float) -> tuple[int, int]:
    """Signature length / table count tuned to the target cosine.

    Sign-LSH bit-agreement probability for cosine c is 1 - arccos(c)/pi;
    recall of an L-bit AND over T ORed tables is 1-(1-p^L)^T. Long
    signatures only work for high thresholds — at c=0.4 (p≈0.63) a 12-bit
    signature has 0.4% per-table recall, i.e. finds nothing. Candidate
    cost grows as sum(bucket^2), so L trades recall against join fan-out:
    pick short signatures + more tables for loose thresholds, long + few
    for near-dup thresholds."""
    if threshold >= 0.85:
        return 16, 4
    if threshold >= 0.7:
        return 8, 6
    return 4, 8


def lsh_bucket_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    dim: int,
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs: rows sharing a full signature in ANY of
    ``n_tables`` hash tables become candidates (equi-join on
    (table, signature)), then exact cosine reranks. Recall grows with
    n_tables; cost stays an equi-join. Candidate pairs are deduped BEFORE
    the cosine so each pair pays the O(dim) rerank once, not once per
    colliding table."""
    auto_planes, auto_tables = _planes_for_threshold(threshold)
    n_planes = n_planes or auto_planes
    n_tables = n_tables or auto_tables
    sigs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        sigs.append(
            F.struct(F.lit(t).alias("table_idx"), lsh_signature(F.col("_v"), planes).alias("sig"))
        )
    base = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("_t", F.explode(F.array(*sigs)))
        .select("_id", "_v", "_t.table_idx", "_t.sig")
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(
            r,
            (F.col("l.table_idx") == F.col("r.table_idx"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._v").alias("_va"),
            F.col("r._v").alias("_vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            cosine_sim(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def ivf_centroids(
    df: DataFrame, vec_col: str, n_centroids: int = 16, seed: int = 42, sample_rows: int = 100_000
) -> list[list[float]]:
    """Coarse quantizer: KMeans centers fitted on (a sample of) the
    vectors. Fit cost is bounded by ``sample_rows``; at 100 TB you fit on a
    sample and assign the full corpus with expressions."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    n = sample.count()
    if n > sample_rows:
        sample = sample.sample(fraction=sample_rows / n, seed=seed)
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(sample)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _nearest_centroid_expr(vec_col, centroids: list[list[float]]):
    """argmin over squared L2 distance to each centroid — pure expressions,
    assignment scans stay in whole-stage codegen."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec_col,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(scored)["idx"]


def ivf_assign(df: DataFrame, vec_col: str, centroids: list[list[float]], bucket_col: str = "ivf_bucket") -> DataFrame:
    return df.withColumn(
        bucket_col, _nearest_centroid_expr(F.col(vec_col).cast("array<double>"), centroids)
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    centroids: Optional[list[list[float]]] = None,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: assign rows to their nearest KMeans centroid, search only
    the ``n_probe`` buckets nearest the query, exact-rerank survivors.
    The bucket filter prunes ~(1 - n_probe/n_centroids) of the corpus
    before any cosine; with a persisted assignment (``ivf_assign`` +
    partitionBy(bucket) on write) the scan prunes at the file level."""
    if centroids is None:
        centroids = ivf_centroids(df, vec_col, n_centroids=n_centroids, seed=seed)
    q = [float(x) for x in query_vec]
    dists = [
        (sum((a - b) * (a - b) for a, b in zip(q, c)), i) for i, c in enumerate(centroids)
    ]
    probes = [i for _, i in sorted(dists)[:n_probe]]
    assigned = ivf_assign(df, vec_col, centroids)
    qcol = F.array(*[F.lit(x) for x in q]).cast("array<double>")
    return (
        assigned.where(F.col("ivf_bucket").isin(probes))
        .select(
            F.col(id_col).alias("neighbor_id"),
            cosine_sim(F.col(vec_col).cast("array<double>"), qcol).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        .limit(k)
    )


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 4,
    max_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k for one query: candidates = rows whose signature is within
    ``max_hamming`` bits of the query's in any table (signature comparison
    is a cheap long XOR popcount — the scan prunes most rows before any
    cosine is computed), then exact rerank of the survivors."""
    dim = len(query_vec)
    conds = []
    sig_cols = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        qsig = 0
        for i, plane in enumerate(planes):
            dot = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
            if dot >= 0:
                qsig |= 1 << i
        col = lsh_signature(F.col("_v"), planes)
        sig_cols.append(col.alias(f"_sig{t}"))
        conds.append(
            F.bit_count(F.col(f"_sig{t}").bitwiseXOR(F.lit(qsig).cast("long"))) <= max_hamming
        )
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    base = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).select("neighbor_id", "_v", *sig_cols)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    return (
        base.where(cond)
        .select("neighbor_id", cosine_sim(F.col("_v"), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        .limit(k)
    )
