"""Bloom-filter screening of a corpus against a historical corpus.

The recurring shape in training-data pipelines: a new crawl must drop
documents already present in the corpus used for previous runs. A plain
anti-join is exact but shuffles the ENTIRE new crawl by text hash; at
100 TB that shuffle dominates the job. The classic fix is a two-phase
screen:

1. build a Bloom filter over the history's keys ONCE (one scan, bitmap
   OR-reduced executor-side, final bitmap broadcast — never shuffled);
2. map-side filter: rows whose key the bloom rejects are *guaranteed*
   new (no false negatives by construction) and pass through with ZERO
   shuffle;
3. only the bloom-POSITIVE rows — true duplicates plus an ``fpp``
   fraction of false positives — continue to an exact anti-join.

With a 1% ``fpp`` and a 5% true-dup rate, phase 3 shuffles ~6% of the
corpus instead of 100%. The overall result is EXACT (false positives are
recovered by the join), so the operator oracle-checks against a plain
``ANTI JOIN`` in DuckDB.

Sizing: bits m = -n·ln(p)/ln(2)², hashes k = m/n·ln(2) — 10 M keys at
1% fpp is a 12 MB bitmap, 1 B keys ≈ 1.2 GB (the practical broadcast
ceiling; past that, shard the history by key-hash prefix and run one
screen per shard). Hashing is JVM-side ``xxhash64`` with two seeds; the
k probe positions derive by double hashing (h1 + i·h2) & (m-1) (Kirsch &
Mitzenmacher over a power-of-two bitmap). The bitmap broadcasts once and probes
numpy-vectorized in a pandas UDF — measured faster than a pure JVM
expression probe at every size tried (see ``might_contain_column``).

No reference-file citation: the reference connector has no corpus-screen
surface; this implements the charter's training-data dedup family.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class BloomFilter:
    """Immutable built filter: ``bits`` is a little-endian uint8 bitmap of
    ``m_bits`` bits probed ``k`` times per key."""

    m_bits: int
    k: int
    seed: int
    bits: np.ndarray  # uint8, length ceil(m_bits / 8)

    def might_contain_np(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Vectorized membership for pre-hashed keys (int64 arrays).

        Probe index i is ``((h1 & mask) + i*(h2 & mask)) & mask`` with
        ``mask = m_bits - 1`` (m is a power of two) — every intermediate
        is small and non-negative, so the arithmetic is overflow-free
        and reproducible by any engine from the raw xxhash64 pair."""
        mask = np.int64(self.m_bits - 1)
        a = h1 & mask
        b = h2 & mask
        ok = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = (a + np.int64(i) * b) & mask
            ok &= (self.bits[idx >> np.int64(3)]
                   >> (idx & np.int64(7)).astype(np.uint8)) & 1 == 1
        return ok


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for ``expected_items`` keys at ``fpp``. ``m_bits`` is
    rounded UP to a power of two: probe positions then reduce with a
    bit mask — overflow-free (safe under ANSI semantics anywhere the
    arithmetic is re-expressed) and trivially portable. The round-up
    only ever LOWERS the false-positive rate."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m_opt = int(math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m_opt = max(m_opt, 64)
    m = 1 << (m_opt - 1).bit_length()  # next power of two
    # k from the UN-rounded optimum: the power-of-two slack already
    # lowers the realized fpp, and fewer probes cost less per row
    k = max(1, round(m_opt / expected_items * math.log(2)))
    return m, k


def _hash_pair(col, seed: int):
    """Two independent 64-bit key hashes, JVM-side. NULL keys are handled
    by the callers (nulls bypass the bloom entirely)."""
    return (
        F.xxhash64(F.col(col), F.lit(seed)).alias("_h1"),
        F.xxhash64(F.col(col), F.lit(seed + 1)).alias("_h2"),
    )


def build_bloom(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    seed: int = 0x10f,
    build_partitions: int = 8,
    params: tuple[int, int] | None = None,
) -> BloomFilter:
    """One scan over ``df[col]`` → a driver-held :class:`BloomFilter`.

    Two-stage fold: per-partition uint8 bitmaps are built at the scan's
    natural parallelism, then OR-reduced executor-side down to at most
    ``build_partitions`` rows before the driver collect — the scan never
    loses parallelism and the driver never sees more than
    ``build_partitions`` bitmap-sized rows. Pass ``expected_items``
    (an upper bound is fine — oversizing only wastes bitmap space);
    when omitted, a ``count()`` pre-scan sizes it, which costs one extra
    read of the history — acceptable for a one-off index build, but at
    full scale prefer passing the bound.
    """
    if params is not None:
        m_bits, k = params  # caller pins the geometry (incremental updates
        # of a persisted bitmap must keep it fixed across batches)
    else:
        if expected_items is None:
            expected_items = max(df.count(), 1)
        m_bits, k = bloom_params(expected_items, fpp)
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    n_bytes = (m_bits + 7) // 8

    # Stage 1 hashes + sets bits at the scan's NATURAL parallelism (a
    # coalesce here would merge input splits and serialize the history
    # scan to build_partitions tasks — the one expensive phase). Only the
    # already-tiny bitmap rows repartition down for the OR fold, so at
    # most build_partitions bitmap-sized rows ever reach the driver.
    hashed = df.where(F.col(col).isNotNull()).select(*_hash_pair(col, seed))

    def _bitmap(batches):
        bits = np.zeros(n_bytes, dtype=np.uint8)
        mask = np.int64(m_bits - 1)
        saw = False
        for pdf in batches:
            if not len(pdf):
                continue
            saw = True
            a = pdf["_h1"].to_numpy(np.int64) & mask
            b = pdf["_h2"].to_numpy(np.int64) & mask
            for i in range(k):
                idx = (a + np.int64(i) * b) & mask
                np.bitwise_or.at(
                    bits,
                    idx >> np.int64(3),
                    (np.uint8(1) << (idx & np.int64(7)).astype(np.uint8)),
                )
        if saw:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    def _or_fold(batches):
        acc = None
        for pdf in batches:
            for raw in pdf["bits"]:
                arr = np.frombuffer(raw, dtype=np.uint8)
                acc = arr.copy() if acc is None else acc | arr
        if acc is not None:
            yield pd.DataFrame({"bits": [acc.tobytes()]})

    per_part = hashed.mapInPandas(_bitmap, "bits binary")
    parts = (
        per_part.repartition(build_partitions)
        .mapInPandas(_or_fold, "bits binary")
        .collect()
    )
    bits = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        bits |= np.frombuffer(row.bits, dtype=np.uint8)
    return BloomFilter(m_bits=m_bits, k=k, seed=seed, bits=bits)


def might_contain_column(spark_df: DataFrame, col: str, bloom: BloomFilter):
    """Boolean Column: bloom membership of ``col``, probed numpy-
    vectorized per Arrow batch against the broadcast bitmap. NULL keys
    map to false (a NULL never equals anything, so it is never a
    duplicate — matching anti-join semantics).

    Why a pandas UDF and not a JVM expression: a pure-expression probe
    (bitmap as a hex-string literal, substring+conv per probe) measured
    5× SLOWER than this Arrow path at k=11 — the multi-KB literal
    repeated across k probe expressions pushes the generated code past
    codegen limits into interpreted evaluation. The Arrow transfer ships
    only the two hash columns (16 B/row), and the bitmap rides the
    executor broadcast cache, so this is the fast path at every scale.
    """
    m_bits, k = bloom.m_bits, bloom.k
    h1, h2 = _hash_pair(col, bloom.seed)
    sc = spark_df.sparkSession.sparkContext
    bc = sc.broadcast(bloom.bits)

    @F.pandas_udf("boolean")
    def _mc(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        probe = BloomFilter(m_bits, k, 0, bc.value)
        out = probe.might_contain_np(
            h1s.to_numpy(np.int64), h2s.to_numpy(np.int64)
        )
        return pd.Series(out)

    return F.when(F.col(col).isNull(), F.lit(False)).otherwise(_mc(h1, h2))


def dedup_against_history(
    corpus: DataFrame,
    history: DataFrame,
    on: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    exact: bool = True,
    seed: int = 0x10f,
) -> DataFrame:
    """Rows of ``corpus`` whose ``on`` value does NOT appear in
    ``history[on]`` — semantically a left anti-join, executed as the
    two-phase bloom screen described in the module docstring.

    ``exact=True`` (default) recovers bloom false positives with an
    anti-join over only the bloom-positive slice; the result is then
    byte-for-byte the anti-join answer. ``exact=False`` skips phase 3 —
    up to an ``fpp`` fraction of genuinely-new rows is dropped, in
    exchange for a screen with no shuffle at all (the right trade when
    the corpus is huge and a small recall loss is acceptable).
    """
    bloom = build_bloom(history, on, expected_items=expected_items, fpp=fpp, seed=seed)
    mc = might_contain_column(corpus, on, bloom)
    flagged = corpus.withColumn("_maybe_dup", mc)
    negatives = flagged.where(~F.col("_maybe_dup")).drop("_maybe_dup")
    if not exact:
        return negatives
    recovered = (
        flagged.where(F.col("_maybe_dup"))
        .drop("_maybe_dup")
        .join(history.select(on).where(F.col(on).isNotNull()).distinct(),
              on=on, how="left_anti")
    )
    return negatives.unionByName(recovered.select(*negatives.columns))
