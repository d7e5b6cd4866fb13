"""Deduplication operators for large-scale training-data pipelines.

All candidate generation is expressed as DataFrame ops that shuffle on a
bucketable key (hash of text / LSH band / simhash block / shingle), so each
strategy scales as an equi-join, never an O(n²) cross join:

- exact:     groupBy(hash) — one shuffle of (key, id), combiner applies;
- minhash:   shingle → per-seed xxhash64 min (JVM expressions) → band →
             equi-join on (band_idx, band_hash) → exact-Jaccard verify;
- simhash:   64-bit signature via bit-vote over token hashes → block split
             → equi-join on matching block → Hamming verify;
- n-gram:    explode shingles → join on shared shingle → Jaccard from
             overlap counts (inverted-index style, the classic MapReduce
             near-dup join);
- embedding: exact all-pairs above a cosine threshold via a blocked
             self-join (baseline), LSH-bucketed variant in similarity.py.

At 100 TB: every strategy's shuffle key spreads uniformly (hashes), skew is
bounded by document-frequency caps (``max_shingle_df``), and verification
joins carry only (id, signature) pairs, never the full text.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import tokenize


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's default parallelism before heavy
    per-row compute. Small inputs (one parquet file → one partition) would
    otherwise pin expression-heavy ops (64-seed MinHash, 64-bit SimHash
    votes) to a single core; at cluster scale the input is already
    many-partitioned and this is a cheap round-robin."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def normalized_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per normalized text. Returns
    (keeper_id, dup_count). GroupBy on the normalized text hashes/shuffles
    once; partial aggregation handles the heavy lifting map-side."""
    return (
        df.groupBy(normalized_text(F.col(text_col)).alias("_norm"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
        .select("keeper_id", "dup_count")
    )


def word_shingles(col, k: int = 3):
    """Distinct word ``k``-grams as an array column (JVM expressions)."""
    toks = tokenize(col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    grams = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array().cast("array<string>"))
    )


# Carter-Wegman permutation constants over the Mersenne prime 2^61-1:
# h_i(x) = (a_i * x + b_i) mod p — the classic MinHash family. Constants
# derive from a fixed seed so signatures are deterministic across runs.
_MERSENNE_P = (1 << 31) - 1


def _perm_constants(num_perm: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(0x5EED)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(num_perm)
    ]


def minhash_signature(shingles, num_perm: int = 64):
    """num_perm-wide MinHash signature as pure expressions.

    Shingles are hashed once per permutation via the universal-hash map
    ``(a*h + b) mod p`` (p = 2^31-1, products < 2^62 so no ANSI
    overflow). NOTE: array higher-order functions evaluate interpreted
    (no codegen); for large corpora the Arrow-vectorized signature path in
    ``minhash_near_dup_pairs(use_arrow=True)`` is ~an order of magnitude
    faster — this expression form remains for option-free composition."""
    p = F.lit(_MERSENNE_P).cast("long")
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), p))
    sig = []
    for a, b in _perm_constants(num_perm):
        sig.append(
            F.array_min(
                F.transform(
                    base,
                    lambda h: F.pmod(h * F.lit(a).cast("long") + F.lit(b).cast("long"), p),
                )
            )
        )
    return F.array(*sig)


def _minhash_sig_udf(num_perm: int, shingle_k: int):
    """Arrow-batched signature computation: blake2b shingle hashes + one
    numpy (n_shingles × num_perm) affine-mod-min — C-speed inner loop."""
    from hashlib import blake2b

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    consts = _perm_constants(num_perm)
    A = np.array([a for a, _ in consts], dtype=np.int64)
    B = np.array([b for _, b in consts], dtype=np.int64)
    P = _MERSENNE_P

    def compute(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if len(toks) >= shingle_k:
                sh = {" ".join(toks[i : i + shingle_k]) for i in range(len(toks) - shingle_k + 1)}
            elif toks:
                sh = {" ".join(toks)}
            else:
                out.append([P] * num_perm)
                continue
            h = np.fromiter(
                (
                    int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little") % P
                    for s in sh
                ),
                dtype=np.int64,
                count=len(sh),
            )
            out.append(((np.outer(h, A) + B) % P).min(axis=0).tolist())
        return pd.Series(out)

    return pandas_udf(compute, ArrayType(LongType()))


def jaccard(a, b):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    verify: bool = True,
    use_arrow: bool = True,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs (id_a < id_b).

    Pipeline: shingle → signature → split into ``bands`` bands of
    ``num_perm/bands`` rows → hash each band → explode → equi-join on
    (band_idx, band_hash) → optional exact-Jaccard verification on the
    shingle sets. The only shuffle is the band-hash join; band hashes are
    uniform so no skew.

    ``use_arrow=True`` (default) computes signatures in an Arrow-batched
    pandas UDF (numpy inner loop) — array higher-order functions run
    interpreted in Spark, so at corpus scale the vectorized path wins by
    ~an order of magnitude. Candidate recall is identical in distribution;
    the verification step makes the final output threshold-exact either
    way."""
    rows = num_perm // bands
    spread = _spread(df)
    if use_arrow:
        sig_udf = _minhash_sig_udf(num_perm, shingle_k)
        sig_base = spread.select(
            F.col(id_col).alias("_id"), sig_udf(F.col(text_col)).alias("_sig")
        )
    else:
        sig_base = spread.select(
            F.col(id_col).alias("_id"),
            minhash_signature(word_shingles(F.col(text_col), shingle_k), num_perm).alias("_sig"),
        )
    # band join moves only (id, band_idx, band_hash) — never the shingle
    # arrays (at scale that's bytes per doc per band, not kilobytes)
    banded = sig_base.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(F.concat_ws(",", *[F.col("_sig")[b * rows + r] for r in range(rows)])).alias(
                            "band_hash"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band"),
    ).select("_id", "_band.band_idx", "_band.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return pairs.select("id_a", "id_b")
    # exact-Jaccard verification: shingle ONLY the candidate ids (semi-join
    # first — shingling every document for a handful of candidates is the
    # dominant cost otherwise)
    cand_ids = (
        pairs.select(F.col("id_a").alias("_sid"))
        .union(pairs.select(F.col("id_b").alias("_sid")))
        .distinct()
    )
    shingle_map = (
        spread.join(cand_ids, spread[id_col] == cand_ids["_sid"], "left_semi")
        .select(
            F.col(id_col).alias("_sid"), word_shingles(F.col(text_col), shingle_k).alias("_sh")
        )
    )
    sa = shingle_map.select(F.col("_sid").alias("id_a"), F.col("_sh").alias("_sa"))
    sb = shingle_map.select(F.col("_sid").alias("id_b"), F.col("_sh").alias("_sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("_sa"), F.col("_sb")))
        .where(F.col("jaccard_sim") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def simhash_signature(col, bits: int = 64):
    """SimHash: per token hash, vote +1/-1 on each bit position weighted by
    term frequency; sign of the vote is the signature bit. Expressed with
    aggregate over the token array — still no Python in the path."""
    toks = tokenize(normalized_text(col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def mask(b: int) -> int:
        # signed-64 representation (1 << 63 overflows LongType)
        return (1 << b) if b < 63 else -(1 << 63)

    votes = [
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(mask(b)).cast("long")) != 0, 1).otherwise(-1),
        )
        for b in range(bits)
    ]
    sig = F.lit(0).cast("long")
    for b, v in enumerate(votes):
        sig = sig.bitwiseOR(
            F.when(v > 0, F.lit(mask(b)).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return sig


def _simhash_sig_udf():
    """Arrow-batched SimHash: blake2b token hashes → numpy unpackbits →
    bit votes → signed-64 signature."""
    from hashlib import blake2b

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def compute(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = " ".join((t or "").lower().split()).split()
            if not toks:
                out.append(0)
                continue
            h = np.fromiter(
                (
                    int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little")
                    for s in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(toks)
            sig = 0
            for b in np.nonzero(votes > 0)[0]:
                sig |= 1 << int(b)
            if sig >= 1 << 63:
                sig -= 1 << 64
            out.append(sig)
        return pd.Series(out, dtype="int64")

    return pandas_udf(compute, LongType())


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    blocks: int = 4,
    use_arrow: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs (id_a < id_b, hamming ≤ max_hamming).

    Pigeonhole blocking: split the 64-bit signature into ``blocks`` chunks;
    any pair within ``blocks-1`` bit flips shares at least one exact chunk,
    so candidates come from ``blocks`` equi-joins (union) — never a cross
    join. With blocks=4, max_hamming=3 the recall is exact.

    ``use_arrow=True`` computes signatures numpy-vectorized (the 64
    per-bit aggregate expressions run interpreted otherwise)."""
    width = 64 // blocks
    mask = (1 << width) - 1
    sig_expr = (
        _simhash_sig_udf()(F.col(text_col))
        if use_arrow
        else simhash_signature(F.col(text_col))
    )
    base = _spread(df).select(F.col(id_col).alias("_id"), sig_expr.alias("_sim"))
    chunked = base.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.shiftright("_sim", b * width).bitwiseAND(F.lit(mask).cast("long")).alias("block_val"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("_blk"),
    ).select("_id", "_sim", "_blk.block_idx", "_blk.block_val")
    l, r = chunked.alias("l"), chunked.alias("r")
    return (
        l.join(
            r,
            (F.col("l.block_idx") == F.col("r.block_idx"))
            & (F.col("l.block_val") == F.col("r.block_val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            hamming64(F.col("l._sim"), F.col("r._sim")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = 1000,
) -> DataFrame:
    """Inverted-index n-gram Jaccard join: explode shingles, count overlap
    per (id_a, id_b), derive Jaccard from |A|,|B|,|A∩B|. ``max_shingle_df``
    drops stop-shingles (document frequency cap) — THE skew guard at scale:
    a shingle shared by 10^6 docs would otherwise explode the join."""
    sh = _spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("shingle"),
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("set_size"))
    if max_shingle_df is not None:
        rare = sh.groupBy("shingle").agg(F.count("*").alias("df")).where(F.col("df") <= max_shingle_df)
        sh = sh.join(rare.select("shingle"), "shingle")
    l, r = sh.alias("l"), sh.alias("r")
    overlap = (
        l.join(r, (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        overlap.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard_sim",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    parallelism: int = 64,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (id_a < id_b) — the ground-truth
    baseline, O(n²) by definition. Repartitioned before the cross join so
    the n² work spreads over ``parallelism²`` tasks. For corpora beyond
    ~10^5 vectors use the LSH-bucketed path (similarity.py
    ``lsh_bucket_pairs``), which replaces the cross join with an equi-join
    on hyperplane signatures."""
    from spark_streaming_sql_s3_connector_spark.operators.similarity import cosine_sim

    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    l = base.repartition(parallelism).alias("l")
    r = base.alias("r")
    return (
        l.crossJoin(r)
        .where(F.col("l._id") < F.col("r._id"))
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            cosine_sim(F.col("l._v"), F.col("r._v")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )
