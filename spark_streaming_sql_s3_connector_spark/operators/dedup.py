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
    """Repartition small inputs before heavy per-row compute (64-seed
    MinHash, 64-bit SimHash votes) — see partitioning.spread_for_compute
    for the policy and why it avoids probing ``.rdd``."""
    from spark_streaming_sql_s3_connector_spark.partitioning import spread_for_compute

    return spread_for_compute(df)


def normalized_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def bucket_pairs(
    df: DataFrame,
    key_cols: list[str],
    payload_col,
    max_bucket_size: Optional[int] = 100_000,
) -> DataFrame:
    """All unordered pairs of rows sharing a bucket key: groupBy(key) →
    sorted payload list → explode i<j combinations.

    This replaces a self-equi-join for candidate generation: a self-join
    shuffles the (recomputed) input twice and runs signature UDFs on both
    sides; this shape shuffles once and computes payloads once. Output
    columns: ``a`` and ``b`` (the payload structs, a < b by struct order —
    put the id first in the payload).

    ``max_bucket_size`` drops degenerate buckets (a bucket of n rows emits
    n²/2 pairs in ONE task — at corpus scale a stop-bucket would OOM the
    executor; dropping it mirrors the df-cap skew guard in the n-gram
    join)."""
    grouped = df.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(payload_col)).alias("_items")
    )
    sized = grouped.where(F.size("_items") > 1)
    if max_bucket_size is not None:
        sized = sized.where(F.size("_items") <= max_bucket_size)
    items = F.col("_items")
    pair_arrays = F.transform(
        items,
        lambda x, i: F.transform(
            F.slice(items, i + F.lit(2), F.size(items)),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    )
    # explode_outer: the flatten is never empty (buckets have ≥2 items) and
    # plain explode would infer a size()>0 filter that evaluates the O(m²)
    # pair-building transform a second time
    return sized.select(F.explode_outer(F.flatten(pair_arrays)).alias("_p")).select(
        "_p.a", "_p.b"
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per normalized text. Returns
    (keeper_id, dup_count). One groupBy with map-side partial agg — and
    the group key is ``md5(normalized text)`` (128-bit, collision-free
    at any realistic corpus size), NOT the text itself, so the shuffle
    carries 16-byte keys instead of document bodies. NULL text stays
    its own group (md5(NULL) = NULL), matching the un-hashed form."""
    key = F.md5(F.encode(normalized_text(F.col(text_col)), "UTF-8"))
    return (
        df.groupBy(key.alias("_k"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
        .select("keeper_id", "dup_count")
    )


def dedup_keep_best(df: DataFrame, text_col: str, id_col: str, score_col) -> DataFrame:
    """Exact dedup keeping the BEST row per duplicate cluster (highest
    ``score_col``, id as tie-break) instead of the smallest id — the shape
    a curation pipeline wants when duplicates differ in quality metadata.
    One window partitioned by ``md5(normalized text)`` (same grouping,
    but the window sort compares 32-char keys instead of document
    bodies; NULL text stays its own group since md5(NULL) is NULL) so
    state distributes like dedup_exact's groupBy."""
    from pyspark.sql.window import Window

    key = F.md5(F.encode(normalized_text(F.col(text_col)), "UTF-8"))
    w = Window.partitionBy(key).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
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


def _minhash_sig_udf(num_perm: int, shingle_k: int, bands: Optional[int] = None):
    """Arrow-batched signature computation: blake2b shingle hashes + one
    numpy (n_shingles × num_perm) affine-mod-min — C-speed inner loop.

    With ``bands`` set, returns the ``bands`` LSH band hashes instead of
    the raw signature: folding the band hash into the UDF keeps the Spark
    side a bare posexplode — the alternative (16 × xxhash64(concat_ws(
    element_at…)) expressions) costs seconds of codegen compile per query
    and re-extracts 64 array elements per row at runtime."""
    from hashlib import blake2b

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    consts = _perm_constants(num_perm)
    A = np.array([a for a, _ in consts], dtype=np.int64)
    B = np.array([b for _, b in consts], dtype=np.int64)
    P = _MERSENNE_P
    # 64-bit mixing constants (splitmix64) for the in-UDF band fold
    _MIX = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as signed

    def _fold_bands(sig: "np.ndarray", n_bands: int) -> list:
        # deterministic polynomial fold of each band's rows into one long
        rows = sig.shape[0] // n_bands
        banded = sig.reshape(n_bands, rows)
        with np.errstate(over="ignore"):
            acc = np.zeros(n_bands, dtype=np.int64)
            for r in range(rows):
                acc = acc * _MIX + banded[:, r]
        return acc.tolist()

    def compute(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if len(toks) >= shingle_k:
                sh = {" ".join(toks[i : i + shingle_k]) for i in range(len(toks) - shingle_k + 1)}
            elif toks:
                sh = {" ".join(toks)}
            else:
                sig = np.full(num_perm, P, dtype=np.int64)
                out.append(_fold_bands(sig, bands) if bands else sig.tolist())
                continue
            h = np.fromiter(
                (
                    int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little") % P
                    for s in sh
                ),
                dtype=np.int64,
                count=len(sh),
            )
            sig = ((np.outer(h, A) + B) % P).min(axis=0)
            out.append(_fold_bands(sig, bands) if bands else sig.tolist())
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
    # band grouping moves only (id, band_idx, band_hash) — never the
    # shingle arrays (at scale that's bytes per doc per band, not
    # kilobytes). bucket_pairs = ONE shuffle and one signature pass; a
    # self-join here would recompute the signature UDF on both sides.
    if use_arrow:
        # band hashes computed inside the UDF → the Spark side is a bare
        # posexplode. _outer matters: plain posexplode lets Catalyst's
        # InferFiltersFromGenerate synthesize `size(_bh) > 0` and push it
        # below the repartition exchange — evaluating the signature UDF a
        # SECOND time on the pre-repartition (often single) partition.
        # Band arrays are always exactly `bands` long, so outer ≡ inner.
        band_udf = _minhash_sig_udf(num_perm, shingle_k, bands=bands)
        banded = (
            spread.select(F.col(id_col).alias("_id"), band_udf(F.col(text_col)).alias("_bh"))
            .select("_id", F.posexplode_outer("_bh").alias("band_idx", "band_hash"))
        )
    else:
        sig_base = spread.select(
            F.col(id_col).alias("_id"),
            minhash_signature(word_shingles(F.col(text_col), shingle_k), num_perm).alias("_sig"),
        )
        banded = sig_base.select(
            "_id",
            F.explode_outer(
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
    pairs = (
        bucket_pairs(banded, ["band_idx", "band_hash"], F.struct(F.col("_id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return pairs.select("id_a", "id_b")
    # the candidate set is referenced three times below (two id projections
    # + the final join); persist the (tiny) pair list so the band-grouping
    # subtree — including the signature UDF pass — runs once, not thrice
    pairs = pairs.persist()
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


def cross_corpus_minhash_pairs(
    df_new: DataFrame,
    df_base: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    verify: bool = True,
) -> DataFrame:
    """Bipartite MinHash+LSH screen — the SCALE path for
    :func:`cross_corpus_jaccard_pairs` (which is exact but pays the
    full inverted-index pair volume): band signatures on both sides,
    per (band_idx, band_hash) bucket collect the two sides' id lists
    SEPARATELY and explode only their cross product, then verify
    candidates with exact Jaccard over cross-side shingle sets.
    Candidate recall follows the same LSH S-curve as the within-corpus
    operator (identical signatures and banding — restriction law in
    pytest: this equals ``minhash_near_dup_pairs`` restricted to
    cross-side pairs); verification makes the OUTPUT threshold-exact.
    Band hashes are uniform, so the bucket join is skew-free without a
    cap. Output: ``id_new | id_base | jaccard_sim``."""
    band_udf = _minhash_sig_udf(num_perm, shingle_k, bands=bands)

    def _banded(df: DataFrame, side: str) -> DataFrame:
        return (
            _spread(df)
            .select(F.col(id_col).alias("_id"), band_udf(F.col(text_col)).alias("_bh"))
            .select("_id", F.posexplode_outer("_bh").alias("band_idx", "band_hash"))
            .withColumn("_side", F.lit(side))
        )

    banded = _banded(df_new, "n").unionByName(_banded(df_base, "b"))
    grouped = banded.groupBy("band_idx", "band_hash").agg(
        F.collect_list(F.when(F.col("_side") == "n", F.col("_id"))).alias("_ns"),
        F.collect_list(F.when(F.col("_side") == "b", F.col("_id"))).alias("_bs"),
    )
    cross = F.flatten(
        F.transform(
            F.col("_ns"),
            lambda x: F.transform(
                F.col("_bs"),
                lambda y: F.struct(x.alias("id_new"), y.alias("id_base")),
            ),
        )
    )
    pairs = (
        grouped.where((F.size("_ns") > 0) & (F.size("_bs") > 0))
        .select(F.explode_outer(cross).alias("_p"))
        .select("_p.id_new", "_p.id_base")
        .dropDuplicates(["id_new", "id_base"])
    )
    if not verify:
        return pairs
    pairs = pairs.persist()
    sa = (
        _spread(df_new)
        .join(
            pairs.select(F.col("id_new").alias("_sid")).distinct(),
            F.col(id_col) == F.col("_sid"),
            "left_semi",
        )
        .select(
            F.col(id_col).alias("id_new"),
            word_shingles(F.col(text_col), shingle_k).alias("_sa"),
        )
    )
    sb = (
        _spread(df_base)
        .join(
            pairs.select(F.col("id_base").alias("_sid")).distinct(),
            F.col(id_col) == F.col("_sid"),
            "left_semi",
        )
        .select(
            F.col(id_col).alias("id_base"),
            word_shingles(F.col(text_col), shingle_k).alias("_sb"),
        )
    )
    return (
        pairs.join(sa, "id_new")
        .join(sb, "id_base")
        .withColumn("jaccard_sim", jaccard(F.col("_sa"), F.col("_sb")))
        .where(F.col("jaccard_sim") >= jaccard_threshold)
        .select("id_new", "id_base", "jaccard_sim")
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
    # explode_outer: see minhash — plain explode would re-evaluate the
    # signature (via an inferred size()>0 filter) below the repartition
    chunked = base.select(
        "_id",
        "_sim",
        F.explode_outer(
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
    # one shuffle: bucket by block, explode pairs carrying the signature —
    # hamming verifies in place, no join back for the signatures. Filter
    # BEFORE dropDuplicates: hamming is already computed in place (a pair
    # duplicated across blocks carries the same signatures, so the same
    # hamming), and filtering first shrinks the dedup aggregate's input
    # from the full multi-block candidate set to the surviving pairs.
    return (
        bucket_pairs(
            chunked, ["block_idx", "block_val"], F.struct(F.col("_id"), F.col("_sim"))
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a._sim"), F.col("b._sim")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _shingles_udf(shingle_k: int):
    """Arrow-batched distinct word-k-gram extraction — same semantics as
    the ``word_shingles`` expression form (trim, whitespace split,
    distinct k-grams; <k tokens → the whole text as one shingle), but
    vectorized instead of interpreted transform/slice lambdas."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    def compute(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if len(toks) >= shingle_k:
                out.append(
                    list({" ".join(toks[i : i + shingle_k]) for i in range(len(toks) - shingle_k + 1)})
                )
            elif toks:
                out.append([" ".join(toks)])
            else:
                out.append([])
        return pd.Series(out)

    return pandas_udf(compute, ArrayType(StringType()))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = 1000,
    use_arrow: bool = True,
) -> DataFrame:
    """Inverted-index n-gram Jaccard join: explode shingles, count overlap
    per (id_a, id_b), derive Jaccard from |A|,|B|,|A∩B|. ``max_shingle_df``
    drops stop-shingles (document frequency cap) — THE skew guard at scale:
    a shingle shared by 10^6 docs would otherwise explode the join."""
    shingle_expr = (
        _shingles_udf(shingle_k)(F.col(text_col))
        if use_arrow
        else word_shingles(F.col(text_col), shingle_k)
    )
    # compute the shingle array ONCE and carry each doc's set size
    # through the explode: shingles are distinct per doc, so
    # size(array) equals the per-id exploded row count the former
    # sizes aggregate produced, and sizes are functionally dependent
    # on ids — grouping by (id, size) is the same grouping. The old
    # sizes-agg + two size joins re-ran the shingle UDF and the source
    # scan two extra times and paid an extra shuffle.
    sh = (
        _spread(df)
        .select(F.col(id_col).alias("_id"), shingle_expr.alias("_shs"))
        .select(
            "_id",
            F.size("_shs").alias("set_size"),
            F.explode_outer("_shs").alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
    )
    # bucket by shingle and explode id pairs: one shuffle instead of a
    # two-sided self-join; the df cap below doubles as the bucket-size
    # skew guard, so pass max_bucket_size=None
    overlap = (
        bucket_pairs(
            sh,
            ["shingle"],
            F.struct(F.col("_id"), F.col("set_size")),
            max_bucket_size=max_shingle_df,
        )
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        overlap.withColumn(
            "jaccard_sim",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def cross_corpus_jaccard_pairs(
    df_new: DataFrame,
    df_base: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = 1000,
    use_arrow: bool = True,
) -> DataFrame:
    """Bipartite near-dup join: which NEW documents near-duplicate a
    BASE corpus (new crawl vs existing training set — the screen every
    data refresh runs before mixing; also the decontamination shape
    when ``df_base`` is an eval benchmark). Same inverted-index
    n-gram-Jaccard arithmetic as :func:`ngram_jaccard_pairs`
    (law-tested: this equals its output restricted to cross-side
    pairs), but the candidate generator pairs ONLY across sides:
    per shingle bucket the two sides' id lists are collected
    separately and the explode is their cross product — within-side
    pairs are never materialized, so screening a small delta against a
    huge base costs |delta-bucket|×|base-bucket| per shingle, not
    bucket². ``max_shingle_df`` caps the TOTAL bucket population
    (both sides) exactly like the within-corpus guard.

    Output: ``id_new | id_base | jaccard_sim`` (one row per matched
    cross pair at/above ``threshold``)."""
    shingle_expr = (
        _shingles_udf(shingle_k)(F.col(text_col))
        if use_arrow
        else word_shingles(F.col(text_col), shingle_k)
    )

    def _sh(df: DataFrame, side: str) -> DataFrame:
        # same one-pass shape as ngram_jaccard_pairs: the shingle UDF
        # runs once per side and each doc's set size (== size of its
        # distinct-shingle array == the row count the former sizes
        # aggregate produced) rides along, so the sizes agg + two size
        # joins — and their extra UDF/scan evaluations — disappear
        return (
            _spread(df)
            .select(F.col(id_col).alias("_id"), shingle_expr.alias("_shs"))
            .select(
                "_id",
                F.size("_shs").alias("set_size"),
                F.explode_outer("_shs").alias("shingle"),
            )
            .where(F.col("shingle").isNotNull())
            .withColumn("_side", F.lit(side))
        )

    sh = _sh(df_new, "n").unionByName(_sh(df_base, "b"))
    grouped = sh.groupBy("shingle").agg(
        F.collect_list(
            F.when(
                F.col("_side") == "n", F.struct(F.col("_id"), F.col("set_size"))
            )
        ).alias("_ns"),
        F.collect_list(
            F.when(
                F.col("_side") == "b", F.struct(F.col("_id"), F.col("set_size"))
            )
        ).alias("_bs"),
    )
    filtered = grouped.where((F.size("_ns") > 0) & (F.size("_bs") > 0))
    if max_shingle_df is not None:
        filtered = filtered.where(
            F.size("_ns") + F.size("_bs") <= max_shingle_df
        )
    cross = F.flatten(
        F.transform(
            F.col("_ns"),
            lambda x: F.transform(
                F.col("_bs"), lambda y: F.struct(x.alias("n"), y.alias("b"))
            ),
        )
    )
    return (
        filtered.select(F.explode_outer(cross).alias("_p"))
        .groupBy(
            F.col("_p.n._id").alias("id_new"),
            F.col("_p.b._id").alias("id_base"),
            F.col("_p.n.set_size").alias("size_n"),
            F.col("_p.b.set_size").alias("size_b"),
        )
        .agg(F.count("*").alias("inter"))
        .withColumn(
            "jaccard_sim",
            F.col("inter") / (F.col("size_n") + F.col("size_b") - F.col("inter")),
        )
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_new", "id_base", "jaccard_sim")
    )


def _union_find_components(edge_rows) -> dict[int, int]:
    """Driver-side union-find (path compression + union by rank) over a
    bounded edge list; returns {node: min id in its component}."""
    parent: dict[int, int] = {}
    rank: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edge_rows:
        for n in (u, v):
            if n not in parent:
                parent[n], rank[n] = n, 0
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        if rank[ru] < rank[rv]:
            ru, rv = rv, ru
        parent[rv] = ru
        if rank[ru] == rank[rv]:
            rank[ru] += 1
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {n: comp_min[find(n)] for n in parent}


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    driver_max_edges: int = 5_000_000,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS: connected
    components of the undirected pair graph.

    Size-gated hybrid, the same reasoning as a broadcast join or the
    bounded IVF training sample:

    - The pair graph is the DUPLICATES, orders of magnitude smaller than
      the corpus. When its edge count fits ``driver_max_edges`` (default
      5M edges ≈ 80 MB of longs), a driver-side union-find resolves it in
      one collect + milliseconds — no iterative jobs at all.
    - Past the gate, distributed min-label propagation with pointer
      jumping: every node starts labeled with its own id; each round
      takes the min over self + neighbors (one narrow (id, label)
      shuffle), then compresses label <- label(label). The jump turns
      O(diameter) convergence into O(log diameter) rounds (the bound the
      large-star/small-star alternation of Kiveris et al. achieves) —
      near-dup clusters are dense (diameter ~2) but similarity-threshold
      graphs can chain, and the jump table is the (id, label) frame
      itself, broadcast-sized in practice. Lineage is truncated with an
      eager localCheckpoint every round — without it the plan doubles per
      iteration and Catalyst analysis time explodes.

    Returns (id, component) where component = min id in the component;
    only ids that appear in at least one pair are returned (singletons
    are their own trivial component — join back if needed).

    Raises ``RuntimeError`` if the propagation loop exhausts
    ``max_iterations`` without converging — a partial labeling is a
    WRONG clustering (two rows of one component can carry different
    labels), and returning it silently would poison every downstream
    keep-one decision. The driver union-find path is exact and never
    raises.
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
    ).persist()
    # gate on the RAW pair count: union-find neither needs the symmetric
    # closure nor edge dedup (find/union are idempotent), so the driver
    # path skips the closure's distinct shuffle entirely. 2x is the
    # closure bound, so the driver-memory guard is conservative (raw
    # pairs can only overestimate the distinct undirected edge count).
    n_pairs = edges.count()  # also materializes the persist
    if 2 * n_pairs <= driver_max_edges:
        # one bounded collect (<= driver_max_edges/2 * 16 B), not
        # toLocalIterator's per-partition round trips
        mapping = _union_find_components(
            (r["u"], r["v"]) for r in edges.collect()
        )
        edges.unpersist()
        spark = pairs.sparkSession
        return spark.createDataFrame(
            list(mapping.items()), schema="id long, component long"
        )
    und = (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    # seed = round one fused: with labels initialized to ids, the first
    # round's neighbor-min is just min(neighbor id) — computable straight
    # from the edge set, saving a full join+checkpoint round. Every node
    # appears on the v side of the symmetric closure, so none are lost.
    labels = (
        und.groupBy(F.col("v").alias("id"))
        .agg(F.min("u").alias("_nbr_min"))
        .select("id", F.least(F.col("id"), F.col("_nbr_min")).alias("component"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        nbr_min = (
            und.join(labels, und["u"] == labels["id"])
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        prop = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("component"), F.coalesce("_nbr_min", "component")).alias(
                "component"
            ),
            F.col("component").alias("_orig"),
        )
        # pointer jumping: component <- label(component). Labels are always
        # node ids, so the self-join resolves; this halves the remaining
        # path per round, turning O(diameter) convergence into
        # O(log diameter) — the difference between ~10 and ~4 rounds on
        # chain-shaped similarity graphs (dense dup clusters stay at 2).
        # The jump table is the (id, component) frame itself — tiny next to
        # the corpus, so AQE broadcasts this join in practice.
        jump = prop.select(
            F.col("id").alias("_jid"), F.col("component").alias("_jcomp")
        )
        new_val = F.least(F.col("component"), F.coalesce("_jcomp", "component"))
        # carry a per-row changed flag computed against the round-start
        # label: the convergence probe is then one map-side max over the
        # rows the eager checkpoint just materialized, not a second
        # labels-vs-labels join job
        checkpointed = (
            prop.join(jump, prop["component"] == jump["_jid"], "left")
            .select(
                "id",
                new_val.alias("component"),
                (new_val < F.col("_orig")).cast("int").alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = checkpointed.agg(F.max("_chg")).collect()[0][0]
        labels = checkpointed.drop("_chg")
        if not changed:
            converged = True
            break
    und.unpersist()
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations; the partial labeling would be a wrong clustering. "
            "With pointer jumping, rounds grow ~log2(component diameter) — "
            "raise max_iterations (25 covers diameters beyond any real "
            "near-dup graph) or lower the similarity threshold feeding the "
            "pair graph."
        )
    return labels


def assign_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Attach a ``canonical_id`` column mapping every row to its duplicate
    cluster's representative (min id in the connected component); rows in
    no pair are their own representative. The component map is the pair
    graph's node set — tiny relative to the corpus — so the join back is
    broadcast-friendly and Spark's AQE picks that up on its own."""
    # alias the component frame's key so the join+drop can never collide
    # with a caller id_col literally named "id"
    comp = connected_components(pairs, id_a, id_b).select(
        F.col("id").alias("_cc_id"), "component"
    )
    return (
        df.join(comp, df[id_col] == comp["_cc_id"], "left")
        .drop("_cc_id")
        .withColumn("canonical_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (id_a < id_b) — the ground-truth
    baseline, O(n²) by definition, executed as BLOCKED MATRIX MULTIPLY:
    hash vectors into ``n_blocks`` blocks, cross-join the B(B+1)/2 block
    pairs (B rows each side, not n), and compute each block-pair's full
    cosine submatrix with one numpy gemm inside mapInPandas.

    Versus a row-level cross join with expression cosine this moves the
    n² inner loop from interpreted Catalyst lambdas to BLAS (~100× at
    d=64) and shuffles each vector B times instead of P times. At scale,
    pick n_blocks so a block (n/B × d doubles) fits executor memory; the
    n² flops are irreducible — that's what the LSH/IVF variants are for."""
    import numpy as np

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    blocks = base.groupBy("_blk").agg(
        F.collect_list(F.struct(F.col("_id"), F.col("_v"))).alias("_items")
    )
    l = blocks.select(F.col("_blk").alias("lb"), F.col("_items").alias("litems"))
    r = blocks.select(F.col("_blk").alias("rb"), F.col("_items").alias("ritems"))
    block_pairs = l.join(r, F.col("lb") <= F.col("rb")).repartition(
        df.sparkSession.sparkContext.defaultParallelism, "lb", "rb"
    )

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def compute(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                same = row.lb == row.rb
                lids = np.array([it["_id"] for it in row.litems], dtype=np.int64)
                lv = np.array([it["_v"] for it in row.litems], dtype=np.float64)
                if same:
                    rids, rv = lids, lv
                else:
                    rids = np.array([it["_id"] for it in row.ritems], dtype=np.int64)
                    rv = np.array([it["_v"] for it in row.ritems], dtype=np.float64)
                ln = lv / np.maximum(np.linalg.norm(lv, axis=1, keepdims=True), 1e-300)
                rn = (
                    ln
                    if same
                    else rv / np.maximum(np.linalg.norm(rv, axis=1, keepdims=True), 1e-300)
                )
                C = ln @ rn.T
                ii, jj = np.nonzero(C >= threshold)
                ida, idb = lids[ii], rids[jj]
                keep = ida < idb  # drops self-pairs and dedupes same-block
                if not same:
                    swap = ida > idb
                    ida2 = np.where(swap, idb, ida)
                    idb2 = np.where(swap, ida, idb)
                    ida, idb, keep = ida2, idb2, np.ones(len(ida2), dtype=bool)
                yield pd.DataFrame(
                    {
                        "id_a": ida[keep],
                        "id_b": idb[keep],
                        "cosine": C[ii, jj][keep],
                    }
                )

    return block_pairs.mapInPandas(compute, out_schema).select("id_a", "id_b")


def near_dup_keep_best(
    df: DataFrame,
    text_col: str,
    id_col: str,
    score_col,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """NEAR-duplicate curation: cluster near-dups (exact inverted-index
    n-gram Jaccard pairs → connected components) and keep ONE best
    representative per cluster — highest ``score_col``, id ascending as
    the tie-break; documents with no near-dup partner pass through
    untouched.

    The near-dup counterpart of :func:`dedup_keep_best` (whose clusters
    are exact-text groups): the shape an LLM curation pipeline runs over
    a crawled corpus where copies differ by boilerplate or light edits.

    Scale shape: pair generation is the DF-capped inverted index (never
    all-pairs), components are the gated min-label propagation, and the
    per-cluster argmax is ``min(struct(-score, id))`` — a map-side
    partial aggregate, no window over a skewed cluster partition.
    Returns the kept rows: (id, component, score); a singleton (no
    near-dup partner) is its own keeper with ``component = id``.
    """
    pairs = ngram_jaccard_pairs(
        df, text_col, id_col, shingle_k=shingle_k, threshold=threshold
    ).select("id_a", "id_b")
    comp = connected_components(pairs)
    scored = df.select(
        F.col(id_col).alias("_nid"), F.col(score_col).alias("_score")
    )
    m = comp.join(scored, comp["id"] == F.col("_nid"))
    # the argmax struct already carries the winning score as its negated
    # sort key, so the keeper's score is -ns — no corpus re-join to
    # recover it (r14; exact for numeric types: -(-x) round-trips)
    keepers = (
        m.groupBy("component")
        .agg(F.min(F.struct((-F.col("_score")).alias("ns"), F.col("id").alias("i"))).alias("_k"))
        .select(
            F.col("_k.i").alias(id_col),
            F.col("component"),
            (-F.col("_k.ns")).alias(score_col),
        )
    )
    clustered_ids = comp.select(F.col("id").alias("_cid"))
    singletons = (
        df.select(F.col(id_col), F.col(score_col))
        .join(clustered_ids, F.col(id_col) == F.col("_cid"), "left_anti")
        .withColumn("component", F.col(id_col).cast("bigint"))
        .select(id_col, "component", score_col)
    )
    return keepers.unionByName(singletons).select(id_col, "component", score_col)


def passage_dedup_keep_first(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    out_col: str = "deduped_text",
) -> DataFrame:
    """Cross-document PASSAGE dedup: every whitespace k-gram keeps only
    its globally FIRST occurrence in (doc id, position) order; all later
    occurrences — other documents and repeats within the same document —
    have their k token positions masked, and each document is rebuilt
    from its surviving tokens. The k-gram-counting approximation of
    suffix-array substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): any repeated span of >= k
    tokens is caught because every k-window inside it repeats.

    Granularity ladder this completes: whole-document (dedup_exact /
    near-dup), line/paragraph (web.dedup_lines_keep_first), and now
    arbitrary-span — repeated boilerplate that crosses line boundaries,
    quoted passages, or template fragments shorter than a document but
    unaligned with lines. An exact copy of an earlier document loses
    every token; a fresh document loses nothing.

    Scale shape: one gram-keyed shuffle whose key is md5(gram) (16 B,
    never the gram text — same 128-bit rekey discipline as dedup_exact)
    with a map-side-combined min(struct(id, pos)) partial aggregate, so
    a gram repeated 10^8 times ships one row per map task; the join
    back is the standard AQE skew-split case (1:1 fan-out). The covered-
    position explode costs k rows per DUPLICATED occurrence only —
    bounded by dup coverage, not corpus size — and the rebuild is one
    doc-keyed shuffle. Token-explode volume is ~n_tokens rows, the same
    linear pass a suffix-array build would pay.

    Documents with fewer than k tokens generate no grams and pass
    through untouched; blank/NULL text rebuilds to ''. Returns
    (id_col, out_col, n_kept_tokens, n_removed_tokens).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    from spark_streaming_sql_s3_connector_spark.functions.text import tokenize

    base = df.select(
        F.col(id_col).alias("_id"), tokenize(F.col(text_col)).alias("_toks")
    )
    # gram start positions are 0-based; slice() below is 1-based
    gram_expr = (
        f"transform(sequence(0, size(_toks) - {k}), "
        f"i -> md5(encode(concat_ws(' ', slice(_toks, i + 1, {k})), 'UTF-8')))"
    )
    gram_occ = (
        base.where(F.size("_toks") >= k)
        .select("_id", F.posexplode(F.expr(gram_expr)))
        .withColumnRenamed("pos", "_start")
        .withColumnRenamed("col", "_gram")
    )
    firsts = gram_occ.groupBy("_gram").agg(
        F.min(F.struct("_id", "_start")).alias("_first")
    )
    dup_occ = (
        gram_occ.join(firsts, "_gram")
        .where(
            (F.col("_id") != F.col("_first._id"))
            | (F.col("_start") != F.col("_first._start"))
        )
        .select("_id", "_start")
    )
    covered = dup_occ.select(
        "_id",
        F.explode(F.sequence(F.col("_start"), F.col("_start") + F.lit(k - 1))).alias(
            "_pos"
        ),
    ).distinct()
    tok_pos = base.select(
        "_id", F.posexplode("_toks").alias("_pos", "_tok")
    )
    kept = tok_pos.join(covered, ["_id", "_pos"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias(out_col),
        F.count("*").alias("n_kept_tokens"),
    )
    totals = base.select("_id", F.size("_toks").cast("bigint").alias("_n_total"))
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            F.coalesce(F.col("n_kept_tokens"), F.lit(0)).cast("bigint").alias(
                "n_kept_tokens"
            ),
            (F.col("_n_total") - F.coalesce(F.col("n_kept_tokens"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed_tokens"),
        )
    )
