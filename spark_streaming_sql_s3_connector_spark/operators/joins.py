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

from typing import Optional, Sequence

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
    pigeonhole_min_pairs: Optional[int] = None,
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
    4. Inside each allowed HOT block (in-block pair volume above a
       fixed floor — cold blocks keep the direct walk, whose per-pair
       cost is far below the candidate machinery's fixed overhead), a
       PIGEONHOLE candidate tier
       (PassJoin-style) replaces the raw cross-pair walk: the b-side
       string is partitioned into ``max_dist + 1`` fixed segments, and
       a pair within edit distance ``max_dist`` must contain at least
       one b-segment VERBATIM in a, at a position shifted by at most
       ``max_dist`` (each edit touches ≤1 segment; k edits cannot
       touch k+1 segments; the untouched segment's position moves by
       the net insert/delete count before it, which is ≤ k). So a
       emits its (segment_idx, window_substring) keys for the ±k
       windows, b emits its exact segments, and candidates come from a
       narrow (block, seg_idx, seg_text) equi-join — LOSSLESS by the
       pigeonhole argument, and candidate volume grows ~linearly in
       corpus size where the raw in-block cross-pair count grows
       quadratically (measured: 1.21M → 152k candidate pairs at a
       local 10× scale-up, with sub-linear 0.5→1 growth).
       b rows too short for a full segmentation (shorter than the last
       segment's start — the untouched segment could be the empty
       tail, which prunes nothing) take the direct in-block walk;
       they are the tail of the length distribution by construction.

    Output: ``id_a | id_b | edit_dist`` for pairs at/below
    ``max_dist``. Exactly SQL-mirrorable (classic Levenshtein in both
    engines — the banded form returns the same distance for kept rows;
    the blocking predicate and the pair-volume cap are part of the
    spec, so the oracle applies them too; the pigeonhole tier is
    lossless, so the oracle stays the plain blocked cross-pair form)."""
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
    ca = a.groupBy("_blk").agg(F.count(F.lit(1)).alias("_na"))
    cb = b.groupBy("_blk").agg(F.count(F.lit(1)).alias("_nb"))
    blocks = ca.join(cb, "_blk")
    if max_block_pairs is not None:
        blocks = blocks.where(F.col("_na") * F.col("_nb") <= max_block_pairs)

    dist = F.levenshtein(F.col("_s_a"), F.col("_s_b"), max_dist)
    # the banded form spells "above threshold" as -1
    keep = (F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_dist)

    n_seg = max_dist + 1
    starts = [1 + (i * cap_len) // n_seg for i in range(n_seg)]
    seg_lens = [
        ((i + 1) * cap_len) // n_seg - (i * cap_len) // n_seg for i in range(n_seg)
    ]
    if min(seg_lens) < 2:
        # cap_len ~ max_dist: 0/1-char segments prune nothing (and
        # 0-char ones match everything) — the direct walk IS the plan
        ok = blocks.select("_blk")
        return (
            a.join(F.broadcast(ok), "_blk")
            .join(b.join(F.broadcast(ok), "_blk"), "_blk")
            .select("id_a", "id_b", dist.alias("edit_dist"))
            .where(keep)
        )

    # Hybrid routing: cold blocks (small in-block pair volume) keep the
    # plain cross-pair walk — its per-pair cost is tiny and the
    # pigeonhole tier's explode+distinct overhead would dominate; only
    # HOT blocks (where the quadratic in-block volume is the actual
    # scale risk) pay the candidate machinery. Both tiers are lossless,
    # so routing never changes the output. The default was MEASURED
    # (r14, documents corpus, max_dist=5, interleaved 3-rep medians on
    # an idle machine): at sf0.1 walls are nearly flat in the
    # threshold — 1.58 / 1.35 / 1.28 / 1.27 s for 1k / 8k / 32k /
    # never-pigeonhole (the machinery's fixed cost is ~0.3 s there) —
    # but at sf0.5 the ordering INVERTS hard: 2.83 / 4.10 / 4.54 /
    # 4.36 s. As data grows, typical in-block pair volume grows
    # quadratically, so the volume mass sits in blocks a high
    # threshold would route to the quadratic walk; 1024 keeps the
    # 0.1→0.5 hop at 1.79x (vs 3.4x direct) at a ~0.3 s small-corpus
    # premium — the right trade for an operator whose risk is the
    # 100x direction.
    if pigeonhole_min_pairs is None:
        pigeonhole_min_pairs = 1024
    vol = F.col("_na") * F.col("_nb")
    ok_cold = blocks.where(vol <= pigeonhole_min_pairs).select("_blk")
    ok_hot = blocks.where(vol > pigeonhole_min_pairs).select("_blk")
    a_cold = a.join(F.broadcast(ok_cold), "_blk")
    b_cold = b.join(F.broadcast(ok_cold), "_blk")
    a_hot = a.join(F.broadcast(ok_hot), "_blk")
    b_hot = b.join(F.broadcast(ok_hot), "_blk")

    # a b row segments fully iff it reaches the last segment's start;
    # shorter rows keep the direct in-block walk (losslessness)
    b_long = b_hot.where(F.length("_s_b") >= starts[-1])
    b_short = b_hot.where(F.length("_s_b") < starts[-1])
    direct = (
        a_cold.join(b_cold, "_blk")
        .unionByName(a_hot.join(b_short, "_blk"))
        .select("id_a", "id_b", dist.alias("edit_dist"))
        .where(keep)
    )

    # segment frames stay NARROW (ids + segment key + capped length —
    # measured faster than carrying the capped strings through the ×66
    # window explode); candidates dedupe once, then the strings join
    # back by id. The length column feeds the LOSSLESS length-band
    # prefilter on the candidate join (r14): two strings whose lengths
    # differ by more than max_dist need more than max_dist edits, so
    # banded levenshtein would return -1 anyway — filtering at the
    # candidate join prunes them before the distinct and the two
    # string back-joins instead of after the distance computation.
    seg_b = b_long.select(
        "_blk",
        "id_b",
        F.length("_s_b").alias("_lb"),
        F.posexplode(
            F.array(
                *[F.substring("_s_b", starts[i], seg_lens[i]) for i in range(n_seg)]
            )
        ).alias("_si", "_seg"),
    )
    # a-side windows: each segment may appear shifted by the net
    # insert/delete count before it, bounded by ±max_dist (clamped at
    # position 1 — nothing shifts left of the string start)
    wins = [
        (i, d)
        for i in range(n_seg)
        for d in range(-max_dist, max_dist + 1)
        if starts[i] + d >= 1
    ]
    seg_a = (
        a_hot.select(
            "_blk",
            "id_a",
            F.length("_s_a").alias("_la"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("_si"),
                            F.lit(d).alias("_d"),
                            F.substring("_s_a", starts[i] + d, seg_lens[i]).alias(
                                "_seg"
                            ),
                        )
                        for i, d in wins
                    ]
                )
            ).alias("_w"),
        )
        .select(
            "_blk",
            "id_a",
            "_la",
            F.col("_w._si").alias("_si"),
            F.col("_w._d").alias("_d"),
            F.col("_w._seg").alias("_seg"),
        )
        # windows past the a-string's end produce '' — no (non-empty)
        # b segment can equal them, so dropping the rows is lossless
        # and shrinks the explode output before the shuffle
        .where(F.col("_seg") != "")
    )
    # multi-match-aware shift filter (PassJoin's position lemma, r14):
    # an untouched b-segment matched at shift d needs ≥|d| ins/dels
    # BEFORE it (the net shift) and ≥|Δ−d| AFTER it (the remaining
    # length difference, Δ = len_a − len_b), so |d| + |Δ−d| > max_dist
    # rules this witness out. The TRUE alignment of the pigeonhole's
    # untouched segment always satisfies the bound, so pruning the
    # others is lossless — and it subsumes the plain length band
    # (|Δ| ≤ max_dist follows by triangle inequality).
    delta = seg_a["_la"] - seg_b["_lb"]
    cand = (
        seg_a.join(
            seg_b,
            (seg_a["_blk"] == seg_b["_blk"])
            & (seg_a["_si"] == seg_b["_si"])
            & (seg_a["_seg"] == seg_b["_seg"])
            & (F.abs(seg_a["_d"]) + F.abs(delta - seg_a["_d"]) <= max_dist),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    pigeonholed = (
        cand.join(a_hot.select("id_a", "_s_a"), "id_a")
        .join(b_long.select("id_b", "_s_b"), "id_b")
        .select("id_a", "id_b", dist.alias("edit_dist"))
        .where(keep)
    )
    return pigeonholed.unionByName(direct)
