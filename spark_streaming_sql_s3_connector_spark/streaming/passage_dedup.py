"""Streaming keep-FIRST passage dedup vs everything seen before.

`operators/dedup.passage_dedup_keep_first` answers the batch question:
mask every repeated whitespace k-gram's non-first occurrences and
rebuild each doc from surviving tokens. This module answers it
INCREMENTALLY: as documents stream in, a k-gram occurrence is a
duplicate iff its key was already kept — by an earlier batch, or by an
earlier (doc, start) within this batch — and each document is emitted
rebuilt with every duplicated occurrence's k token positions masked.
The gram-key index persists between triggers with the same layout and
crash story as `streaming/exact_dedup.py` (whose helpers this module
reuses verbatim): delta parquet under ``_new/batch=<id>``, shard-pruned
history joins, an OR-idempotent Bloom bitmap as pure acceleration,
overwrite-by-batch-dir replay convergence.

Per-batch recipe:

1. explode the batch's docs into k-gram occurrences
   ``(_id, start, key=md5(gram), shard)`` (same tokenization and
   16-byte gram rekey as the batch operator);
2. within-batch first per key: ``min(struct(id, start))`` — partial
   agg, no window over a hot gram;
3. screen the firsts against the persisted key index (bloom-negative ⇒
   guaranteed new; positives anti-join the shard-pruned history);
4. an occurrence is a DUP iff it is not a surviving first; dups explode
   to their k covered token positions;
5. rebuild each doc from uncovered tokens → ``_docs/batch=<id>``
   (every input doc gets a row; a doc that was an exact copy of
   earlier-seen text comes back empty);
6. append the newly-kept keys under ``_new/batch=<id>``; OR the bloom.

Law (tested): processing doc-id-range-ordered batches incrementally
equals the batch operator on the union — "first in (batch, doc, start)
order" and "first in (doc, start) order" coincide when batches
partition the id space in order.

Scale shape: index rows are (key, keeper id, shard) — ~40 B per
DISTINCT k-gram ever kept. That is token-scale state (the honest cost
any substring-dedup index pays — a suffix array is larger), which is
exactly why the index inherits exact_dedup's sharded layout, bloom
screen, and compactor instead of a driver-side structure. Each trigger
shuffles the batch's grams once (min-struct partial agg) and joins only
the bloom-positive slice against pruned history shards; the
covered-position explode is bounded by k × dup occurrences.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.streaming.exact_dedup import (
    _N_SHARDS,
    _batch_probe_column,
    _index_frames,
    _new_dir,
    _shard_params,
    _update_shard_bitmaps,
)


def _docs_dir(index_dir: str, batch_id: int) -> str:
    return os.path.join(index_dir, "_docs", f"batch={batch_id}")


def _tokenized(batch: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from spark_streaming_sql_s3_connector_spark.functions.text import tokenize

    return batch.select(
        F.col(id_col).alias("_id"), tokenize(F.col(text_col)).alias("_toks")
    )


def _gram_occurrences(base: DataFrame, k: int) -> DataFrame:
    """(_id, start, key, _shard) — 0-based start positions, md5 gram
    keys (the same rekey as the batch operator, so history joins ship
    16-byte keys, never gram text)."""
    gram_expr = (
        f"transform(sequence(0, size(_toks) - {k}), "
        f"i -> md5(encode(concat_ws(' ', slice(_toks, i + 1, {k})), 'UTF-8')))"
    )
    occ = (
        base.where(F.size("_toks") >= k)
        .select("_id", F.posexplode(F.expr(gram_expr)))
        .withColumnRenamed("pos", "start")
        .withColumnRenamed("col", "key")
    )
    return occ.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col("key")), F.lit(_N_SHARDS)).cast("int")
    )


def process_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    expected_total_items: int = 1_000_000,
    fpp: float = 0.01,
) -> None:
    """One micro-batch of the incremental keep-first passage dedup.
    Overwrites its ``batch=<id>`` outputs — replay converges."""
    if k < 2:
        raise ValueError("k must be >= 2")
    spark = batch.sparkSession
    sm_bits, sk = _shard_params(expected_total_items, fpp)

    base = _tokenized(batch, text_col, id_col).persist()
    occ = _gram_occurrences(base, k).persist()
    cached_matched = None  # assigned in the history branch; finally unpersists
    flagged = None
    try:
        firsts = (
            occ.groupBy("key", "_shard")
            .agg(F.min(F.struct("_id", "start")).alias("_f"))
            .select(
                "key",
                "_shard",
                F.col("_f._id").alias("_id"),
                F.col("_f.start").alias("start"),
            )
            .persist()
        )
        frames = _index_frames(spark, index_dir, before_batch=batch_id)
        if frames:
            hist = frames[0]
            for fr in frames[1:]:
                hist = hist.unionByName(fr)
            probe = _batch_probe_column(
                index_dir, firsts, sm_bits, sk, expected_total_items, fpp
            )
            if probe is not None:
                flagged = firsts.withColumn("_maybe", probe).persist()
                negatives = flagged.where(~F.col("_maybe")).drop("_maybe")
                cand = flagged.where(F.col("_maybe")).drop("_maybe")
            else:
                negatives = firsts.limit(0)
                cand = firsts
            shards = [r["_shard"] for r in cand.select("_shard").distinct().collect()]
            hist = hist.where(F.col("_shard").isin(shards))
            # persisted: `matched` sits under BOTH the rebuilt-docs and
            # the index-delta writes — without the cache each write
            # re-runs the pruned HISTORY scan (the r12 line/exact fix)
            matched = (
                hist.join(F.broadcast(cand.select("key")), "key", "left_semi")
                .select("key")
                .distinct()
                .persist()
            )
            cached_matched = matched
            new_firsts = negatives.unionByName(
                cand.join(F.broadcast(matched), "key", "left_anti")
            )
        else:
            new_firsts = firsts

        # an occurrence is a dup unless it IS a surviving first
        dup_occ = occ.join(
            new_firsts.select(
                F.col("key").alias("_k"),
                F.col("_id").alias("_fid"),
                F.col("start").alias("_fstart"),
            ),
            (F.col("key") == F.col("_k"))
            & (F.col("_id") == F.col("_fid"))
            & (F.col("start") == F.col("_fstart")),
            "left_anti",
        ).select("_id", "start")
        covered = dup_occ.select(
            "_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(k - 1))
            ).alias("_pos"),
        ).distinct()
        tok_pos = base.select("_id", F.posexplode("_toks").alias("_pos", "_tok"))
        kept = tok_pos.join(covered, ["_id", "_pos"], "left_anti")
        rebuilt = kept.groupBy("_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                    lambda s: s["_tok"],
                ),
                " ",
            ).alias("deduped_text"),
            F.count("*").alias("n_kept_tokens"),
        )
        out = (
            batch.select(F.col(id_col))
            .join(rebuilt, F.col(id_col) == F.col("_id"), "left")
            .select(
                F.col(id_col),
                F.coalesce("deduped_text", F.lit("")).alias("deduped_text"),
                F.coalesce("n_kept_tokens", F.lit(0)).cast("bigint").alias(
                    "n_kept_tokens"
                ),
            )
        )
        out.write.mode("overwrite").parquet(_docs_dir(index_dir, batch_id))
        # clustered delta write — one file per shard, not tasks×shards
        # slivers (see exact_dedup.process_batch)
        new_firsts.select("_id", "key", "_shard").repartition("_shard").write.mode(
            "overwrite"
        ).partitionBy("_shard").parquet(_new_dir(index_dir, batch_id))

        _update_shard_bitmaps(
            spark, index_dir, firsts.select("key", "_shard"), sm_bits, sk
        )
    finally:
        base.unpersist()
        occ.unpersist()
        if flagged is not None:
            flagged.unpersist()
        if cached_matched is not None:
            cached_matched.unpersist()


def read_deduped_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    """(doc_id, deduped_text, n_kept_tokens) across all processed batches."""
    return spark.read.parquet(os.path.join(index_dir, "_docs"))


def streaming_passage_dedup(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    expected_total_items: int = 1_000_000,
    fpp: float = 0.01,
):
    """Start the incremental keep-first passage dedup as a foreachBatch
    stream; returns the StreamingQuery."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        process_batch(
            batch,
            batch_id,
            index_dir,
            text_col=text_col,
            id_col=id_col,
            k=k,
            expected_total_items=expected_total_items,
            fpp=fpp,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_index(spark: SparkSession, index_dir: str, upto_batch=None):
    """Fold the gram-key deltas into a versioned base — exactly
    `streaming/line_dedup.compact_index`'s situation: the index layout
    is exact_dedup's, so its compactor applies verbatim, and the replay
    stakes match line dedup's (folding a not-yet-committed batch makes
    its replay see its own grams as history and rewrite
    ``_docs/batch=N`` fully masked). ``upto_batch=None`` therefore
    derives the always-safe default — fold only deltas strictly below
    the newest delta id; pass ``<newest id> + 1`` after a clean stop."""
    from spark_streaming_sql_s3_connector_spark.streaming.exact_dedup import (
        _delta_ids,
        compact_index as _compact,
    )

    if upto_batch is None:
        ids = _delta_ids(index_dir)
        if ids:
            upto_batch = max(ids)
    return _compact(spark, index_dir, upto_batch=upto_batch)
