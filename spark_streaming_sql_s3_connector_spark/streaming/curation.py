"""Flagship composed pipeline: connector stream → keep-first line dedup
→ exact dedup → per-language quality gate → sequence packing, under
exactly-once.

The two halves of this repo — the S3-event connector plane (sources/,
queueing/, state/) and the LLM-curation operators (operators/,
functions/) — compose here into ONE streaming pipeline with a single
checkpoint story, the composition analog of the reference's restore
contract (S3ConnectorSourceItSuite.scala:640-724: kill the query
mid-corpus, restart on the same checkpoint, results equal the
uninterrupted run):

- per micro-batch (:func:`process_curation_batch`): corpus-global
  keep-first line dedup (``streaming/line_dedup``), then exact dedup of
  the line-deduped text vs everything seen (``streaming/exact_dedup``)
  — both incremental, bloom-screened, overwrite-by-batch-dir replay
  convergent; plus a tiny ``(doc_id, lang)`` side table per batch for
  the finalization gate.
- at corpus end (:func:`finalize_curation`): join the surviving docs,
  score the DEDUPED text, keep the top fraction per language
  (``keep_top_fraction`` — rank-exact), and concat-and-split pack the
  survivors (``pack_concat``).

Law (tested, including kill/restart mid-corpus): finalize over
range-ordered streamed batches equals :func:`batch_curation` on the
union corpus — because each incremental stage's "first in (batch, doc)
order" coincides with "first in doc order" when batches partition the
id space in order, and the finalization stages are pure functions of
the (identical) surviving set.

Scale shape: the streaming stages inherit their components' stories
(line-keyed partial aggs, shard-pruned history joins, per-shard bloom
bitmaps); the finalization is one gate shuffle on ``lang`` plus the
pack's one shard-window shuffle. Nothing in the composition adds a new
scan of the raw corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import quality_score
from spark_streaming_sql_s3_connector_spark.operators.packing import pack_concat
from spark_streaming_sql_s3_connector_spark.operators.sampling import (
    keep_top_fraction,
)
from spark_streaming_sql_s3_connector_spark.streaming import exact_dedup, line_dedup


def _line_index(pipeline_dir: str) -> str:
    return os.path.join(pipeline_dir, "line_index")


def _exact_index(pipeline_dir: str) -> str:
    return os.path.join(pipeline_dir, "exact_index")


def _meta_dir(pipeline_dir: str, batch_id: int) -> str:
    return os.path.join(pipeline_dir, "_meta", f"batch={batch_id}")


def _profile_dir(pipeline_dir: str) -> str:
    return os.path.join(pipeline_dir, "monitor", "profile")


def _lang_counts_dir(pipeline_dir: str) -> str:
    return os.path.join(pipeline_dir, "monitor", "lang_counts")


def process_curation_batch(
    batch: DataFrame,
    batch_id: int,
    pipeline_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    expected_total_items: int = 1_000_000,
    monitor: bool = True,
) -> None:
    """One micro-batch of the composed pipeline. Every write is keyed by
    ``batch=<id>`` and overwritten on replay — the same convergence
    argument as each component stage.

    ``monitor`` (default on) additionally maintains the pipeline's
    observability plane from the SAME micro-batch, at delta-log cost
    (one wide partial row + one |langs|-row count delta per trigger,
    both batch-id-keyed ⇒ replay-convergent like everything else here):
    the incremental ADMITTED-corpus profile (``streaming/profile``) and
    the language distribution counts (``streaming/drift``) — read them
    with :func:`read_curation_profile` / :func:`read_curation_drift`
    while the stream runs to catch schema/null/range anomalies and
    distribution shift BEFORE finalization."""
    spark = batch.sparkSession
    # (doc_id, lang) side table for the finalization gate
    batch.select(F.col(id_col), F.col(lang_col)).write.mode("overwrite").parquet(
        _meta_dir(pipeline_dir, batch_id)
    )
    if monitor:
        from spark_streaming_sql_s3_connector_spark.streaming.drift import (
            count_batch,
        )
        from spark_streaming_sql_s3_connector_spark.streaming.profile import (
            profile_batch,
        )

        profile_batch(
            batch.select(
                F.col(id_col),
                F.col(lang_col),
                F.length(F.col(text_col)).alias("_text_chars"),
            ),
            batch_id,
            _profile_dir(pipeline_dir),
        )
        count_batch(batch, batch_id, _lang_counts_dir(pipeline_dir), lang_col)
    line_dedup.process_batch(
        batch.select(F.col(id_col), F.col(text_col)),
        batch_id,
        _line_index(pipeline_dir),
        text_col=text_col,
        id_col=id_col,
        expected_total_items=expected_total_items,
    )
    # chain: this batch's line-deduped docs (committed state) feed the
    # exact-dedup stage within the same trigger
    deduped = spark.read.parquet(
        line_dedup._docs_dir(_line_index(pipeline_dir), batch_id)
    )
    exact_dedup.process_batch(
        deduped,
        batch_id,
        _exact_index(pipeline_dir),
        text_col="deduped_text",
        id_col=id_col,
        expected_total_items=expected_total_items,
    )


def streaming_curation(
    stream: DataFrame,
    pipeline_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    expected_total_items: int = 1_000_000,
    monitor: bool = True,
):
    """Run the composed pipeline as a foreachBatch stream; returns the
    StreamingQuery. Restart-safe: the checkpoint replays at most the
    last uncommitted batch, whose stage outputs all overwrite."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        process_curation_batch(
            batch,
            batch_id,
            pipeline_dir,
            text_col=text_col,
            id_col=id_col,
            lang_col=lang_col,
            expected_total_items=expected_total_items,
            monitor=monitor,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_curation_profile(spark: SparkSession, pipeline_dir: str) -> DataFrame:
    """Live profile of everything the pipeline has ADMITTED (same schema
    as operators/profile.profile_table; n_distinct is an HLL
    estimate)."""
    from spark_streaming_sql_s3_connector_spark.streaming.profile import (
        read_profile,
    )

    return read_profile(spark, _profile_dir(pipeline_dir))


def read_curation_drift(
    spark: SparkSession, pipeline_dir: str, baseline_counts: DataFrame
) -> DataFrame:
    """Language-distribution drift of the admitted stream vs a baseline
    ``bucket | n`` frame (operators/drift.categorical_drift schema;
    ``SUM(psi_term)`` is the alarm)."""
    from spark_streaming_sql_s3_connector_spark.streaming.drift import read_drift

    return read_drift(spark, _lang_counts_dir(pipeline_dir), baseline_counts)


def compact_curation_state(spark: SparkSession, pipeline_dir: str) -> None:
    """Maintenance: fold both stages' delta indexes into their versioned
    bases. Uses each compactor's safe default (never folds the newest
    delta — the only batch a restart could replay; see
    line_dedup.compact_index for why that guard is stricter here than
    label-skew)."""
    line_dedup.compact_index(spark, _line_index(pipeline_dir))
    exact_dedup.compact_index(
        spark,
        _exact_index(pipeline_dir),
        upto_batch=_newest_delta(_exact_index(pipeline_dir)),
    )


def _newest_delta(index_dir: str):
    from spark_streaming_sql_s3_connector_spark.streaming.exact_dedup import (
        _delta_ids,
    )

    ids = _delta_ids(index_dir)
    return max(ids) if ids else None


def finalize_curation(
    spark: SparkSession,
    pipeline_dir: str,
    id_col: str = "doc_id",
    frac: float = 0.4,
    capacity: int = 128,
    num_shards: int = 8,
    approx_gate: bool = False,
) -> DataFrame:
    """Corpus-end finalization: gate + pack the streamed survivors.
    Returns one row per packed doc: (doc_id, lang, qscore, shard,
    start_offset, n_tokens, seq_first, seq_last).

    ``approx_gate``: the default rank-exact gate sorts each language
    stratum in ONE task (partitionBy(lang) has only a handful of
    strata) — fine up to millions of docs per language, the profiled
    super-linear stage past that (SCALING.md audit). ``approx_gate=
    True`` switches to ``quantile_gate_approx``: per-group
    approx_percentile thresholds broadcast back as a map-side filter —
    no per-stratum sort, the 100 TB path. Kept fraction then tracks
    ``frac`` to sketch accuracy instead of exactly."""
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        quantile_gate_approx,
    )

    docs = line_dedup.read_deduped_docs(spark, _line_index(pipeline_dir))
    uniq = (
        exact_dedup.read_unique_ids(spark, _exact_index(pipeline_dir))
        .select(F.col("doc_id").alias(id_col))
    )
    meta = (
        spark.read.parquet(os.path.join(pipeline_dir, "_meta"))
        .select(id_col, "lang")
    )
    survivors = docs.join(uniq, id_col).join(meta, id_col)
    scored = survivors.withColumn(
        "qscore", F.round(quality_score(F.col("deduped_text")), 6)
    )
    if approx_gate:
        # collect_thresholds: |langs| driver rows, and the gate becomes
        # a literal-map filter — one evaluation of the quality score on
        # the probe side instead of the join form's pushed-isnotnull
        # re-evaluation (see quantile_gate_approx's docstring)
        gated = quantile_gate_approx(
            scored, "qscore", ["lang"], frac, collect_thresholds=True
        )
    else:
        gated = keep_top_fraction(scored, "qscore", ["lang"], frac, id_col=id_col)
    packed = pack_concat(
        gated, id_col, capacity, text_col="deduped_text", num_shards=num_shards
    )
    return (
        gated.select(id_col, "lang", "qscore")
        .join(packed, id_col)
        .orderBy(id_col)
    )


def batch_curation(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    frac: float = 0.4,
    capacity: int = 128,
    num_shards: int = 8,
) -> DataFrame:
    """The batch twin: identical semantics in one job over the full
    corpus — line dedup (keep first in (doc, pos) order), exact dedup of
    the deduped text (keep min id per normalized text), per-language
    top-fraction gate on the deduped text's quality score, pack. The
    streaming law asserts finalize == this on the union corpus."""
    from spark_streaming_sql_s3_connector_spark.operators.dedup import (
        normalized_text,
    )
    from spark_streaming_sql_s3_connector_spark.operators.web import (
        dedup_lines_keep_first,
    )

    kf = dedup_lines_keep_first(
        docs.select(F.col(id_col), F.col(lang_col), F.col(text_col)),
        text_col,
        id_col,
    )
    # exact dedup on the DEDUPED text: keeper = min id per normalized
    # text, keyed by md5 so the shuffle carries 16-byte keys, not bodies
    keepers = (
        kf.groupBy(
            F.md5(F.encode(normalized_text(F.col("deduped_text")), "UTF-8")).alias("_k")
        )
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    survivors = kf.join(keepers, id_col).select(
        id_col, F.col(lang_col).alias("lang"), "deduped_text"
    )
    scored = survivors.withColumn(
        "qscore", F.round(quality_score(F.col("deduped_text")), 6)
    )
    gated = keep_top_fraction(scored, "qscore", ["lang"], frac, id_col=id_col)
    packed = pack_concat(
        gated, id_col, capacity, text_col="deduped_text", num_shards=num_shards
    )
    return (
        gated.select(id_col, "lang", "qscore")
        .join(packed, id_col)
        .orderBy(id_col)
    )


def propagate_doc_deletes(
    docs: DataFrame,
    batch_id: int,
    text_col: str,
    id_col: str,
    ann_index_dir: str | None = None,
    term_stats_dir: str | None = None,
    vec_col: str | None = None,
    emb_docs: DataFrame | None = None,
    exact_index_dir: str | None = None,
    line_index_dir: str | None = None,
    passage_index_dir: str | None = None,
    minhash_index_dir: str | None = None,
    policy: str = "takedown",
) -> None:
    """ONE delete, EVERY persisted state (r9 serving, r10 screening):
    when curation drops documents — retention policy, takedown,
    decontamination — the drop must reach every index still serving or
    screening against them. This is the single entry point: tombstones
    the ids out of the persisted ANN index
    (`operators/ann_index.delete_from_ann_index`), writes the
    negated-stats + posting markers into the lexical state
    (`streaming/term_stats.delete_docs_from_term_stats`), and — under
    the ``forget`` policy — writes forget markers into the four
    dedup-family SCREENING indexes (exact md5 keys, line keys, passage
    gram keys, MinHash bands; `exact_dedup.delete_docs_from_screen`).
    All states share the insert-order delete semantics (a marker at
    batch t kills rows inserted before t; later re-inserts revive) and
    the overwrite-by-batch-dir replay convergence, so one monotonic
    batch-id sequence drives the whole lifecycle. Pass only the states
    the pipeline maintains; ``emb_docs`` (id + vector) defaults to
    ``docs`` when the doc frame carries the vector column.

    ``policy`` splits WHY the doc is deleted, because the screening
    states must behave oppositely per reason:

    - ``"takedown"`` (default): the CONTENT is banned (legal removal,
      contamination). Serving states delete; screening states keep
      their keys, so a re-crawl of the same content is still rejected
      as a duplicate — suppression is the point.
    - ``"forget"``: the ROW is expiring (retention, consent
      withdrawal). Serving states delete AND screening states forget
      the doc's keys, so a legitimate future re-crawl is admitted as
      new instead of silently bouncing off a ghost entry — the same
      semantics as the reference's expiry re-admission rule
      (RocksDBS3SourceLog.scala:301-305: expired files become "new"
      again), one level up.

    Laws (tested): after propagation, neither BM25-from-postings nor
    ANN serving returns a deleted id, the lexical stats equal a rebuild
    over the survivors, forget→re-ingest admits, takedown→re-ingest
    still rejects, and each screening index equals a rebuild over the
    surviving unique docs."""
    if policy not in ("takedown", "forget"):
        raise ValueError(f"policy must be 'takedown' or 'forget', got {policy!r}")
    if ann_index_dir is not None:
        from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
            delete_from_ann_index,
        )

        src = emb_docs if emb_docs is not None else docs
        delete_from_ann_index(
            src.select(F.col(id_col)), ann_index_dir, batch_id=batch_id
        )
    if term_stats_dir is not None:
        from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
            delete_docs_from_term_stats,
        )

        delete_docs_from_term_stats(
            docs, batch_id, term_stats_dir, text_col, id_col
        )
    if policy == "forget":
        from spark_streaming_sql_s3_connector_spark.streaming.exact_dedup import (
            delete_docs_from_screen,
        )

        for d in (
            exact_index_dir,
            line_index_dir,
            passage_index_dir,
            minhash_index_dir,
        ):
            if d is not None:
                delete_docs_from_screen(docs, batch_id, d, id_col=id_col)
