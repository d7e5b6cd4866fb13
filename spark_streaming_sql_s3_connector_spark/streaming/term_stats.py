"""Streaming lexical-retrieval statistics — the incremental half of
BM25 (`operators/retrieval.bm25_search`).

Batch BM25 computes its corpus statistics (N, Σdl, per-term document
frequency) with an extra corpus scan per query. Over a STREAMING
corpus those statistics are pure sums — every micro-batch contributes
``(term → +df)`` and ``(+n_docs, +Σdl)`` deltas — so we persist them
in the rollup delta-log layout and BM25 serves from state: ONE corpus
scan per query, statistics always current, no history re-read.

Correctness precondition (documented, tested): a document must be
counted in exactly ONE batch — which is precisely what the upstream
connector + streaming exact dedup guarantee in this repo's curation
pipeline. Replays of a batch OVERWRITE that batch's own delta dir, so
redelivery converges instead of double-counting (the
``streaming/rollup.py`` exactly-once recipe, reused verbatim: delta
dir per batch id, ``base/v=<n>`` + atomic pointer, readers union base
+ live deltas).

At 100 TB: the per-batch work is one explode of the batch (not the
corpus) + a term-keyed count with map-side combine; the delta log
grows by distinct-terms-per-batch rows per trigger;
``compact_term_stats`` folds it to one base on any schedule. Serving
reads only the query terms' rows (a broadcast-scale slice) plus the
one corpus row.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import tokenize
from spark_streaming_sql_s3_connector_spark.streaming.rollup import (
    _delta_dir,
    _delta_ids,
    _read_pointer,
    _write_pointer,
)

_TERMS = "terms"
_CORPUS = "corpus"


def term_stats_batch(
    batch: DataFrame, batch_id: int, sink_dir: str, text_col: str, id_col: str
) -> None:
    """One micro-batch's contribution: per-term document-frequency
    deltas and the one corpus-totals row, each OVERWRITING this batch's
    own delta dir (idempotent on replay)."""
    toks = tokenize(F.lower(F.col(text_col)))
    terms = (
        batch.select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    corpus = batch.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size(toks)), F.lit(0)).cast("bigint").alias("sum_dl"),
    )
    terms.write.mode("overwrite").parquet(
        _delta_dir(os.path.join(sink_dir, _TERMS), batch_id)
    )
    corpus.write.mode("overwrite").parquet(
        _delta_dir(os.path.join(sink_dir, _CORPUS), batch_id)
    )


def streaming_term_stats(
    stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    text_col: str,
    id_col: str,
    trigger_available_now: bool = False,
):
    """Maintain BM25 corpus statistics off any stream (incl. the
    s3-connector source). Returns the StreamingQuery. Law (tested):
    after any sequence of triggers and replays, the persisted stats
    equal the batch statistics over the union of admitted docs."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        term_stats_batch(batch, batch_id, sink_dir, text_col, id_col)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _live(spark: SparkSession, subdir: str) -> list[DataFrame]:
    ptr = _read_pointer(subdir)
    frames = []
    if ptr is not None:
        frames.append(spark.read.parquet(os.path.join(subdir, "base", f"v={ptr}")))
    for bid in _delta_ids(subdir):
        if ptr is None or bid > ptr:
            frames.append(spark.read.parquet(_delta_dir(subdir, bid)))
    if not frames:
        raise FileNotFoundError(f"no term-stats state under {subdir}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def read_term_stats(
    spark: SparkSession, sink_dir: str, terms: Optional[Sequence[str]] = None
) -> DataFrame:
    """Current per-term document frequencies: ``term | df``. Pass
    ``terms`` to read only a query's slice (the serving path — the
    filter prunes before the fold)."""
    allt = _live(spark, os.path.join(sink_dir, _TERMS))
    if terms is not None:
        allt = allt.where(F.col("term").isin(list(terms)))
    return allt.groupBy("term").agg(F.sum("df").alias("df"))


def read_corpus_stats(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Current corpus totals: one row ``n_docs | sum_dl``."""
    allc = _live(spark, os.path.join(sink_dir, _CORPUS))
    return allc.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    )


def compact_term_stats(
    spark: SparkSession, sink_dir: str, upto_batch: Optional[int] = None
) -> None:
    """Fold committed delta dirs into ``base/v=<n>`` for both state
    tables (atomic pointer flip; correctness never depends on when this
    runs). ``upto_batch`` defaults to the highest delta present — pass
    the last COMMITTED batch id when compacting a live stream, exactly
    as ``streaming/exact_dedup.compact_index`` documents."""
    for sub, keys in ((_TERMS, ["term"]), (_CORPUS, [])):
        subdir = os.path.join(sink_dir, sub)
        ptr = _read_pointer(subdir)
        ids = [
            b
            for b in _delta_ids(subdir)
            if (ptr is None or b > ptr)
            and (upto_batch is None or b <= upto_batch)
        ]
        if not ids:
            continue
        frames = []
        if ptr is not None:
            frames.append(
                spark.read.parquet(os.path.join(subdir, "base", f"v={ptr}"))
            )
        frames.extend(spark.read.parquet(_delta_dir(subdir, b)) for b in ids)
        allf = frames[0]
        for f in frames[1:]:
            allf = allf.unionByName(f)
        if keys:
            folded = allf.groupBy(*keys).agg(F.sum("df").alias("df"))
        else:
            folded = allf.agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("sum_dl").cast("bigint").alias("sum_dl"),
            )
        new_v = max(ids)
        folded.write.mode("overwrite").parquet(
            os.path.join(subdir, "base", f"v={new_v}")
        )
        _write_pointer(subdir, new_v)
        import shutil

        for b in ids:
            shutil.rmtree(_delta_dir(subdir, b), ignore_errors=True)


def bm25_search_indexed(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    sink_dir: str,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 over a corpus whose statistics live in persisted term-stats
    state: identical semantics (and identical results — law-tested) to
    ``operators/retrieval.bm25_search`` on the same corpus, but the
    stats scan is replaced by a query-term-sliced state read, so the
    query costs ONE corpus scan instead of two and the stats stay
    current as the stream appends."""
    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        _bm25_contrib,
    )

    spark = corpus.sparkSession
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if any(t is None or t == "" or t != t.strip().lower() for t in terms):
        raise ValueError("query_terms must be lowercase and stripped")
    dfreq = {
        r.term: int(r.df)
        for r in read_term_stats(spark, sink_dir, terms).collect()
    }
    tot = read_corpus_stats(spark, sink_dir).collect()[0]
    n_docs, sum_dl = int(tot.n_docs), int(tot.sum_dl)
    if n_docs == 0:
        raise ValueError("term-stats state is empty")
    avgdl = F.lit(float(sum_dl)) / F.lit(float(n_docs))
    toks = tokenize(F.lower(F.col(text_col)))

    def _count_of(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    live = [t for t in terms if dfreq.get(t, 0) > 0]
    narrow = corpus.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        *[_count_of(t).alias(f"_tf_{i}") for i, t in enumerate(live)],
    )
    contribs = [
        F.when(
            F.col(f"_tf_{i}") > 0,
            _bm25_contrib(
                F.col(f"_tf_{i}"), F.lit(dfreq[t]), F.col("_dl"),
                F.lit(n_docs), avgdl, k1, b,
            ),
        ).otherwise(F.lit("0").cast("decimal(20,7)"))
        for i, t in enumerate(live)
    ]
    matched = [(F.col(f"_tf_{i}") > 0).cast("int") for i in range(len(live))]
    if not live:
        return narrow.select(
            F.col(id_col),
            F.lit(None).cast("double").alias("score"),
            F.lit(0).alias("n_matched"),
            F.col("_dl").cast("bigint").alias("dl"),
        ).where(F.lit(False))
    return (
        narrow.select(
            F.col(id_col),
            sum(contribs[1:], contribs[0]).alias("_s"),
            sum(matched[1:], matched[0]).alias("n_matched"),
            F.col("_dl").cast("bigint").alias("dl"),
        )
        .where(F.col("n_matched") > 0)
        .orderBy(F.col("_s").desc(), F.col(id_col).asc())
        .limit(top_k)
        .select(
            F.col(id_col),
            F.round(F.col("_s"), 6).cast("double").alias("score"),
            "n_matched",
            "dl",
        )
    )
