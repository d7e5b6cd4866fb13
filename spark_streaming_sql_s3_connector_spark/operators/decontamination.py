"""Benchmark decontamination for training-data pipelines.

Before training, a corpus must be screened against evaluation benchmarks:
any training document sharing word n-grams with an eval document leaks
test data into the model. The standard recipe (GPT-3 appendix C /
PaLM-style 8-gram screens) is an n-gram overlap join:

- normalize BOTH sides (lowercase, strip punctuation, collapse
  whitespace) — without this, trivially-reformatted eval text (case,
  punctuation, spacing) evades the screen;
- build the distinct word n-gram set of the (small) benchmark side;
- explode each training doc into its distinct n-grams;
- join and count, per doc, how many of its n-grams hit the benchmark set.

Scale shape (the 100 TB design):

- The benchmark side is an eval set — thousands of docs, millions of
  n-grams at worst — so its distinct n-gram set is broadcast and the
  whole screen is ONE map-side join + ONE aggregation shuffle of
  ``(doc_id)`` rows. The corpus is never shuffled by n-gram.
- With ``broadcast_benchmark=False`` the join falls back to a shuffled
  equi-join on the n-gram (both sides spread by hash — no skew beyond
  stop-n-grams, which the benchmark side's ``distinct`` bounds to one
  row each).
- Per-doc n-gram explode fans out ~L rows for an L-token doc, all
  consumed by a partial count-aggregate map-side before the one shuffle.

No Python UDF anywhere on the hot path except the Arrow-vectorized
``_shingles_udf`` shared with the n-gram Jaccard join (one pass,
batched); normalization is a pure JVM regexp expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.dedup import (
    _shingles_udf,
    _spread,
)

_RESERVED = {"_id", "_hit", "shingle"}


def screen_normalize(col) -> F.Column:
    """Decontamination-grade text normalization: lowercase, every run of
    non-alphanumeric characters collapsed to a single space, trimmed.
    Applied to BOTH corpus and benchmark so case/punctuation/whitespace
    variants of benchmark text cannot evade the n-gram screen."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def _guard_columns(df: DataFrame, what: str) -> None:
    clash = _RESERVED & set(df.columns)
    if clash:
        raise ValueError(
            f"contamination_check: rename reserved {what} columns first: {sorted(clash)}"
        )


def _non_null_id(id_col: str) -> F.Column:
    # Coalesce is lazily evaluated per row, so raise_error fires only when
    # a NULL id actually occurs — a doc we cannot identify cannot be
    # tracked through the screen (it would silently bypass the anti-join
    # in `decontaminate`), so it is a hard error, not a silent survivor.
    return F.coalesce(
        F.col(id_col),
        F.raise_error(
            F.lit(
                f"contamination_check: NULL value in id column '{id_col}' — "
                "NULL-id docs cannot be screened (they would bypass the "
                "decontamination anti-join); filter or assign ids first"
            )
        ),
    )


def benchmark_ngram_set(
    bench: DataFrame, text_col: str, n: int = 8, normalize: bool = True
) -> DataFrame:
    """Distinct word ``n``-grams of the benchmark corpus, one row per
    n-gram (column ``shingle``). Docs shorter than ``n`` tokens
    contribute their whole text as a single n-gram (same convention as
    the near-dup shinglers, so screens compose with dedup)."""
    text = screen_normalize(F.col(text_col)) if normalize else F.col(text_col)
    return (
        bench.select(F.explode_outer(_shingles_udf(n)(text)).alias("shingle"))
        .where(F.col("shingle").isNotNull())
        .distinct()
    )


def contamination_check(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    broadcast_benchmark: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """Per-document contamination screen of ``docs`` against ``bench``.

    Returns one row per doc: ``(id_col, n_grams, n_overlap,
    contamination_frac)`` where ``n_overlap`` counts the doc's distinct
    n-grams that appear anywhere in the benchmark and
    ``contamination_frac = n_overlap / n_grams``. Docs with no tokens
    yield ``n_grams = 0`` and ``n_overlap = 0``. A NULL value in
    ``id_col`` raises at execution time (see ``_non_null_id``).

    One explode + one left join (broadcast by default) + one groupBy on
    the doc id — the corpus is shuffled once, keyed by doc id.
    """
    _guard_columns(docs, "docs")
    bench_set = benchmark_ngram_set(
        bench, bench_text_col or text_col, n, normalize=normalize
    ).withColumn("_hit", F.lit(1))
    if broadcast_benchmark:
        bench_set = F.broadcast(bench_set)
    doc_text = screen_normalize(F.col(text_col)) if normalize else F.col(text_col)
    exploded = _spread(docs).select(
        _non_null_id(id_col).alias("_id"),
        F.explode_outer(_shingles_udf(n)(doc_text)).alias("shingle"),
    )
    per_doc = (
        exploded.join(bench_set, "shingle", "left")
        .groupBy("_id")
        .agg(
            F.count(F.col("shingle")).alias("n_grams"),
            F.count(F.col("_hit")).alias("n_overlap"),
        )
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_grams",
        "n_overlap",
        F.when(
            F.col("n_grams") > 0, F.col("n_overlap") / F.col("n_grams")
        )
        .otherwise(F.lit(0.0))
        .alias("contamination_frac"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    max_overlap: int = 0,
    broadcast_benchmark: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """Drop every doc whose benchmark n-gram overlap exceeds
    ``max_overlap`` (default: any overlap). Returns ``docs`` rows that
    survive, original schema preserved. NULL ids raise at execution time
    (a NULL-keyed doc would silently bypass the anti-join and survive
    regardless of contamination).

    The filter is an anti-join of ``docs`` against the contaminated id
    set; only ``(id)`` rows cross that shuffle, never text."""
    contaminated = (
        contamination_check(
            docs,
            bench,
            text_col,
            id_col,
            bench_text_col=bench_text_col,
            n=n,
            broadcast_benchmark=broadcast_benchmark,
            normalize=normalize,
        )
        .where(F.col("n_overlap") > max_overlap)
        .select(id_col)
    )
    return docs.join(contaminated, id_col, "left_anti")
