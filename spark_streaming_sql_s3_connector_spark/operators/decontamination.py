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


# Record separator (U+001E) — cannot occur in screen-normalized text
# (alphanumerics + single spaces only), so it is a safe piece-break
# marker inside the rebuilt word stream.
_BREAK = ""


def span_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    margin: int = 0,
    min_piece_words: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Surgical (span-level) decontamination, GPT-3 appendix-C style.

    Whole-document dropping (:func:`decontaminate`) throws away every
    clean word of a long document because one sentence overlaps an eval
    benchmark. The surgical recipe instead removes only the overlapping
    window and SPLITS the document at the removed spans:

    - work in screen-normalized word space (both sides — same
      normalization as the whole-doc screen, so the two compose);
    - a word is contaminated iff it lies inside ``[p - margin,
      p + n - 1 + margin]`` for some position ``p`` where the doc's
      positional ``n``-gram hits the benchmark n-gram set;
    - the surviving words form maximal runs; each run becomes a PIECE
      (one output row). Splitting — not re-joining — matters: gluing
      the words on either side of a removed span together can fabricate
      brand-new n-grams that were never in the document.

    Docs shorter than ``n`` words contribute their whole text as one
    positional gram at position 0 (the ``benchmark_ngram_set``
    convention, so short eval docs still screen). Pieces shorter than
    ``min_piece_words`` are dropped (GPT-3 used a minimum piece length
    to discard unusable fragments).

    Returns one row per surviving piece: ``(id_col, piece_id,
    piece_text, n_piece_words, n_doc_words, n_removed)`` — ``piece_id``
    is the 1-based position of the piece within its doc, assigned
    BEFORE the ``min_piece_words`` filter (dropped fragments leave
    gaps, so surviving ids are stable under threshold changes);
    ``n_removed`` counts the doc's removed words. Uncontaminated docs yield exactly
    one piece carrying the full normalized text. Docs whose words are
    all removed (or empty docs) yield no rows.

    Scale shape (the 100 TB design): the benchmark n-gram set is
    broadcast (eval suites are tiny next to a training corpus); the
    positional-gram explode is consumed map-side by the broadcast inner
    join, so only CONTAMINATED ``(doc, position)`` rows — a sliver of
    the corpus — cross the one aggregation shuffle. The hit lists then
    join back to the corpus on the doc id; that side is small and
    AQE-broadcastable at runtime. Everything after the join is pure
    JVM array expressions per row (no explode of kept words, no Python
    UDF): contaminated-index test, run-splitting via an interleaved
    U+001E marker, piece explode. Per-word removal testing is
    ``O(words × hits)`` per doc — bounded by doc length and by the
    sparsity of real contamination.
    """
    if n < 1 or margin < 0 or min_piece_words < 1:
        raise ValueError(
            "span_decontaminate: need n >= 1, margin >= 0, min_piece_words >= 1"
        )
    _guard_columns(docs, "docs")
    bench_set = benchmark_ngram_set(bench, bench_text_col or text_col, n)
    if broadcast_benchmark:
        bench_set = F.broadcast(bench_set)

    words = F.when(
        screen_normalize(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(screen_normalize(F.col(text_col)), " "))
    base = _spread(docs).select(
        _non_null_id(id_col).alias("_id"), words.alias("_w")
    )

    # Positional n-grams: sequence(0, size-n) when the doc is long
    # enough, else the single whole-text gram at position 0 (slice
    # truncates past the array end, matching the benchmark convention).
    grams = base.where(F.size("_w") > 0).select(
        "_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, greatest(size(_w) - {n}, 0)), "
                f"i -> struct(i AS pos, concat_ws(' ', slice(_w, i + 1, {n})) AS shingle))"
            )
        ).alias("g"),
    ).select("_id", F.col("g.pos").alias("_pos"), F.col("g.shingle").alias("shingle"))
    hits = (
        grams.join(bench_set, "shingle")
        .groupBy("_id")
        .agg(F.collect_list("_pos").alias("_hits"))
    )

    lo, hi = margin, n - 1 + margin
    pieced = (
        base.join(hits, "_id", "left")
        .withColumn(
            "_hits", F.coalesce(F.col("_hits"), F.array().cast("array<int>"))
        )
        .withColumn(
            "_kept",
            F.expr(
                f"filter(transform(_w, (x, j) -> j), "
                f"j -> !exists(_hits, p -> j >= p - {lo} AND j <= p + {hi}))"
            ),
        )
        .withColumn(
            # Interleave a piece-break marker before every kept word
            # whose predecessor in the ORIGINAL doc was removed, then
            # split the joined stream on the marker: one string op per
            # doc, no per-word explode.
            "_pieces",
            F.split(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(_kept, (j, i) -> concat("
                        f"if(i > 0 AND j != element_at(_kept, i) + 1, '{_BREAK} ', ''), "
                        "element_at(_w, j + 1)))"
                    ),
                ),
                f" {_BREAK} ",
            ),
        )
    )
    piece = F.posexplode(F.col("_pieces"))
    out = (
        pieced.select(
            "_id",
            F.size("_w").alias("n_doc_words"),
            (F.size("_w") - F.size("_kept")).alias("n_removed"),
            piece.alias("_p0", "piece_text"),
        )
        .where(F.col("piece_text") != "")
        .withColumn("n_piece_words", F.size(F.split(F.col("piece_text"), " ")))
        .where(F.col("n_piece_words") >= min_piece_words)
    )
    return out.select(
        F.col("_id").alias(id_col),
        (F.col("_p0") + 1).alias("piece_id"),
        "piece_text",
        "n_piece_words",
        "n_doc_words",
        "n_removed",
    )
