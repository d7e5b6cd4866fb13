"""Cross-document boilerplate detection and removal (CCNet-style).

Scraped corpora repeat navigation bars, cookie banners, and footer
disclaimers across thousands of pages. `functions/text.repetition_metrics`
measures repetition WITHIN a document; these operators measure it ACROSS
documents: a line occurring in ≥ ``min_doc_freq`` distinct documents is
boilerplate, and `strip_boilerplate` rewrites each document without
those lines.

Scale shape (inverted-index family, like the n-gram Jaccard join):

- explode to DISTINCT (doc, line) pairs — `array_distinct` before the
  explode keeps a doc that repeats its own nav bar 100× from inflating
  the index;
- one shuffle keyed on the line computes document frequency (a count
  aggregate — a hot boilerplate line costs one partial-agg row per map
  task, never a pair explosion, so there is no skew bomb to guard);
- one broadcast-or-shuffle join back + one doc-keyed aggregate.

Line semantics are shared with ``repetition_metrics``: split on
newlines, trim, drop blanks. For corpora without newlines (the synthetic
testdata's single-line docs), pre-split sentences into lines with
``lined_text``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lined_text(col) -> F.Column:
    """Sentence-per-line rewrite ('. ' → '.\\n') — turns single-line prose
    into line-structured text so line-level ops bite. Same transform as
    the repetition oracle's ``lined`` CTE."""
    return F.regexp_replace(col, r"\. ", ".\n")


def _doc_lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(F.array_distinct(lines)).alias("line"),
    ).where(F.col("line").isNotNull())


def line_doc_frequency(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(line, doc_freq): in how many distinct documents each non-blank
    trimmed line occurs. The corpus-wide boilerplate table."""
    return _doc_lines(df, text_col, id_col).groupBy("line").agg(
        F.count("*").alias("doc_freq")
    )


def boilerplate_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Per-document boilerplate signals: ``n_distinct_lines``,
    ``n_boilerplate_lines`` (lines shared by ≥ ``min_doc_freq`` docs),
    and ``boilerplate_frac``. Documents with no non-blank lines get a
    zero row (left join back to the corpus)."""
    if min_doc_freq < 2:
        raise ValueError("min_doc_freq must be >= 2 (1 would flag every line)")
    freq = line_doc_frequency(df, text_col, id_col)
    per_doc = (
        _doc_lines(df, text_col, id_col)
        .join(freq, "line")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_distinct_lines"),
            F.sum(
                F.when(F.col("doc_freq") >= min_doc_freq, 1).otherwise(0)
            ).alias("n_boilerplate_lines"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, df[id_col] == per_doc["_id"], "left")
        .select(
            F.col(id_col),
            F.coalesce("n_distinct_lines", F.lit(0)).alias("n_distinct_lines"),
            F.coalesce("n_boilerplate_lines", F.lit(0)).alias("n_boilerplate_lines"),
            F.when(
                F.coalesce("n_distinct_lines", F.lit(0)) > 0,
                F.col("n_boilerplate_lines")
                / F.col("n_distinct_lines").cast("double"),
            )
            .otherwise(0.0)
            .alias("boilerplate_frac"),
        )
    )


def dedup_lines_keep_first(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str = "deduped_text",
) -> DataFrame:
    """Corpus-global keep-FIRST line/paragraph dedup: every repeated
    trimmed line keeps only its first occurrence in (doc id, position)
    order; all later copies — in other documents AND later in the same
    document — are dropped, and each document is rebuilt from its
    surviving lines.

    This is the keep-one counterpart to :func:`strip_boilerplate` (which
    removes ALL copies of cross-doc lines): the dedup used when repeated
    paragraphs carry signal once but must not be trained on thousands of
    times.

    Scale shape: the global first per line is ``min(struct(id, pos))`` —
    a map-side partial aggregate, so a line repeated 10⁸ times costs one
    row per map task in the line-keyed shuffle, never a window over a
    skewed partition. One line-keyed shuffle (+ join back) and one
    doc-keyed rebuild. Honest caveat: the join BACK is also line-keyed,
    so a mega-hot line's copies do land in one shuffle partition there
    (1:1 fan-out, no blow-up); that is the standard AQE skew-join split
    case, not a pair explosion.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    pos = df.select(
        F.col(id_col).alias("_id"), F.posexplode_outer(lines)
    ).withColumnRenamed("col", "line")
    firsts = (
        pos.where(F.col("line").isNotNull())
        .groupBy("line")
        .agg(F.min(F.struct("_id", "pos")).alias("_first"))
    )
    kept = (
        pos.join(firsts, "line")
        .where((F.col("_id") == F.col("_first._id")) & (F.col("pos") == F.col("_first.pos")))
        .select("_id", "pos", "line")
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(out_col),
        F.count("*").alias("n_kept_lines"),
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_id"], "left")
        .drop("_id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
        .withColumn("n_kept_lines", F.coalesce("n_kept_lines", F.lit(0)))
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_doc_freq: int = 2,
    out_col: str = "clean_text",
) -> DataFrame:
    """Rewrite each document without its boilerplate lines (original line
    order preserved via posexplode; duplicate in-doc lines are all kept
    unless the LINE is corpus-boilerplate). Documents whose every line is
    boilerplate come back with an empty string."""
    boiler = (
        line_doc_frequency(df, text_col, id_col)
        .where(F.col("doc_freq") >= min_doc_freq)
        .select("line")
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    pos = (
        df.select(F.col(id_col).alias("_id"), F.posexplode_outer(lines))
        .withColumnRenamed("col", "line")
    )
    kept = pos.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(out_col)
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_id"], "left")
        .drop("_id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
    )
