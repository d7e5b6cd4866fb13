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


def source_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
) -> DataFrame:
    """Per-source (domain) corpus statistics — the aggregation step of
    RefinedWeb/C4-style DOMAIN-level curation, where whole sources are
    admitted or dropped on their aggregate quality rather than doc by
    doc: ``(source, n_docs, sum_qscore, n_dup_docs, sum_tokens)``.

    ``sum_qscore`` is the DECIMAL(18,6) sum of per-doc quality scores
    pre-rounded to 6 dp — order-independent exact arithmetic, so a
    cross-engine oracle reproduces it bit-for-bit (the repo's
    decimal-sum FP-parity discipline); derive the mean as
    ``round(cast(sum as double) / n, 6)``. ``n_dup_docs`` counts docs
    whose md5(normalized text) occurs ≥2 times CORPUS-WIDE (cross-source
    copies count against both sources).

    Scale shape: one 16-byte-key count shuffle (map-side partial) for
    corpus-wide dup counts, one 16-byte join back, one source-keyed
    partial aggregate. Output is |sources| rows — driver/broadcast
    material by construction.
    """
    from spark_streaming_sql_s3_connector_spark.functions.text import (
        quality_score,
        token_count,
    )
    from spark_streaming_sql_s3_connector_spark.operators.dedup import (
        normalized_text,
    )

    key = F.md5(F.encode(normalized_text(F.col(text_col)), "UTF-8"))
    scored = df.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("source"),
        F.round(quality_score(F.col(text_col)), 6)
        .cast("decimal(18,6)")
        .alias("_q"),
        token_count(F.col(text_col)).alias("_tok"),
        key.alias("_key"),
    )
    key_counts = scored.groupBy("_key").agg(F.count("*").alias("_kc"))
    # LEFT join: a NULL-text doc has a NULL key (equi-join miss) but
    # must still count toward its source's n_docs — it just can't be a
    # duplicate (NULL equals nothing, same convention as dedup_exact)
    flagged = scored.join(key_counts, "_key", "left")
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("_q").alias("sum_qscore"),
        F.sum(
            F.when(F.coalesce(F.col("_kc"), F.lit(0)) > 1, 1).otherwise(0)
        ).alias("n_dup_docs"),
        F.sum(F.col("_tok").cast("bigint")).alias("sum_tokens"),
    )


def gate_sources(
    stats: DataFrame,
    min_docs: int = 1,
    min_mean_quality: float = 0.0,
    max_dup_rate: float = 1.0,
) -> DataFrame:
    """Add ``mean_qscore``, ``dup_rate``, and the ``passes`` verdict to
    a :func:`source_stats` frame. All three predicates evaluate on
    exact quantities (integer counts, decimal sums, one final double
    division), so the verdict is engine-deterministic."""
    mean_q = F.round(
        F.col("sum_qscore").cast("double") / F.col("n_docs"), 6
    )
    dup_rate = F.round(
        F.col("n_dup_docs").cast("double") / F.col("n_docs"), 6
    )
    return stats.select(
        "*",
        mean_q.alias("mean_qscore"),
        dup_rate.alias("dup_rate"),
    ).withColumn(
        "passes",
        (F.col("n_docs") >= F.lit(int(min_docs)))
        & (F.col("mean_qscore") >= F.lit(float(min_mean_quality)))
        & (F.col("dup_rate") <= F.lit(float(max_dup_rate))),
    )


def filter_docs_by_source(
    df: DataFrame,
    source_col: str,
    gated_stats: DataFrame,
) -> DataFrame:
    """Keep only documents whose source passed the gate — a broadcast
    semi-join against the (tiny, |sources|-row) verdict table; the
    corpus never shuffles."""
    passing = gated_stats.where(F.col("passes")).select(
        F.col("source").alias("_pass_src")
    )
    return df.join(
        F.broadcast(passing), F.col(source_col) == F.col("_pass_src"), "left_semi"
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str,
    group_col: str,
    shingle_k: int = 3,
    max_groups_per_shingle: int | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """Pairwise content overlap BETWEEN groups (sources/domains/crawls):
    for every unordered group pair, how many distinct word
    ``shingle_k``-grams they share, as absolute count, Jaccard over the
    two shingle sets, and overlap coefficient (inter / min) — the
    "which crawls duplicate each other" matrix a corpus merge decides
    dedup order with.

    Output: ``source_a | source_b | n_shared | jaccard | overlap``
    (``source_a < source_b``), plus each group's distinct-shingle size.

    Scale shape: explode → ONE corpus-sized shuffle,
    ``groupBy(shingle).agg(collect_set(group))`` — the set agg dedups
    (group, gram) repeats AND builds the per-shingle group list in the
    same exchange (partial collect_sets merge map-side), so there is no
    separate ``distinct`` pass. The grouped frame (|distinct shingles|
    rows) is PERSISTED (memory-and-disk): it feeds pair generation and
    the per-group sizes, and without the cache Catalyst re-runs the
    corpus explode per consumer (observed: 3 scans, 0 ReusedExchange).
    Each shingle emits C(g, 2) pair rows where g = the number of GROUPS
    containing it — bounded by the group count and capped by
    ``max_groups_per_shingle`` when the group population is itself huge
    (the same stop-shingle skew guard as the n-gram Jaccard join); the
    pair volume itself is intrinsic to an exact overlap matrix.
    Per-group sizes broadcast back onto the |pairs| result.
    """
    from pyspark import StorageLevel

    from spark_streaming_sql_s3_connector_spark.operators.dedup import (
        _shingles_udf,
        word_shingles,
    )

    # Arrow shingler by default: the Catalyst-lambda form
    # (transform+slice+concat_ws per token) measured 6-10x slower at
    # sf0.5 (19.8 s vs 3.3 s for the same 1.3M grams) — same trade and
    # same shared shingler as ngram_jaccard_pairs(use_arrow=True)
    shingles = (
        _shingles_udf(shingle_k)(F.col(text_col))
        if use_arrow
        else word_shingles(F.col(text_col), shingle_k)
    )
    grouped = (
        df.select(
            F.col(group_col).alias("_grp"),
            F.explode_outer(shingles).alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_set("_grp")).alias("_grps"))
    )
    if max_groups_per_shingle is not None:
        grouped = grouped.where(F.size("_grps") <= max_groups_per_shingle)
    grouped = grouped.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = (
        grouped.select(F.explode("_grps").alias("_grp"))
        .groupBy("_grp")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    # i<j pairs from the sorted group array: two chained generators (the
    # array, <= group count post-cap, rides the first explode)
    e1 = grouped.select("_grps", F.posexplode("_grps").alias("_ia", "_a"))
    inter = (
        e1.select("_ia", "_a", F.posexplode("_grps").alias("_ib", "_b"))
        .where(F.col("_ib") > F.col("_ia"))
        .groupBy(F.col("_a").alias("source_a"), F.col("_b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("_grp").alias("source_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("_grp").alias("source_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "size_a",
            "size_b",
            F.round(
                F.col("n_shared")
                / (F.col("size_a") + F.col("size_b") - F.col("n_shared")),
                9,
            ).alias("jaccard"),
            F.round(
                F.col("n_shared") / F.least(F.col("size_a"), F.col("size_b")), 9
            ).alias("overlap"),
        )
        .orderBy("source_a", "source_b")
    )
