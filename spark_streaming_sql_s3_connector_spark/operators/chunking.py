"""Fixed-size token chunking with overlap — the "shape the corpus into
training windows" step of an LLM data pipeline.

All JVM expressions (split → sequence of chunk starts → posexplode →
slice → array_join): the explode fans each L-token document into
ceil(L/step) rows map-side, no shuffle, no Python. At 100 TB the chunker
is a narrow transformation that pipelines straight into the writer —
chunk row counts are bounded by (corpus tokens / step), independent of
document-length skew.

The reference has no analog (it is an ingest connector); this operator
comes from the build charter's training-data-pipeline surface, next to
dedup/sampling/decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import tokenize


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Explode each document into whitespace-token windows of
    ``chunk_tokens`` tokens, starting every ``chunk_tokens -
    overlap_tokens`` tokens (the final window may be shorter; empty docs
    produce no rows).

    Output: ``(id_col, chunk_idx, chunk_text, chunk_n_tokens)`` with
    ``chunk_idx`` counting windows from 0 — deterministic, so chunk ids
    are stable across runs and re-chunking is idempotent."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap_tokens < chunk_tokens, got {overlap_tokens}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap_tokens
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # starts: 0, step, 2*step, ... while start < n - overlap (sequence is
    # inclusive of its upper bound, so the cap is n - overlap - 1). A
    # start in [n - overlap, n) would emit a window wholly contained in
    # the previous chunk's tail — zero new tokens, pure duplicated
    # training content, exactly what the dedup operators exist to remove.
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), F.greatest(n - overlap_tokens - 1, F.lit(0)), F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    sliced = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_idx",
        F.array_join(sliced, " ").alias("chunk_text"),
        F.size(sliced).alias("chunk_n_tokens"),
    )
