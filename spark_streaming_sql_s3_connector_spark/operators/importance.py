"""DSIR-style data selection: importance resampling toward a target
distribution (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023 — public method).

The recipe: estimate cheap bag-of-words language models of the TARGET
distribution (the domain you want more of — wikipedia, code, a lang
slice) and the RAW corpus; per document, the log importance weight is
``Σ_t [log p_target(t) − log p_raw(t)]``; then sample WITHOUT
replacement with probability ∝ weight via the Gumbel top-k trick.

Engine-portable by the repo's decimal discipline: both LMs come from
``functions/text.train_unigram_lm`` (7-dp pre-rounded logprobs), the
per-token DELTA is an exact difference of two 7-dp decimals computed
driver-side, and the per-doc sum is decimal (order-independent). The
Gumbel key derives from the salted md5 of the doc id — the same
deterministic-hash uniform every sampler in ``operators/sampling.py``
uses — so selection is reproducible across engines, partitionings and
reruns, and a DuckDB oracle can mirror it exactly.

Scale shapes (100 TB): each LM train is one explode+groupBy shuffle
with map-side combine + a V-row TakeOrdered (see train_unigram_lm);
weighting is one explode + ONE broadcast join of the merged V-row
delta table + a per-doc partial agg; selection is a scan-local key
expression + global TakeOrderedAndProject for n_keep. The corpus never
shuffles except the (doc, sum) agg rows.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import tokenize

# 12 hex digits of md5 → uniform grid of 16^12 buckets; +0.5 centers so
# u is never 0 or 1 (both would blow up the double-log)
_GUMBEL_SPAN = float(16 ** 12)


def _gumbel_key(id_col: Column, salt: str) -> Column:
    """Deterministic standard-Gumbel noise from the salted md5 of the
    id: u = (first-12-hex + 0.5) / 16^12, g = −ln(−ln u). Matches the
    DuckDB expression
    ``-ln(-ln((CAST('0x'||substr(md5(id||salt),1,12) AS BIGINT)+0.5)/16^12))``."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    u = (
        F.conv(F.substring(h, 1, 12), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(_GUMBEL_SPAN)
    return -F.log(-F.log(u))


def _delta_table(target_lm: dict, raw_lm: dict):
    """Merged per-token Δlogprob rows [(tok, Δ-as-string)]: union of
    both vocabularies, each side coalescing to its OOV mass. Exact
    decimal arithmetic — no float drift between trainer and scorer."""
    t = {tok: Decimal(str(lp)) for tok, lp in target_lm["vocab"]}
    r = {tok: Decimal(str(lp)) for tok, lp in raw_lm["vocab"]}
    t_oov = Decimal(str(target_lm["oov_lp"]))
    r_oov = Decimal(str(raw_lm["oov_lp"]))
    toks = sorted(set(t) | set(r))
    return (
        [(tok, str(t.get(tok, t_oov) - r.get(tok, r_oov))) for tok in toks],
        str(t_oov - r_oov),
    )


def dsir_log_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_lm: dict,
    raw_lm: dict,
) -> DataFrame:
    """Per-document DSIR log importance weight:
    ``<id_col> | log_weight (decimal 20,7) | n_tokens``. Token-less
    docs get log_weight 0 (weight 1 — no evidence either way)."""
    spark = df.sparkSession
    rows, oov_delta = _delta_table(target_lm, raw_lm)
    lm = spark.createDataFrame(rows, "tok string, _d_s string").select(
        "tok", F.col("_d_s").cast("decimal(20,7)").alias("_d")
    )
    oov = F.lit(oov_delta).cast("decimal(20,7)")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("tok"),
    )
    agg = (
        toks.join(F.broadcast(lm), "tok", "left")
        .select("_id", F.coalesce(F.col("_d"), oov).alias("_d"))
        .groupBy("_id")
        .agg(F.sum("_d").alias("_w"), F.count(F.lit(1)).alias("_n"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_w").alias("log_weight"),
            F.col("_n").cast("bigint").alias("n_tokens"),
        )
    )
    # token-less docs (weight 1) re-enter via a scan-local second pass
    # + union — NOT a corpus-keyed join-back, which would plan as a
    # second full shuffle (SortMergeJoin on doc id)
    zero = F.lit("0").cast("decimal(20,7)")
    empty = df.where(
        # NULL text tokenizes to NULL, not [] — fold both to "no tokens"
        F.coalesce(F.size(tokenize(F.lower(F.col(text_col)))), F.lit(0)) <= 0
    ).select(
        F.col(id_col),
        zero.alias("log_weight"),
        F.lit(0).cast("bigint").alias("n_tokens"),
    )
    return agg.unionByName(empty)


def dsir_resample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_lm: dict,
    raw_lm: dict,
    n_keep: int,
    salt: str = "",
) -> DataFrame:
    """Select ``n_keep`` documents with probability ∝ importance weight,
    WITHOUT replacement, deterministically: Gumbel top-k — key =
    log_weight + Gumbel(md5(id‖salt)), take the global top ``n_keep``
    by (key desc, id asc). Returns
    ``<id_col> | log_weight (6-dp double) | sample_key (raw double)``.

    Same (corpus, LMs, salt) ⇒ same sample on any engine/partitioning;
    a new salt redraws the randomness without retraining. The top-k is
    TakeOrderedAndProject — per-partition heads + driver merge, no
    global sort, no window.
    """
    if n_keep < 1:
        raise ValueError("n_keep must be >= 1")
    w = dsir_log_weights(df, text_col, id_col, target_lm, raw_lm)
    keyed = w.select(
        F.col(id_col),
        # decimal-first 6-dp rounding (see retrieval.py score note)
        F.round(F.col("log_weight"), 6).cast("double").alias("log_weight"),
        (
            F.col("log_weight").cast("double")
            + _gumbel_key(F.col(id_col), salt)
        ).alias("sample_key"),
    )
    return (
        keyed.orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(n_keep)
    )
