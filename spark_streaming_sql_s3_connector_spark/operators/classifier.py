"""Distributed multinomial Naive Bayes text classifier — the
closed-form sibling of the fasttext-style quality/domain classifiers
LLM pipelines (CCNet, RefinedWeb) train to score web text.

Why NB here: its MLE is pure COUNTING — per-class token counts, class
priors, one smoothing formula — so "training on 100 TB" is one
explode+groupBy shuffle with map-side combine, no gradient loop, no
parameter server. The model is V×L logprobs (a few MB), broadcast for
scoring exactly like the unigram LM in ``functions/text.py``, whose
decimal-sum FP-parity discipline this module reuses: per-token logprobs
are PRE-ROUNDED 7-dp DECIMAL literals, per-(doc,label) sums are exact
decimals (order-independent ⇒ engine-portable hashes), only the final
reported score divides/rounds in double.

Train plan: explode → groupBy(label, token) [THE shuffle; carries
distinct (label, token) pairs per partition after partial agg] → global
top-V vocab via a V-row TakeOrdered → collect ≤ V×L count rows +
L priors to the driver (bounded, documented). Score plan: explode →
ONE broadcast join of the V-row wide LM table → per-doc partial agg →
argmax over L decimal score columns (JVM expressions, ties break label-
ascending) → left-join back so empty docs keep a row scored on priors.

A token absent from class l (or absent from the vocab entirely) scores
``ln(α / (N_l + α(V+1)))`` — the same smoothed-zero mass, so scoring is
one ``coalesce`` per label and the model never materializes zero rows.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import tokenize


def train_nb_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    vocab_size: int = 4096,
    alpha: float = 1.0,
) -> dict:
    """Train the NB model; returns a broadcastable dict:
    ``labels`` (sorted), ``priors`` / ``oov`` (label → 7-dp logprob),
    ``table`` ((token, label) → 7-dp logprob for observed vocab pairs),
    ``vocab_size``, ``n_docs``. Rows with a NULL label are excluded
    from training (they cannot vote); NULL/empty texts still count for
    their class prior."""
    lbl = F.col(label_col)
    labeled = df.where(lbl.isNotNull())
    toks = labeled.select(
        lbl.alias("_lbl"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("tok"),
    )
    counts = toks.groupBy("_lbl", "tok").agg(F.count(F.lit(1)).alias("c")).persist()
    try:
        top = (
            counts.groupBy("tok")
            .agg(F.sum("c").alias("tc"))
            .orderBy(F.desc("tc"), F.asc("tok"))
            .limit(vocab_size)
        )
        vocab = [r.tok for r in top.collect()]
        vset = top.select("tok")
        pair_rows = counts.join(F.broadcast(vset), "tok").collect()  # <= V*L
        totals = counts.groupBy("_lbl").agg(F.sum("c").alias("n")).collect()
    finally:
        counts.unpersist()
    prior_rows = labeled.groupBy(lbl.alias("_lbl")).agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    labels = sorted(str(r._lbl) for r in prior_rows)
    n_docs = sum(r.n for r in prior_rows)
    n_tokens = {str(r._lbl): int(r.n) for r in totals}
    v1 = len(vocab) + 1
    denom = {
        l: n_tokens.get(l, 0) + alpha * v1 for l in labels
    }
    table = {
        (r.tok, str(r._lbl)): round(
            math.log((r.c + alpha) / denom[str(r._lbl)]), 7
        )
        for r in pair_rows
    }
    return {
        "labels": labels,
        "priors": {
            str(r._lbl): round(math.log(r.n / n_docs), 7) for r in prior_rows
        },
        "oov": {l: round(math.log(alpha / denom[l]), 7) for l in labels},
        "table": table,
        "vocab": vocab,
        "alpha": alpha,
        "n_docs": int(n_docs),
    }


def nb_score_docs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: dict,
    keep_scores: bool = False,
) -> DataFrame:
    """Score every document under the NB model:
    ``id | pred_label | pred_score | n_tokens`` (+ one rounded
    ``score_<label>`` column per class when ``keep_scores``).
    ``pred_score`` is the winning joint log-likelihood divided by
    nothing — compare across labels, not across docs of different
    lengths. Ties break label-ascending; token-less docs score on the
    priors alone."""
    spark = df.sparkSession
    labels = model["labels"]
    if not labels:
        raise ValueError("model has no labels")
    # wide LM: one row per vocab token, one decimal column per label
    wide_rows = [
        tuple(
            [t]
            + [
                str(model["table"].get((t, l), model["oov"][l]))
                for l in labels
            ]
        )
        for t in model["vocab"]
    ]
    schema = "tok string, " + ", ".join(
        f"_lp_{i}_s string" for i in range(len(labels))
    )
    lm = spark.createDataFrame(wide_rows, schema).select(
        "tok",
        *[
            F.col(f"_lp_{i}_s").cast("decimal(20,7)").alias(f"_lp_{i}")
            for i in range(len(labels))
        ],
    )
    oov = {
        i: F.lit(str(model["oov"][l])).cast("decimal(20,7)")
        for i, l in enumerate(labels)
    }
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("tok"),
    )
    agg = (
        toks.join(F.broadcast(lm), "tok", "left")
        .select(
            "_id",
            *[
                F.coalesce(F.col(f"_lp_{i}"), oov[i]).alias(f"_lp_{i}")
                for i in range(len(labels))
            ],
        )
        .groupBy("_id")
        .agg(
            *[F.sum(f"_lp_{i}").alias(f"_s_{i}") for i in range(len(labels))],
            F.count(F.lit(1)).alias("_n"),
        )
    )
    scored = df.select(F.col(id_col)).join(
        agg, F.col(id_col) == F.col("_id"), "left"
    )
    score_cols = []
    for i, l in enumerate(labels):
        prior = F.lit(str(model["priors"][l])).cast("decimal(20,7)")
        score_cols.append(
            (prior + F.coalesce(F.col(f"_s_{i}"), F.lit("0").cast("decimal(20,7)")))
            .alias(f"_sc_{i}")
        )
    scored = scored.select(F.col(id_col), F.col("_n"), *score_cols)
    # argmax with label-ascending tie-break: max over (score, reversed
    # label rank) structs — exact decimal comparison, deterministic
    best = F.greatest(
        *[
            F.struct(
                F.col(f"_sc_{i}").alias("s"),
                F.lit(len(labels) - i).alias("r"),  # earlier label wins ties
                F.lit(l).alias("l"),
            )
            for i, l in enumerate(labels)
        ]
    ) if len(labels) > 1 else F.struct(
        F.col("_sc_0").alias("s"), F.lit(1).alias("r"), F.lit(labels[0]).alias("l")
    )
    out = scored.select(
        F.col(id_col),
        best.getField("l").alias("pred_label"),
        F.round(best.getField("s").cast("double"), 6).alias("pred_score"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_tokens"),
        *(
            [
                F.round(F.col(f"_sc_{i}").cast("double"), 6).alias(
                    f"score_{l}"
                )
                for i, l in enumerate(labels)
            ]
            if keep_scores
            else []
        ),
    )
    return out
