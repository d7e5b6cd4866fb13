"""Laws + plan pins for DSIR importance resampling
(operators/importance.py). Cross-engine value parity is pinned by the
`dsir_resample_docs` oracle; here: weight semantics on controlled
corpora, Gumbel-top-k selection laws, and the scale-shape plan pins."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import train_unigram_lm
from spark_streaming_sql_s3_connector_spark.operators.importance import (
    dsir_log_weights,
    dsir_resample,
)


def _toy(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


@pytest.fixture(scope="module")
def toy_corpus(spark):
    # target-ish docs speak "alpha beta", raw background speaks "x y z"
    rows = [(i, "alpha beta alpha beta", "en") for i in range(10)] + [
        (i, "x y z x y z", "zz") for i in range(10, 30)
    ]
    return _toy(spark, rows)


def test_weights_favor_target_like_docs(spark, toy_corpus):
    tlm = train_unigram_lm(toy_corpus.where("lang = 'en'"), "text", vocab_size=64)
    rlm = train_unigram_lm(toy_corpus, "text", vocab_size=64)
    w = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(
            toy_corpus, "text", "doc_id", tlm, rlm
        ).collect()
    }
    # every target-language doc outweighs every background doc
    assert min(float(w[i]) for i in range(10)) > max(
        float(w[i]) for i in range(10, 30)
    )


def test_tokenless_docs_weight_zero(spark):
    docs = _toy(spark, [(1, "alpha beta", "en"), (2, "", "en"), (3, None, "en")])
    tlm = train_unigram_lm(docs.where("doc_id = 1"), "text", vocab_size=8)
    rlm = train_unigram_lm(docs, "text", vocab_size=8)
    rows = {
        r.doc_id: r
        for r in dsir_log_weights(docs, "text", "doc_id", tlm, rlm).collect()
    }
    assert float(rows[2].log_weight) == 0.0 and rows[2].n_tokens == 0
    assert float(rows[3].log_weight) == 0.0 and rows[3].n_tokens == 0


def test_resample_prefers_heavy_weights_over_gumbel_noise(spark, toy_corpus):
    """Gumbel noise spans a few nats; with an overwhelming weight gap
    the 10 target docs must all be chosen before any background doc.
    The toy gap: target docs score Σ 4 tokens × (ln p_t − ln p_r) ≫
    noise because background tokens are OOV in the target LM."""
    tlm = train_unigram_lm(toy_corpus.where("lang = 'en'"), "text", vocab_size=64)
    rlm = train_unigram_lm(toy_corpus, "text", vocab_size=64)
    kept = dsir_resample(
        toy_corpus, "text", "doc_id", tlm, rlm, n_keep=10, salt="s"
    ).collect()
    assert sorted(r.doc_id for r in kept) == list(range(10))


def test_resample_salt_rotates_sample_deterministically(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    tlm = train_unigram_lm(docs.where("lang = 'en'"), "text", vocab_size=512)
    rlm = train_unigram_lm(docs, "text", vocab_size=512)
    a1 = dsir_resample(docs, "text", "doc_id", tlm, rlm, 30, salt="a").collect()
    a2 = dsir_resample(
        docs.repartition(17), "text", "doc_id", tlm, rlm, 30, salt="a"
    ).collect()
    b = dsir_resample(docs, "text", "doc_id", tlm, rlm, 30, salt="b").collect()
    assert [tuple(r) for r in a1] == [tuple(r) for r in a2]
    assert {r.doc_id for r in a1} != {r.doc_id for r in b}
    assert len(a1) == 30


def test_resample_n_keep_validation(spark, toy_corpus):
    tlm = train_unigram_lm(toy_corpus, "text", vocab_size=8)
    with pytest.raises(ValueError):
        dsir_resample(toy_corpus, "text", "doc_id", tlm, tlm, n_keep=0)


def test_resample_plan_broadcast_and_take_ordered(spark, sf_dir):
    """Scale pins: the delta table joins as a broadcast (corpus never
    shuffles for it), selection is TakeOrderedAndProject (no global
    sort, no window)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    tlm = train_unigram_lm(docs.where("lang = 'en'"), "text", vocab_size=256)
    rlm = train_unigram_lm(docs, "text", vocab_size=256)
    plan = (
        dsir_resample(docs, "text", "doc_id", tlm, rlm, 30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
