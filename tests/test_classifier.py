"""Distributed Naive Bayes (operators/classifier.py).

The registry key `nb_classifier_docs` is hash-exact vs a DuckDB
train+score mirror; these tests pin the learning semantics (separable
data classified perfectly, priors dominate empty docs, deterministic
ties) and the plan shape (broadcast LM join, no Python, corpus never
shuffles for the join).
"""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.classifier import (
    nb_score_docs,
    train_nb_classifier,
)


@pytest.fixture(scope="module")
def separable(spark):
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma alpha beta", "A"))
        rows.append((100 + i, "delta epsilon zeta delta zeta", "B"))
    return spark.createDataFrame(rows, "doc_id bigint, text string, lbl string")


def test_separable_data_classified_perfectly(spark, separable):
    m = train_nb_classifier(separable, "text", "lbl")
    out = nb_score_docs(separable, "text", "doc_id", m)
    joined = {r["doc_id"]: r["pred_label"] for r in out.collect()}
    assert all(v == "A" for k, v in joined.items() if k < 100)
    assert all(v == "B" for k, v in joined.items() if k >= 100)


def test_model_shape_and_smoothing(spark, separable):
    m = train_nb_classifier(separable, "text", "lbl", alpha=1.0)
    assert m["labels"] == ["A", "B"]
    assert set(m["vocab"]) == {"alpha", "beta", "gamma", "delta", "epsilon", "zeta"}
    # priors: equal classes
    assert m["priors"]["A"] == m["priors"]["B"]
    # a token seen in one class only: its other-class score equals the
    # smoothed-zero (OOV) mass — the model stores no zero rows
    assert ("alpha", "B") not in m["table"]
    assert ("alpha", "A") in m["table"]


def test_empty_docs_score_on_priors_and_ties_break_ascending(spark):
    # EQUAL class token masses (N_A == N_B == 2) so the per-class OOV
    # masses coincide and the PRIOR alone decides OOV/empty docs
    train = spark.createDataFrame(
        [(1, "x", "A"), (2, "y", "A"), (3, "z w", "B")],
        "doc_id bigint, text string, lbl string",
    )
    m = train_nb_classifier(train, "text", "lbl")
    assert m["oov"]["A"] == m["oov"]["B"]
    probe = spark.createDataFrame(
        [(10, ""), (11, None), (12, "q q q")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in nb_score_docs(probe, "text", "doc_id", m).collect()}
    # empty/NULL docs: prior argmax -> A (2/3 of docs)
    assert rows[10]["pred_label"] == "A" and rows[10]["n_tokens"] == 0
    assert rows[11]["pred_label"] == "A" and rows[11]["n_tokens"] == 0
    # all-OOV doc: per-token scores tie exactly, priors decide -> A
    assert rows[12]["pred_label"] == "A" and rows[12]["n_tokens"] == 3


def test_tie_breaks_label_ascending_exactly(spark):
    # perfectly symmetric classes: every doc's scores tie exactly in
    # DECIMAL arithmetic -> the earlier label must win
    train = spark.createDataFrame(
        [(1, "x", "B"), (2, "y", "A")], "doc_id bigint, text string, lbl string"
    )
    m = train_nb_classifier(train, "text", "lbl")
    probe = spark.createDataFrame([(10, "q")], "doc_id bigint, text string")
    out = nb_score_docs(probe, "text", "doc_id", m, keep_scores=True).collect()[0]
    assert out["score_A"] == out["score_B"]
    assert out["pred_label"] == "A"


def test_null_labels_excluded_from_training(spark):
    train = spark.createDataFrame(
        [(1, "x y z", "A"), (2, "x y z", None), (3, "w v u", "B")],
        "doc_id bigint, text string, lbl string",
    )
    m = train_nb_classifier(train, "text", "lbl")
    assert m["labels"] == ["A", "B"]
    assert m["n_docs"] == 2  # the NULL-label doc votes nowhere


def test_keep_scores_and_empty_model_guard(spark, separable):
    m = train_nb_classifier(separable, "text", "lbl")
    out = nb_score_docs(separable, "text", "doc_id", m, keep_scores=True)
    assert {"score_A", "score_B"} <= set(out.columns)
    m_empty = dict(m, labels=[])
    with pytest.raises(ValueError, match="labels"):
        nb_score_docs(separable, "text", "doc_id", m_empty)


def test_scoring_plan_broadcasts_lm_no_python(spark, separable):
    m = train_nb_classifier(separable, "text", "lbl")
    plan = (
        nb_score_docs(separable, "text", "doc_id", m)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
