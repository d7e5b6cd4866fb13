"""Benchmark decontamination screen (operators/decontamination.py).

Pins: n-gram overlap counting, normalization (case/punct/whitespace
variants must NOT evade the screen), empty/short-doc conventions, the
NULL-id hard error, the reserved-column guard, and that ``decontaminate``
keeps exactly the zero-overlap docs."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.decontamination import (
    benchmark_ngram_set,
    contamination_check,
    decontaminate,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        # doc 1: exact copy of bench text -> fully contaminated
        (1, "the quick brown fox jumps over the lazy dog"),
        # doc 2: case/punctuation variant of bench text -> must still hit
        (2, "The QUICK, brown FOX!! Jumps over... the lazy DOG."),
        # doc 3: clean
        (3, "completely unrelated content about spark partitions here"),
        # doc 4: partial overlap (shares a 3-gram window with bench)
        (4, "quick brown fox goes somewhere else entirely today ok"),
        # doc 5: short (< n tokens): whole text is one shingle, no hit
        (5, "tiny doc"),
        # doc 6: empty
        (6, ""),
        # doc 7: punctuation-only -> normalizes to empty
        (7, "!!! ??? ..."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["bid", "text"]
    )


def test_contamination_counts(spark, corpus, bench):
    out = {
        r.doc_id: (r.n_grams, r.n_overlap)
        for r in contamination_check(corpus, bench, "text", "doc_id", n=3).collect()
    }
    # bench has 9 tokens -> 7 distinct 3-grams
    assert out[1] == (7, 7)  # exact copy: every 3-gram hits
    assert out[2] == (7, 7)  # normalization: variant hits identically
    assert out[3][1] == 0  # clean doc: no overlap
    assert out[4][0] > 0 and 0 < out[4][1] < out[4][0]  # partial overlap
    assert out[5] == (1, 0)  # short doc: single whole-text shingle
    assert out[6] == (0, 0)  # empty doc
    assert out[7] == (0, 0)  # punctuation-only normalizes to empty
    fracs = {
        r.doc_id: r.contamination_frac
        for r in contamination_check(corpus, bench, "text", "doc_id", n=3).collect()
    }
    assert fracs[1] == 1.0 and fracs[6] == 0.0


def test_normalization_disabled_misses_variant(spark, corpus, bench):
    out = {
        r.doc_id: r.n_overlap
        for r in contamination_check(
            corpus, bench, "text", "doc_id", n=3, normalize=False
        ).collect()
    }
    assert out[1] == 7  # exact copy still hits
    assert out[2] < 7  # the case/punct variant now evades — why normalize=True


def test_decontaminate_keeps_exactly_zero_overlap(spark, corpus, bench):
    kept = sorted(
        r.doc_id for r in decontaminate(corpus, bench, "text", "doc_id", n=3).collect()
    )
    chk = contamination_check(corpus, bench, "text", "doc_id", n=3)
    expected = sorted(
        r.doc_id for r in chk.where(F.col("n_overlap") == 0).collect()
    )
    assert kept == expected
    assert 1 not in kept and 2 not in kept and 3 in kept
    # schema preserved
    assert decontaminate(corpus, bench, "text", "doc_id", n=3).columns == ["doc_id", "text"]


def test_max_overlap_threshold(spark, corpus, bench):
    # with a high threshold the partial-overlap doc survives
    out4 = [
        r.n_overlap
        for r in contamination_check(corpus, bench, "text", "doc_id", n=3).collect()
        if r.doc_id == 4
    ][0]
    kept = sorted(
        r.doc_id
        for r in decontaminate(
            corpus, bench, "text", "doc_id", n=3, max_overlap=out4
        ).collect()
    )
    assert 4 in kept and 1 not in kept


def test_null_id_raises(spark, bench):
    docs = spark.createDataFrame(
        [(1, "some text here ok"), (None, "sneaky null doc")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="NULL value in id column"):
        contamination_check(docs, bench, "text", "doc_id", n=3).collect()
    with pytest.raises(Exception, match="NULL value in id column"):
        decontaminate(docs, bench, "text", "doc_id", n=3).collect()


def test_reserved_column_guard(spark, corpus, bench):
    clashing = corpus.withColumn("shingle", F.lit("x"))
    with pytest.raises(ValueError, match="reserved"):
        contamination_check(clashing, bench, "text", "doc_id", n=3)


def test_benchmark_ngram_set_conventions(spark, bench):
    shingles = {r.shingle for r in benchmark_ngram_set(bench, "text", n=3).collect()}
    assert "the quick brown" in shingles and len(shingles) == 7
    short = spark.createDataFrame([(1, "Tiny DOC!")], ["bid", "text"])
    assert {r.shingle for r in benchmark_ngram_set(short, "text", n=3).collect()} == {
        "tiny doc"
    }


def test_broadcast_and_shuffle_paths_agree(spark, corpus, bench):
    a = {
        (r.doc_id, r.n_grams, r.n_overlap)
        for r in contamination_check(
            corpus, bench, "text", "doc_id", n=3, broadcast_benchmark=True
        ).collect()
    }
    b = {
        (r.doc_id, r.n_grams, r.n_overlap)
        for r in contamination_check(
            corpus, bench, "text", "doc_id", n=3, broadcast_benchmark=False
        ).collect()
    }
    assert a == b
