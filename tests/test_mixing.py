"""Data-mixing (mix_corpus) laws: determinism under repartition, budget
targeting, oversubscription keep-all, default-share drop, keep_fraction
arithmetic, argument validation."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.sampling import mix_corpus

SHARES = {"web": 0.6, "code": 0.3}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(3000):
        src = ("web", "code", "books")[i % 3]
        rows.append((i, src, (i * 13) % 97 + 10))
    return spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")


def test_deterministic_under_repartition(spark, corpus):
    a = mix_corpus(corpus, "doc_id", "source", "n_tokens", SHARES, 30_000, salt="s")
    b = mix_corpus(
        corpus.repartition(17), "doc_id", "source", "n_tokens", SHARES, 30_000, salt="s"
    )
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0


def test_budget_targeting(spark, corpus):
    budget = 30_000
    out = mix_corpus(corpus, "doc_id", "source", "n_tokens", SHARES, budget, salt="s")
    got = {
        r.source: r.tok
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    for src, share in SHARES.items():
        target = share * budget
        # hash sampling is binomial-ish; 25% envelope at ~1000 rows/source
        assert abs(got[src] - target) / target < 0.25, (src, got[src], target)


def test_oversubscribed_source_keeps_all(spark, corpus):
    # share*budget far above the source's total -> fraction clamps to 1
    out = mix_corpus(
        corpus, "doc_id", "source", "n_tokens", {"web": 1.0}, 10**9, salt="s"
    )
    n_web = corpus.where(F.col("source") == "web").count()
    kept = out.where(F.col("source") == "web")
    assert kept.count() == n_web
    assert kept.select(F.min("keep_fraction")).collect()[0][0] == 1.0


def test_default_share_zero_drops_unlisted(spark, corpus):
    out = mix_corpus(corpus, "doc_id", "source", "n_tokens", SHARES, 30_000, salt="s")
    assert out.where(F.col("source") == "books").count() == 0


def test_default_share_nonzero_keeps_unlisted(spark, corpus):
    out = mix_corpus(
        corpus, "doc_id", "source", "n_tokens", SHARES, 30_000,
        salt="s", default_share=0.1,
    )
    assert out.where(F.col("source") == "books").count() > 0


def test_keep_fraction_arithmetic(spark, corpus):
    budget = 30_000
    out = mix_corpus(corpus, "doc_id", "source", "n_tokens", SHARES, budget, salt="s")
    totals = {
        r.source: r.tok
        for r in corpus.groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    fracs = {
        r.source: r.f
        for r in out.groupBy("source").agg(F.max("keep_fraction").alias("f")).collect()
    }
    for src, share in SHARES.items():
        assert fracs[src] == pytest.approx(min(1.0, share * budget / totals[src]))


def test_validation(spark, corpus):
    with pytest.raises(ValueError):
        mix_corpus(corpus, "doc_id", "source", "n_tokens", SHARES, 0)
    with pytest.raises(ValueError):
        mix_corpus(corpus, "doc_id", "source", "n_tokens", {"web": -0.1}, 100)


def test_null_group_gets_default_share(spark):
    rows = [(i, None if i % 2 else "web", 50) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")
    out = mix_corpus(
        df, "doc_id", "source", "n_tokens", {"web": 0.5}, 20_000,
        salt="s", default_share=0.5,
    )
    null_kept = out.where(F.col("source").isNull()).count()
    # NULL is the unlabeled source: sampled at default_share, not deleted
    assert null_kept > 0
    target_rows = 0.5 * 20_000 / 50  # share*budget / tokens-per-row
    assert abs(null_kept - target_rows) / target_rows < 0.3


def test_zero_token_group_keeps_all(spark):
    rows = [(i, "empty", 0) for i in range(50)] + [(100 + i, "web", 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")
    out = mix_corpus(
        df, "doc_id", "source", "n_tokens", {"web": 0.5, "empty": 0.5}, 1000, salt="s"
    )
    # zero-mass group clamps to keep-all rather than vanishing
    assert out.where(F.col("source") == "empty").count() == 50


# --- temperature mixture resampling (r8) ---


def test_temperature_flattens_toward_uniform(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        temperature_mix,
    )

    # 10:1 imbalanced sources, generous budget: alpha<1 must raise the
    # tail source's kept SHARE vs natural-proportion sampling
    rows = [(i, "big", 10) for i in range(1000)] + [
        (10_000 + i, "small", 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, src string, toks bigint")
    nat = temperature_mix(df, "doc_id", "src", "toks", 4000, alpha=1.0)
    cool = temperature_mix(df, "doc_id", "src", "toks", 4000, alpha=0.3)

    def small_share(kept):
        c = {r["src"]: r["n"] for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
        return c.get("small", 0) / max(1, sum(c.values()))

    assert small_share(cool) > small_share(nat)
    # alpha=1 reproduces natural proportions: keep fractions equal
    fr = {r["src"]: r["keep_fraction"] for r in nat.select("src", "keep_fraction").distinct().collect()}
    assert abs(fr["big"] - fr["small"]) < 1e-9


def test_temperature_mix_laws(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, f"s{i % 4}", 5 + i % 7) for i in range(400)]
    rows.append((9999, None, 100))  # NULL source: dropped by contract
    df = spark.createDataFrame(rows, "doc_id bigint, src string, toks bigint")
    kept = temperature_mix(df, "doc_id", "src", "toks", 500, alpha=0.5, salt="x")
    got = kept.collect()
    assert all(r["src"] is not None for r in got)
    # deterministic under repartition
    again = {
        r["doc_id"]
        for r in temperature_mix(
            df.repartition(13), "doc_id", "src", "toks", 500, alpha=0.5, salt="x"
        ).collect()
    }
    assert {r["doc_id"] for r in got} == again
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mix(df, "doc_id", "src", "toks", 500, alpha=0.0)
    with _pytest.raises(ValueError):
        temperature_mix(
            df.where(F.col("src").isNull()), "doc_id", "src", "toks", 500
        )
