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


# ---------------------------------------------------------------------------
# UniMax (operators/sampling.unimax_plan / unimax_mix)


def test_unimax_plan_water_filling_exact():
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        unimax_plan,
    )

    totals = {"de": 100, "en": 1000, "fr": 150}
    # budget below all caps: uniform level B/3, nobody saturates
    plan = unimax_plan(totals, 150, max_epochs=2)
    assert plan["de"] == round(50 / 100, 12)
    assert plan["en"] == round(50 / 1000, 12)
    assert plan["fr"] == round(50 / 150, 12)
    # mixed: de saturates at cap 200, rest split the remainder
    plan = unimax_plan(totals, 1000, max_epochs=2)
    assert plan["de"] == 2.0
    assert plan["fr"] == round(400 / 150, 12) if 400 / 150 <= 2 else True
    # budget >= sum of caps: everyone at max_epochs exactly
    plan = unimax_plan(totals, 10**9, max_epochs=3)
    assert plan == {"de": 3.0, "en": 3.0, "fr": 3.0}
    # allocation never exceeds the cap and fills the budget when it can
    plan = unimax_plan(totals, 1000, max_epochs=2)
    alloc = sum(plan[g] * totals[g] for g in plan)
    assert alloc == pytest.approx(min(1000, 2 * sum(totals.values())))
    assert all(0 < e <= 2 for e in plan.values())


def test_unimax_plan_validation():
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        unimax_plan,
    )

    with pytest.raises(ValueError):
        unimax_plan({"a": 10}, 0, 2)
    with pytest.raises(ValueError):
        unimax_plan({"a": 10}, 100, 0)
    with pytest.raises(ValueError):
        unimax_plan({"a": 0}, 100, 2)


def test_unimax_mix_replication_law(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        unimax_mix,
        unimax_plan,
    )

    rows = [(i, "tail" if i < 20 else "head", 10) for i in range(220)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "toks"])
    out = unimax_mix(df, "doc_id", "src", "toks", token_budget=1500, max_epochs=3)
    plan = unimax_plan({"tail": 200, "head": 2000}, 1500, 3)
    got = out.groupBy("doc_id", "src").agg(
        F.count(F.lit(1)).alias("n"), F.max("epoch").alias("mx")
    )
    import math

    for r in got.collect():
        e = plan[r["src"]]
        # every kept doc appears floor(e) or ceil(e) times, epochs 1..n
        assert r["n"] in (math.floor(e), math.ceil(e))
        assert r["mx"] == r["n"]
    # group-level token mass ≈ e · total (hash resolution 1e-4)
    mass = {
        r["src"]: r["m"]
        for r in out.groupBy("src").agg(F.sum("toks").alias("m")).collect()
    }
    for g, total in (("tail", 200), ("head", 2000)):
        assert mass.get(g, 0) == pytest.approx(plan[g] * total, rel=0.15)
    # deterministic
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            unimax_mix(
                df, "doc_id", "src", "toks", token_budget=1500, max_epochs=3
            ).collect(),
        )
    )
    assert a == b


def test_unimax_mix_drops_null_groups(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        unimax_mix,
    )

    rows = [(1, "a", 10), (2, None, 10), (3, "a", 10)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "toks"])
    out = unimax_mix(df, "doc_id", "src", "toks", token_budget=100, max_epochs=2)
    assert {r["doc_id"] for r in out.collect()} == {1, 3}
