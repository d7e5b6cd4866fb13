"""Deterministic sampling laws: reproducibility under repartitioning,
split complement/stability, and fraction accuracy."""

from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
    with_split,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_sample_is_stable_under_repartition(spark):
    df = _ids(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(df.repartition(17), "doc_id", 0.2).collect()
    }
    assert a == b
    # approximate fraction (hash uniformity): 20% ± 4pp on 2000 ids
    assert abs(len(a) / 2000 - 0.2) < 0.04


def test_salt_rotates_sample(spark):
    df = _ids(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2, salt="x").collect()}
    b = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2, salt="y").collect()}
    assert a != b
    # rotated samples are near-independent: overlap ≈ 4% of ids
    assert len(a & b) < 0.08 * 2000


def test_split_is_a_partition_of_input(spark):
    df = _ids(spark)
    train, test = train_test_split(df, "doc_id", test_fraction=0.25)
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert tr | te == set(range(2000))
    assert tr & te == set()
    assert abs(len(te) / 2000 - 0.25) < 0.04


def test_split_labels_stable(spark):
    df = _ids(spark)
    l1 = {(r.doc_id, r.split) for r in with_split(df, "doc_id", 0.25).collect()}
    l2 = {
        (r.doc_id, r.split)
        for r in with_split(df.repartition(5), "doc_id", 0.25).collect()
    }
    assert l1 == l2


def test_fraction_bounds(spark):
    df = _ids(spark, 10)
    assert deterministic_sample(df, "doc_id", 0.0).count() == 0
    assert deterministic_sample(df, "doc_id", 1.0).count() == 10
    import pytest

    with pytest.raises(ValueError):
        deterministic_sample(df, "doc_id", 1.5)


def test_stratified_exact_counts_and_determinism(spark):
    from pyspark.sql import functions as F

    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        stratified_sample_exact,
    )

    df = _ids(spark).withColumn("grp", F.col("doc_id") % 7)
    tiny = df.where(F.col("doc_id") < 3).withColumn("grp", F.lit(99))  # |stratum|=3
    data = df.union(tiny)

    out = stratified_sample_exact(data, "doc_id", ["grp"], 5)
    sizes = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(sizes[g] == 5 for g in range(7))
    assert sizes[99] == 3  # short stratum: min(n, size)

    # deterministic under repartition
    a = sorted((r["grp"], r["doc_id"]) for r in out.collect())
    b = sorted(
        (r["grp"], r["doc_id"])
        for r in stratified_sample_exact(data.repartition(13), "doc_id", ["grp"], 5).collect()
    )
    assert a == b

    # salt rotates the pick
    c = sorted(
        (r["grp"], r["doc_id"])
        for r in stratified_sample_exact(data, "doc_id", ["grp"], 5, salt="x").collect()
    )
    assert a != c


def test_stratified_plan_prunes_before_exchange(spark):
    """WindowGroupLimit must sit below the shuffle: each map task ships
    only its local top-n per stratum — the property that makes a hot
    stratum ship n·tasks rows instead of its full mass."""
    from pyspark.sql import functions as F

    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        stratified_sample_exact,
    )

    df = _ids(spark).withColumn("grp", F.col("doc_id") % 7)
    plan = (
        stratified_sample_exact(df, "doc_id", ["grp"], 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
    partial = plan.split("Exchange hashpartitioning")[-1]
    assert "WindowGroupLimit" in partial, plan


def test_keep_top_fraction_exact_counts_and_members(spark):
    from pyspark.sql import functions as F

    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        keep_top_fraction,
    )

    rows = [(i, "a" if i < 10 else "b", float(i % 7)) for i in range(17)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string, v double")
    kept = keep_top_fraction(df, "v", ["g"], 0.4, id_col="doc_id")
    by_g = {
        g: sorted(r.doc_id for r in kept.where(F.col("g") == g).collect())
        for g in ("a", "b")
    }
    # ceil(10*0.4)=4 and ceil(7*0.4)=3 — exact per-group counts
    assert len(by_g["a"]) == 4 and len(by_g["b"]) == 3
    # members are the (v desc, id asc) top rows: group a values 0..6,0,1,2
    # -> top: v6(id6), v5(id5), v4(id4), v3(id3)
    assert by_g["a"] == [3, 4, 5, 6]


def test_quantile_gate_approx_tracks_exact(spark):
    """The scale path keeps approximately the requested fraction and its
    kept set contains every row the exact gate keeps above the sketch
    threshold — sanity envelope, not equality (it's approximate)."""
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        keep_top_fraction,
        quantile_gate_approx,
    )

    rows = [(i, "g", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string, v double")
    exact = {r.doc_id for r in keep_top_fraction(df, "v", ["g"], 0.3).collect()}
    approx = {r.doc_id for r in quantile_gate_approx(df, "v", ["g"], 0.3).collect()}
    assert 250 <= len(approx) <= 350  # within sketch tolerance of 300
    # high-value core agrees
    assert {i for i in range(720, 1000)} <= approx
    assert len(exact) == 300


def test_keep_top_fraction_randomized_vs_reference(spark):
    """Seeded randomized inputs vs a python reference: ceil(n*frac)
    rows per group, chosen by (value desc, id asc), ties included by
    id order."""
    import math
    import random

    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        keep_top_fraction,
    )

    for seed, frac in ((5, 0.25), (6, 0.5), (7, 0.9)):
        rng = random.Random(seed)
        rows = [
            (i, rng.choice("xyz"), float(rng.randint(0, 5)))  # many ties
            for i in range(40)
        ]
        want = set()
        for g in "xyz":
            members = sorted(
                (r for r in rows if r[1] == g), key=lambda r: (-r[2], r[0])
            )
            want |= {r[0] for r in members[: math.ceil(len(members) * frac)]}
        df = spark.createDataFrame(rows, "doc_id bigint, g string, v double")
        got = {r.doc_id for r in keep_top_fraction(df, "v", ["g"], frac).collect()}
        assert got == want, (seed, frac)


def test_quantile_gate_approx_containment_on_documents(spark):
    """Registered-key law (r7 verdict task): on the real documents
    corpus the approx gate's kept set must contain the exact gate's
    kept set up to sketch tolerance — at accuracy 10⁴ the rank error is
    ≤ n·10⁻⁴, so losing more than 1% of the exact keepers means the
    threshold path broke, not that the sketch was unlucky. Kept
    fraction must also sit in the registered slot's band."""
    from pyspark.sql import functions as F

    from spark_streaming_sql_s3_connector_spark.functions.text import quality_score
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        keep_top_fraction,
        quantile_gate_approx,
    )
    from spark_streaming_sql_s3_connector_spark.plans.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "lang", F.round(quality_score(F.col("text")), 6).alias("qscore")
    )
    exact = keep_top_fraction(docs, "qscore", ["lang"], 0.4, id_col="doc_id")
    approx = quantile_gate_approx(docs, "qscore", ["lang"], 0.4)
    n_exact = exact.count()
    lost = exact.join(approx.select("doc_id"), "doc_id", "left_anti").count()
    assert lost <= max(1, n_exact // 100), (lost, n_exact)
    n_docs = docs.count()
    assert 0.38 * n_docs <= approx.count() <= 0.48 * n_docs


def test_quantile_gate_collect_thresholds_equals_join_form(spark):
    """collect_thresholds applies the SAME sketch thresholds as a
    literal map filter — row-identical to the broadcast-join form, with
    no Join (and no duplicated value-expression evaluation) in the
    plan."""
    from pyspark.sql import functions as F

    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        quantile_gate_approx,
    )

    rows = [(i, ["a", "b", "c"][i % 3], float((i * 37) % 101)) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string, v double")
    join_form = {
        r.doc_id for r in quantile_gate_approx(df, "v", ["g"], 0.3).collect()
    }
    lit_form = {
        r.doc_id
        for r in quantile_gate_approx(
            df, "v", ["g"], 0.3, collect_thresholds=True
        ).collect()
    }
    assert lit_form == join_form
    plan = (
        quantile_gate_approx(df, "v", ["g"], 0.3, collect_thresholds=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan and "Sort" not in plan
    # multi-column grouping is join-form-only
    import pytest as _pytest

    with _pytest.raises(ValueError, match="one group column"):
        quantile_gate_approx(df, "v", ["g", "doc_id"], 0.3, collect_thresholds=True)


# --- group-aware leakage-free splits (r8) ---


def test_group_split_no_leakage(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        with_group_split,
    )

    df = spark.createDataFrame(
        [(i, f"dom{i % 17}") for i in range(500)], "id bigint, domain string"
    )
    labeled = with_group_split(
        df, "domain", {"test": 0.2, "val": 0.2, "train": 0.6}, salt="s"
    )
    # THE law: every group sits in exactly one split
    per_group = (
        labeled.groupBy("domain").agg(F.count_distinct("split").alias("k")).collect()
    )
    assert all(r["k"] == 1 for r in per_group)
    # partition of the input (fractions sum to 1 -> no NULL split)
    assert labeled.where(F.col("split").isNull()).count() == 0
    assert labeled.count() == 500


def test_group_split_deterministic_under_repartition(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        with_group_split,
    )

    df = spark.createDataFrame(
        [(i, f"d{i % 11}") for i in range(200)], "id bigint, g string"
    )
    a = {
        (r["id"], r["split"])
        for r in with_group_split(df, "g", {"t": 0.5, "u": 0.5}, "z").collect()
    }
    b = {
        (r["id"], r["split"])
        for r in with_group_split(
            df.repartition(13), "g", {"t": 0.5, "u": 0.5}, "z"
        ).collect()
    }
    assert a == b


def test_group_split_nulls_one_pseudo_group(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        with_group_split,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id bigint, g string"
    )
    rows = with_group_split(df, "g", {"a": 0.5, "b": 0.5}).collect()
    null_splits = {r["split"] for r in rows if r["id"] in (1, 2)}
    assert len(null_splits) == 1  # all NULL-keyed rows move together


def test_group_split_holdout_and_validation(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        group_train_test_split,
        with_group_split,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 40}") for i in range(400)], "id bigint, g string"
    )
    # fractions summing < 1: remainder is held out as NULL
    lab = with_group_split(df, "g", {"a": 0.3, "b": 0.3}, salt="h")
    n_null = lab.where(F.col("split").isNull()).count()
    assert 0 < n_null < 400
    # two-way convenience splits partition the input
    tr, te = group_train_test_split(df, "g", 0.3, salt="h")
    assert tr.count() + te.count() == 400
    assert tr.join(te, "id", "inner").count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        with_group_split(df, "g", {})
    with _pytest.raises(ValueError):
        with_group_split(df, "g", {"a": 0.8, "b": 0.3})
    with _pytest.raises(ValueError):
        with_group_split(df, "g", {"a": -0.1})


def test_group_split_scan_local_no_shuffle(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        with_group_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        with_group_split(docs, "source", {"t": 0.1, "r": 0.9})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


# --- deterministic training-order shuffle (r8) ---


def test_shuffle_shards_coordinates_are_a_bijection(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        shuffle_shards,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    coords = shuffle_shards(df, "doc_id", n_shards=7, salt="e0")
    rows = coords.collect()
    assert len(rows) == 500
    # every (shard, pos) unique; pos dense 1..n per shard
    assert len({(r["shard"], r["pos"]) for r in rows}) == 500
    per = {}
    for r in rows:
        per.setdefault(r["shard"], []).append(r["pos"])
    assert set(per) <= set(range(7))
    for ps in per.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_shuffle_shards_deterministic_and_salt_rotates(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        shuffle_shards,
    )

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(df, "doc_id", 5, "e0").collect()
    }
    b = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(df.repartition(17), "doc_id", 5, "e0").collect()
    }
    assert a == b  # any partitioning, same permutation
    c = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(df, "doc_id", 5, "e1").collect()
    }
    assert a != c  # a new salt is a new epoch order
    import pytest as _pytest

    with _pytest.raises(ValueError):
        shuffle_shards(df, "doc_id", 0)


def test_shuffle_shards_single_exchange(spark):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        shuffle_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        shuffle_shards(docs, "doc_id", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1 and "Python" not in plan


def test_write_training_shards_round_trip(spark, tmp_path):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        read_training_shard,
        shuffle_shards,
        write_training_shards,
    )

    df = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    out = str(tmp_path / "shards")
    write_training_shards(df, out, "doc_id", n_shards=6, salt="e0")
    coords = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in shuffle_shards(df, "doc_id", 6, "e0").collect()
    }
    total = 0
    for s in range(6):
        rows = read_training_shard(spark, out, s).collect()
        total += len(rows)
        # stored order == the epoch permutation, dense from 1
        assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
        for r in rows:
            assert coords[(s, r["pos"])] == r["doc_id"]
        # physical file order matches pos order (no read-time sort needed)
        import glob as _glob

        import pyarrow.parquet as _pq

        files = sorted(_glob.glob(f"{out}/shard={s}/part-*.parquet"))
        assert len(files) == 1  # one task wrote the whole shard
        poses = _pq.read_table(files[0], columns=["pos"])["pos"].to_pylist()
        assert poses == sorted(poses)
    assert total == 400
