"""operators/drift: snapshot diff + distribution drift laws.

The two registry keys (`snapshot_diff_docs`, `drift_profile_docs`) are
oracle-backed; these tests pin the semantic edge cases (NULL vs empty,
NULL ids, compare subsets, bin clamping) and the scale property that the
diff's id shuffle carries hashes, never document bodies.
"""

import math
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.drift import (
    categorical_drift,
    numeric_drift,
    snapshot_diff,
    snapshot_diff_summary,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, a string, b bigint")


def test_diff_classifies_all_statuses(spark):
    old = _mk(spark, [(1, "x", 1), (2, "y", 2), (3, "z", 3)])
    new = _mk(spark, [(2, "y", 2), (3, "z", 99), (4, "w", 4)])
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    summ = {r["status"]: r["n_docs"] for r in snapshot_diff_summary(old, new, "id").collect()}
    assert summ == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_null_vs_empty_and_boundary_shift(spark):
    # NULL != '' and ('ab','c') != ('a','bc') under the length-prefixed
    # rendering
    old = _mk(spark, [(1, "", 1), (2, "ab", 1)])
    new = spark.createDataFrame([(1, None, 1), (2, "a", 1)], "id bigint, a string, b bigint")
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["a", "b"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_compare_subset_ignores_volatile_cols(spark):
    old = _mk(spark, [(1, "x", 1)])
    new = _mk(spark, [(1, "x", 999)])
    got = snapshot_diff(old, new, "id", ["a"]).collect()
    assert got[0]["status"] == "unchanged"


def test_null_id_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    old = spark.createDataFrame([(None, "x", 1)], "id bigint, a string, b bigint")
    new = _mk(spark, [(1, "x", 1)])
    with pytest.raises((Py4JJavaError, PySparkException), match="NULL id"):
        snapshot_diff(old, new, "id").collect()


def test_no_shared_columns_raises(spark):
    old = _mk(spark, [(1, "x", 1)])
    with pytest.raises(ValueError):
        snapshot_diff(old, old.select("id"), "id")


def test_diff_shuffle_carries_hashes_not_bodies(spark):
    # THE scale property: the full outer join's Exchanges must move
    # (id, md5) pairs only — the 'a' (body) column never reaches a
    # shuffle. Parse the formatted plan's per-node Input lists.
    old = _mk(spark, [(1, "x" * 100, 1)])
    new = _mk(spark, [(1, "x" * 100, 1)])
    plan = (
        snapshot_diff(old, new, "id")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    # detail sections start at "(n) NodeName"; Exchange inputs must not
    # reference the body column 'a#'
    for sect in re.split(r"\n\(\d+\) ", plan):
        if sect.startswith("Exchange"):
            inp = [l for l in sect.splitlines() if l.startswith("Input")]
            assert inp and "a#" not in inp[0], sect


def test_categorical_drift_identical_snapshots(spark):
    df = spark.createDataFrame(
        [("en",)] * 6 + [("de",)] * 3 + [(None,)], "lang string"
    )
    rows = categorical_drift(df, df, "lang").collect()
    assert len(rows) == 3  # en, de, NULL-token
    for r in rows:
        assert r["n_old"] == r["n_new"]
        assert r["share_old"] == r["share_new"]
        assert r["psi_term"] == 0.0
    assert abs(sum(r["share_old"] for r in rows) - 1.0) < 1e-9


def test_categorical_drift_disjoint_is_large(spark):
    old = spark.createDataFrame([("en",)] * 5, "lang string")
    new = spark.createDataFrame([("de",)] * 5, "lang string")
    rows = {r["bucket"]: r for r in categorical_drift(old, new, "lang").collect()}
    psi = sum(r["psi_term"] for r in rows.values())
    assert psi > 1.0  # total shift is a huge PSI
    assert rows["en"]["n_new"] == 0 and rows["de"]["n_old"] == 0
    # smoothing keeps every term finite
    assert all(math.isfinite(r["psi_term"]) for r in rows.values())


def test_numeric_drift_bins_clamp_and_null(spark):
    old = spark.createDataFrame([(x,) for x in [-5.0, 0.0, 10.0, 99.9, 250.0, None]], "v double")
    rows = {r["bucket"]: r for r in numeric_drift(old, old, "v", 0.0, 100.0, n_bins=4).collect()}
    # -5 clamps into bin 0; 250 clamps into bin 3; NULL has its own bucket
    assert rows["0000"]["n_old"] == 3  # -5, 0, 10
    assert rows["0003"]["n_old"] == 2  # 99.9, 250
    assert rows["\x20NULL"]["n_old"] == 1
    assert set(rows) == {"0000", "0003", "\x20NULL"}


def test_numeric_drift_validates_args(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        numeric_drift(df, df, "v", 5.0, 5.0)
    with pytest.raises(ValueError):
        numeric_drift(df, df, "v", 0.0, 1.0, n_bins=1)


def test_drift_detects_planted_shift(spark):
    # a 20-point share move on one value dominates the PSI
    old = spark.createDataFrame([("en",)] * 8 + [("de",)] * 2, "lang string")
    new = spark.createDataFrame([("en",)] * 6 + [("de",)] * 4, "lang string")
    rows = categorical_drift(old, new, "lang").collect()
    psi = sum(r["psi_term"] for r in rows)
    # (0.6-0.8)ln(0.6/0.8) + (0.4-0.2)ln(0.4/0.2) ~ 0.196
    assert 0.1 < psi < 0.3


def test_embedding_drift_numpy_parity(spark):
    """Per-dim moments match numpy computed on the 6-dp-rounded
    elements (the operator's spec'd grid), and mean_shift is the
    standardized effect size."""
    import random

    import numpy as np

    from spark_streaming_sql_s3_connector_spark.operators.drift import (
        embedding_drift,
    )

    rng = random.Random(3)
    old = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(50)]
    new = [(i, [rng.gauss(0.3, 1.2) for _ in range(6)]) for i in range(40)]
    got = embedding_drift(
        spark.createDataFrame(old, ["id", "v"]),
        spark.createDataFrame(new, ["id", "v"]),
        "v",
    ).collect()
    ao = np.round(np.asarray([v for _, v in old]), 6)
    an = np.round(np.asarray([v for _, v in new]), 6)
    assert [r.dim for r in got] == list(range(6))
    for r in got:
        d = r.dim
        mo, mn = ao[:, d].mean(), an[:, d].mean()
        vo = (ao[:, d] ** 2).mean() - mo * mo
        vn = (an[:, d] ** 2).mean() - mn * mn
        assert abs(r.mean_old - mo) < 1e-8 and abs(r.mean_new - mn) < 1e-8
        assert abs(r.var_old - vo) < 1e-8 and abs(r.var_new - vn) < 1e-8
        assert abs(r.mean_shift - abs(mn - mo) / (vo + 1e-12) ** 0.5) < 1e-7


def test_embedding_drift_identical_snapshots_zero_shift(spark):
    from spark_streaming_sql_s3_connector_spark.operators.drift import (
        embedding_drift,
    )

    rows = [(i, [float(i % 5), 1.5]) for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "v"])
    for r in embedding_drift(df, df, "v").collect():
        assert r.mean_shift == 0.0
        assert r.mean_old == r.mean_new and r.var_old == r.var_new
