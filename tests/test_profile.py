"""operators/profile: one-pass per-column dataset profiling.

Exact mode is oracle-backed via the ``table_profile_docs`` registry key;
these tests pin the unit-level laws (null/distinct accounting, portable
min/max rendering, unsupported-type behavior) and the scale properties:
the approx (HLL) variant must plan WITHOUT the Expand row-multiplication
that exact COUNT(DISTINCT) pays, and both modes must read the table once.
"""

import datetime
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [
            Row(i=1, s="b", f=2.5, d=datetime.date(2024, 1, 2), arr=[1, 2]),
            Row(i=2, s="a", f=None, d=datetime.date(2024, 1, 1), arr=[3]),
            Row(i=2, s=None, f=10.0, d=None, arr=None),
            Row(i=None, s="a", f=0.25, d=datetime.date(2024, 3, 1), arr=[]),
        ]
    )


def test_exact_profile_values(sample):
    rows = {r["col_name"]: r for r in profile_table(sample).collect()}
    assert set(rows) == {"i", "s", "f", "d", "arr"}
    for r in rows.values():
        assert r["n_rows"] == 4
    assert rows["i"]["n_null"] == 1 and rows["i"]["n_distinct"] == 2
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["f"]["n_null"] == 1 and rows["f"]["n_distinct"] == 3
    # numeric min/max render via DECIMAL(28,6): numeric order, fixed text
    assert rows["i"]["min_value"] == "1.000000" and rows["i"]["max_value"] == "2.000000"
    assert rows["f"]["min_value"] == "0.250000" and rows["f"]["max_value"] == "10.000000"
    assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "b"
    assert rows["d"]["min_value"] == "2024-01-01" and rows["d"]["max_value"] == "2024-03-01"
    # arrays: counted, but no portable ordering -> NULL min/max
    assert rows["arr"]["n_null"] == 1
    assert rows["arr"]["min_value"] is None and rows["arr"]["max_value"] is None


def test_numeric_min_is_numeric_not_lexicographic(spark):
    # '10.0' < '2.0' lexicographically: the rendering must aggregate in
    # the native type FIRST, then render
    df = spark.range(0, 3).select((F.col("id") * 5 + 2).cast("double").alias("x"))
    r = profile_table(df).collect()[0]
    assert r["min_value"] == "2.000000" and r["max_value"] == "12.000000"


def test_column_subset_and_errors(sample):
    rows = profile_table(sample, ["i", "s"]).collect()
    assert [r["col_name"] for r in rows] == ["i", "s"]
    with pytest.raises(ValueError):
        profile_table(sample, ["nope"])
    with pytest.raises(ValueError):
        profile_table(sample, [])


def test_approx_mode_within_rsd(spark):
    # 1000 distinct ids at rsd=0.05: HLL must land within a generous 3*rsd
    df = spark.range(0, 1000).select(F.col("id").cast("string").alias("k"))
    r = profile_table(df, approx_distinct=True, rsd=0.05).collect()[0]
    assert abs(r["n_distinct"] - 1000) <= 150
    assert r["n_null"] == 0 and r["n_rows"] == 1000


def test_all_null_column(spark):
    df = spark.range(0, 5).select(F.lit(None).cast("string").alias("s"))
    r = profile_table(df).collect()[0]
    assert r["n_null"] == 5 and r["n_distinct"] == 0
    assert r["min_value"] is None and r["max_value"] is None


def _plan(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_profile_single_scan_no_python(spark):
    # both modes: ONE scan of the input, zero Python evaluation
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for approx in (False, True):
        plan = _plan(profile_table(docs, ["doc_id", "lang", "n_chars"], approx), spark)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_approx_profile_has_no_expand(spark):
    # THE 100 TB property: exact k-way COUNT(DISTINCT) pays an Expand
    # (k+1 x row multiplication) + value-keyed shuffle; the HLL mode must
    # be a plain partial/final agg — no Expand, 1-row-per-partition reduce
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = _plan(profile_table(docs, ["doc_id", "lang", "n_chars"]), spark)
    approx = _plan(profile_table(docs, ["doc_id", "lang", "n_chars"], True), spark)
    assert "Expand" in exact  # documents the cost the approx mode removes
    assert "Expand" not in approx
    # partial + final agg survive (HLL is an imperative agg, so Spark
    # plans Sort/ObjectHashAggregate rather than HashAggregate)
    assert "partial_approx_count_distinct" in approx
    assert len(re.findall(r"(?:Sort|ObjectHash|Hash)Aggregate", approx)) >= 2


def test_exact_vs_approx_agree_on_exact_stats(spark):
    # n_rows / n_null / min / max are identical across modes (only
    # n_distinct is approximated)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["doc_id", "lang", "n_chars"]
    e = {r["col_name"]: r for r in profile_table(docs, cols).collect()}
    a = {r["col_name"]: r for r in profile_table(docs, cols, True).collect()}
    for c in cols:
        for f_ in ("n_rows", "n_null", "min_value", "max_value"):
            assert e[c][f_] == a[c][f_]


# --- dataset fingerprint (r8) ---


def test_fingerprint_invariant_under_partitioning(spark):
    from spark_streaming_sql_s3_connector_spark.operators.profile import (
        fingerprint_table,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = fingerprint_table(docs).collect()[0]
    b = fingerprint_table(docs.repartition(17).orderBy(F.rand(7))).collect()[0]
    assert a["fingerprint"] == b["fingerprint"]
    assert a["n_rows"] == b["n_rows"] and a["n_columns"] == b["n_columns"]


def test_fingerprint_flips_on_change(spark):
    from spark_streaming_sql_s3_connector_spark.operators.profile import (
        fingerprint_table,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, s string"
    )
    f0 = fingerprint_table(base).collect()[0]["fingerprint"]
    # membership change
    f1 = fingerprint_table(base.where(F.col("id") != 3)).collect()[0]["fingerprint"]
    # value change that moves a range boundary
    edited = base.withColumn(
        "s", F.when(F.col("id") == 3, F.lit("z")).otherwise(F.col("s"))
    )
    f2 = fingerprint_table(edited).collect()[0]["fingerprint"]
    assert len({f0, f1, f2}) == 3
    # column subset gives a different (narrower) stamp, deterministically
    fa = fingerprint_table(base, ["id"]).collect()[0]
    fb = fingerprint_table(base, ["id"]).collect()[0]
    assert fa["fingerprint"] == fb["fingerprint"] != f0
    assert fa["n_columns"] == 1
