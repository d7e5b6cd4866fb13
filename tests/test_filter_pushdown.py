"""Filter pushdown through the Python data source (Spark 4.1
``DataSourceReader.pushFilters``): accepted comparisons prune parquet row
groups via footer statistics and filter rows before the Arrow->JVM
transfer; everything else is returned to Spark for re-evaluation.

The reference delegates batch reads to stock Spark and inherits JVM
pushdown (S3ConnectorSource.scala:170-181); this is the same capability
on the Python read path."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    In,
    IsNotNull,
    Not,
    StringStartsWith,
)
from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spark_streaming_sql_s3_connector_spark.sources.datasource import (
    S3ConnectorBatchReaderWithPushdown,
    register,
)
from spark_streaming_sql_s3_connector_spark.sources.file_read import (
    read_file_to_table,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("v", DoubleType()),
        StructField("s", StringType()),
    ]
)


@pytest.fixture()
def pq_file(tmp_path):
    """4 row groups of 25 rows each; k is 0..99 ascending so each group's
    footer min/max spans 25 consecutive keys."""
    path = str(tmp_path / "data.parquet")
    tbl = pa.table(
        {
            "k": pa.array(range(100), pa.int64()),
            "v": pa.array([float(i % 10) for i in range(100)], pa.float64()),
            "s": pa.array([f"row{i:03d}" for i in range(100)]),
        }
    )
    pq.write_table(tbl, path, row_group_size=25)
    assert pq.ParquetFile(path).num_row_groups == 4
    return path


@pytest.fixture()
def pushdown_spark(spark):
    """Session with Python-data-source filter pushdown enabled (the
    reader subclass is chosen per-session off this conf)."""
    key = "spark.sql.python.filterPushdown.enabled"
    spark.conf.set(key, "true")
    yield spark
    spark.conf.set(key, "false")


def _reader(paths):
    return S3ConnectorBatchReaderWithPushdown(
        SCHEMA,
        {
            "spark.s3conn.fileFormat": "parquet",
            "spark.s3conn.queueUrl": "unused",
            "spark.s3conn.queueType": "local",
            "paths": ",".join(paths) if isinstance(paths, list) else paths,
        },
    )


def test_push_filters_partitions_accept_and_reject(pq_file):
    r = _reader(pq_file)
    rejected = list(
        r.pushFilters(
            [
                GreaterThan(("k",), 80),  # accepted
                In(("s",), ("row001", "row002")),  # accepted
                IsNotNull(("v",)),  # accepted
                StringStartsWith(("s",), "row0"),  # accepted (r6): prefix range
                Not(EqualTo(("k",), 5)),  # wrapped -> rejected
                EqualTo(("nope",), 1),  # unknown column
            ]
        )
    )
    assert [type(f).__name__ for f in rejected] == [
        "Not",
        "EqualTo",
    ]
    assert r._pushed_filters == [
        ("gt", "k", 80),
        ("in", "s", ("row001", "row002")),
        ("notnull", "v", None),
        ("startswith", "s", "row0"),
    ]


def test_row_group_pruning_by_footer_stats(pq_file):
    # k > 80 excludes the first 3 of 4 row groups entirely
    t = read_file_to_table(
        pq_file, "parquet", SCHEMA, {}, [], None, pushed_filters=[("gt", "k", 80)]
    )
    # pruning alone keeps only the last group (25 rows, k in 75..99) —
    # exact row filtering happens later in iter_record_batches
    assert t.num_rows == 25
    assert min(t.column("k").to_pylist()) == 75
    # a filter excluding every group short-circuits to an empty table
    t2 = read_file_to_table(
        pq_file, "parquet", SCHEMA, {}, [], None, pushed_filters=[("gt", "k", 1000)]
    )
    assert t2.num_rows == 0 and t2.schema.names == ["k", "v", "s"]


def test_exact_filtering_through_reader(pq_file):
    r = _reader(pq_file)
    list(r.pushFilters([GreaterThan(("k",), 90)]))
    rows = []
    for part in r.partitions():
        for rb in r.read(part):
            rows.extend(rb.to_pylist())
    # exact: 91..99, not just the surviving row group's 75..99
    assert sorted(x["k"] for x in rows) == list(range(91, 100))


def test_e2e_filtered_read_matches_jvm(pushdown_spark, pq_file):
    spark = pushdown_spark
    register(spark)
    df = (
        spark.read.format("s3-connector")
        .schema(SCHEMA)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", "unused")
        .option("spark.s3conn.queueType", "local")
        .option("paths", pq_file)
        .load()
    )
    got = (
        df.where((F.col("k") > 40) & (F.col("v") <= 3.0) & F.col("s").isNotNull())
        .select("k")
        .orderBy("k")
        .collect()
    )
    expect = (
        spark.read.parquet(pq_file)
        .where((F.col("k") > 40) & (F.col("v") <= 3.0) & F.col("s").isNotNull())
        .select("k")
        .orderBy("k")
        .collect()
    )
    assert [r.k for r in got] == [r.k for r in expect]
    assert len(got) > 0


def test_nan_ordering_divergence_not_pushed(pushdown_spark, tmp_path):
    """Spark orders NaN greater than every double; pyarrow follows IEEE.
    gt/ge on a float column must therefore be REJECTED (Spark
    re-evaluates them and NaN rows survive `v > 1`); lt stays pushed and
    agrees in both engines."""
    import math

    from pyspark.sql.datasource import GreaterThan, LessThan

    spark = pushdown_spark
    path = str(tmp_path / "nan.parquet")
    tbl = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([0.5, 2.0, float("nan"), 3.0], pa.float64()),
            "s": pa.array(["a", "b", "c", "d"]),
        }
    )
    pq.write_table(tbl, path)
    # unit: gt on double rejected, lt accepted, gt on int accepted
    r = _reader(path)
    rejected = list(r.pushFilters([GreaterThan(("v",), 1.0), LessThan(("v",), 1.0), GreaterThan(("k",), 1)]))
    assert [type(f).__name__ for f in rejected] == ["GreaterThan"]
    assert r._pushed_filters == [("lt", "v", 1.0), ("gt", "k", 1)]
    # e2e: the connector must reproduce Spark's NaN semantics exactly
    register(spark)
    df = (
        spark.read.format("s3-connector")
        .schema(SCHEMA)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", "unused")
        .option("spark.s3conn.queueType", "local")
        .option("paths", path)
        .load()
    )
    got = sorted(r.k for r in df.where(F.col("v") > 1.0).select("k").collect())
    expect = sorted(
        r.k for r in spark.read.parquet(path).where(F.col("v") > 1.0).select("k").collect()
    )
    assert got == expect
    assert 3 in got, "Spark semantics: the NaN row satisfies v > 1.0"


def test_e2e_rejected_filters_still_applied_by_spark(pushdown_spark, pq_file):
    spark = pushdown_spark
    register(spark)
    df = (
        spark.read.format("s3-connector")
        .schema(SCHEMA)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", "unused")
        .option("spark.s3conn.queueType", "local")
        .option("paths", pq_file)
        .load()
    )
    # startswith is pushed since r6 (applied exactly by the reader);
    # Not(...) stays rejected -> Spark must evaluate it post-scan
    got = df.where(F.col("s").startswith("row09")).count()
    assert got == 10


def test_nan_stats_do_not_prune_row_groups():
    """Legacy parquet writers fold NaN into float min/max stats; NaN
    comparisons evaluate False, so e.g. 'lt' with lo=NaN would turn
    'not (lo < val)' into True and silently prune a group containing
    matches. The guard must keep any group whose min or max is NaN."""
    from spark_streaming_sql_s3_connector_spark.sources.file_read import (
        _row_group_may_match,
    )

    class _Stats:
        def __init__(self, lo, hi):
            self.has_min_max = True
            self.min, self.max = lo, hi

    class _Col:
        def __init__(self, stats):
            self.statistics = stats

    class _Group:
        def __init__(self, stats):
            self._c = _Col(stats)

        def column(self, i):
            return self._c

    class _MD:
        def __init__(self, stats):
            self._g = _Group(stats)

        def row_group(self, rg):
            return self._g

    nan = float("nan")
    col_idx = {"v": 0}
    for bad in [_MD(_Stats(nan, 5.0)), _MD(_Stats(0.0, nan)), _MD(_Stats(nan, nan))]:
        for op, val in [("lt", 1.0), ("le", 1.0), ("gt", 1.0), ("ge", 1.0), ("eq", 1.0), ("in", (1.0,))]:
            assert _row_group_may_match(bad, 0, col_idx, [(op, "v", val)]), (op, val)
    # sane float stats still prune
    ok = _MD(_Stats(10.0, 20.0))
    assert not _row_group_may_match(ok, 0, col_idx, [("lt", "v", 5.0)])
    assert _row_group_may_match(ok, 0, col_idx, [("lt", "v", 15.0)])


# ---- r6: string-prefix and date32 pushdown ----


def test_string_prefix_prunes_row_groups(pq_file):
    # s is 'row000'..'row099' across 4 groups of 25; prefix 'row09' only
    # intersects the last group's ['row075','row099'] stats range
    t = read_file_to_table(
        pq_file, "parquet", SCHEMA, {}, [], None,
        pushed_filters=[("startswith", "s", "row09")],
    )
    assert t.num_rows == 25  # 3 of 4 groups pruned by footer stats
    assert min(t.column("s").to_pylist()) == "row075"
    # a prefix beyond every group's range prunes everything
    t2 = read_file_to_table(
        pq_file, "parquet", SCHEMA, {}, [], None,
        pushed_filters=[("startswith", "s", "zzz")],
    )
    assert t2.num_rows == 0
    # prefix below every group: 'aaa' < all stats -> also everything
    t3 = read_file_to_table(
        pq_file, "parquet", SCHEMA, {}, [], None,
        pushed_filters=[("startswith", "s", "aaa")],
    )
    assert t3.num_rows == 0


def test_string_prefix_exact_rows_through_reader(pq_file):
    r = _reader(pq_file)
    assert list(r.pushFilters([StringStartsWith(("s",), "row09")])) == []
    rows = []
    for part in r.partitions():
        for rb in r.read(part):
            rows.extend(rb.to_pylist())
    # exact: only row090..row099, not the surviving group's 75..99
    assert sorted(x["s"] for x in rows) == [f"row{i:03d}" for i in range(90, 100)]


def test_prefix_upper_bound_edge_cases():
    from spark_streaming_sql_s3_connector_spark.sources.file_read import (
        _prefix_upper_bound,
    )

    assert _prefix_upper_bound("abc") == "abd"
    assert _prefix_upper_bound("ab" + chr(0x10FFFF)) == "ac"
    assert _prefix_upper_bound(chr(0x10FFFF)) is None  # no upper bound


DATE_SCHEMA = StructType(
    [StructField("k", LongType()), StructField("d", DateType())]
)


@pytest.fixture()
def date_pq_file(tmp_path):
    import datetime

    path = str(tmp_path / "dates.parquet")
    base = datetime.date(2024, 1, 1)
    tbl = pa.table(
        {
            "k": pa.array(range(100), pa.int64()),
            "d": pa.array(
                [base + datetime.timedelta(days=i) for i in range(100)],
                pa.date32(),
            ),
        }
    )
    pq.write_table(tbl, path, row_group_size=25)
    return path


def test_date_pushdown_accept_and_prune(date_pq_file):
    import datetime

    r = S3ConnectorBatchReaderWithPushdown(
        DATE_SCHEMA,
        {
            "spark.s3conn.fileFormat": "parquet",
            "spark.s3conn.queueUrl": "unused",
            "spark.s3conn.queueType": "local",
            "paths": date_pq_file,
        },
    )
    cut = datetime.date(2024, 1, 1) + datetime.timedelta(days=80)
    assert list(r.pushFilters([GreaterThan(("d",), cut)])) == []
    assert r._pushed_filters == [("gt", "d", cut)]
    # row-group pruning on date32 stats: first 3 of 4 groups excluded
    t = read_file_to_table(
        date_pq_file, "parquet", DATE_SCHEMA, {}, [], None,
        pushed_filters=[("gt", "d", cut)],
    )
    assert t.num_rows == 25
    # exact rows through the reader
    rows = []
    for part in r.partitions():
        for rb in r.read(part):
            rows.extend(rb.to_pylist())
    assert sorted(x["k"] for x in rows) == list(range(81, 100))
    # timestamp literals stay rejected (datetime is a date subclass —
    # must not slip through the date acceptance)
    r2 = S3ConnectorBatchReaderWithPushdown(
        DATE_SCHEMA,
        {
            "spark.s3conn.fileFormat": "parquet",
            "spark.s3conn.queueUrl": "unused",
            "spark.s3conn.queueType": "local",
            "paths": date_pq_file,
        },
    )
    rej = list(r2.pushFilters([GreaterThan(("d",), datetime.datetime(2024, 3, 1))]))
    assert len(rej) == 1 and r2._pushed_filters == []


def test_e2e_prefix_and_date_match_jvm(pushdown_spark, date_pq_file, pq_file):
    import datetime

    spark = pushdown_spark
    register(spark)
    # prefix predicate
    df = (
        spark.read.format("s3-connector")
        .schema(SCHEMA)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", "unused")
        .option("spark.s3conn.queueType", "local")
        .option("paths", pq_file)
        .load()
    )
    got = df.where(F.col("s").startswith("row04")).select("k").orderBy("k").collect()
    expect = (
        spark.read.parquet(pq_file)
        .where(F.col("s").startswith("row04"))
        .select("k")
        .orderBy("k")
        .collect()
    )
    assert [r.k for r in got] == [r.k for r in expect] and len(got) == 10
    # date predicate
    dfd = (
        spark.read.format("s3-connector")
        .schema(DATE_SCHEMA)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", "unused")
        .option("spark.s3conn.queueType", "local")
        .option("paths", date_pq_file)
        .load()
    )
    cut = datetime.date(2024, 2, 15)
    gotd = dfd.where(F.col("d") >= F.lit(cut)).select("k").orderBy("k").collect()
    expectd = (
        spark.read.parquet(date_pq_file)
        .where(F.col("d") >= F.lit(cut))
        .select("k")
        .orderBy("k")
        .collect()
    )
    assert [r.k for r in gotd] == [r.k for r in expectd] and len(gotd) > 0
