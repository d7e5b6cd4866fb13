"""Table loading for the driver's synthetic star schema (TESTDATA.md).

Stays on Spark's native vectorized parquet scan (whole-stage codegen,
predicate pushdown, column pruning all apply). The one wrinkle: the
driver-generated ``events.parquet`` stores nanosecond timestamps, which
Spark's reader rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos as
long (``spark.sql.legacy.parquet.nanosAsLong``) and convert JVM-side with
``timestamp_micros`` — no Python in the path, scan stays vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# columns stored as TIMESTAMP(NANOS) per table (read as long, convert)
_NANOS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _NANOS_COLS.get(name, [])
    if nanos_cols:
        # SESSION-LEVEL side effect, deliberately not restored: the scan
        # re-reads this conf at action time, so flipping it back after
        # planning would break the very read it enables. It only changes
        # how TIMESTAMP(NANOS) parquet columns materialize (long instead
        # of an error) — non-nanos reads are unaffected. A concurrent
        # query in the SAME session that wants nanos-as-timestamp
        # semantics must use its own session (sparkSession.newSession()).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div`, NOT `/`: double division loses precision at
            # 16-digit nanosecond values (off-by-one microseconds)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to executors via addPyFile so Python data source
    workers can import it even when the host session was launched without
    the repo on PYTHONPATH (e.g. an external verification harness)."""
    if getattr(spark, "_s3conn_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_name = os.path.basename(pkg_dir)
    fd, zpath = tempfile.mkstemp(prefix="s3conn-pkg-", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark._s3conn_pkg_shipped = True
