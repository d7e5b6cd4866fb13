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
        # runtime-settable; affects only nanos columns (others unchanged)
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
