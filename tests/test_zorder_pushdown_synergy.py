"""Z-order clustering x filter pushdown: the combined 100 TB scan story.

Clustering bounds each output file's per-column value span
(operators/zorder.py); the pushdown reader prunes parquet row groups by
footer min/max stats (sources/file_read.py). Together, a selective
predicate over a clustered layout reads a small fraction of the data —
this test pins that the SAME predicate prunes row groups under the
clustered layout and cannot prune under a value-interleaved layout."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.zorder import zorder_dataframe
from spark_streaming_sql_s3_connector_spark.sources.file_read import (
    _row_group_may_match,
    read_file_to_table,
)


@pytest.fixture()
def layouts(spark, tmp_path):
    """One dataset, two single-file layouts with 8 row groups each:
    clustered (sorted by zorder code over x,y) vs adversarially
    interleaved (x alternates low/high so every group spans the full
    range)."""
    n = 8000
    df = spark.range(n).select(
        (F.col("id") % 89).cast("double").alias("x"),
        ((F.col("id") * 7) % 97).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )
    clustered = zorder_dataframe(df, ["x", "y"], n_files=1)
    c_dir = str(tmp_path / "clustered")
    clustered.coalesce(1).write.parquet(c_dir)
    # interleaved: order by payload parity then id — x cycles 0..88
    # throughout the file, so every row group sees min≈0, max≈88
    i_dir = str(tmp_path / "interleaved")
    df.orderBy((F.col("payload") % 2), "payload").coalesce(1).write.parquet(i_dir)

    def single_file(d, rows_per_group=1000):
        src = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        # rewrite with fixed row-group size so both layouts have 8 groups
        t = pq.read_table(os.path.join(d, src))
        out = os.path.join(d, "regrouped.parquet")
        pq.write_table(t, out, row_group_size=rows_per_group)
        return out

    return single_file(c_dir), single_file(i_dir)


def test_clustered_layout_prunes_interleaved_does_not(layouts):
    clustered, interleaved = layouts
    pred = [("le", "x", 10.0)]  # selective: x <= 10 of 0..88

    def surviving_groups(path):
        md = pq.ParquetFile(path).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = {n: i for i, n in enumerate(names)}
        return [
            g for g in range(md.num_row_groups)
            if _row_group_may_match(md, g, idx, pred)
        ], md.num_row_groups

    c_kept, c_total = surviving_groups(clustered)
    i_kept, i_total = surviving_groups(interleaved)
    assert c_total == 8 and i_total == 8
    # clustering makes footer stats selective; interleaving defeats them.
    # Morton order trades some single-column selectivity for pruning on
    # BOTH dimensions, so expect meaningfully-fewer (not minimal) groups.
    assert len(c_kept) <= c_total - 2, f"clustered kept {len(c_kept)}/{c_total}"
    assert len(i_kept) == i_total, f"interleaved should keep all, kept {len(i_kept)}"


def test_pruned_read_is_still_exact(spark, layouts):
    clustered, _ = layouts
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("x", DoubleType()),
            StructField("y", DoubleType()),
            StructField("payload", LongType()),
        ]
    )
    t = read_file_to_table(
        clustered, "parquet", schema, {}, [], None, pushed_filters=[("le", "x", 10.0)]
    )
    # group pruning is a superset of the exact answer; the exact filter
    # runs later — here just pin that no qualifying row was dropped
    got_payloads = {
        p for x, p in zip(t.column("x").to_pylist(), t.column("payload").to_pylist())
        if x <= 10.0
    }
    expect = {i for i in range(8000) if (i % 89) <= 10}
    assert got_payloads == expect
