"""Record-level streaming dedup + stream-static enrichment over the
connector source (duplicate records across files, broadcast dim join)."""

import os
import time

from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.plans.io import load_table
from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
from spark_streaming_sql_s3_connector_spark.sources.datasource import register
from spark_streaming_sql_s3_connector_spark.streaming.transforms import (
    dedup_records_stream,
    stream_static_enrich,
)


def _connector_stream(spark, tmp_path, schema):
    return (
        spark.readStream.format("s3-connector")
        .schema(schema)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{tmp_path}/queue")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .option("spark.s3conn.metadataPath", str(tmp_path / "meta"))
        .load()
    )


def test_record_dedup_across_files(spark, tmp_path, sf_dir):
    """Two DIFFERENT files carrying overlapping records: file-level
    admission passes both (distinct paths), record-level dedup must
    collapse the shared event_ids."""
    register(spark)
    ev = load_table(spark, sf_dir, "events").limit(400).cache()
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ev.write.parquet(a)  # records 0..399
    ev.limit(150).write.parquet(b)  # records 0..149 again, different file
    files = [
        os.path.join(d, f)
        for d in (a, b)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    ]
    q = LocalFileQueueClient(f"local://{tmp_path}/queue")
    for f in files:
        q.send_file_event(f, int(time.time() * 1000))

    stream = _connector_stream(spark, tmp_path, ev.schema)
    deduped = dedup_records_stream(stream, ["event_id"], ts_col="ts", watermark="10 minutes")
    query = (
        deduped.writeStream.format("memory")
        .queryName("rec_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        n = spark.sql("SELECT COUNT(DISTINCT event_id) c FROM rec_dedup").collect()[0].c
        total = spark.sql("SELECT COUNT(*) c FROM rec_dedup").collect()[0].c
        assert n == 400
        assert total == 400  # duplicates dropped, not just distinct-counted
    finally:
        query.stop()


def test_stream_static_enrich_broadcast(spark, tmp_path, sf_dir):
    register(spark)
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "files")
    ev.repartition(2).write.parquet(out)
    files = [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")]
    q = LocalFileQueueClient(f"local://{tmp_path}/queue")
    for f in files:
        q.send_file_event(f, int(time.time() * 1000))

    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"),
         ("signup", "growth"), ("error", "ops")],
        ["event_type", "category"],
    )
    stream = _connector_stream(spark, tmp_path, ev.schema)
    enriched = stream_static_enrich(stream, dim, "event_type").groupBy("category").agg(
        F.count("*").alias("cnt")
    )
    query = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = {r.category: r.cnt for r in spark.sql("SELECT * FROM enriched").collect()}
        truth = {
            r.category: r.cnt
            for r in ev.join(dim, "event_type").groupBy("category").agg(F.count("*").alias("cnt")).collect()
        }
        assert got == truth
    finally:
        query.stop()
