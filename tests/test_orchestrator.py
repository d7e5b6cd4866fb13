"""Hybrid JVM-read orchestrator: batch semantics, crash recovery, and the
remaining reference IT scenarios (json format, schema projection,
DROPMALFORMED) through both read paths."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from spark_streaming_sql_s3_connector_spark.streaming.orchestrator import MicroBatchOrchestrator
from tests.test_streaming_e2e import BASIC_ROWS, BASIC_SCHEMA, write_basic_csv


def make_orch(spark, tmp_path, fmt="csv", **extra):
    opts = {
        "spark.s3conn.fileFormat": fmt,
        "spark.s3conn.queueUrl": f"local://{tmp_path}/queue",
        "spark.s3conn.queueType": "local",
        "spark.s3conn.queueFetchWaitTimeoutSeconds": "1",
    }
    opts.update(extra)
    return MicroBatchOrchestrator(spark, opts, str(tmp_path / "meta"))


def test_orchestrator_basic_and_exactly_once(spark, tmp_path):
    orch = make_orch(spark, tmp_path)
    q = orch.controller.queue_client
    f1 = str(tmp_path / "f1.csv")
    write_basic_csv(f1)
    q.send_file_event(f1, int(time.time() * 1000))
    seen = []
    orch.run_available(BASIC_SCHEMA, lambda df, bid: seen.append((bid, df.count())))
    assert seen == [(0, 3)]
    # duplicate redelivery → no new batch
    q.send_file_event(f1, int(time.time() * 1000))
    orch.run_available(BASIC_SCHEMA, lambda df, bid: seen.append((bid, df.count())))
    assert seen == [(0, 3)]
    orch.close()


def test_orchestrator_crash_replay(spark, tmp_path):
    orch = make_orch(spark, tmp_path)
    q = orch.controller.queue_client
    f1 = str(tmp_path / "f1.csv")
    write_basic_csv(f1)
    q.send_file_event(f1, int(time.time() * 1000))
    # simulate crash AFTER the log append but BEFORE the callback completes
    with pytest.raises(RuntimeError, match="boom"):
        orch.run_once(BASIC_SCHEMA, lambda df, bid: (_ for _ in ()).throw(RuntimeError("boom")))
    orch.close()
    # restart: the logged batch replays into the callback
    orch2 = make_orch(spark, tmp_path)
    seen = []
    orch2.run_available(BASIC_SCHEMA, lambda df, bid: seen.append((bid, df.count())))
    assert seen == [(0, 3)]
    orch2.close()


def test_orchestrator_batching(spark, tmp_path):
    orch = make_orch(spark, tmp_path, **{"spark.s3conn.maxFilesPerTrigger": "1"})
    q = orch.controller.queue_client
    for i in range(3):
        f = str(tmp_path / f"f{i}.csv")
        write_basic_csv(f)
        q.send_file_event(f, int(time.time() * 1000))
    seen = []
    orch.run_available(BASIC_SCHEMA, lambda df, bid: seen.append((bid, df.count())))
    assert seen == [(0, 3), (1, 3), (2, 3)]
    orch.close()


def write_json_file(path, rows=BASIC_ROWS):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps({"testString": r[0], "testBoolean": r[1], "testInt": r[2]}) + "\n")


def test_orchestrator_json_format(spark, tmp_path):
    orch = make_orch(spark, tmp_path, fmt="json")
    q = orch.controller.queue_client
    f1 = str(tmp_path / "f1.json")
    write_json_file(f1)
    q.send_file_event(f1, int(time.time() * 1000))
    got = []
    orch.run_available(BASIC_SCHEMA, lambda df, bid: got.extend(sorted(tuple(r) for r in df.collect())))
    assert got == sorted(BASIC_ROWS)
    orch.close()


def test_schema_projection_permissive_nulls_jvm(spark, tmp_path):
    # B9: project a 3-column csv onto (testInt int) → all-null (reference
    # S3ConnectorSourceItSuite.scala:257-290)
    orch = make_orch(spark, tmp_path)
    q = orch.controller.queue_client
    f1 = str(tmp_path / "f1.csv")
    write_basic_csv(f1)
    q.send_file_event(f1, int(time.time() * 1000))
    narrow = StructType([StructField("testInt", IntegerType())])
    got = []
    orch.run_available(narrow, lambda df, bid: got.extend([r.testInt for r in df.collect()]))
    assert got == [None, None, None]
    orch.close()


def test_drop_malformed_jvm(spark, tmp_path):
    # B10: same projection with mode=DROPMALFORMED → empty (reference
    # S3ConnectorSourceItSuite.scala:292-322)
    orch = make_orch(spark, tmp_path, mode="DROPMALFORMED")
    q = orch.controller.queue_client
    f1 = str(tmp_path / "f1.csv")
    write_basic_csv(f1)
    q.send_file_event(f1, int(time.time() * 1000))
    narrow = StructType([StructField("testInt", IntegerType())])
    got = []
    # NOTE: collect the column — Spark's CSV column pruning means a bare
    # count() parses nothing and DROPMALFORMED never fires
    orch.run_available(narrow, lambda df, bid: got.extend(df.select("testInt").collect()))
    assert got == []
    orch.close()


def test_parquet_by_name_projection_jvm(spark, tmp_path):
    # parquet onto (newtestInt int, testString string): null for missing,
    # by-name for present (reference S3ConnectorSourceItSuite.scala:352-386)
    src = spark.createDataFrame(BASIC_ROWS, BASIC_SCHEMA)
    pdir = str(tmp_path / "pq")
    src.coalesce(1).write.parquet(pdir)
    pfile = next(str(tmp_path / "pq" / f) for f in os.listdir(pdir) if f.endswith(".parquet"))
    orch = make_orch(spark, tmp_path, fmt="parquet")
    q = orch.controller.queue_client
    q.send_file_event(pfile, int(time.time() * 1000))
    proj = StructType(
        [StructField("newtestInt", IntegerType()), StructField("testString", StringType())]
    )
    got = []
    orch.run_available(proj, lambda df, bid: got.extend(sorted((r.newtestInt, r.testString) for r in df.collect())))
    assert got == [(None, "James"), (None, "Michael"), (None, "Robert")]
    orch.close()


def test_jvm_fallback_ingests_text_format(spark, tmp_path):
    """Format-passthrough parity (S3ConnectorSourceOptions.scala:99-100):
    a format outside the Arrow executor set still ingests through the
    JVM read path — the orchestrator hands the format string to
    spark.read.format(...) unchanged, with the same exactly-once
    admission."""
    from pyspark.sql.types import StringType, StructField, StructType

    orch = make_orch(spark, tmp_path, fmt="text")
    q = orch.controller.queue_client
    f1 = str(tmp_path / "lines1.txt")
    with open(f1, "w") as f:
        f.write("alpha\nbeta\ngamma\n")
    q.send_file_event(f1, int(time.time() * 1000))
    schema = StructType([StructField("value", StringType())])
    seen = []
    orch.run_available(
        schema, lambda df, bid: seen.append((bid, sorted(r.value for r in df.collect())))
    )
    assert seen == [(0, ["alpha", "beta", "gamma"])]
    # redelivery screened — exactly-once holds on the fallback path too
    q.send_file_event(f1, int(time.time() * 1000))
    orch.run_available(schema, lambda df, bid: seen.append((bid, df.count())))
    assert len(seen) == 1
    orch.close()


def test_python_source_rejects_unknown_format_with_pointer(spark, tmp_path):
    """fileFormat=avro on format("s3-connector") must fail fast at
    analysis time with a pointer to the JVM-read orchestrator, not die
    in an executor task."""
    from pyspark.sql.types import StringType, StructField, StructType

    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    register(spark)
    schema = StructType([StructField("value", StringType())])
    df = (
        spark.read.format("s3-connector")
        .schema(schema)
        .option("spark.s3conn.fileFormat", "avro")
        .option("spark.s3conn.queueUrl", "unused")
        .option("spark.s3conn.queueType", "local")
        .option("paths", str(tmp_path / "nothing.avro"))
        .load()
    )
    with pytest.raises(Exception, match="MicroBatchOrchestrator"):
        df.count()
