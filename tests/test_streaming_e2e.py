"""End-to-end streaming through format("s3-connector") — the local-queue
mirror of the reference's IT scenarios (S3ConnectorSourceItSuite.scala):
basic ingest, exactly-once duplicate screening, maxFilesPerTrigger
batching, partition columns, checkpoint restart."""

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
from spark_streaming_sql_s3_connector_spark.sources.datasource import register

BASIC_SCHEMA = StructType(
    [
        StructField("testString", StringType()),
        StructField("testBoolean", BooleanType()),
        StructField("testInt", IntegerType()),
    ]
)
# reference golden rows (S3ConnectorItBase.scala:43-47)
BASIC_ROWS = [("James", True, 3000), ("Michael", False, 5000), ("Robert", False, 5000)]


def write_basic_csv(path: str, rows=BASIC_ROWS, header=False, sep=","):
    with open(path, "w") as f:
        if header:
            f.write(sep.join(["testString", "testBoolean", "testInt"]) + "\n")
        for r in rows:
            f.write(sep.join([r[0], str(r[1]).lower(), str(r[2])]) + "\n")


def base_options(tmp_path, fmt="csv", **extra):
    opts = {
        "spark.s3conn.fileFormat": fmt,
        "spark.s3conn.queueUrl": f"local://{tmp_path}/queue",
        "spark.s3conn.queueType": "local",
        "spark.s3conn.queueFetchWaitTimeoutSeconds": "1",
        "spark.s3conn.metadataPath": str(tmp_path / "meta"),
    }
    opts.update(extra)
    return opts


def start_stream(spark, tmp_path, schema, opts, query_name):
    reader = spark.readStream.format("s3-connector").schema(schema)
    for k, v in opts.items():
        reader = reader.option(k, v)
    df = reader.load()
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )


@pytest.fixture()
def queue(tmp_path):
    return LocalFileQueueClient(f"local://{tmp_path}/queue")


def test_csv_ingest_and_exactly_once(spark, tmp_path, queue):
    register(spark)
    f1 = str(tmp_path / "f1.csv")
    write_basic_csv(f1)
    queue.send_file_event(f1, int(time.time() * 1000))
    q = start_stream(spark, tmp_path, BASIC_SCHEMA, base_options(tmp_path), "e2e_csv")
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.sql("SELECT * FROM e2e_csv").collect())
        assert got == sorted(BASIC_ROWS)
        # duplicate event: ignored (S3ConnectorSourceItSuite.scala:415-458)
        queue.send_file_event(f1, int(time.time() * 1000))
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) c FROM e2e_csv").collect()[0].c == 3
    finally:
        q.stop()


def test_csv_header_and_custom_sep(spark, tmp_path, queue):
    register(spark)
    f1 = str(tmp_path / "f1.csv")
    write_basic_csv(f1, header=True, sep="|")
    queue.send_file_event(f1, int(time.time() * 1000))
    q = start_stream(
        spark, tmp_path, BASIC_SCHEMA,
        base_options(tmp_path, header="true", sep="|"), "e2e_csv_hdr",
    )
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.sql("SELECT * FROM e2e_csv_hdr").collect())
        assert got == sorted(BASIC_ROWS)
    finally:
        q.stop()


def test_partition_columns(spark, tmp_path, queue):
    register(spark)
    base = tmp_path / "data"
    # StructType.add mutates in place - copy so the shared schema stays 3 fields
    schema = StructType(list(BASIC_SCHEMA.fields)).add("testPart1", StringType()).add(
        "testPart2", IntegerType()
    )
    rows = {("p1", 1): BASIC_ROWS[:2], ("p1", 2): BASIC_ROWS[2:], ("p2", 1): BASIC_ROWS[:1]}
    for (p1, p2), rs in rows.items():
        d = base / f"testPart1={p1}" / f"testPart2={p2}"
        os.makedirs(d)
        write_basic_csv(str(d / "part-0.csv"), rs)
        queue.send_file_event(str(d / "part-0.csv"), int(time.time() * 1000))
    opts = base_options(
        tmp_path,
        **{
            "spark.s3conn.partitionColumns": "testPart1,testPart2",
            "basePath": str(base),
        },
    )
    q = start_stream(spark, tmp_path, schema, opts, "e2e_part")
    try:
        q.processAllAvailable()
        res = spark.sql("SELECT testPart1, testPart2, COUNT(*) c FROM e2e_part GROUP BY 1,2").collect()
        got = {(r.testPart1, r.testPart2): r.c for r in res}
        assert got == {("p1", 1): 2, ("p1", 2): 1, ("p2", 1): 1}
    finally:
        q.stop()


def test_max_files_per_trigger_batching(spark, tmp_path, queue):
    register(spark)
    for i in range(5):
        f = str(tmp_path / f"f{i}.csv")
        write_basic_csv(f)
        queue.send_file_event(f, int(time.time() * 1000))
    q = start_stream(
        spark, tmp_path, BASIC_SCHEMA,
        base_options(tmp_path, **{"spark.s3conn.maxFilesPerTrigger": "2"}), "e2e_mfpt",
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) c FROM e2e_mfpt").collect()[0].c == 15
        batches = [p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) >= 3  # 5 files at ≤2/trigger
    finally:
        q.stop()


def test_checkpoint_restart(spark, tmp_path, queue):
    # file sink (memory sink doesn't support checkpoint recovery), mirroring
    # the reference's restart IT (S3ConnectorSourceItSuite.scala:640-724)
    register(spark)
    out_dir = str(tmp_path / "out")

    def run_once():
        reader = spark.readStream.format("s3-connector").schema(BASIC_SCHEMA)
        for k, v in base_options(tmp_path).items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    f1 = str(tmp_path / "f1.csv")
    write_basic_csv(f1)
    queue.send_file_event(f1, int(time.time() * 1000))
    run_once()
    assert spark.read.parquet(out_dir).count() == 3
    # restart with same checkpoint; new file plus duplicate of the old one
    f2 = str(tmp_path / "f2.csv")
    write_basic_csv(f2)
    queue.send_file_event(f2, int(time.time() * 1000))
    queue.send_file_event(f1, int(time.time() * 1000))
    run_once()
    # 3 new rows only; f1 screened by the persisted metadata log
    assert spark.read.parquet(out_dir).count() == 6


def test_max_file_age_expires_old_events(spark, tmp_path, queue):
    # a file whose event timestamp is far older than maxFileAge relative to
    # the newest seen file is rejected as expired (A8 purge horizon)
    register(spark)
    fresh = str(tmp_path / "fresh.csv")
    stale = str(tmp_path / "stale.csv")
    write_basic_csv(fresh)
    write_basic_csv(stale)
    now = int(time.time() * 1000)
    queue.send_file_event(fresh, now)
    q = start_stream(
        spark, tmp_path, BASIC_SCHEMA,
        base_options(tmp_path, **{"spark.s3conn.maxFileAge": "1h"}), "e2e_age",
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) c FROM e2e_age").collect()[0].c == 3
        # stale event: 2 h older than the newest file → beyond the 1 h horizon
        queue.send_file_event(stale, now - 2 * 3600 * 1000)
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) c FROM e2e_age").collect()[0].c == 3
    finally:
        q.stop()


def test_foreach_sink(spark, tmp_path, queue):
    # B12: foreach-style sink through the stream surface (reference
    # TestForeachWriter.scala:24-56 accumulates rows in a static map)
    register(spark)
    f1 = str(tmp_path / "f1.csv")
    write_basic_csv(f1)
    queue.send_file_event(f1, int(time.time() * 1000))
    out_dir = tmp_path / "foreach-out"
    out_dir.mkdir()

    def write_row(row):
        # executor-side accumulator: one marker file per row
        marker = out_dir / f"{row.testString}-{row.testInt}"
        marker.write_text("1")

    reader = spark.readStream.format("s3-connector").schema(BASIC_SCHEMA)
    for k, v in base_options(tmp_path).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreach(write_row)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(p.name for p in out_dir.iterdir()) == [
        "James-3000",
        "Michael-5000",
        "Robert-5000",
    ]


def test_glob_filter_stream(spark, tmp_path, queue):
    register(spark)
    keep = str(tmp_path / "keep.csv")
    skip = str(tmp_path / "skip.json")
    write_basic_csv(keep)
    write_basic_csv(skip)
    queue.send_file_event(keep, int(time.time() * 1000))
    queue.send_file_event(skip, int(time.time() * 1000))
    q = start_stream(
        spark, tmp_path, BASIC_SCHEMA,
        base_options(tmp_path, **{"spark.s3conn.pathGlobFilter": "*.csv"}), "e2e_glob",
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) c FROM e2e_glob").collect()[0].c == 3
    finally:
        q.stop()


def test_json_stream_ingest(spark, tmp_path, queue):
    """JSON format through the real stream path (reference scenario at
    S3ConnectorSourceItSuite.scala:388-413), including an EMPTY file —
    which must contribute zero rows, not an error."""
    register(spark)
    import json as _json

    f1 = str(tmp_path / "a.json")
    with open(f1, "w") as f:
        for s, b, i in BASIC_ROWS:
            f.write(_json.dumps({"testString": s, "testBoolean": b, "testInt": i}) + "\n")
    f2 = str(tmp_path / "empty.json")
    open(f2, "w").close()
    queue.send_file_event(f1, int(time.time() * 1000))
    queue.send_file_event(f2, int(time.time() * 1000))

    q = start_stream(
        spark, tmp_path, BASIC_SCHEMA, base_options(tmp_path, fmt="json"), "json_e2e"
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.testString, r.testBoolean, r.testInt)
            for r in spark.sql("SELECT * FROM json_e2e").collect()
        )
        assert got == sorted(BASIC_ROWS)
    finally:
        q.stop()


def test_checkpoint_restart_new_process(spark, tmp_path, queue):
    """Restore in a brand-new DRIVER PROCESS (the reference restarts with
    a new SparkSession, S3ConnectorSourceItSuite.scala:640-724; PySpark's
    Python-data-source registry is per-process, so the honest equivalent
    is a fresh interpreter+JVM): only the on-disk metadata log and sink
    checkpoint carry over — the new process must resume the offset and
    keep screening already-ingested files."""
    register(spark)
    out_dir = str(tmp_path / "out2")

    reader = spark.readStream.format("s3-connector").schema(BASIC_SCHEMA)
    for k, v in base_options(tmp_path).items():
        reader = reader.option(k, v)
    f1 = str(tmp_path / "n1.csv")
    write_basic_csv(f1)
    queue.send_file_event(f1, int(time.time() * 1000))
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out_dir).count() == 3

    f2 = str(tmp_path / "n2.csv")
    write_basic_csv(f2)
    queue.send_file_event(f2, int(time.time() * 1000))
    queue.send_file_event(f1, int(time.time() * 1000))  # duplicate

    import subprocess
    import sys as _sys

    script = f"""
import os, sys
sys.path.insert(0, {str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
os.environ["PYTHONPATH"] = {str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
from pyspark.sql import SparkSession
from pyspark.sql.types import BooleanType, IntegerType, StringType, StructField, StructType
from spark_streaming_sql_s3_connector_spark.sources.datasource import register
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
register(spark)
schema = StructType([StructField("testString", StringType()),
                     StructField("testBoolean", BooleanType()),
                     StructField("testInt", IntegerType())])
reader = spark.readStream.format("s3-connector").schema(schema)
for k, v in {base_options(tmp_path)!r}.items():
    reader = reader.option(k, v)
q = (reader.load().writeStream.format("parquet")
     .option("path", {out_dir!r})
     .option("checkpointLocation", {str(tmp_path / "ckpt2")!r}).start())
q.processAllAvailable()
q.stop()
n = spark.read.parquet({out_dir!r}).count()
spark.stop()
print("ROWS=" + str(n))
assert n == 6, n
"""
    proc = subprocess.run(
        [_sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ROWS=6" in proc.stdout


def test_orc_stream_ingest(spark, tmp_path, queue):
    """ORC through the real stream path — the reference passes any
    DataSource format string through (S3ConnectorSourceOptions.scala:
    99-100); our Arrow reader covers orc alongside csv/json/parquet."""
    register(spark)
    src = spark.createDataFrame(BASIC_ROWS, BASIC_SCHEMA)
    orc_dir = str(tmp_path / "orcdata")
    src.coalesce(1).write.orc(orc_dir)
    files = [
        os.path.join(orc_dir, f) for f in os.listdir(orc_dir) if f.endswith(".orc")
    ]
    assert files
    for f in files:
        queue.send_file_event(f, int(time.time() * 1000))

    q = start_stream(
        spark, tmp_path, BASIC_SCHEMA, base_options(tmp_path, fmt="orc"), "orc_e2e"
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.testString, r.testBoolean, r.testInt)
            for r in spark.sql("SELECT * FROM orc_e2e").collect()
        )
        assert got == sorted(BASIC_ROWS)
    finally:
        q.stop()


def test_text_format_stream(spark, tmp_path, queue):
    # free-form format parity: the reference hands any format string to
    # DataSource resolution (S3ConnectorSource.scala:176); `text` runs
    # natively on the Arrow executor path — one line per row, no parsing
    register(spark)
    f1 = str(tmp_path / "poem.txt")
    lines = ["first line", "second,line,with,commas", "", "fourth"]
    with open(f1, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    queue.send_file_event(f1, int(time.time() * 1000))
    schema = StructType([StructField("value", StringType())])
    q = start_stream(
        spark, tmp_path, schema, base_options(tmp_path, fmt="text"), "e2e_text"
    )
    try:
        q.processAllAvailable()
        got = [r.value for r in spark.sql("SELECT value FROM e2e_text").collect()]
        assert sorted(got) == sorted(lines)
    finally:
        q.stop()


def test_unknown_format_error_names_jvm_fallback(spark, tmp_path, queue):
    # formats the Arrow path lacks must fail loudly, pointing at the
    # JVM-read pipeline that accepts any Spark DataSource format
    from spark_streaming_sql_s3_connector_spark.sources.file_read import read_file_to_table

    f1 = str(tmp_path / "x.avro")
    with open(f1, "wb") as fh:
        fh.write(b"Obj\x01")
    schema = StructType([StructField("value", StringType())])
    with pytest.raises(ValueError, match="orchestrator"):
        read_file_to_table(f1, "avro", schema, {}, [], None)
