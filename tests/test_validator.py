"""Ports of S3ConnectorFileValidatorSuite (reference scala:27-83)."""

from spark_streaming_sql_s3_connector_spark.models import FileEntry, QueueMessageDesc
from spark_streaming_sql_s3_connector_spark.state.file_cache import FileCache
from spark_streaming_sql_s3_connector_spark.state.metadata_log import JsonMetadataLog
from spark_streaming_sql_s3_connector_spark.state.validator import (
    FileValidator,
    FileValidResult,
    glob_matches,
)


def mk(tmp_path, glob=None, max_age=10_000):
    cache = FileCache(max_age)
    log = JsonMetadataLog(str(tmp_path / "log"), purge_timestamp_provider=lambda: cache.last_purge_timestamp)
    return cache, log, FileValidator(cache, log, glob)


def test_ok_for_new_file(tmp_path):
    _, _, v = mk(tmp_path)
    assert v.is_valid_new_file("s3a://b/f1.csv", 100) is FileValidResult.OK


def test_glob_pattern(tmp_path):
    _, _, v = mk(tmp_path, glob="*.csv")
    assert v.is_valid_new_file("data.csv", 100) is FileValidResult.OK
    assert v.is_valid_new_file("data.json", 100) is FileValidResult.PATTERN_NOT_MATCH


def test_glob_partition_pattern(tmp_path):
    # reference test pattern */partition=1*/* (GlobPattern: '*' crosses '/')
    _, _, v = mk(tmp_path, glob="*/partition=1*/*")
    assert v.is_valid_new_file("base/partition=10/f.csv", 100) is FileValidResult.OK
    assert v.is_valid_new_file("base/x/partition=1/f.csv", 100) is FileValidResult.OK
    assert v.is_valid_new_file("base/partition=2/f.csv", 100) is FileValidResult.PATTERN_NOT_MATCH


def test_expired_file(tmp_path):
    cache, _, v = mk(tmp_path, max_age=100)
    cache.add("recent", QueueMessageDesc(1000, False))
    cache.purge()  # horizon = 900
    assert v.is_valid_new_file("oldfile", 899) is FileValidResult.FILE_EXPIRED
    assert v.is_valid_new_file("newfile", 901) is FileValidResult.OK


def test_cache_states(tmp_path):
    cache, _, v = mk(tmp_path)
    cache.add("pending", QueueMessageDesc(100, False))
    cache.add("done", QueueMessageDesc(100, True))
    assert v.is_valid_new_file("pending", 100) is FileValidResult.EXIST_IN_CACHE_NOT_PROCESSED
    assert v.is_valid_new_file("done", 100) is FileValidResult.EXIST_IN_CACHE_PROCESSED


def test_persisted_in_log(tmp_path):
    cache, log, v = mk(tmp_path)
    log.add(0, [FileEntry("committed", 100, 0)])
    assert v.is_valid_new_file("committed", 100) is FileValidResult.PERSISTED_IN_METADATA_LOG
    # expired from log horizon → re-admittable: simulate via cache horizon
    cache.add("recent", QueueMessageDesc(100_000 + 200, False))
    cache.purge()  # horizon = 300 > 100
    assert v.is_valid_new_file("committed", cache.last_purge_timestamp + 1) is FileValidResult.OK


def test_glob_matches_brace_and_question():
    assert glob_matches("*.{csv,json}", "a.csv")
    assert glob_matches("*.{csv,json}", "a.json")
    assert not glob_matches("*.{csv,json}", "a.parquet")
    assert glob_matches("f?.csv", "f1.csv")
    assert not glob_matches("f?.csv", "f12.csv")
