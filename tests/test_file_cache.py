"""Ports of S3ConnectorFileCacheSuite (reference scala:21-138)."""

from spark_streaming_sql_s3_connector_spark.models import QueueMessageDesc
from spark_streaming_sql_s3_connector_spark.state.file_cache import FileCache, FileCacheNewFileResult


def desc(ts, processed=False, mid=None):
    return QueueMessageDesc(ts, processed, mid)


def test_add_and_is_new_file_states():
    c = FileCache(max_file_age_ms=1000)
    assert c.is_new_file("a") is FileCacheNewFileResult.OK
    c.add("a", desc(10))
    assert c.is_new_file("a") is FileCacheNewFileResult.EXIST_IN_CACHE_NOT_PROCESSED
    c.mark_processed("a")
    assert c.is_new_file("a") is FileCacheNewFileResult.EXIST_IN_CACHE_PROCESSED


def test_add_if_absent_returns_existing():
    c = FileCache(1000)
    d1 = desc(10, mid="m1")
    d2 = desc(20, mid="m2")
    assert c.add_if_absent("a", d1) is d1
    assert c.add_if_absent("a", d2) is d1  # lost CAS returns pre-existing
    assert c.latest_timestamp == 20  # latest ts still bumped


def test_get_unprocessed_files_respects_max_and_processed():
    c = FileCache(10_000)
    for i in range(10):
        c.add(f"f{i}", desc(100 + i))
    c.mark_processed("f0")
    files = c.get_unprocessed_files(max_files_per_trigger=5)
    assert len(files) == 5
    assert all(f.file_path != "f0" for f in files)
    files = c.get_unprocessed_files(None)
    assert len(files) == 9


def test_get_unprocessed_files_sorted():
    c = FileCache(10_000)
    c.add("b", desc(200))
    c.add("a", desc(100))
    c.add("c", desc(300))
    files = c.get_unprocessed_files(2, should_sort_files=True)
    assert [f.file_path for f in files] == ["a", "b"]


def test_purge_removes_aged_and_processed():
    c = FileCache(max_file_age_ms=100)
    c.add("old", desc(10))
    c.add("new", desc(500))
    c.add("done", desc(450, processed=True))
    n = c.purge()
    # horizon = 500 - 100 = 400: "old" aged out, "done" processed
    assert n == 2
    assert c.last_purge_timestamp == 400
    assert c.size == 1
    assert c.is_new_file("new") is FileCacheNewFileResult.EXIST_IN_CACHE_NOT_PROCESSED


def test_purge_horizon_excludes_from_batch_cut():
    c = FileCache(max_file_age_ms=100)
    c.add("new", desc(500))
    c.purge()  # horizon 400
    c.add("late", desc(300))  # older than horizon, arrives after purge
    files = c.get_unprocessed_files(None)
    assert [f.file_path for f in files] == ["new"]


def test_purge_horizon_never_regresses():
    c = FileCache(max_file_age_ms=100)
    c.add("a", desc(500))
    c.purge()
    assert c.last_purge_timestamp == 400
    c2 = c.purge()  # latest unchanged → horizon unchanged
    assert c.last_purge_timestamp == 400
