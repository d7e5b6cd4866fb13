"""File admission validator — predicate chain over glob, age, cache, log.

Same 6-valued decision procedure as the reference's S3ConnectorFileValidator
(S3ConnectorFileValidator.scala:32-61): glob mismatch → PatternNotMatch;
older than purge horizon → FileExpired; cache hit → ExistInCache{Processed,
NotProcessed}; persisted in log and not expired → PersistedInMetadataLog;
else Ok. Semantically a left-anti join of candidates against seen files.
"""

from __future__ import annotations

import fnmatch
from enum import Enum
from typing import Optional

from spark_streaming_sql_s3_connector_spark.state.file_cache import FileCache, FileCacheNewFileResult
from spark_streaming_sql_s3_connector_spark.state.metadata_log import JsonMetadataLog


class FileValidResult(Enum):
    OK = "Ok"
    PATTERN_NOT_MATCH = "PatternNotMatch"
    FILE_EXPIRED = "FileExpired"
    EXIST_IN_CACHE_PROCESSED = "ExistInCacheProcessed"
    EXIST_IN_CACHE_NOT_PROCESSED = "ExistInCacheNotProcessed"
    PERSISTED_IN_METADATA_LOG = "PersistedInMetadataLog"


def glob_matches(pattern: str, path: str) -> bool:
    """Hadoop GlobPattern-style match (the reference applies
    org.apache.hadoop.fs.GlobPattern to the whole path,
    S3ConnectorFileValidator.scala:36): ``*`` → ``.*`` and ``?`` → ``.``
    (both cross ``/``, unlike shell globs), plus ``[...]`` classes and
    ``{a,b}`` alternation.
    """
    import re

    regex = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            regex.append(".*")
        elif c == "?":
            regex.append(".")
        elif c == "[":
            j = i + 1
            if j < len(pattern) and pattern[j] in "!^":
                j += 1
            if j < len(pattern) and pattern[j] == "]":
                j += 1
            while j < len(pattern) and pattern[j] != "]":
                j += 1
            if j >= len(pattern):
                regex.append(re.escape(c))
            else:
                cls = pattern[i + 1 : j].replace("\\", "\\\\")
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                regex.append(f"[{cls}]")
                i = j
        elif c == "{":
            j = pattern.find("}", i)
            if j == -1:
                regex.append(re.escape(c))
            else:
                alts = pattern[i + 1 : j].split(",")
                regex.append("(" + "|".join(re.escape(a) for a in alts) + ")")
                i = j
        else:
            regex.append(re.escape(c))
        i += 1
    return re.fullmatch("".join(regex), path) is not None


class FileValidator:
    def __init__(
        self,
        file_cache: FileCache,
        metadata_log: JsonMetadataLog,
        path_glob_filter: Optional[str] = None,
    ):
        self._cache = file_cache
        self._log = metadata_log
        self._glob = path_glob_filter

    def is_valid_new_file(self, file_path: str, timestamp: int) -> FileValidResult:
        if self._glob is not None and not glob_matches(self._glob, file_path):
            return FileValidResult.PATTERN_NOT_MATCH
        last_purge_ts = self._cache.last_purge_timestamp
        if timestamp < last_purge_ts:
            return FileValidResult.FILE_EXPIRED
        cache_result = self._cache.is_new_file(file_path)
        if cache_result == FileCacheNewFileResult.EXIST_IN_CACHE_PROCESSED:
            return FileValidResult.EXIST_IN_CACHE_PROCESSED
        if cache_result == FileCacheNewFileResult.EXIST_IN_CACHE_NOT_PROCESSED:
            return FileValidResult.EXIST_IN_CACHE_NOT_PROCESSED
        if not self._log.is_new_file(file_path, last_purge_ts):
            return FileValidResult.PERSISTED_IN_METADATA_LOG
        return FileValidResult.OK
