from spark_streaming_sql_s3_connector_spark.state.file_cache import FileCache, FileCacheNewFileResult
from spark_streaming_sql_s3_connector_spark.state.metadata_log import JsonMetadataLog, MetadataLogHoleError
from spark_streaming_sql_s3_connector_spark.state.validator import FileValidator, FileValidResult

__all__ = [
    "FileCache",
    "FileCacheNewFileResult",
    "JsonMetadataLog",
    "MetadataLogHoleError",
    "FileValidator",
    "FileValidResult",
]
