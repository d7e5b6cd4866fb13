from spark_streaming_sql_s3_connector_spark.sources.admission import (
    AdmissionController,
    MetalogAddError,
    ReprocessDryRunComplete,
    ReprocessLockExistsError,
)
from spark_streaming_sql_s3_connector_spark.sources.datasource import S3ConnectorDataSource, register

__all__ = [
    "AdmissionController",
    "MetalogAddError",
    "ReprocessDryRunComplete",
    "ReprocessLockExistsError",
    "S3ConnectorDataSource",
    "register",
]
