from spark_streaming_sql_s3_connector_spark.functions.text import (
    document_fingerprint,
    language_id,
    quality_metrics,
    token_count,
    tokenize,
)

__all__ = [
    "document_fingerprint",
    "language_id",
    "quality_metrics",
    "token_count",
    "tokenize",
]
